"""espnet-flavor model container: Conformer encoder + CTC head + transducer.

One jitted program per bucket computes the encoder pass ONCE and returns both
the CTC probability matrix (for blank detection / alignment) and the greedy
transducer emissions — eliminating the reference's 3× encoder recompute per
chunk (SURVEY.md §3.3 note).
"""

import glob
import os
import warnings
from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tokenizer import CharTokenizer
from ...decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
from ...frontend.features import FrontendConfig, espnet_frontend_config, log_mel_spectrogram
from ...models.conformer import espnet_encoder_config, init_ctc_head, ctc_logits
from ...models.fastconformer import FastConformerConfig, fastconformer_encode, init_fastconformer
from ...models.rnnt import RNNTConfig, init_joint, init_predictor

__all__ = ["EspnetTPUModel", "load_model_container"]

DEFAULT_CHECKPOINT_ENV = "REAZONSPEECH_TPU_ESPNET_CHECKPOINT"

# Published weights repo (parity: pkg/espnet-asr/src/transcribe.py:28-31).
HF_REPO_ID = "reazon-research/reazonspeech-espnet-v2"
BUCKET_SAMPLES = 2 * 16000  # chunks are ≤ 20 s; 2 s buckets bound recompiles


def _apply_mvn(params, feats, flens):
    """GlobalMVN feature normalization (espnet2/layers/global_mvn.py: the
    published espnet-v2 recipe normalizes log-mel with corpus stats that the
    converter folds into params['normalize']). Padded frames are re-zeroed —
    the subsampling convs must not see the normalized-zero bias."""
    if "normalize" not in params:
        return feats
    n = params["normalize"]
    out = (feats - n["mean"]) / n["std"]
    mask = jnp.arange(feats.shape[1])[None, :] < flens[:, None]
    return jnp.where(mask[..., None], out, 0.0)


@partial(jax.jit, static_argnames=("fe_cfg", "enc_cfg", "rnnt_cfg", "decode_cfg"))
def encode_ctc_decode(
    params, waveform, lengths, fe_cfg, enc_cfg, rnnt_cfg, decode_cfg
):
    """One fused pass: frontend → encoder → (CTC log-probs, emissions)."""
    from ...decoding.rnnt_beam import BeamDecodeConfig, rnnt_beam_decode
    from ...decoding.transducer_graves import GravesBeamConfig, graves_beam_decode
    from ...decoding.transducer_maes import MAESBeamConfig, maes_beam_decode

    feats, flens = log_mel_spectrogram(waveform, lengths, fe_cfg)
    feats = _apply_mvn(params, feats, flens)
    enc, elens = fastconformer_encode(params["encoder"], feats, flens, enc_cfg)
    lpz_log = jax.nn.log_softmax(ctc_logits(params["ctc"], enc), axis=-1)
    saturated = jnp.zeros((enc.shape[0],), bool)
    if isinstance(decode_cfg, GravesBeamConfig):
        # the reference's decode algorithm (ESPnet default_beam_search);
        # ``saturated`` marks elements where the fixed-shape pop cap ended a
        # frame before ESPnet's own termination test would have
        tokens, frames, counts, _, saturated = graves_beam_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    elif isinstance(decode_cfg, MAESBeamConfig):
        # ESPnet's alignment-synchronous alternative (search_type="maes"):
        # O(frames) batched expansions, no serial pop loop
        tokens, frames, counts, _ = maes_beam_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    elif isinstance(decode_cfg, BeamDecodeConfig):
        tokens, frames, counts, _ = rnnt_beam_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    else:
        tokens, frames, counts = rnnt_greedy_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    return lpz_log, tokens, frames, counts, elens, saturated


@partial(jax.jit, static_argnames=("fe_cfg", "enc_cfg"))
def encode_ctc(params, waveform, lengths, fe_cfg, enc_cfg):
    """frontend → encoder → CTC softmax probabilities (the lpz matrix)."""
    feats, flens = log_mel_spectrogram(waveform, lengths, fe_cfg)
    feats = _apply_mvn(params, feats, flens)
    enc, elens = fastconformer_encode(params["encoder"], feats, flens, enc_cfg)
    lpz = jax.nn.softmax(ctc_logits(params["ctc"], enc), axis=-1)
    return lpz, elens


def _warn_saturated(saturated):
    """Warn when the fixed-shape beam's pop budget bound (ESPnet's search is
    unbounded; ours caps pops per frame so shapes stay static — outside the
    cap, outputs are exact vs the oracle). Mirrors the reference's style of
    warning instead of failing (pkg/k2-asr/src/transcribe.py:27-34)."""
    n = int(np.asarray(saturated).sum())
    if n:
        warnings.warn(
            f"beam search pop budget was exhausted on {n} batch element(s) "
            "before ESPnet's termination test; results there may diverge "
            "from the reference. Raise GravesBeamConfig.max_pops_per_frame "
            "to remove the bound.",
            RuntimeWarning,
            stacklevel=3,
        )


@dataclass
class EspnetTPUModel:
    # waveform padding grid (serving batches align to this)
    bucket_samples = BUCKET_SAMPLES
    params: dict
    fe_cfg: FrontendConfig
    enc_cfg: FastConformerConfig
    rnnt_cfg: RNNTConfig
    decode_cfg: GreedyDecodeConfig
    tokenizer: object  # CharTokenizer over token_list
    blank_id: int = 0  # CTC blank (espnet convention)

    @property
    def token_list(self):
        return self.tokenizer.pieces

    def _bucket(self, samples):
        n = len(samples)
        padded = max(BUCKET_SAMPLES, -(-n // BUCKET_SAMPLES) * BUCKET_SAMPLES)
        buf = np.zeros((1, padded), np.float32)
        buf[0, :n] = samples
        return buf, np.array([n], np.int32)

    def ctc_probs(self, samples):
        """lpz [T_valid, V] softmax probabilities for a waveform chunk."""
        buf, lens = self._bucket(samples)
        lpz, elens = encode_ctc(
            self.params, jnp.asarray(buf), jnp.asarray(lens), self.fe_cfg, self.enc_cfg
        )
        return np.asarray(lpz[0, : int(elens[0])])

    def decode_with_ctc(self, samples):
        """(token_ids, lpz_log [T_valid, V]) for a waveform chunk — one
        encoder pass shared by decode and alignment."""
        buf, lens = self._bucket(samples)
        lpz_log, tokens, frames, counts, elens, saturated = encode_ctc_decode(
            self.params,
            jnp.asarray(buf),
            jnp.asarray(lens),
            self.fe_cfg,
            self.enc_cfg,
            self.rnnt_cfg,
            self.decode_cfg,
        )
        _warn_saturated(saturated)
        c = int(counts[0])
        return (
            tokens[0, :c].tolist(),
            np.asarray(lpz_log[0, : int(elens[0])]),
        )

    def ids_to_text(self, ids):
        return self.tokenizer.ids_to_text(ids)

    def decode_batch_fn(self):
        """Pure per-shard pipeline ``(params, waveform, lengths) -> (tokens,
        frames, counts, enc_lengths, saturated)`` closing over the static
        configs — the unit parallel/serving.py shard_maps over the mesh data
        axis. The CTC matrix is dropped inside the trace (DCE'd) so the
        sharded serving path never materializes it."""
        fe_cfg, enc_cfg = self.fe_cfg, self.enc_cfg
        rnnt_cfg, decode_cfg = self.rnnt_cfg, self.decode_cfg

        def fn(params, waveform, lengths):
            _, tokens, frames, counts, elens, saturated = encode_ctc_decode(
                params, waveform, lengths, fe_cfg, enc_cfg, rnnt_cfg,
                decode_cfg)
            return tokens, frames, counts, elens, saturated

        return fn

    def _host_decode_flags(self, outs):
        """Host-side post for mesh-serving outputs (5th element = the
        per-element pop-budget saturation flag)."""
        if len(outs) > 4:
            _warn_saturated(outs[4])

    def decode_batch(self, waveforms: np.ndarray, lengths: np.ndarray):
        """Padded-batch transducer decode (the serving/MicroBatcher
        interface the other flavors expose): returns host numpy
        (tokens, frames, counts, enc_lengths)."""
        _, tokens, frames, counts, elens, saturated = encode_ctc_decode(
            self.params,
            jnp.asarray(waveforms, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self.fe_cfg,
            self.enc_cfg,
            self.rnnt_cfg,
            self.decode_cfg,
        )
        _warn_saturated(saturated)
        return (
            np.asarray(tokens),
            np.asarray(frames),
            np.asarray(counts),
            np.asarray(elens),
        )

    def decode_single(self, waveform: np.ndarray):
        buf, lens = self._bucket(np.asarray(waveform, np.float32))
        tokens, frames, counts, _ = self.decode_batch(buf, lens)
        c = int(counts[0])
        return tokens[0, :c].tolist(), frames[0, :c].tolist()


def default_token_list(vocab_chars=None):
    """espnet-convention token list: <blank> first, <sos/eos> last."""
    if vocab_chars is None:
        chars = ["。", "、", "?", "!"]
        chars += [chr(c) for c in range(0x3041, 0x3097)]
        chars += [chr(c) for c in range(0x30A1, 0x30FB)]
        chars += [chr(c) for c in range(0x4E00, 0x4E00 + 2000)]
        vocab_chars = chars
    return ["<blank>"] + list(vocab_chars) + ["<sos/eos>"]


def _convert_snapshot(snapshot_dir, out_base):
    """Convert the espnet-zoo .pth (+ its config.yaml) inside an HF snapshot."""
    pths = sorted(
        glob.glob(os.path.join(snapshot_dir, "**", "*.pth"), recursive=True),
        # prefer the averaged validation checkpoint the zoo publishes
        key=lambda p: ("valid" not in p, "ave" not in p, p),
    )
    if not pths:
        from ...core.hub import CheckpointNotFoundError

        raise CheckpointNotFoundError(
            f"HF snapshot {snapshot_dir} contains no .pth checkpoint"
        )
    cfg_candidates = glob.glob(
        os.path.join(os.path.dirname(pths[0]), "config.yaml")
    ) or glob.glob(os.path.join(snapshot_dir, "**", "config.yaml"), recursive=True)
    from ...convert.espnet_conformer import convert_espnet_checkpoint

    convert_espnet_checkpoint(
        pths[0], out_base, config_yaml=cfg_candidates[0] if cfg_candidates else None
    )


def _tpu_serving_overrides(enc_cfg: FastConformerConfig) -> FastConformerConfig:
    """Pallas attention on TPU; residual stream fp32 by default (see
    nemo/asr/model.py — bf16 residual is opt-in pending real-weight CER)."""
    if jax.devices()[0].platform in ("tpu", "axon"):
        residual = os.environ.get("REAZONSPEECH_TPU_RESIDUAL_DTYPE", "float32")
        return replace(
            enc_cfg, attn_impl="pallas", conv_impl="pallas",
            lnd_impl="pallas", residual_dtype=residual,
        )
    return enc_cfg


def load_model_container(
    checkpoint: Optional[str] = None,
    enc_cfg: Optional[FastConformerConfig] = None,
    rnnt_cfg: Optional[RNNTConfig] = None,
    token_list=None,
    decoding: str = "beam",
    beam_size: int = 20,
    seed: int = 0,
) -> EspnetTPUModel:
    """Build the espnet-flavor container.

    ``decoding`` selects the decode strategy: "beam" (the DEFAULT — ESPnet's
    ``default_beam_search`` at Speech2Text's default width 20, exactly what
    the reference serves via pkg/espnet-asr/src/transcribe.py:27-32,69;
    oracle-gated in tools/convert_and_gate.py), "maes" (ESPnet's
    alignment-synchronous ``search_type="maes"`` — O(frames) batched
    expansions instead of the serial per-frame pop loop, oracle-gated in
    tests/test_maes_beam.py; stays opt-in until real-weight CER confirms
    parity with "beam"), "alsd" (the NeMo-style alignment-synchronous beam)
    or "greedy" (the fast path).

    Checkpoint resolution is offline-first HF-hub (core/hub.py) and FAILS
    LOUDLY when nothing resolves; pass checkpoint="random" for an explicitly
    randomly initialized model (tests/benchmarks).
    """
    checkpoint = checkpoint or os.environ.get(DEFAULT_CHECKPOINT_ENV)
    random_init = checkpoint == "random"
    meta = {}
    params = None
    if not random_init:
        if checkpoint is None:
            from ...core.hub import resolve_converted

            checkpoint = resolve_converted(HF_REPO_ID, "model", _convert_snapshot)
        from ...convert.store import load_param_tree

        params, meta = load_param_tree(checkpoint)
        if meta.get("token_list"):
            token_list = token_list or meta["token_list"]

    if enc_cfg is None:
        if meta.get("enc_cfg"):
            enc_cfg = _tpu_serving_overrides(FastConformerConfig(**meta["enc_cfg"]))
        elif os.environ.get("REAZONSPEECH_TPU_MODEL_SIZE", "") == "tiny":
            enc_cfg = espnet_encoder_config(
                num_layers=2, d_model=64, num_heads=4, subsampling_channels=32
            )
        else:
            enc_cfg = _tpu_serving_overrides(espnet_encoder_config())

    token_list = token_list or default_token_list()
    num_tokens = len(token_list)
    if rnnt_cfg is None and meta.get("rnnt_cfg"):
        rnnt_cfg = RNNTConfig(**meta["rnnt_cfg"])
    if rnnt_cfg is None:
        # espnet2 TransducerDecoder/JointNetwork conventions: blank id 0
        # shares the embedding table, tanh joint
        rnnt_cfg = RNNTConfig(
            vocab_size=num_tokens,
            enc_dim=enc_cfg.d_model,
            pred_hidden=256 if enc_cfg.d_model >= 256 else 64,
            joint_hidden=256 if enc_cfg.d_model >= 256 else 64,
            joint_activation="tanh",
            blank_position="first",
        )

    if params is None:
        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = {
            "encoder": init_fastconformer(k1, enc_cfg),
            "ctc": init_ctc_head(k2, enc_cfg.d_model, num_tokens),
            "predictor": init_predictor(k3, rnnt_cfg),
            "joint": init_joint(k4, rnnt_cfg),
        }
    else:
        # a CTC-only or encoder-only conversion still needs usable shapes
        # for the transducer branch of the fused program
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params.setdefault("ctc", init_ctc_head(k1, enc_cfg.d_model, num_tokens))
        params.setdefault("predictor", init_predictor(k2, rnnt_cfg))
        params.setdefault("joint", init_joint(k3, rnnt_cfg))

    tok = CharTokenizer(token_list)
    tok.types[0] = 3  # <blank> control
    tok.types[-1] = 3  # <sos/eos> control

    topk_impl = (
        "pallas" if jax.devices()[0].platform in ("tpu", "axon") else "xla"
    )
    if decoding == "beam":
        from ...decoding.transducer_graves import GravesBeamConfig

        decode_cfg = GravesBeamConfig(beam_size=beam_size, topk_impl=topk_impl)
    elif decoding == "maes":
        from ...decoding.transducer_maes import MAESBeamConfig

        decode_cfg = MAESBeamConfig(beam_size=beam_size, topk_impl=topk_impl)
    elif decoding == "alsd":
        from ...decoding.rnnt_beam import BeamDecodeConfig

        decode_cfg = BeamDecodeConfig(beam_size=beam_size, topk_impl=topk_impl)
    else:
        decode_cfg = GreedyDecodeConfig()

    return EspnetTPUModel(
        params=params,
        fe_cfg=espnet_frontend_config(n_mels=enc_cfg.feat_in),
        enc_cfg=enc_cfg,
        rnnt_cfg=rnnt_cfg,
        decode_cfg=decode_cfg,
        tokenizer=tok,
    )
