"""k2-flavor model container: Zipformer + stateless transducer, jitted.

Replaces the sherpa-onnx C++ OfflineRecognizer (pkg/k2-asr/src/huggingface.py:73-83)
with a single jitted program per bucket: kaldi-convention fbank → Zipformer2
encoder → label-looping greedy decode with the k2 stateless (2-token context)
prediction network, blank-first token convention.
"""

import os
from dataclasses import dataclass, replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.tokenizer import VocabTokenizer
from ...decoding.rnnt_greedy import GreedyDecodeConfig, rnnt_greedy_decode
from ...frontend.features import FrontendConfig, kaldi_frontend_config, log_mel_spectrogram
from ...models.rnnt import RNNTConfig, init_joint, init_predictor
from ...models.zipformer import ZipformerConfig, init_zipformer, zipformer_encode

__all__ = ["K2TPUModel", "load_model_container", "SECONDS_PER_FRAME"]

DEFAULT_CHECKPOINT_ENV = "REAZONSPEECH_TPU_K2_CHECKPOINT"
BUCKET_SAMPLES = 4 * 16000

# Zipformer output frame rate: 10 ms fbank hop × 2 (embed) × 2 (output
# downsample) = 25 frames/sec, the grid sherpa timestamps live on.
SECONDS_PER_FRAME = 0.04


@partial(jax.jit, static_argnames=("fe_cfg", "enc_cfg", "rnnt_cfg", "decode_cfg"))
def k2_forward(params, waveform, lengths, fe_cfg, enc_cfg, rnnt_cfg, decode_cfg):
    from ...decoding.rnnt_beam import BeamDecodeConfig, rnnt_beam_decode

    feats, flens = log_mel_spectrogram(waveform, lengths, fe_cfg)
    enc, elens = zipformer_encode(params["encoder"], feats, flens, enc_cfg)
    if isinstance(decode_cfg, BeamDecodeConfig):
        tokens, frames, counts, _ = rnnt_beam_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    else:
        tokens, frames, counts = rnnt_greedy_decode(
            params["predictor"], params["joint"], enc, elens, rnnt_cfg, decode_cfg
        )
    return tokens, frames, counts, elens


@dataclass
class K2TPUModel:
    # waveform padding grid (serving batches align to this)
    bucket_samples = BUCKET_SAMPLES
    params: dict
    fe_cfg: FrontendConfig
    enc_cfg: ZipformerConfig
    rnnt_cfg: RNNTConfig
    decode_cfg: GreedyDecodeConfig
    tokenizer: object

    @property
    def token_list(self):
        return self.tokenizer.pieces

    def decode_batch_fn(self):
        """Pure per-shard pipeline ``(params, waveform, lengths) -> (tokens,
        frames, counts, enc_lengths)`` closing over the static configs — the
        unit parallel/serving.py shard_maps over the mesh data axis."""
        fe_cfg, enc_cfg = self.fe_cfg, self.enc_cfg
        rnnt_cfg, decode_cfg = self.rnnt_cfg, self.decode_cfg

        def fn(params, waveform, lengths):
            return k2_forward(
                params, waveform, lengths, fe_cfg, enc_cfg, rnnt_cfg,
                decode_cfg)

        return fn

    def decode_batch(self, waveforms: np.ndarray, lengths: np.ndarray):
        """Run the jitted pipeline on a padded [B, N] batch."""
        out = k2_forward(
            self.params,
            jnp.asarray(waveforms, jnp.float32),
            jnp.asarray(lengths, jnp.int32),
            self.fe_cfg,
            self.enc_cfg,
            self.rnnt_cfg,
            self.decode_cfg,
        )
        return tuple(np.asarray(x) for x in out)

    def decode_single(self, waveform: np.ndarray):
        n = len(waveform)
        padded_n = max(BUCKET_SAMPLES, -(-n // BUCKET_SAMPLES) * BUCKET_SAMPLES)
        buf = np.zeros((1, padded_n), np.float32)
        buf[0, :n] = waveform
        tokens, frames, counts, _ = self.decode_batch(buf, np.array([n]))
        c = int(counts[0])
        return tokens[0, :c].tolist(), frames[0, :c].tolist()


def default_k2_token_list():
    """k2 tokens.txt convention: <blk> first, then pieces."""
    pieces = ["<blk>", "<sos/eos>", "<unk>"]
    pieces += [chr(c) for c in range(0x3041, 0x3097)]
    pieces += [chr(c) for c in range(0x30A1, 0x30FB)]
    pieces += [chr(c) for c in range(0x4E00, 0x4E00 + 2000)]
    return pieces


def _tpu_serving_overrides(enc_cfg: ZipformerConfig) -> ZipformerConfig:
    """On real TPU, serve with the scores-in-VMEM shared-attention kernel
    (ops/zipformer_attention.py); the residual stream stays fp32 (same
    accuracy policy as the conformers, see nemo/asr/model.py)."""
    if jax.devices()[0].platform in ("tpu", "axon"):
        return replace(enc_cfg, attn_impl="pallas")
    return enc_cfg


def load_model_container(
    checkpoint: Optional[str] = None,
    enc_cfg: Optional[ZipformerConfig] = None,
    rnnt_cfg: Optional[RNNTConfig] = None,
    token_list=None,
    decoding: str = "greedy",
    beam_size: int = 4,
    seed: int = 0,
) -> K2TPUModel:
    """Build the k2-flavor container.

    ``checkpoint`` is a converted-tree base path, "random" (explicit random
    initialization for tests/benchmarks), or None — which consults
    $REAZONSPEECH_TPU_K2_CHECKPOINT and otherwise raises (the HF-hub
    resolution lives in load_model, k2/asr/huggingface.py).
    """
    checkpoint = checkpoint or os.environ.get(DEFAULT_CHECKPOINT_ENV)
    random_init = checkpoint == "random"
    meta = {}
    params = None
    if not random_init:
        if checkpoint is None:
            from ...core.hub import CheckpointNotFoundError

            raise CheckpointNotFoundError(
                "No k2 checkpoint given (pass checkpoint=, set $%s, or use "
                "k2.asr.load_model for HF-hub resolution). For a randomly "
                "initialized model pass checkpoint=\"random\"."
                % DEFAULT_CHECKPOINT_ENV
            )
        from ...convert.quantize import dequantize_tree, is_quantized
        from ...convert.store import load_param_tree

        params, meta = load_param_tree(checkpoint)
        if is_quantized(params):  # int8 precision variants
            params = dequantize_tree(params)
        if meta.get("token_list"):
            token_list = token_list or meta["token_list"]

    if enc_cfg is None:
        if meta.get("enc_cfg"):
            cfg_kw = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in meta["enc_cfg"].items()
            }
            enc_cfg = _tpu_serving_overrides(ZipformerConfig(**cfg_kw))
        else:
            size = os.environ.get("REAZONSPEECH_TPU_MODEL_SIZE", "")
            enc_cfg = (
                ZipformerConfig.tiny()
                if size == "tiny"
                else _tpu_serving_overrides(ZipformerConfig.large())
            )

    token_list = token_list or default_k2_token_list()
    if rnnt_cfg is None and meta.get("rnnt_cfg"):
        rnnt_cfg = RNNTConfig(**meta["rnnt_cfg"])
    if rnnt_cfg is None:
        rnnt_cfg = RNNTConfig(
            vocab_size=len(token_list),
            enc_dim=enc_cfg.out_dim,
            pred_hidden=512,
            joint_hidden=512,
            joint_activation="tanh",
            predictor_kind="stateless",
            context_size=2,
        )

    if params is None:
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "encoder": init_zipformer(k1, enc_cfg),
            "predictor": init_predictor(k2, rnnt_cfg),
            "joint": init_joint(k3, rnnt_cfg),
        }

    if decoding == "beam":
        # sherpa-onnx exposes modified_beam_search for the same models
        # (beyond the reference's pinned greedy_search)
        from ...decoding.rnnt_beam import BeamDecodeConfig

        decode_cfg = BeamDecodeConfig(beam_size=beam_size)
    else:
        decode_cfg = GreedyDecodeConfig()

    return K2TPUModel(
        params=params,
        fe_cfg=kaldi_frontend_config(n_mels=enc_cfg.feat_in),
        enc_cfg=enc_cfg,
        rnnt_cfg=rnnt_cfg,
        decode_cfg=decode_cfg,
        tokenizer=VocabTokenizer(token_list),
    )
