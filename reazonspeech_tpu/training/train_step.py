"""Full RNN-T training step (waveform → loss → param update), pjit-ready.

The reference ships no trainer (SURVEY.md §4); this makes the TPU framework a
complete product: the same frontend/encoder code paths used at inference are
differentiated end-to-end. The step is written to be jitted over a
('data','model') mesh — batch sharded over data, encoder matmuls tensor-
sharded over model (parallel.mesh rules) — with XLA inserting the gradient
psums from sharding annotations alone.
"""

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..frontend.features import FrontendConfig, log_mel_spectrogram
from ..models.fastconformer import FastConformerConfig, fastconformer_encode
from ..models.rnnt import RNNTConfig, joint_full, predictor_sequence
from .losses import rnnt_loss

__all__ = ["TrainState", "make_train_step", "compute_loss"]


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def compute_loss(
    params,
    batch,
    fe_cfg: FrontendConfig,
    enc_cfg: FastConformerConfig,
    rnnt_cfg: RNNTConfig,
    ctc_weight: float = 0.0,
    loss: str = "full",
    s_range: int = 5,
    simple_scale: float = 0.5,
    pipeline=None,
):
    """batch: dict(waveform [B,N] f32, lengths [B] i32, labels [B,U] i32,
    label_lengths [B] i32) -> scalar mean NLL.

    loss="full" materializes the [B,T,U+1,V] joint (the classic RNN-T
    memory wall); loss="pruned" trains the icefall-style simple+pruned
    objective (training.pruned_rnnt) whose peak activation is the
    [B,T,s_range,V] band — params must then carry a "simple_joint" entry
    (pruned_rnnt.init_simple_joint).

    With ctc_weight > 0 (and a "ctc" head in params), trains the hybrid
    CTC+transducer objective the espnet flavor's models use:
    (1-w)·rnnt + w·ctc.
    """
    feats, flens = log_mel_spectrogram(batch["waveform"], batch["lengths"], fe_cfg)
    if pipeline is not None:
        # encoder under the GPipe schedule (parallel.pipeline.PipelineSpec):
        # jax.grad transposes the forward ppermute chain into the backward
        # pipeline, so pp training needs no bespoke step
        from ..parallel.pipeline import pipeline_encode_core

        enc, elens = pipeline_encode_core(
            params["encoder"], feats, flens, enc_cfg, pipeline.mesh,
            pipeline.axis, pipeline.data_axis, pipeline.n_micro)
    else:
        enc, elens = fastconformer_encode(
            params["encoder"], feats, flens, enc_cfg)
    pred = predictor_sequence(params["predictor"], batch["labels"], rnnt_cfg)
    if loss == "pruned":
        from .pruned_rnnt import pruned_loss_bundle

        per_utt, _ = pruned_loss_bundle(
            params["simple_joint"], params["joint"], enc, pred,
            batch["labels"], elens, batch["label_lengths"], rnnt_cfg,
            s_range=s_range, simple_scale=simple_scale,
        )
        nll = jnp.mean(per_utt)
    else:
        logits = joint_full(params["joint"], enc, pred, rnnt_cfg)
        nll = jnp.mean(
            rnnt_loss(
                logits, elens, batch["labels"], batch["label_lengths"],
                rnnt_cfg.blank_id,
            )
        )
    if ctc_weight > 0.0:
        from ..models.conformer import ctc_logits
        from .losses import ctc_loss

        c_logits = ctc_logits(params["ctc"], enc)
        # espnet CTC convention: blank == 0
        c_nll = jnp.mean(
            ctc_loss(c_logits, elens, batch["labels"], batch["label_lengths"], 0)
        )
        nll = (1.0 - ctc_weight) * nll + ctc_weight * c_nll
    return nll


def make_train_step(fe_cfg, enc_cfg, rnnt_cfg, optimizer=None, ctc_weight=0.0,
                    loss="full", s_range=5, simple_scale=0.5, pipeline=None):
    """Returns (init_state, train_step). ``train_step(state, batch)`` is a
    pure jittable function -> (new_state, metrics).

    ``pipeline``: optional ``parallel.pipeline.PipelineSpec`` — the encoder
    forward/backward runs under the GPipe schedule over the spec's mesh
    (layer stack sharded over its ``axis``); params["encoder"]["blocks"]
    should be device_put with the leading layer axis sharded to match."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4, weight_decay=0.01)

    def init_state(params):
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def train_step(state: TrainState, batch):
        loss_val, grads = jax.value_and_grad(compute_loss)(
            state.params, batch, fe_cfg, enc_cfg, rnnt_cfg, ctc_weight,
            loss, s_range, simple_scale, pipeline,
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=new_params, opt_state=new_opt, step=state.step + 1),
            {"loss": loss_val, "grad_norm": gnorm},
        )

    return init_state, train_step


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)
