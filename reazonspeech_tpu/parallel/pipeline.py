"""Pipeline parallelism: the conformer block stack under a GPipe schedule.

The reference's only parallelism is process-level data parallel
(SURVEY.md §2.3: evaluation/src/base.py:194-215); dp/tp/sp are already
first-class here (parallel/mesh.py, parallel/sequence.py). This module adds
the fourth axis: the LAYER stack sharded over a ``pipe`` mesh axis, for
deployments where one chip's HBM cannot hold the whole encoder's weights
(e.g. a future >>1B-param flavor) — each stage holds ``num_layers/S``
blocks and activations flow stage-to-stage over ICI.

Design is ``shard_map`` + ``lax.ppermute``, not GSPMD annotations: a GPipe
schedule is explicitly *scheduled* communication (stage ``i`` sends its
activation to stage ``i+1`` every tick), which is exactly the case where
per-device code beats the partitioner. The batch is split into M
microbatches; the pipeline runs ``M + S - 1`` ticks, stage 0 injecting
microbatch ``t`` at tick ``t`` and stage ``S-1`` emitting microbatch
``t-(S-1)``; the bubble fraction is ``(S-1)/(M+S-1)``. Each tick every
stage runs its local ``lax.scan`` over its block shard — the same
``_block`` the single-chip encoder scans, so Pallas kernel impls work
unchanged inside the per-device code (unlike the sequence-parallel path,
where GSPMD cannot see through a ``pallas_call``).

Composes with data parallel on a 2-D ``('data','pipe')`` mesh: the
microbatch batch dim shards over ``data`` while the block stack shards
over ``pipe`` — one ``shard_map`` covers both.

Scope: the FastConformer block stack — which covers the nemo AND espnet
flavors (espnet's Conformer is a FastConformerConfig,
models/conformer.py). The k2 Zipformer is NOT stageable this way: its
five stacks run at different time resolutions with different block
programs, so equal-program SPMD stages don't exist; its long/large-model
story is the shared-attention blockwise-KV kernels + dp/tp
(ops/zipformer_attention.py, parallel/mesh.py).
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

from ..models.fastconformer import (
    FastConformerConfig,
    _block,
    _encode_prologue,
    layer_norm,
)
from .mesh import DATA_AXIS
from .sequence import use_mesh

__all__ = ["pipeline_parallel_encode", "pipeline_encode_core",
           "make_pipeline_mesh", "shard_params_pipeline", "PipelineSpec",
           "PIPE_AXIS"]

PIPE_AXIS = "pipe"


@dataclass(frozen=True)
class PipelineSpec:
    """How to pipeline the encoder block stack (hashable → jit-static).
    Hand to ``training.make_train_step(pipeline=...)`` to train with the
    encoder forward AND backward under the GPipe schedule."""

    mesh: Mesh
    axis: str = PIPE_AXIS
    data_axis: Optional[str] = None
    n_micro: Optional[int] = None


def make_pipeline_mesh(n_pipe, n_data=1, devices=None) -> Mesh:
    """A ``('data', 'pipe')`` mesh: batch over ``data``, layer stack over
    ``pipe``."""
    devices = devices if devices is not None else jax.devices()
    if n_data * n_pipe != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_pipe} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def shard_params_pipeline(params, mesh: Mesh, axis: str = PIPE_AXIS):
    """Place an encoder param tree for the pipeline: every ``blocks`` leaf
    sharded over ``axis`` on its leading (layer) axis, everything else
    (subsampling, after_norm) replicated.

    This is what makes pp actually CUT per-chip weight HBM to
    ``num_layers/S`` blocks — with replicated params the schedule still
    runs (``shard_map`` reshards its inputs to the in_specs), but every
    chip holds the full stack. Works on a full model tree (with an
    ``encoder`` entry) or a bare encoder tree.
    """
    enc = params["encoder"] if "encoder" in params else params

    def put(path, leaf):
        stacked = (path and getattr(path[0], "key", None) == "blocks"
                   and getattr(leaf, "ndim", 0) >= 1
                   and leaf.shape[0] % int(mesh.shape[axis]) == 0)
        spec = P(axis) if stacked else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    enc = jax.tree_util.tree_map_with_path(put, enc)
    if "encoder" in params:
        rest = {k: jax.device_put(v, NamedSharding(mesh, P()))
                for k, v in params.items() if k != "encoder"}
        return {**rest, "encoder": enc}
    return enc


def pipeline_parallel_encode(
    params,
    feats,
    feat_lengths,
    cfg: FastConformerConfig,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    data_axis: str = None,
    n_micro: int = None,
):
    """Encode [B, T, F] log-mel features with the block stack sharded over
    ``mesh[axis]`` under a GPipe schedule.

    Output matches `fastconformer_encode` on one device (same math —
    each microbatch runs the identical block scan, just on a different
    chip per layer group; tested to 1e-5 on the emulated mesh). Returns
    ``(encoded [B, T', D] fp32, encoded_lengths [B])``.

    Args:
      axis: mesh axis the layer stack shards over; ``cfg.num_layers`` must
        divide by its size.
      data_axis: optional second mesh axis to ALSO shard the microbatch
        batch dim over (dp x pp on one mesh).
      n_micro: microbatch count M (default: the larger of ``2*S``/``S``
        that divides B). More microbatches shrink the pipeline bubble
        ``(S-1)/(M+S-1)`` at the cost of smaller per-tick matmuls.
    """
    n_micro = _resolve_schedule(feats.shape[0], cfg, mesh, axis, data_axis,
                                n_micro)
    feats = jax.device_put(
        feats, NamedSharding(mesh, P(data_axis) if data_axis else P()))
    feat_lengths = jax.device_put(
        feat_lengths,
        NamedSharding(mesh, P(data_axis) if data_axis else P()))
    with use_mesh(mesh):
        return _pp_encode_jit(params, feats, feat_lengths, cfg, mesh,
                              axis, data_axis, n_micro)


@partial(jax.jit,
         static_argnames=("cfg", "mesh", "axis", "data_axis", "n_micro"))
def _pp_encode_jit(params, feats, feat_lengths, cfg, mesh, axis, data_axis,
                   n_micro):
    return pipeline_encode_core(params, feats, feat_lengths, cfg, mesh,
                                axis, data_axis, n_micro)


def _resolve_schedule(b, cfg, mesh, axis, data_axis, n_micro):
    """Validate the (layers, batch, mesh) split and default the microbatch
    count; returns the resolved ``n_micro``."""
    if cfg.seq_axis:
        raise ValueError("the pipeline schedule owns the mesh layout; "
                         "unset cfg.seq_axis (sp+pp is not a supported "
                         "combination — they shard different bottlenecks)")
    n_stage = int(mesh.shape[axis])
    if cfg.num_layers % n_stage:
        raise ValueError(
            f"num_layers ({cfg.num_layers}) must divide by the '{axis}' "
            f"axis size ({n_stage}) — equal-depth stages only")
    n_data = int(mesh.shape[data_axis]) if data_axis is not None else 1
    if n_micro is None:
        for cand in (2 * n_stage, n_stage, 1):
            if b % cand == 0 and (b // cand) % n_data == 0:
                n_micro = cand
                break
        else:
            raise ValueError(
                f"no default microbatch count fits batch ({b}) over "
                f"{n_stage} stages x {n_data} data shards; pass n_micro")
    if b % n_micro:
        raise ValueError(f"batch ({b}) must divide into n_micro ({n_micro}) "
                         "microbatches")
    if (b // n_micro) % n_data:
        raise ValueError(
            f"microbatch size ({b // n_micro}) must divide by the "
            f"'{data_axis}' axis size ({n_data})")
    return n_micro


def pipeline_encode_core(params, feats, feat_lengths, cfg, mesh, axis,
                         data_axis=None, n_micro=None):
    """The pure, traceable pipelined encode — also the TRAINING forward:
    every op in the schedule is differentiable (``ppermute`` transposes to
    the reverse permute, the inject/collect masks to their complements), so
    ``jax.grad`` through this function IS the backward pipeline — microbatch
    cotangents flow stage ``S-1 → 0`` in reverse schedule order with no
    hand-written 1F1B. With ``cfg.remat`` each stage rematerializes its
    block activations in the backward, the standard GPipe memory profile."""
    n_micro = _resolve_schedule(feats.shape[0], cfg, mesh, axis, data_axis,
                                n_micro)
    n_stage = int(mesh.shape[axis])
    x, lengths, pos_emb, mask, t_out = _encode_prologue(
        params, feats, feat_lengths, cfg)
    b, t, d = x.shape
    bm = b // n_micro
    x_m = x.reshape(n_micro, bm, t, d)
    mask_m = mask.reshape(n_micro, bm, t)
    len_m = lengths.reshape(n_micro, bm)

    def stage_fn(blocks, x_m, mask_m, len_m, pos_emb):
        i = jax.lax.axis_index(axis)
        state0 = jnp.zeros(x_m.shape[1:], x_m.dtype)

        def blk(carry, bp):
            # carry = (stream, mask, lengths): the per-microbatch mask rides
            # the activation through the local block scan
            s, m, ln = carry
            return (_block(bp, s, pos_emb, m, ln, cfg), m, ln), None

        if cfg.remat:
            blk = jax.checkpoint(blk)

        def tick(state, ti):
            # hand the previous tick's activation downstream (stage i ->
            # i+1); stage 0 receives zeros and injects microbatch ti instead
            prev = jax.lax.ppermute(
                state, axis, [(s, s + 1) for s in range(n_stage - 1)])
            m_idx = jnp.clip(ti - i, 0, n_micro - 1)
            x_t = jax.lax.dynamic_index_in_dim(
                x_m, jnp.clip(ti, 0, n_micro - 1), 0, keepdims=False)
            inp = jnp.where(i == 0, x_t, prev)
            mask_t = jax.lax.dynamic_index_in_dim(
                mask_m, m_idx, 0, keepdims=False)
            len_t = jax.lax.dynamic_index_in_dim(
                len_m, m_idx, 0, keepdims=False)
            (out, _, _), _ = jax.lax.scan(blk, (inp, mask_t, len_t), blocks)
            return out, out

        _, ys = jax.lax.scan(tick, state0,
                             jnp.arange(n_micro + n_stage - 1))
        # only the last stage's drain ticks carry finished microbatches;
        # psum over the (zero-masked) others replicates the result
        valid = jax.lax.dynamic_slice_in_dim(ys, n_stage - 1, n_micro, 0)
        out = jnp.where(i == n_stage - 1, valid, jnp.zeros_like(valid))
        return jax.lax.psum(out, axis)

    # microbatch leading dim replicated; batch dim sharded over data_axis
    dspec = P(None, data_axis) if data_axis else P()
    out_m = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), dspec, dspec, dspec, P()),
        out_specs=dspec,
        # the schedule mixes replicated inputs with the device-varying
        # stage index; the collectives here (ppermute/psum) are the whole
        # point and are correct by construction
        check_vma=False,
    )(params["blocks"], x_m, mask_m, len_m, pos_emb)

    enc = out_m.reshape(b, t, d)[:, :t_out]
    if cfg.final_norm:
        enc = layer_norm(params["after_norm"], enc)
    return enc.astype(jnp.float32), lengths
