"""Sequence parallelism: shard the TIME axis of a long-audio encode.

The reference has no long-context scaling story beyond chunking (its 20 s
windows, pkg/espnet-asr/src/transcribe.py:44-66); this module is the
TPU-native complement to the repo's blockwise-KV attention for UNCHUNKED
long-form encoding — when one chip's HBM can't hold the [B, T, D] stream of
a very long utterance, the time axis itself is sharded over a mesh axis.

Design is the scaling-book recipe, not hand-written collectives: the
waveform-derived feature stream enters with its time dim device-put onto the
mesh axis, `FastConformerConfig.seq_axis` re-pins that layout between
blocks, and XLA's GSPMD partitioner inserts what the math needs — K/V
all-gathers for the relative-position attention (every query shard attends
over full keys), halo exchanges for the depthwise/subsampling convs, and
nothing at all for the pointwise FFN/LN work, which stays local to the
shard. The Pallas kernel impls are pinned off: a `pallas_call` is an opaque
custom call the partitioner cannot split, so the sequence-parallel path runs
the XLA reference impls (the kernels are a single-chip optimization; the
collective layout is what this mode is for).
"""

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.fastconformer import FastConformerConfig, fastconformer_encode
from .mesh import MODEL_AXIS

__all__ = ["sequence_parallel_encode", "sequence_parallel_config", "use_mesh"]


def use_mesh(mesh):
    """The mesh context manager across JAX versions: `jax.set_mesh` (the
    current API, present in jax>=0.7) or `jax.sharding.use_mesh` where they
    exist, the Mesh object itself (the legacy resource env, which
    with_sharding_constraint resolves PartitionSpecs against) otherwise."""
    if hasattr(jax, "set_mesh"):
        return jax.set_mesh(mesh)
    if hasattr(jax.sharding, "use_mesh"):
        return jax.sharding.use_mesh(mesh)
    return mesh


def sequence_parallel_config(cfg: FastConformerConfig, axis: str = MODEL_AXIS):
    """The sequence-parallel variant of an encoder config: time axis pinned
    to ``axis``, XLA impls (Pallas custom calls are opaque to GSPMD)."""
    return replace(
        cfg,
        seq_axis=axis,
        attn_impl="xla",
        conv_impl="xla",
        lnd_impl="xla",
    )


def sequence_parallel_encode(
    params,
    feats,
    feat_lengths,
    cfg: FastConformerConfig,
    mesh,
    axis: str = MODEL_AXIS,
):
    """Encode [B, T, F] log-mel features with T sharded over ``mesh[axis]``.

    Output matches `fastconformer_encode` on one device (same math, same
    fp32 accumulation; tested to 1e-5 on the emulated mesh). Returns
    (encoded [B, T', D] fp32, encoded_lengths [B]) with the output time axis
    still sharded over ``axis`` — callers that continue on-device (CTC,
    decode) can consume it in place; `np.asarray` gathers it to host.
    """
    sp_cfg = sequence_parallel_config(cfg, axis)
    n_shard = mesh.shape[axis]
    t_in = feats.shape[1]
    if t_in % n_shard:
        # trailing-pad would SHIFT the subsampling grid (SAME padding's
        # pad_left depends on T parity at every stride-2 stage), silently
        # changing every output frame vs the unsharded encode — refuse
        # instead; serving feature buckets are multiples of big powers of 2
        raise ValueError(
            f"sequence_parallel_encode: feature frames ({t_in}) must be a "
            f"multiple of the '{axis}' axis size ({n_shard}); pad or bucket "
            "the feature stream first (pad frames past feat_lengths are "
            "masked by the encoder)"
        )
    feats = jax.device_put(feats, NamedSharding(mesh, P(None, axis, None)))
    feat_lengths = jax.device_put(feat_lengths, NamedSharding(mesh, P()))

    with use_mesh(mesh):
        # module-level jit (cfg static/hashable): repeat long-form encodes at
        # the same shape hit the jit cache instead of retracing per call
        return _sp_encode_jit(params, feats, feat_lengths, sp_cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _sp_encode_jit(params, feats, feat_lengths, cfg):
    return fastconformer_encode(params, feats, feat_lengths, cfg)
