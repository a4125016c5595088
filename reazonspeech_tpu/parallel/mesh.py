"""Device mesh + sharding rules.

The reference's only parallelism is process-level data parallel over GPUs
(SURVEY.md §2.3: evaluation/src/base.py:194-215). The TPU build makes
parallelism first-class instead: one ``jax.sharding.Mesh`` over
``('data', 'model')``, batch sharded over ``data`` (ICI/DCN collectives
inserted by XLA), and the big encoder matmuls tensor-sharded over ``model``.
No custom communication backend — XLA's GSPMD partitioner inserts
all-gather/reduce-scatter on ICI from the NamedSharding annotations alone.

Sharding rules are path-based over the param tree:
- FFN: in-proj column-sharded, out-proj row-sharded (Megatron layout — one
  reduce-scatter per FFN instead of per matmul);
- attention q/k/v column-sharded over heads, out-proj row-sharded;
- conv modules, norms, predictor, and joint are replicated (tiny next to the
  FFN/attention weights).
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params", "shard_batch", "param_spec"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data=None, n_model=1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    if n_data * n_model != n:
        raise ValueError(f"mesh {n_data}x{n_model} != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# (regex over 'a/b/c' flattened path) -> PartitionSpec for the *trailing*
# dims; a leading stacked-layer axis is preserved automatically.
_RULES = [
    (r"ffn\d_in/w$", P(None, MODEL_AXIS)),
    (r"ffn\d_in/b$", P(MODEL_AXIS)),
    (r"ffn\d_out/w$", P(MODEL_AXIS, None)),
    (r"attn_(q|k|v|pos)/w$", P(None, MODEL_AXIS)),
    (r"attn_(q|k|v)/b$", P(MODEL_AXIS)),
    (r"attn_out/w$", P(MODEL_AXIS, None)),
    (r"attn_bias_[uv]$", P(MODEL_AXIS, None)),
]


def _path_str(path):
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_spec(params, stacked_prefixes=("encoder/blocks",)):
    """PartitionSpec tree for a param tree. Leaves under ``stacked_prefixes``
    have a leading layer axis which stays unsharded."""

    def leaf_spec(path, leaf):
        s = _path_str(path)
        spec = P()
        for pat, p in _RULES:
            if re.search(pat, s):
                spec = p
                break
        stacked = any(s.startswith(pre) for pre in stacked_prefixes)
        if stacked and spec != P():
            spec = P(None, *spec)
        # don't shard dims that don't divide (e.g. tiny test configs)
        if len(spec) > getattr(leaf, "ndim", 0):
            return P()
        return spec

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params, mesh: Mesh, stacked_prefixes=("encoder/blocks",)):
    """Device-put a param tree with the tensor-parallel sharding rules."""
    specs = param_spec(params, stacked_prefixes)

    def put_leaf(leaf, spec):
        axis_ok = True
        for i, ax in enumerate(spec):
            if ax == MODEL_AXIS and leaf.shape[i] % mesh.shape[MODEL_AXIS] != 0:
                axis_ok = False
        if not axis_ok:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put_leaf, params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard leading (batch) dim over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
