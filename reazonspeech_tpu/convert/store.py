"""Native parameter-tree storage.

The framework's own checkpoint format: a ``.npz`` of flattened param leaves
plus a JSON sidecar with tree structure, configs, and tokenizer pointers.
Converters (nemo/onnx/espnet/hf) write this format; loaders read it. This is
the TPU build's replacement for the reference's four external checkpoint
mechanisms (SURVEY.md §5 checkpoint/resume).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["save_param_tree", "load_param_tree", "save_orbax", "load_orbax"]

_SEP = "/"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _spec(tree):
    if isinstance(tree, dict):
        return {k: _spec(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_spec(v) for v in tree]
    return None


def _unflatten(spec, flat, prefix=""):
    if isinstance(spec, dict):
        return {k: _unflatten(v, flat, f"{prefix}{k}{_SEP}") for k, v in spec.items()}
    if isinstance(spec, list):
        return [
            _unflatten(v, flat, f"{prefix}{i}{_SEP}") for i, v in enumerate(spec)
        ]
    return jnp.asarray(flat[prefix.rstrip(_SEP)])


def save_param_tree(path, params, meta=None):
    """Write params to ``<path>.npz`` + ``<path>.json``."""
    flat = _flatten(params)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    side = {"spec": _spec(params), "meta": meta or {}}
    with open(_sidecar(path), "w") as f:
        json.dump(side, f)


def _sidecar(path):
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"


def load_param_tree(path):
    """Read (params, meta) written by save_param_tree."""
    npz = path if path.endswith(".npz") else path + ".npz"
    with open(_sidecar(path)) as f:
        side = json.load(f)
    flat = dict(np.load(npz))
    params = _unflatten(side["spec"], flat)
    return params, side.get("meta", {})


# -- Orbax interop -----------------------------------------------------------
# The npz store above is the zero-dependency default; Orbax gives sharded,
# async, multi-host checkpointing for training runs.


def save_orbax(path, params, meta=None):
    """Write params with Orbax (directory checkpoint); meta goes to the
    JSON sidecar."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_orbax(path, template=None):
    """Read (params, meta) from an Orbax checkpoint; ``template`` (a tree of
    like-shaped arrays, e.g. a random init) restores custom tree structure."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            params = ckptr.restore(path, template)
        else:
            params = ckptr.restore(path)
    meta = {}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    return params, meta
