"""Shared functional layer primitives.

Pure-function style: every layer is an ``init_*(key, ...) -> params`` plus an
``apply`` function over a params pytree. No framework classes — this keeps
param trees trivially shardable (jax.sharding NamedSharding over leaves),
scannable (stacked leaves + lax.scan over identical layers), and easy to
target with checkpoint converters.

Compute dtype policy: matmul/conv inputs are cast to the caller's compute
dtype (bf16 on TPU for the MXU); normalization statistics and residual sums
stay in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dense_init",
    "dense",
    "layer_norm_init",
    "layer_norm",
    "batch_norm_init",
    "batch_norm_infer",
    "conv1d_init",
    "conv1d",
    "depthwise_conv1d_init",
    "depthwise_conv1d",
    "conv2d_init",
    "conv2d",
    "embedding_init",
    "swish",
    "glu",
]


def _uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -scale, scale)


# -- dense ------------------------------------------------------------------

def dense_init(key, in_dim, out_dim, bias=True):
    kw, kb = jax.random.split(key)
    scale = 1.0 / np.sqrt(in_dim)
    p = {"w": _uniform(kw, (in_dim, out_dim), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_dim,), scale)
    return p


def dense(p, x, dtype=None):
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = x @ w
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# -- normalization ----------------------------------------------------------

def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def batch_norm_init(dim):
    """Inference-mode batch norm: running statistics are part of the params
    (converted checkpoints fill them; random init is the identity)."""
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batch_norm_infer(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"] + eps) * p["scale"]
    return ((x32 - p["mean"]) * inv + p["bias"]).astype(x.dtype)


# -- convolutions -----------------------------------------------------------

def conv1d_init(key, in_ch, out_ch, kernel, bias=True):
    kw, kb = jax.random.split(key)
    scale = 1.0 / np.sqrt(in_ch * kernel)
    p = {"w": _uniform(kw, (kernel, in_ch, out_ch), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), scale)
    return p


def conv1d(p, x, stride=1, padding="SAME", dtype=None):
    """x: [B, T, C_in] -> [B, T', C_out]."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def depthwise_conv1d_init(key, ch, kernel, bias=True):
    kw, kb = jax.random.split(key)
    scale = 1.0 / np.sqrt(kernel)
    p = {"w": _uniform(kw, (kernel, 1, ch), scale)}
    if bias:
        p["b"] = _uniform(kb, (ch,), scale)
    return p


def depthwise_conv1d(p, x, stride=1, padding="SAME", dtype=None):
    """x: [B, T, C] -> [B, T', C] with one filter per channel."""
    w = p["w"]
    ch = x.shape[-1]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=ch,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv2d_init(key, in_ch, out_ch, kernel, groups=1, bias=True):
    kw, kb = jax.random.split(key)
    kh, kv = (kernel, kernel) if isinstance(kernel, int) else kernel
    scale = 1.0 / np.sqrt(in_ch // groups * kh * kv)
    p = {"w": _uniform(kw, (kh, kv, in_ch // groups, out_ch), scale)}
    if bias:
        p["b"] = _uniform(kb, (out_ch,), scale)
    return p


def conv2d(p, x, stride=1, padding="SAME", groups=1, dtype=None):
    """x: [B, H, W, C_in] -> [B, H', W', C_out]."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    s = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# -- embeddings / activations ----------------------------------------------

def embedding_init(key, vocab, dim, scale=1.0):
    return {"table": jax.random.normal(key, (vocab, dim)) * scale}


def swish(x):
    return x * jax.nn.sigmoid(x)


def glu(x, axis=-1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)
