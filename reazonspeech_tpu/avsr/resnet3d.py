"""Video trunk: 3-D conv frontend + per-frame ResNet-18 (JAX).

Architecture parity with the reference trunk (pkg/avsr/src/avhubert/
modeling_resnet.py:74-178): Conv3d(1→64, k=(5,7,7), s=(1,2,2)) + BN + PReLU +
MaxPool3d(k=(1,3,3), s=(1,2,2)), then a [2,2,2,2] BasicBlock ResNet over each
frame, global average pool → 512-d per frame. BatchNorms run in inference
mode (statistics are params, filled by the checkpoint converter).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..models.layers import batch_norm_infer, batch_norm_init, conv2d, conv2d_init

__all__ = ["init_resnet3d", "resnet3d_apply", "RESNET_OUT_DIM"]

RESNET_OUT_DIM = 512


def _prelu_init(ch=1):
    return {"alpha": jnp.full((ch,), 0.25)}


def _prelu(p, x):
    a = p["alpha"]
    if a.shape[0] == 1:
        a = a[0]
    return jnp.where(x >= 0, x, a * x)


def _conv3d_init(key, in_ch, out_ch, kernel):
    kd, kh, kw = kernel
    scale = 1.0 / np.sqrt(in_ch * kd * kh * kw)
    return {
        "w": jax.random.uniform(
            key, (kd, kh, kw, in_ch, out_ch), jnp.float32, -scale, scale
        )
    }


def _conv3d(p, x, stride, padding, dtype=None):
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _basic_block_init(key, in_ch, out_ch, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": conv2d_init(k1, in_ch, out_ch, 3, bias=False),
        "bn1": batch_norm_init(out_ch),
        "relu1": _prelu_init(out_ch),
        "conv2": conv2d_init(k2, out_ch, out_ch, 3, bias=False),
        "bn2": batch_norm_init(out_ch),
        "relu2": _prelu_init(out_ch),
    }
    if stride != 1 or in_ch != out_ch:
        p["down_conv"] = conv2d_init(k3, in_ch, out_ch, 1, bias=False)
        p["down_bn"] = batch_norm_init(out_ch)
    return p


def _basic_block(p, x, stride, dtype):
    identity = x
    y = conv2d(p["conv1"], x, stride=stride, padding=[(1, 1), (1, 1)], dtype=dtype)
    y = _prelu(p["relu1"], batch_norm_infer(p["bn1"], y).astype(dtype))
    y = conv2d(p["conv2"], y, stride=1, padding=[(1, 1), (1, 1)], dtype=dtype)
    y = batch_norm_infer(p["bn2"], y).astype(dtype)
    if "down_conv" in p:
        identity = conv2d(p["down_conv"], x, stride=stride, padding="VALID", dtype=dtype)
        identity = batch_norm_infer(p["down_bn"], identity).astype(dtype)
    return _prelu(p["relu2"], y + identity)


def init_resnet3d(key, relu_type="prelu"):
    del relu_type  # prelu params double as relu when alpha -> 0
    keys = iter(jax.random.split(key, 16))
    p = {
        "front_conv": _conv3d_init(next(keys), 1, 64, (5, 7, 7)),
        "front_bn": batch_norm_init(64),
        "front_relu": _prelu_init(64),
    }
    stages = []
    in_ch = 64
    for si, (out_ch, stride) in enumerate(
        [(64, 1), (128, 2), (256, 2), (512, 2)]
    ):
        blocks = [
            _basic_block_init(next(keys), in_ch, out_ch, stride),
            _basic_block_init(next(keys), out_ch, out_ch, 1),
        ]
        stages.append(blocks)
        in_ch = out_ch
    p["stages"] = stages
    return p


def resnet3d_apply(params, video, dtype=jnp.float32):
    """video: [B, T, H, W] grayscale -> [B, T, 512].

    The 3-D frontend mixes ±2 frames of temporal context; the ResNet trunk
    then runs per-frame (time folded into batch, reference
    modeling_resnet.py:175-178).
    """
    b, t, h, w = video.shape
    x = video[..., None].astype(dtype)  # [B, T, H, W, 1]
    x = _conv3d(
        params["front_conv"], x, (1, 2, 2), [(2, 2), (3, 3), (3, 3)], dtype=dtype
    )
    x = batch_norm_infer(params["front_bn"], x).astype(dtype)
    x = _prelu(params["front_relu"], x)
    # MaxPool3d k=(1,3,3) s=(1,2,2) pad (0,1,1)
    x = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 3, 3, 1),
        window_strides=(1, 1, 2, 2, 1),
        padding=((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
    )

    # fold time into batch for the 2-D trunk
    _, t2, h2, w2, c = x.shape
    x = x.reshape(b * t2, h2, w2, c)
    for blocks in params["stages"]:
        for bi, block in enumerate(blocks):
            # first block of a widening stage downsamples spatially
            stride = 2 if (bi == 0 and "down_conv" in block) else 1
            x = _basic_block(block, x, stride, dtype)
    x = x.mean(axis=(1, 2))  # global average pool -> [B*T, 512]
    return x.reshape(b, t2, RESNET_OUT_DIM).astype(jnp.float32)
