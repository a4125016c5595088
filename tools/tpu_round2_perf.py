"""Round-2 on-chip kernel validation + encoder stage timing (ONE process).

Run on the real TPU chip (plain `python tools/tpu_round2_perf.py`). Never
concurrently with another TPU process. Batches every measurement the round
needs so the exclusive device grant is claimed once:

  1. Pallas rel-pos attention with bf16 inputs vs the fp32 XLA reference;
  2. fused conv-module kernel vs the XLA module at serving shapes;
  3. encoder wall-clock at B=32 x 30 s across implementation variants;
  4. end-to-end nemo pipeline RTFx at B=128 for the serving default.

Completion is forced by host materialization (tunnel caveat, CLAUDE.md).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from reazonspeech_tpu.models.fastconformer import (
    FastConformerConfig,
    _conv_module,
    _rel_shift,
    fastconformer_encode,
    init_fastconformer,
)
from reazonspeech_tpu.ops.conformer_conv import fold_batch_norm, fused_conv_module
from reazonspeech_tpu.ops.relpos_attention import relpos_attention

RNG = np.random.default_rng(7)


def force(x):
    return np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(fn, *args, iters=8):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / iters, out


def check_attention_bf16():
    print("== pallas attention, bf16 inputs ==", flush=True)
    for tag, (b, h, t, dh) in {
        "nemo (dh=128, T=376)": (2, 8, 376, 128),
        "espnet (dh=64, T=501)": (2, 8, 501, 64),
    }.items():
        mk = lambda *s: jnp.asarray(RNG.standard_normal(s) * 0.5, jnp.bfloat16)
        qu, qv, k, v = mk(b, h, t, dh), mk(b, h, t, dh), mk(b, h, t, dh), mk(b, h, t, dh)
        pos = mk(2 * t - 1, h, dh)
        lens = jnp.array([t] + [max(t // 2, 1)] * (b - 1))
        got = np.asarray(relpos_attention(qu, qv, k, v, pos, lens))
        f32 = lambda x: x.astype(jnp.float32)
        ac = jnp.einsum("bhtd,bhsd->bhts", f32(qu), f32(k))
        bd = _rel_shift(jnp.einsum("bhtd,hld->bhtl", f32(qv),
                                   jnp.transpose(f32(pos), (1, 0, 2))))
        sc = (ac + bd) / np.sqrt(dh)
        mask = jnp.arange(t)[None, :] < lens[:, None]
        sc = jnp.where(mask[:, None, None, :], sc, -1e30)
        want = np.asarray(jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(sc, -1), f32(v)))
        err = (np.abs(got - want) * np.asarray(mask)[:, None, :, None]).max()
        print(f"  {tag}: max err vs fp32-XLA-of-bf16-inputs {err:.2e}", flush=True)


def check_conv_kernel():
    print("== fused conv module ==", flush=True)
    from reazonspeech_tpu.models.layers import (
        batch_norm_init,
        conv1d_init,
        depthwise_conv1d_init,
    )

    for tag, (b, t, d, k) in {
        "nemo (D=1024, K=9, T=384)": (4, 384, 1024, 9),
        "espnet (D=512, K=31, T=512)": (4, 512, 512, 31),
    }.items():
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        p = {
            "conv_in": conv1d_init(keys[0], d, 2 * d, 1),
            "conv_dw": depthwise_conv1d_init(keys[1], d, k),
            "conv_out": conv1d_init(keys[2], d, d, 1),
            "conv_bn": batch_norm_init(d),
        }
        x = jnp.asarray(RNG.standard_normal((b, t, d)) * 0.5, jnp.bfloat16)
        lens = jnp.array([t, t - 5, t // 2, 7], jnp.int32)
        mask = jnp.arange(t)[None, :] < lens[:, None]
        cfg = FastConformerConfig.tiny(d_model=d, conv_kernel=k)
        want = np.asarray(_conv_module(p, x, mask, cfg).astype(jnp.float32))
        scale, bias = fold_batch_norm(p["conv_bn"])
        run = lambda: fused_conv_module(
            x, lens, p["conv_in"]["w"][0], p["conv_in"]["b"],
            p["conv_dw"]["w"], p["conv_dw"]["b"], scale, bias,
            p["conv_out"]["w"][0], p["conv_out"]["b"],
        )
        got = np.asarray(run().astype(jnp.float32))
        err = (np.abs(got - want) * np.asarray(mask)[..., None]).max()
        dt_x, _ = timeit(lambda *a: _conv_module(p, x, mask, cfg), iters=16)
        dt_p, _ = timeit(lambda *a: run(), iters=16)
        print(f"  {tag}: max err {err:.2e}  xla {dt_x*1e3:.2f} ms  "
              f"pallas {dt_p*1e3:.2f} ms", flush=True)


def encoder_variants():
    print("== encoder wall-clock, B=32 x 30 s (376 frames) ==", flush=True)
    feats = jnp.asarray(RNG.standard_normal((32, 3001, 80)), jnp.float32)
    lens = jnp.full((32,), 3001, jnp.int32)
    variants = {
        "r1 serving (attn pallas-fp32in emulated by xla-conv, bf16 resid)":
            dict(attn_impl="pallas", conv_impl="xla", residual_dtype="bfloat16"),
        "attn-only, fp32 resid": dict(attn_impl="pallas", conv_impl="xla"),
        "NEW default (attn+conv pallas, fp32 resid)":
            dict(attn_impl="pallas", conv_impl="pallas"),
        "new + bf16 resid": dict(
            attn_impl="pallas", conv_impl="pallas", residual_dtype="bfloat16"),
        "all-xla fp32-resid": dict(),
    }
    params = None
    for tag, kw in variants.items():
        cfg = FastConformerConfig.xlarge(**kw)
        if params is None:
            params = jax.device_put(init_fastconformer(jax.random.PRNGKey(0), cfg))
            force(params)
        f = jax.jit(lambda p, x, l, c=cfg: fastconformer_encode(p, x, l, c)[0])
        dt, _ = timeit(f, params, feats, lens, iters=4)
        print(f"  {tag}: {dt*1e3:.0f} ms  ({32*30/dt:.0f} audio-sec/s)", flush=True)


def bench_e2e():
    print("== end-to-end bench (serving default) ==", flush=True)
    import bench

    bench.main()


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    check_attention_bf16()
    check_conv_kernel()
    encoder_variants()
