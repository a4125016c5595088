"""GPipe pipeline-parallel encode vs the single-device block scan
(emulated 8-device CPU mesh, see conftest).

The reference has no layer-stack parallelism (its only distribution is
spawn-per-GPU data parallel, pkg/evaluation/src/base.py:194-215); this
gates the beyond-reference pp path in parallel/pipeline.py against the
local encoder bit-for-bit math.
"""

from dataclasses import replace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reazonspeech_tpu.models.fastconformer import (
    FastConformerConfig,
    fastconformer_encode,
    init_fastconformer,
)
from reazonspeech_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_parallel_encode,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


def small_cfg(**kw):
    return FastConformerConfig(
        num_layers=4,
        d_model=64,
        num_heads=4,
        ff_expansion=2,
        subsampling_channels=16,
        compute_dtype="float32",
        attn_impl="xla",
        conv_impl="xla",
        lnd_impl="xla",
        **kw,
    )


def _inputs(cfg, b=4, t=64, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((b, t, cfg.feat_in)), jnp.float32)
    flens = jnp.asarray([t, t - 14, t // 2 + 1, t], jnp.int32)[:b]
    return feats, flens


@pytest.mark.parametrize("final_norm", [False, True])
def test_pipeline_matches_local_encode(final_norm):
    # final_norm=True is the espnet-flavor encoder shape (after_norm) —
    # the same pipeline covers it since espnet shares fastconformer_encode
    cfg = small_cfg(final_norm=final_norm)
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    feats, flens = _inputs(cfg)
    ref, ref_lens = fastconformer_encode(params, feats, flens, cfg)

    mesh = make_pipeline_mesh(n_pipe=4, n_data=1, devices=jax.devices()[:4])
    pp, pp_lens = pipeline_parallel_encode(params, feats, flens, cfg, mesh)

    assert np.array_equal(np.asarray(pp_lens), np.asarray(ref_lens))
    err = np.abs(np.asarray(pp) - np.asarray(ref)).max()
    assert err < 1e-5, err


def test_pipeline_composes_with_data_parallel():
    cfg = small_cfg()
    params = init_fastconformer(jax.random.PRNGKey(1), cfg)
    feats, flens = _inputs(cfg, seed=1)
    ref, _ = fastconformer_encode(params, feats, flens, cfg)

    mesh = make_pipeline_mesh(n_pipe=4, n_data=2)
    pp, _ = pipeline_parallel_encode(
        params, feats, flens, cfg, mesh, data_axis="data", n_micro=2)
    err = np.abs(np.asarray(pp) - np.asarray(ref)).max()
    assert err < 1e-5, err


def test_pipeline_remat_and_explicit_microbatches():
    cfg = small_cfg(remat=True)
    params = init_fastconformer(jax.random.PRNGKey(2), cfg)
    feats, flens = _inputs(cfg, seed=2)
    ref, _ = fastconformer_encode(params, feats, flens, cfg)

    mesh = make_pipeline_mesh(n_pipe=2, n_data=1, devices=jax.devices()[:2])
    pp, _ = pipeline_parallel_encode(
        params, feats, flens, cfg, mesh, n_micro=4)
    err = np.abs(np.asarray(pp) - np.asarray(ref)).max()
    assert err < 1e-5, err


def _grad_err(g_ref, g):
    errs = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max()
        / (np.abs(np.asarray(a)).max() + 1e-8),
        g_ref, g)
    return max(jax.tree.leaves(errs))


def test_pipeline_backward_is_the_transposed_schedule():
    """jax.grad through the GPipe forward = the backward pipeline.

    Two gates: at n_micro=1 the schedule is a pure re-staging of the local
    scan, so grads must match the local encoder to fp32 exactness; at
    n_micro=2 the oracle is the MICROBATCHED local grad (summing two
    half-batch losses) — plain batch splitting alone reorders fp32
    accumulation by ~1e-2 rel on random weights, so comparing pp directly
    to the unsplit grad would gate on noise, not on the schedule.
    """
    from reazonspeech_tpu.parallel.pipeline import pipeline_encode_core
    from reazonspeech_tpu.parallel.sequence import use_mesh

    cfg = small_cfg(remat=True)
    params = init_fastconformer(jax.random.PRNGKey(3), cfg)
    feats, flens = _inputs(cfg, seed=3)
    mesh = make_pipeline_mesh(n_pipe=2, n_data=2, devices=jax.devices()[:4])

    def loss_local(p):
        enc, _ = fastconformer_encode(p, feats, flens, cfg)
        return jnp.sum(enc ** 2)

    def loss_micro(p):
        l = 0.0
        for s in (slice(0, 2), slice(2, 4)):
            enc, _ = fastconformer_encode(p, feats[s], flens[s], cfg)
            l = l + jnp.sum(enc ** 2)
        return l

    def loss_pp(n_micro):
        def f(p):
            enc, _ = pipeline_encode_core(
                p, feats, flens, cfg, mesh, "pipe",
                "data" if n_micro > 1 else None, n_micro)
            return jnp.sum(enc ** 2)
        return f

    with use_mesh(mesh):
        g_pp1 = jax.jit(jax.grad(loss_pp(1)))(params)
        g_pp2 = jax.jit(jax.grad(loss_pp(2)))(params)
    assert _grad_err(jax.jit(jax.grad(loss_local))(params), g_pp1) < 1e-6
    assert _grad_err(jax.jit(jax.grad(loss_micro))(params), g_pp2) < 1e-3


def test_pipeline_train_step():
    """Full RNN-T train step with the encoder under the GPipe schedule
    (training.make_train_step(pipeline=PipelineSpec(...)))."""
    from reazonspeech_tpu.frontend.features import nemo_frontend_config
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import init_params
    from reazonspeech_tpu.parallel.pipeline import PipelineSpec
    from reazonspeech_tpu.parallel.sequence import use_mesh
    from reazonspeech_tpu.training.train_step import make_train_step

    enc_cfg = small_cfg(remat=True)
    rnnt_cfg = RNNTConfig(vocab_size=32, enc_dim=enc_cfg.d_model,
                          pred_hidden=32, joint_hidden=32,
                          compute_dtype="float32")
    fe_cfg = nemo_frontend_config()
    params = init_params(0, enc_cfg, rnnt_cfg)
    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(
            rng.standard_normal((4, 16000)), jnp.float32) * 0.1,
        "lengths": jnp.full((4,), 16000, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 32, (4, 6)), jnp.int32),
        "label_lengths": jnp.full((4,), 6, jnp.int32),
    }
    init_s, step_local = make_train_step(fe_cfg, enc_cfg, rnnt_cfg)
    _, m_local = jax.jit(step_local)(init_s(params), batch)

    mesh = make_pipeline_mesh(n_pipe=2, n_data=2, devices=jax.devices()[:4])
    spec = PipelineSpec(mesh=mesh, data_axis="data", n_micro=2)
    init_pp, step_pp = make_train_step(fe_cfg, enc_cfg, rnnt_cfg,
                                       pipeline=spec)
    with use_mesh(mesh):
        st, m_pp = jax.jit(step_pp)(init_pp(params), batch)
    # forward is exact (same masked math); the loss must agree tightly
    assert abs(float(m_pp["loss"]) - float(m_local["loss"])) < 1e-4 * max(
        1.0, abs(float(m_local["loss"])))
    # grad norm within microbatch-reorder noise; the update must apply
    g_rel = abs(float(m_pp["grad_norm"]) - float(m_local["grad_norm"])) \
        / float(m_local["grad_norm"])
    assert g_rel < 1e-2, g_rel
    assert int(st.step) == 1
    assert np.isfinite(float(m_pp["loss"]))


def test_shard_params_pipeline_places_and_matches():
    """shard_params_pipeline puts L/S block layers per chip (the HBM win
    pp exists for) and the encode over pre-sharded params is unchanged."""
    from reazonspeech_tpu.parallel.pipeline import shard_params_pipeline

    cfg = small_cfg()
    params = init_fastconformer(jax.random.PRNGKey(4), cfg)
    feats, flens = _inputs(cfg, seed=4)
    ref, _ = fastconformer_encode(params, feats, flens, cfg)

    mesh = make_pipeline_mesh(n_pipe=4, n_data=1, devices=jax.devices()[:4])
    sharded = shard_params_pipeline(params, mesh)
    w = sharded["blocks"]["ffn1_in"]["w"]  # [L=4, D, DFF]
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(1,) + w.shape[1:]}  # 1 layer per chip
    # non-block leaves replicated
    sub = sharded["subsampling"]["proj"]["w"]
    assert {s.data.shape for s in sub.addressable_shards} == {sub.shape}

    pp, _ = pipeline_parallel_encode(sharded, feats, flens, cfg, mesh)
    err = np.abs(np.asarray(pp) - np.asarray(ref)).max()
    assert err < 1e-5, err

    # full model tree (encoder entry) keeps the other heads replicated
    full = shard_params_pipeline({"encoder": params, "joint": {
        "w": jnp.zeros((4, 4))}}, mesh)
    assert {s.data.shape
            for s in full["joint"]["w"].addressable_shards} == {(4, 4)}


def test_pipeline_validation():
    cfg = small_cfg()
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    feats, flens = _inputs(cfg)

    # 3 stages don't divide 4 layers
    mesh3 = make_pipeline_mesh(n_pipe=3, n_data=1, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="num_layers"):
        pipeline_parallel_encode(params, feats, flens, cfg, mesh3)

    mesh2 = make_pipeline_mesh(n_pipe=2, n_data=1, devices=jax.devices()[:2])
    # batch 4 can't split into 3 microbatches
    with pytest.raises(ValueError, match="microbatch|batch"):
        pipeline_parallel_encode(
            params, feats, flens, cfg, mesh2, n_micro=3)
    # sp+pp is refused
    with pytest.raises(ValueError, match="seq_axis"):
        pipeline_parallel_encode(
            params, feats, flens, replace(cfg, seq_axis="model"), mesh2)
