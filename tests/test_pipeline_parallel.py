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


def test_pipeline_matches_local_encode():
    cfg = small_cfg()
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
