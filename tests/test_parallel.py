"""Emulated-mesh distributed tests (8 virtual CPU devices, see conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from reazonspeech_tpu.frontend.features import nemo_frontend_config
from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import init_params
from reazonspeech_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    param_spec,
    shard_batch,
    shard_params,
)
from reazonspeech_tpu.training.train_step import make_train_step
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow



def small_cfgs():
    enc_cfg = FastConformerConfig(
        num_layers=2,
        d_model=128,
        num_heads=4,
        subsampling_channels=32,
        compute_dtype="float32",
    )
    rnnt_cfg = RNNTConfig(
        vocab_size=32, enc_dim=128, pred_hidden=64, joint_hidden=64,
        compute_dtype="float32",
    )
    return enc_cfg, rnnt_cfg


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=3)


def test_param_spec_rules():
    enc_cfg, rnnt_cfg = small_cfgs()
    params = init_params(0, enc_cfg, rnnt_cfg)
    specs = param_spec(params)
    # stacked encoder blocks: leading layer axis unsharded, ffn in col-sharded
    assert specs["encoder"]["blocks"]["ffn1_in"]["w"] == P(None, None, MODEL_AXIS)
    assert specs["encoder"]["blocks"]["ffn1_out"]["w"] == P(None, MODEL_AXIS, None)
    assert specs["encoder"]["blocks"]["attn_q"]["w"] == P(None, None, MODEL_AXIS)
    # replicated leaves
    assert specs["encoder"]["blocks"]["conv_dw"]["w"] == P()
    assert specs["joint"]["out"]["w"] == P()


def test_sharded_params_placement():
    enc_cfg, rnnt_cfg = small_cfgs()
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_params(0, enc_cfg, rnnt_cfg)
    sharded = shard_params(params, mesh)
    w = sharded["encoder"]["blocks"]["ffn1_in"]["w"]
    # column-sharded over 2 model devices: each shard holds half the cols
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    full = w.shape
    assert (full[0], full[1], full[2] // 2) in shard_shapes


def test_train_step_sharded_matches_single_device():
    """The dp+tp sharded train step must produce the same loss as the
    unsharded one (GSPMD collectives are numerically transparent here)."""
    enc_cfg, rnnt_cfg = small_cfgs()
    fe_cfg = nemo_frontend_config()
    params = init_params(0, enc_cfg, rnnt_cfg)
    rng = np.random.default_rng(0)
    b, n = 8, 16000
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1,
        "lengths": jnp.full((b,), n, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, rnnt_cfg.vocab_size, (b, 6)), jnp.int32),
        "label_lengths": jnp.full((b,), 6, jnp.int32),
    }
    init_state, train_step = make_train_step(fe_cfg, enc_cfg, rnnt_cfg)

    # single device
    state1 = init_state(params)
    _, m1 = jax.jit(train_step)(state1, batch)

    # 4x2 mesh
    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh)
    state2 = init_state(sp)
    sb = shard_batch(batch, mesh)
    new_state, m2 = jax.jit(train_step)(state2, sb)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    assert np.isfinite(float(m2["grad_norm"]))
    assert int(new_state.step) == 1


def test_loss_decreases_overfit():
    """Sanity: a few steps on one tiny batch should reduce the loss."""
    import optax

    enc_cfg, rnnt_cfg = small_cfgs()
    fe_cfg = nemo_frontend_config()
    params = init_params(0, enc_cfg, rnnt_cfg)
    rng = np.random.default_rng(0)
    b, n = 2, 8000
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1,
        "lengths": jnp.full((b,), n, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, rnnt_cfg.vocab_size, (b, 4)), jnp.int32),
        "label_lengths": jnp.full((b,), 4, jnp.int32),
    }
    init_state, train_step = make_train_step(
        fe_cfg, enc_cfg, rnnt_cfg, optimizer=optax.adam(3e-4)
    )
    state = init_state(params)
    step = jax.jit(train_step)
    state, m0 = step(state, batch)
    for _ in range(5):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_hybrid_ctc_rnnt_loss_decreases():
    """espnet-style hybrid objective trains end-to-end."""
    import optax

    import jax
    import jax.numpy as jnp

    from reazonspeech_tpu.models.conformer import init_ctc_head

    enc_cfg, rnnt_cfg = small_cfgs()
    fe_cfg = nemo_frontend_config()
    params = init_params(0, enc_cfg, rnnt_cfg)
    params["ctc"] = init_ctc_head(
        jax.random.PRNGKey(9), enc_cfg.d_model, rnnt_cfg.vocab_size
    )
    rng = np.random.default_rng(0)
    b, n = 2, 8000
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1,
        "lengths": jnp.full((b,), n, jnp.int32),
        "labels": jnp.asarray(rng.integers(1, rnnt_cfg.vocab_size, (b, 4)), jnp.int32),
        "label_lengths": jnp.full((b,), 4, jnp.int32),
    }
    init_state, train_step = make_train_step(
        fe_cfg, enc_cfg, rnnt_cfg, optimizer=optax.adam(3e-4), ctc_weight=0.3
    )
    state = init_state(params)
    step = jax.jit(train_step)
    state, m0 = step(state, batch)
    for _ in range(4):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_batch_sharded_inference():
    """asr_forward (the serving path) runs batch-sharded over the data axis
    with identical results to single-device."""
    from reazonspeech_tpu.decoding.rnnt_greedy import GreedyDecodeConfig
    from reazonspeech_tpu.nemo.asr.model import asr_forward

    enc_cfg, rnnt_cfg = small_cfgs()
    fe_cfg = nemo_frontend_config()
    dc = GreedyDecodeConfig()
    params = init_params(0, enc_cfg, rnnt_cfg)
    rng = np.random.default_rng(3)
    b, n = 8, 16000
    wav = jnp.asarray(rng.standard_normal((b, n)), jnp.float32) * 0.1
    lens = jnp.full((b,), n, jnp.int32)

    t1, f1, c1, e1 = asr_forward(params, wav, lens, fe_cfg, enc_cfg, rnnt_cfg, dc)

    mesh = make_mesh(n_data=8, n_model=1)
    sp = jax.device_put(params, jax.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    sw, sl = shard_batch((wav, lens), mesh)
    t2, f2, c2, e2 = asr_forward(sp, sw, sl, fe_cfg, enc_cfg, rnnt_cfg, dc)

    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    for i in range(b):
        c = int(c1[i])
        np.testing.assert_array_equal(np.asarray(t1[i, :c]), np.asarray(t2[i, :c]))


def test_sequence_parallel_encode_matches_single_device():
    """Time-axis-sharded encode (parallel/sequence.py) == the unsharded
    XLA-impl encode, and the compiled program actually communicates (the
    partitioner must insert collectives for attention's full-key view)."""
    from reazonspeech_tpu.models.fastconformer import (
        fastconformer_encode,
        init_fastconformer,
    )
    from reazonspeech_tpu.parallel.sequence import (
        sequence_parallel_config,
        sequence_parallel_encode,
        use_mesh,
    )

    enc_cfg, _ = small_cfgs()
    params = init_fastconformer(jax.random.PRNGKey(0), enc_cfg)
    rng = np.random.default_rng(7)
    mesh = make_mesh(n_data=1, n_model=8)
    b, t, f = 2, 256, enc_cfg.feat_in
    feats = jnp.asarray(rng.standard_normal((b, t, f)), jnp.float32)
    flens = jnp.asarray([t, t - 37], jnp.int32)

    ref, rlens = fastconformer_encode(params, feats, flens, enc_cfg)
    out, olens = sequence_parallel_encode(
        params, feats, flens, enc_cfg, mesh, axis=MODEL_AXIS
    )
    assert out.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(rlens), np.asarray(olens))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

    # non-divisible T must refuse (trailing pad would shift the SAME-padded
    # subsampling grid and silently change every output frame)
    with pytest.raises(ValueError, match="multiple of"):
        sequence_parallel_encode(
            params, feats[:, :101], flens, enc_cfg, mesh, axis=MODEL_AXIS
        )

    # the time sharding must survive to the output (callers continue
    # on-device), and the compiled module must contain collectives
    assert tuple(out.sharding.spec)[:2] == (None, MODEL_AXIS)
    sp_cfg = sequence_parallel_config(enc_cfg, MODEL_AXIS)
    with use_mesh(mesh):
        sharded_feats = jax.device_put(
            feats, jax.NamedSharding(mesh, P(None, MODEL_AXIS, None))
        )
        lowered = jax.jit(
            lambda p, x, l: fastconformer_encode(p, x, l, sp_cfg)
        ).lower(params, sharded_feats, flens)
        hlo = lowered.compile().as_text()
    assert any(k in hlo for k in ("all-gather", "collective-permute", "all-to-all")), \
        "sequence-parallel encode compiled to a collective-free program"


def test_seq_axis_rejects_pallas_impls():
    """seq_axis + a Pallas impl would feed GSPMD opaque custom calls —
    models/fastconformer.py refuses instead of silently replicating."""
    from dataclasses import replace

    import jax.numpy as jnp

    from reazonspeech_tpu.models.fastconformer import (
        FastConformerConfig,
        fastconformer_encode,
        init_fastconformer,
    )

    cfg = replace(
        FastConformerConfig.tiny(compute_dtype="float32"),
        seq_axis="model", attn_impl="pallas",
    )
    params = init_fastconformer(jax.random.PRNGKey(0), cfg)
    feats = jnp.zeros((1, 64, cfg.feat_in), jnp.float32)
    with pytest.raises(ValueError, match="seq_axis"):
        fastconformer_encode(params, feats, jnp.array([64]), cfg)
