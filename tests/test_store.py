import numpy as np
import pytest

import jax

from reazonspeech_tpu.convert.store import (
    load_orbax,
    load_param_tree,
    save_orbax,
    save_param_tree,
)

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


def tree():
    rng = np.random.default_rng(0)
    return {
        "encoder": {
            "blocks": {"w": rng.standard_normal((2, 4, 4)).astype(np.float32)},
        },
        "lstm": [{"w_ih": rng.standard_normal((4, 8)).astype(np.float32)}],
    }


def test_npz_roundtrip(tmp_path):
    t = tree()
    p = str(tmp_path / "ckpt")
    save_param_tree(p, t, {"flavor": "test"})
    loaded, meta = load_param_tree(p)
    assert meta["flavor"] == "test"
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["blocks"]["w"]), t["encoder"]["blocks"]["w"]
    )
    assert isinstance(loaded["lstm"], list)
    np.testing.assert_array_equal(np.asarray(loaded["lstm"][0]["w_ih"]), t["lstm"][0]["w_ih"])


def test_orbax_roundtrip(tmp_path):
    t = tree()
    p = str(tmp_path / "orbax_ckpt")
    save_orbax(p, t, {"step": 7})
    loaded, meta = load_orbax(p, template=jax.tree.map(np.zeros_like, t))
    assert meta["step"] == 7
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["blocks"]["w"]), t["encoder"]["blocks"]["w"]
    )


def test_remat_training_grads():
    """remat=True must produce the same loss/grads as remat=False."""
    import jax.numpy as jnp

    from reazonspeech_tpu.frontend.features import nemo_frontend_config
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.nemo.asr.model import init_params
    from reazonspeech_tpu.training.train_step import compute_loss

    fe_cfg = nemo_frontend_config()
    base = dict(
        num_layers=2, d_model=64, num_heads=4, subsampling_channels=16,
        compute_dtype="float32",
    )
    cfg1 = FastConformerConfig(**base)
    cfg2 = FastConformerConfig(**base, remat=True)
    rnnt_cfg = RNNTConfig(vocab_size=16, enc_dim=64, pred_hidden=32, joint_hidden=32, compute_dtype="float32")
    params = init_params(0, cfg1, rnnt_cfg)
    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(rng.standard_normal((2, 8000)), jnp.float32) * 0.1,
        "lengths": jnp.full((2,), 8000, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 16, (2, 3)), jnp.int32),
        "label_lengths": jnp.full((2,), 3, jnp.int32),
    }
    g1 = jax.grad(compute_loss)(params, batch, fe_cfg, cfg1, rnnt_cfg)
    g2 = jax.grad(compute_loss)(params, batch, fe_cfg, cfg2, rnnt_cfg)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
