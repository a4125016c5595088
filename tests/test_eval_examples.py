"""Run the evaluation EXAMPLES end-to-end offline (VERDICT round 1, item 8).

Each examples/evaluation/*/eval.py previously required hub egress; with the
local fixture dataset they execute in CI: fixture wavs -> flavor load_model
(via an env-var-resolved converted checkpoint built from a faithful
container) -> evaluate() -> "CER: …%" printed. Random weights make the CER
meaningless; the gate is that the full loop runs and aggregates.
"""

import os
import subprocess
import sys

import pytest
# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples", "evaluation")
REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _subprocess_env(**extra):
    """Env for example subprocesses: CPU platform + the repo importable even
    when the package isn't pip-installed (editable installs don't survive
    environment resets here)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra)
    return env


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rs_fixture")
    sys.path.insert(0, EXAMPLES)
    from local_fixture import build_fixture

    build_fixture(str(d), rows=4, seconds=0.5)
    return str(d)


@pytest.fixture(scope="module")
def nemo_checkpoint(tmp_path_factory):
    """A converted tiny checkpoint from a real .nemo container."""
    from fixture_checkpoints import write_nemo_archive

    from reazonspeech_tpu.convert.nemo_fastconformer import convert_nemo_checkpoint
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    d = tmp_path_factory.mktemp("nemo_ckpt")
    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    nemo = os.path.join(d, "m.nemo")
    write_nemo_archive(nemo, enc, rnnt)
    out = os.path.join(d, "converted")
    convert_nemo_checkpoint(nemo, out)
    return out


def test_rs_nemo_example_runs_offline(fixture_dir, nemo_checkpoint):
    env = _subprocess_env(REAZONSPEECH_TPU_NEMO_CHECKPOINT=nemo_checkpoint)
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "rs-nemo", "eval.py"),
         "--local-fixture", fixture_dir],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CER:" in proc.stdout, proc.stdout


def test_rs_nemo_example_mesh_data(fixture_dir, nemo_checkpoint, tmp_path):
    """--mesh-data: ONE evaluation process spans an emulated 2-device slice
    (evaluation/mesh.py) — predictions identical to the single-device run.
    Replaces the reference's spawn-per-GPU evaluation parallelism
    (pkg/evaluation/src/base.py:194-215) with mesh data parallelism."""
    import json

    outs = {}
    for tag, extra in (("single", []), ("mesh", ["--mesh-data", "2"])):
        out = str(tmp_path / f"{tag}.jsonl")
        env = _subprocess_env(
            REAZONSPEECH_TPU_NEMO_CHECKPOINT=nemo_checkpoint,
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(EXAMPLES, "rs-nemo", "eval.py"),
             "--local-fixture", fixture_dir, "--batch_size", "4",
             "--output_file", out] + extra,
            capture_output=True, text=True, timeout=900, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        assert "CER:" in proc.stdout, proc.stdout
        with open(out) as f:
            outs[tag] = [json.loads(line)["prediction"] for line in f]
    assert outs["mesh"] == outs["single"]


def test_rs_k2_example_runs_offline(fixture_dir, tmp_path):
    """k2 example with an explicitly random tiny model (checkpoint env)."""
    from fixture_checkpoints import write_k2_repo

    from reazonspeech_tpu.convert.onnx_zipformer import convert_sherpa_snapshot
    from reazonspeech_tpu.models.rnnt import RNNTConfig
    from reazonspeech_tpu.models.zipformer import ZipformerConfig

    enc_cfg = ZipformerConfig.tiny()
    token_list = ["<blk>", "<sos/eos>", "<unk>"] + list("あいうえおかきくけこ")
    rnnt_cfg = RNNTConfig(
        vocab_size=len(token_list), enc_dim=enc_cfg.out_dim, pred_hidden=16,
        joint_hidden=24, joint_activation="tanh", predictor_kind="stateless",
        context_size=2,
    )
    repo = tmp_path / "repo"
    write_k2_repo(str(repo), enc_cfg, rnnt_cfg, token_list)
    out = str(tmp_path / "converted")
    convert_sherpa_snapshot(
        str(repo / "encoder-epoch-99-avg-1.onnx"),
        str(repo / "decoder-epoch-99-avg-1.onnx"),
        str(repo / "joiner-epoch-99-avg-1.onnx"),
        out,
        tokens_txt=str(repo / "tokens.txt"),
        icefall_pt=str(repo / "exp" / "pretrained.pt"),
        enc_cfg=enc_cfg,
    )

    env = _subprocess_env(REAZONSPEECH_TPU_K2_CHECKPOINT=out)
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "rs-k2", "eval.py"),
         "--local-fixture", fixture_dir],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CER:" in proc.stdout, proc.stdout


def test_rs_espnet_example_runs_offline(fixture_dir, tmp_path):
    """espnet example through env-var checkpoint resolution, offline."""
    from fixture_checkpoints import write_espnet_zoo

    from reazonspeech_tpu.convert.espnet_conformer import convert_espnet_checkpoint
    from reazonspeech_tpu.models.conformer import espnet_encoder_config
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    enc_cfg = espnet_encoder_config(
        num_layers=2, d_model=32, num_heads=4, subsampling_channels=32,
        compute_dtype="float32",
    )
    token_list = ["<blank>"] + list("あいうえおかきくけこ") + ["<sos/eos>"]
    rnnt_cfg = RNNTConfig(
        vocab_size=len(token_list), enc_dim=32, pred_hidden=16, joint_hidden=24,
        joint_activation="tanh", blank_position="first", compute_dtype="float32",
    )
    zoo = tmp_path / "zoo"
    write_espnet_zoo(str(zoo), enc_cfg, token_list, rnnt_cfg)
    import glob

    pth = glob.glob(str(zoo / "exp" / "*" / "*.pth"))[0]
    cfg_yaml = glob.glob(str(zoo / "exp" / "*" / "config.yaml"))[0]
    out = str(tmp_path / "converted")
    convert_espnet_checkpoint(pth, out, config_yaml=cfg_yaml)

    env = _subprocess_env(REAZONSPEECH_TPU_ESPNET_CHECKPOINT=out)
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "rs-espnet", "eval.py"),
         "--local-fixture", fixture_dir],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CER:" in proc.stdout, proc.stdout
