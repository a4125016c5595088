"""Both quickstart notebooks' code cells execute against fixtures.

Notebook parity with the reference's colab pair
(colab/ReazonSpeech_v2_0.ipynb ja + ReazonSpeech_v2_0_en.ipynb en): the
TPU repo ships examples/quickstart.ipynb (en) + examples/quickstart_ja.ipynb
(ja), and CI runs every code cell (install magics skipped) with a converted
tiny checkpoint and a synthetic demo.wav — load → transcribe → text →
segment timings → subword timings → VTT writer.
"""

import json
import os
import sys

import numpy as np
import pytest

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(__file__))

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.fixture(scope="module")
def nemo_checkpoint(tmp_path_factory):
    from fixture_checkpoints import write_nemo_archive

    from reazonspeech_tpu.convert.nemo_fastconformer import (
        convert_nemo_checkpoint,
    )
    from reazonspeech_tpu.models.fastconformer import FastConformerConfig
    from reazonspeech_tpu.models.rnnt import RNNTConfig

    d = tmp_path_factory.mktemp("nb_ckpt")
    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    nemo = os.path.join(d, "m.nemo")
    write_nemo_archive(nemo, enc, rnnt)
    out = os.path.join(d, "converted")
    convert_nemo_checkpoint(nemo, out)
    return out


def _code_cells(path):
    nb = json.load(open(path))
    assert nb["nbformat"] == 4
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        lines = [l for l in src.split("\n")
                 if not l.lstrip().startswith(("%", "!"))]
        src = "\n".join(lines).strip()
        if src:
            yield src


@pytest.mark.parametrize("name", ["quickstart.ipynb", "quickstart_ja.ipynb"])
def test_notebook_code_cells_execute(name, nemo_checkpoint, tmp_path,
                                     monkeypatch):
    from reazonspeech_tpu.core.audio import audio_from_numpy, audio_to_file

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("REAZONSPEECH_TPU_NEMO_CHECKPOINT", nemo_checkpoint)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    audio_to_file("demo.wav", audio_from_numpy(wav, 16000))

    ns = {}
    cells = list(_code_cells(os.path.join(EXAMPLES, name)))
    assert len(cells) >= 4, name
    for src in cells:
        exec(compile(src, f"{name}:cell", "exec"), ns)  # noqa: S102

    ret = ns["ret"]
    assert isinstance(ret.text, str)
    for seg in ret.segments:
        assert 0.0 <= seg.start_seconds <= seg.end_seconds
    assert os.path.exists("demo.vtt")
    assert open("demo.vtt").read().startswith("WEBVTT")
