"""tools/tpu_memory_report.py: AOT memory analysis works shape-only.

The tool must compile from ShapeDtypeStructs (no real arrays staged) and
report self-consistent sizes — the properties that make it safe to run
against a production chip before changing a serving batch size.
"""

import pytest

from reazonspeech_tpu.models.fastconformer import FastConformerConfig
from reazonspeech_tpu.models.rnnt import RNNTConfig
from reazonspeech_tpu.nemo.asr.model import load_model

pytestmark = pytest.mark.slow


def test_report_is_shape_only_and_consistent():
    import sys

    sys.path.insert(0, "tools")
    from tpu_memory_report import report

    enc = FastConformerConfig.tiny(compute_dtype="float32")
    rnnt = RNNTConfig.tiny(enc_dim=enc.d_model, compute_dtype="float32")
    model = load_model(checkpoint="random", enc_cfg=enc, rnnt_cfg=rnnt)
    row = report(model, batch=2, seconds=1.0, flavor="nemo-tiny")
    assert row["flavor"] == "nemo-tiny" and row["batch"] == 2
    # params alone guarantee a nonzero argument footprint
    assert row["argument_gb"] > 0
    assert row["total_gb"] >= row["argument_gb"]
    assert row["headroom_gb"] == pytest.approx(16 - row["total_gb"], abs=0.01)
