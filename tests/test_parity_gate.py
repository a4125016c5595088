"""Run tools/convert_and_gate.py (tiny fixtures) as a pytest gate.

This is the round-2 converted-weights correctness loop in CI form: faithful
containers -> production converters -> torch-oracle logit/token parity.
It caught the subsampling flatten-order bug (C-major vs F-major) that round
1's structural checks could not see.
"""

import json
import os
import sys
import pytest

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, TOOLS)


def test_convert_and_gate_fixtures(tmp_path):
    import convert_and_gate

    out = tmp_path / "PARITY_GATE.json"
    rc = convert_and_gate.main(["--fixtures", "--size", "tiny", "--out", str(out)])
    report = json.loads(out.read_text())
    assert rc == 0, report
    assert report["pass"], report
    for flavor in ("nemo", "espnet", "k2", "avsr"):
        assert report[flavor]["pass"], report[flavor]
    # encoder parity is numeric, not just structural
    assert report["nemo"]["encoder_logit_rel"] < 1e-5
    assert report["espnet"]["encoder_logit_rel"] < 1e-5
    assert report["nemo"]["token_match_vs_torch"] == 1.0
    assert report["k2"]["decoder_joiner_token_match"] == 1.0
    assert report["avsr"]["greedy_token_match"] == 1.0
