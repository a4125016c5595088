"""The real-weights runbook dry-runs green end-to-end on fixtures (VERDICT r2
item 4): artifact validation -> converter/oracle gates -> decoding audit ->
CER variants -> decision record, all in one invocation."""

import json
import os
import sys
import pytest

# heavy compile/integration module — excluded from the fast tier
pytestmark = pytest.mark.slow


sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_fixture_dryrun(tmp_path):
    import run_real_parity

    out = str(tmp_path / "REAL_PARITY.json")
    rc = run_real_parity.main(["--fixture-dryrun", "--limit", "1",
                               "--out", out])
    assert rc == 0
    rep = json.load(open(out))
    assert rep["pass"] is True
    # every family's artifacts validated and gated
    for fam in ("nemo", "espnet", "k2", "avsr"):
        assert rep["artifacts"][fam]["ok"], fam
        assert rep[fam]["pass"], fam
    # the decoding audit saw the fixture's ALSD section
    assert rep["nemo_decoding_audit"]["checkpoint_strategy"] == "alsd"
    assert rep["nemo_decoding_audit"]["matches_serving_default"]
    # CER variants ran and produced the decision block
    dec = rep["nemo_eval"]["decisions"]
    assert dec["bf16_residual"] in ("enable", "keep-fp32")
    assert dec["frame_window"] in (1, 4)
    assert "beam20_default" in rep["espnet_eval"]
    assert "greedy_default" in rep["k2_eval"]
    # emission-density stats drive the pop-budget / frame_window sizing
    # (VERDICT r3 item 5)
    stats = rep["espnet_eval"]["emission_stats"]
    assert stats["pops_per_frame_max_observed"] >= 1
    assert stats["recommended_max_pops_per_frame"] >= 8
    assert rep["espnet_eval"]["decisions"]["max_pops_per_frame"] == \
        stats["recommended_max_pops_per_frame"]
    # v1 streaming + oneseg aligner gated on the same converted weights
    assert rep["v1_eval"]["all_timings_in_bounds"]
    assert any("captions" in r for r in rep["v1_eval"]["rows"])
    assert rep["oneseg_eval"]["aligned_rows"] >= 1
    assert rep["oneseg_eval"]["all_in_bounds"]


def test_artifact_validation_remediation(tmp_path):
    """Wrong artifacts fail loudly with actionable messages."""
    import run_real_parity as rp

    ok, problems = rp.validate_artifacts("nemo", str(tmp_path / "nope.nemo"))
    assert not ok and problems
    ok, problems = rp.validate_artifacts("espnet", str(tmp_path))
    assert not ok and any(".pth" in p for p in problems)
    ok, problems = rp.validate_artifacts("k2", str(tmp_path))
    assert not ok
    ok, problems = rp.validate_artifacts("avsr", str(tmp_path))
    assert not ok and any("config.json" in p for p in problems)
