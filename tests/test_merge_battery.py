"""Promotion gate (tools/merge_battery.py): the math that decides whether a
candidate checkpoint replaces the flagship. A sign error, threshold typo, or
a vacuously-passing missing regime here silently promotes a regressed
checkpoint, so the gate verdicts are pinned against synthetic batteries.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.merge_battery import gate_table  # noqa: E402

INC = "resources/model_incumbent"
CAND = "resources/model_candidate"


def _battery(std_inc_q=39.27, std_cand_q=39.18, het_cand=0.992,
             sys_cand_q=35.0, include_standard=True, include_cand_std=True):
    regimes = {
        "systematic": {
            INC: {"corrected_infix_q": 31.25, "het": {"accuracy": 0.99}},
            CAND: {"corrected_infix_q": sys_cand_q,
                   "het": {"accuracy": 0.99}},
        },
        "r9": {
            # candidate entry missing entirely: must render "not compared"
            INC: {"corrected_infix_q": 30.0, "het": {"accuracy": 0.99}},
        },
    }
    if include_standard:
        entry = {
            INC: {"corrected_infix_q": std_inc_q, "het": {"accuracy": 0.992}},
        }
        if include_cand_std:
            entry[CAND] = {
                "corrected_infix_q": std_cand_q,
                "het": {"accuracy": het_cand},
            }
        regimes["standard"] = entry
    return {"regimes": regimes}


def _verdict(lines):
    gate = [ln for ln in lines if ln.startswith("gate:")]
    assert len(gate) == 1
    return "PASS" if "PASS" in gate[0] else "FAIL"


def test_gate_passes_within_threshold():
    # -0.09 dB on standard, het 99.2%: the shape of the real d512x3L gate
    lines = gate_table(_battery(), INC, CAND)
    assert _verdict(lines) == "PASS"
    # the systematic gain is reported even though it is not gated
    assert any("systematic" in ln and "+3.75" in ln for ln in lines)


def test_gate_boundary_is_inclusive():
    # exactly -0.2 dB must still pass (the gate is "within 0.2 dB")
    lines = gate_table(_battery(std_inc_q=39.2, std_cand_q=39.0), INC, CAND)
    assert _verdict(lines) == "PASS"


def test_gate_fails_on_standard_regression():
    lines = gate_table(
        _battery(std_inc_q=39.27, std_cand_q=39.0), INC, CAND
    )
    assert _verdict(lines) == "FAIL"


def test_gate_fails_on_het_floor():
    lines = gate_table(_battery(het_cand=0.985), INC, CAND)
    assert _verdict(lines) == "FAIL"


def test_gate_fails_when_standard_regime_absent():
    # a battery that never ran the gating regime must not pass vacuously
    lines = gate_table(_battery(include_standard=False), INC, CAND)
    assert _verdict(lines) == "FAIL"
    assert any("MISSING" in ln for ln in lines)


def test_gate_fails_when_candidate_missing_from_standard():
    lines = gate_table(_battery(include_cand_std=False), INC, CAND)
    assert _verdict(lines) == "FAIL"
    assert any(
        ln.startswith("standard") and "not compared" in ln for ln in lines
    )


def test_missing_het_fails_closed():
    # absent het measurement counts as 0 -> below floor -> FAIL
    bat = _battery()
    del bat["regimes"]["standard"][CAND]["het"]
    assert _verdict(gate_table(bat, INC, CAND)) == "FAIL"


def test_promote_as_rewrites_artifact(tmp_path, monkeypatch, capsys):
    """main() with --promote-as copies the candidate's entries under the
    flagship key in the written artifact (used after the weights are copied
    over the flagship path, so artifact keys keep matching shipped paths)."""
    from tools import merge_battery

    path = tmp_path / "battery.json"
    path.write_text(json.dumps(_battery()))
    monkeypatch.setattr(
        sys, "argv",
        ["merge_battery.py", str(path), CAND, "--incumbent", INC,
         "--promote-as", "resources/model_flagship"],
    )
    merge_battery.main()
    out = json.loads(path.read_text())
    for reg, entry in out["regimes"].items():
        if CAND in entry:
            assert entry["resources/model_flagship"] == entry[CAND]
        else:
            assert "resources/model_flagship" not in entry
    assert "gate:" in capsys.readouterr().out
