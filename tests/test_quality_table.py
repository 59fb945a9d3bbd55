"""tools/quality_table.py renders the committed battery artifact and the
README's generated section stays in sync with it (single-sourcing: no two
quality claims may disagree)."""

import json
import os
import re
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BATTERY = os.path.join(ROOT, "resources", "eval_battery.json")
README = os.path.join(ROOT, "README.md")


@pytest.fixture(scope="module")
def battery():
    with open(BATTERY) as f:
        return json.load(f)


def test_render_contains_all_regimes(battery):
    from tools.quality_table import render

    ckpt = next(
        k for k in battery["regimes"]["standard"]
        if k not in ("oracle", "params")
    )
    block = render(battery, ckpt)
    assert "| raw reads |" in block
    assert "counting rule only (floor)" in block
    assert "oracle at supported columns" in block
    # every regime present in the battery must be quoted in the block
    if "r9" in battery["regimes"]:
        assert "R9-like" in block
    if "lowcov10x" in battery["regimes"]:
        assert "~10x" in block
    if "systematic" in battery["regimes"]:
        assert "systematic" in block


def test_readme_section_is_current(battery):
    """The README block between the markers must equal a fresh render of the
    committed battery artifact — regenerating must be a no-op."""
    from tools.quality_table import BEGIN, END, render

    ckpt = next(
        k for k in battery["regimes"]["standard"]
        if k not in ("oracle", "params")
    )
    with open(README) as f:
        text = f.read()
    m = re.search(re.escape(BEGIN) + r"\n(.*?)\n" + re.escape(END), text, re.S)
    assert m, "QUALITY-TABLE markers missing from README"
    assert m.group(1).strip() == render(battery, ckpt).strip(), (
        "README quality section is stale — rerun "
        "`python tools/quality_table.py resources/eval_battery.json "
        "--write README.md`"
    )
