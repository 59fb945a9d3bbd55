"""Byte-exact featurization golden test.

The fixture (tests/golden/featgen_v3.npz, regenerate with
tests/make_golden.py) freezes the full featurization output on a fixed-seed
simulation; any byte-level drift in windowing, pileup fill, supported
counting, or the haplotype re-rank fails here even if the native and numpy
paths drift together."""

import os

import numpy as np
import pytest

from tests.make_golden import build_windows, build_windows_sys

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "featgen_v3.npz")
GOLDEN_SYS = os.path.join(
    os.path.dirname(__file__), "golden", "featgen_sys_v1.npz"
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def current():
    return build_windows()


def _assert_bytes_identical(gold, cur, what):
    assert sorted(gold.files) == sorted(cur.keys()), what
    for name in gold.files:
        a, b = gold[name], cur[name]
        assert a.dtype == b.dtype and a.shape == b.shape, f"{what}: {name}"
        assert a.tobytes() == b.tobytes(), f"{what} drift in {name}"


def test_same_window_set(golden, current):
    assert sorted(golden.files) == sorted(current.keys())


def test_bytes_identical(golden, current):
    for name in golden.files:
        a, b = golden[name], current[name]
        assert a.dtype == b.dtype and a.shape == b.shape, name
        assert a.tobytes() == b.tobytes(), f"featurization drift in {name}"


def test_systematic_profile_bytes_identical():
    """Hotspot/strand-bias/chimera/dropout featurization is frozen byte-exact
    (the round-4 simulator regimes the sys* curriculum shards train on)."""
    _assert_bytes_identical(
        np.load(GOLDEN_SYS), build_windows_sys(), "systematic featurization"
    )
