"""Frozen model-output golden: the flagship checkpoint's logits on a fixed
feature batch must not drift.

Catches silent numeric regressions in the model stack (embedding
contractions, fused kernels / jnp twins, checkpoint load, quantization) in
seconds — the intent of the reference's TorchScript golden tests
(src/inference.rs:302-410). Inputs are frozen in the fixture, so this is
independent of featurization drift (tests/test_golden.py owns that axis).

Regenerate with tests/make_logit_golden.py ONLY on an intentional
checkpoint replacement.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "logits_r10.npz")

# The forward runs in bfloat16 with f32 accumulation; within one environment
# re-runs are deterministic, so any drift is a code/weights change. 1e-3 on
# f32 logits of magnitude ~O(10) is far below a quality-relevant shift but
# far above accumulation-order noise inside a fixed XLA build.
ATOL = 1e-3


@pytest.fixture(scope="module")
def fixture():
    return np.load(GOLDEN)


def _rerun(fx):
    from dataclasses import dataclass

    from tests.make_logit_golden import run_model

    @dataclass
    class B:
        tokens_packed: np.ndarray
        quals: np.ndarray
        support_idx: np.ndarray
        support_mask: np.ndarray
        n_alns: np.ndarray

    batch = B(
        fx["tokens_packed"],
        fx["quals"],
        fx["support_idx"],
        fx["support_mask"],
        fx["n_alns"],
    )
    return run_model(batch)


def test_logits_match_golden(fixture):
    info, logits = _rerun(fixture)
    mask = fixture["support_mask"]
    g_info, g_logits = fixture["info"], fixture["logits"]
    assert logits.shape == g_logits.shape and info.shape == g_info.shape

    d_log = np.abs(logits - g_logits)[mask].max()
    d_info = np.abs(info - g_info)[mask].max()
    assert d_log <= ATOL, f"bases_logits drift {d_log:.2e} > {ATOL}"
    assert d_info <= ATOL, f"info_logits drift {d_info:.2e} > {ATOL}"

    # the decode itself must be bit-stable
    assert np.array_equal(
        np.argmax(logits, -1)[mask], np.argmax(g_logits, -1)[mask]
    )
