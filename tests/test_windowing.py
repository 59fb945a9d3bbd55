"""Windowing tests: hand-built cases plus a property test against a direct
per-op transcription of the reference walk (tests/oracle_windowing.py)."""

import numpy as np
import pytest

from herro_tpu.cigar.ops import parse_cigar
from herro_tpu.cigar.windowing import extract_windows

from oracle_windowing import oracle_extract_windows


def run(cigar, tstart, tend, tlen, qstart, qend, W, n_windows=None):
    cig = parse_cigar(cigar)
    if n_windows is None:
        n_windows = (tlen + W - 1) // W
    ours = [[] for _ in range(n_windows)]
    extract_windows(ours, 7, cig, tstart, tend, tlen, qstart, qend, W)
    ref = [[] for _ in range(n_windows)]
    oracle_extract_windows(ref, 7, cig, tstart, tend, tlen, qstart, qend, W)
    ours_t = [
        [
            (w.aln_idx, w.tstart, w.qstart, w.qend, w.op_start, w.start_off, w.op_end, w.end_off)
            for w in ws
        ]
        for ws in ours
    ]
    assert ours_t == ref
    return ours


def test_simple_full_span():
    # 20 target bases, W=5, perfect match, full span
    wins = run(b"20M", 0, 20, 20, 0, 20, 5)
    assert [len(w) for w in wins] == [1, 1, 1, 1]
    w0 = wins[0][0]
    assert (w0.tstart, w0.qstart, w0.qend) == (0, 0, 5)
    w3 = wins[3][0]
    assert (w3.tstart, w3.qstart, w3.qend) == (15, 15, 20)


def test_offset_start_claims_partial_first_window():
    # tstart=0 < 10% of W → window 0 claimed even if partial
    wins = run(b"18M", 0, 18, 20, 0, 18, 5)
    # tend=18 > 20-0.5 → also claims partial last window... thresh=0 for W=5
    # zeroth_thresh = int(0.5) = 0, so tstart=0 is NOT < 0; but 0 % 5 == 0
    assert len(wins[0]) == 1


def test_unaligned_middle_start():
    # starts at 7 (not boundary, >= thresh) → first full window at 10
    wins = run(b"13M", 7, 20, 40, 0, 13, 5)
    assert [len(w) for w in wins] == [0, 0, 1, 1, 0, 0, 0, 0]
    w2 = wins[2][0]
    assert w2.tstart == 10 and w2.qstart == 3 and w2.qend == 8


def test_deletion_spanning_boundary():
    wins = run(b"3M4D3M", 0, 10, 10, 0, 6, 5)
    assert len(wins[0]) == 1 and len(wins[1]) == 1
    w0 = wins[0][0]
    # boundary at 5 falls inside the D op: qend stays at 3
    assert (w0.qstart, w0.qend) == (0, 3)
    w1 = wins[1][0]
    assert (w1.qstart, w1.qend) == (3, 6)


def test_insertion_at_boundary_absorbed_left():
    wins = run(b"5M3I5M", 0, 10, 10, 0, 13, 5)
    w0 = wins[0][0]
    # the 3I at target pos 5 belongs to window 0
    assert (w0.qstart, w0.qend) == (0, 8)
    assert (w0.op_start, w0.start_off, w0.op_end, w0.end_off) == (0, 0, 2, 3)
    w1 = wins[1][0]
    assert (w1.qstart, w1.qend) == (8, 13)
    assert (w1.op_start, w1.start_off) == (2, 0)


def test_multiwindow_op():
    wins = run(b"25M", 0, 25, 25, 0, 25, 5)
    assert [len(w) for w in wins] == [1] * 5
    for k, ws in enumerate(wins):
        w = ws[0]
        assert w.tstart == 5 * k and w.qstart == 5 * k and w.qend == 5 * (k + 1)


def test_short_overlap_skipped():
    wins = run(b"4M", 0, 4, 20, 0, 4, 5)
    assert all(len(w) == 0 for w in wins)


def test_trailing_partial_window():
    # W=10, tlen=25, overlap reaches the read end: claims partial last window
    wins = run(b"25M", 0, 25, 25, 0, 25, 10)
    assert [len(w) for w in wins] == [1, 1, 1]
    w2 = wins[2][0]
    assert w2.tstart == 20 and w2.qend == 25 and w2.end_off == 25


def test_no_trailing_when_short_of_thresh():
    # tend=24 is not > nth_thresh=24: the partial last window is NOT claimed
    wins = run(b"24M", 0, 24, 25, 0, 24, 10)
    assert [len(w) for w in wins] == [1, 1, 0]


@pytest.mark.parametrize("seed", range(30))
def test_property_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    W = int(rng.choice([5, 8, 16, 64]))
    n_ops = int(rng.integers(1, 60))
    parts = []
    prev_ins = True  # avoid leading insertion (reference panics on those)
    for _ in range(n_ops):
        op = rng.choice([b"M", b"I", b"D"], p=[0.6, 0.2, 0.2])
        if prev_ins and op == b"I":
            op = b"M"
        l = int(rng.integers(1, 3 * W))
        parts.append(b"%d%s" % (l, op))
        prev_ins = op == b"I"
    cigar = b"".join(parts)
    cig = parse_cigar(cigar)
    t_span = int(cig.t_cum[-1])
    q_span = int(cig.q_cum[-1])
    tstart = int(rng.integers(0, 2 * W))
    qstart = int(rng.integers(0, 2 * W))
    tlen = tstart + t_span + int(rng.integers(0, 2 * W))
    run(cigar, tstart, tstart + t_span, tlen, qstart, qstart + q_span, W)
