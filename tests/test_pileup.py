"""Pileup fill tests: hand-built examples + property tests against the
per-base oracle (tests/oracle_pileup.py)."""

import numpy as np
import pytest

from herro_tpu.cigar.ops import parse_cigar
from herro_tpu.cigar.windowing import OverlapWindow, extract_windows
from herro_tpu.features.pileup import (
    fill_window_pileup,
    get_supported,
    window_max_ins,
)

from oracle_pileup import (
    oracle_fill_row,
    oracle_max_ins,
    oracle_supported,
)


def full_window(aln_idx, cig, tstart=0, qlen=None):
    """An OverlapWindow covering the whole cigar."""
    n = len(cig)
    return OverlapWindow(
        aln_idx,
        tstart,
        0,
        int(cig.q_cum[-1]),
        0,
        0,
        n,
        int(cig.lens[-1]),
    )


def test_max_ins_simple():
    cig = parse_cigar(b"3M2I3M1I4M")
    ow = full_window(0, cig)
    mi = window_max_ins([ow], [cig], 0, 10)
    assert mi.tolist() == [0, 0, 2, 0, 0, 1, 0, 0, 0, 0]


def test_pileup_forward_match():
    # target: ACGTACGTAC, query matches with one sub (pos 2 -> T)
    cig = parse_cigar(b"10M")
    ow = full_window(0, cig)
    tseq = np.frombuffer(b"ACGTACGTAC", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIIIIIII", dtype=np.uint8)
    qseq = np.frombuffer(b"ACTTACGTAC", dtype=np.uint8)
    qqual = np.frombuffer(b"JJJJJJJJJJ", dtype=np.uint8)
    mi = window_max_ins([ow], [cig], 0, 10)
    bases, quals = fill_window_pileup(
        [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 10, mi, 2
    )
    assert bases.shape == (10, 3)
    assert bases[:, 0].tobytes() == b"ACGTACGTAC"
    assert bases[:, 1].tobytes() == b"ACTTACGTAC"
    assert bases[:, 2].tobytes() == b".........."
    assert quals[:, 1].tobytes() == b"JJJJJJJJJJ"
    assert quals[:, 2].tobytes() == b"!!!!!!!!!!"


def test_pileup_insertion_columns():
    # query has 2 inserted bases after target pos 2
    cig = parse_cigar(b"3M2I3M")
    ow = full_window(0, cig)
    tseq = np.frombuffer(b"ACGTAC", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIII", dtype=np.uint8)
    qseq = np.frombuffer(b"ACGTTTAC", dtype=np.uint8)
    qqual = np.frombuffer(b"12345678", dtype=np.uint8)
    mi = window_max_ins([ow], [cig], 0, 6)
    assert mi.tolist() == [0, 0, 2, 0, 0, 0]
    bases, quals = fill_window_pileup(
        [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 6, mi, 1
    )
    # anchors: 0,1,2,(ins,ins),3,4,5
    assert bases[:, 0].tobytes() == b"ACG**TAC"
    assert bases[:, 1].tobytes() == b"ACGTTTAC"
    assert quals[:, 0].tobytes() == b"III!!III"


def test_pileup_deletion_gap():
    cig = parse_cigar(b"3M2D3M")
    ow = full_window(0, cig)
    tseq = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIIIII", dtype=np.uint8)
    qseq = np.frombuffer(b"ACGCGT", dtype=np.uint8)
    qqual = np.frombuffer(b"123456", dtype=np.uint8)
    mi = window_max_ins([ow], [cig], 0, 8)
    bases, _ = fill_window_pileup(
        [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 8, mi, 1
    )
    assert bases[:, 1].tobytes() == b"ACG**CGT"


def test_pileup_reverse_strand_lowercase_and_hash_gap():
    cig = parse_cigar(b"3M2D3M")
    ow = full_window(0, cig)
    tseq = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIIIII", dtype=np.uint8)
    # oriented (already RC'd) query bytes
    qseq = np.frombuffer(b"ACGCGT", dtype=np.uint8)
    qqual = np.frombuffer(b"123456", dtype=np.uint8)
    mi = window_max_ins([ow], [cig], 0, 8)
    bases, _ = fill_window_pileup(
        [ow], [cig], [True], [qseq], [qqual], tseq, tqual, 0, 8, mi, 1
    )
    assert bases[:, 1].tobytes() == b"acg##cgt"


def test_pileup_partial_window_flanks():
    # overlap starts at target pos 3 of an 8-long window
    cig = parse_cigar(b"5M")
    ow = OverlapWindow(0, 3, 0, 5, 0, 0, 1, 5)
    tseq = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIIIII", dtype=np.uint8)
    qseq = np.frombuffer(b"TACGT", dtype=np.uint8)
    qqual = np.frombuffer(b"12345", dtype=np.uint8)
    mi = window_max_ins([ow], [cig], 0, 8)
    bases, _ = fill_window_pileup(
        [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 8, mi, 1
    )
    assert bases[:, 1].tobytes() == b"...TACGT"


def test_supported_positions():
    # 10 identical rows + target: column with a second symbol >= thresh
    bases = np.full((4, 10), ord("A"), dtype=np.uint8)
    bases[1, 5:] = ord("C")  # split column: 5 A, 5 C -> supported
    bases[2, 1:] = ord("*")  # 1 A, 9 * -> supported (A count 1 >= thresh 1)
    bases[3, 1:] = ord(".")  # '.' excluded: only 1 A -> not supported
    sup = get_supported(bases)
    got = [(int(p), int(i)) for p, i in sup]
    assert got == oracle_supported(bases)
    assert (1, 0) in got and (2, 0) in got and (3, 0) not in got


def _random_case(seed):
    rng = np.random.default_rng(seed)
    W = int(rng.choice([8, 16, 32]))
    # random cigar with no leading/trailing/double insertions
    parts = []
    prev_ins = True
    n_ops = int(rng.integers(1, 40))
    for k in range(n_ops):
        op = rng.choice([b"M", b"I", b"D"], p=[0.6, 0.2, 0.2])
        if (prev_ins or k == n_ops - 1) and op == b"I":
            op = b"M"
        l = int(rng.integers(1, W))
        parts.append(b"%d%s" % (l, op))
        prev_ins = op == b"I"
    cig = parse_cigar(b"".join(parts))
    t_span = int(cig.t_cum[-1])
    tstart = int(rng.integers(0, 2 * W))
    tlen = tstart + t_span + int(rng.integers(0, 2 * W))
    tseq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=tlen)
    tqual = rng.integers(33, 127, size=tlen, dtype=np.uint8)
    return rng, W, tlen, tseq, tqual, cig, tstart, t_span


@pytest.mark.parametrize("seed", range(25))
def test_property_fill_vs_oracle(seed):
    rng, W, tlen, tseq, tqual, cig, tstart, t_span = _random_case(seed)
    tend = tstart + t_span
    q_span = int(cig.q_cum[-1])
    qseq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=q_span)
    qqual = rng.integers(33, 127, size=q_span, dtype=np.uint8)

    n_windows = (tlen + W - 1) // W
    windows = [[] for _ in range(n_windows)]
    extract_windows(windows, 0, cig, tstart, tend, tlen, 0, q_span, W)

    rev = bool(rng.integers(0, 2))
    for wid, ows in enumerate(windows):
        if not ows:
            continue
        win_start = wid * W
        win_len = min(W, tlen - win_start)
        mi = window_max_ins(ows, [cig], win_start, win_len)
        mi_ref = oracle_max_ins(ows, [cig], win_start, win_len)
        assert mi.tolist() == mi_ref.tolist(), f"max_ins mismatch w{wid}"

        ow = ows[0]
        qs = qseq[ow.qstart : ow.qend]
        qq = qqual[ow.qstart : ow.qend]
        bases, quals = fill_window_pileup(
            [ow], [cig], [rev], [qs], [qq], tseq, tqual, win_start, win_len, mi, 1
        )
        L = bases.shape[0]
        rb = np.empty(L, dtype=np.uint8)
        rq = np.full(L, ord("!"), dtype=np.uint8)
        oracle_fill_row(rb, rq, ow, cig, rev, qs, qq, mi, win_start)
        assert bases[:, 1].tobytes() == rb.tobytes(), f"bases mismatch w{wid}"
        assert quals[:, 1].tobytes() == rq.tobytes(), f"quals mismatch w{wid}"

        sup = get_supported(bases)
        assert [(int(p), int(i)) for p, i in sup] == oracle_supported(bases)


def test_pileup_window_leading_insertion():
    """A window slice that *starts* with an insertion op (tpos == 0) has no
    preceding column to reserve into: window_max_ins skips it, and every fill
    path (numpy / native strided / native batched) must consume the query
    bases without writing anywhere (regression: max_ins[-1] wraparound)."""
    from herro_tpu import native

    cig = parse_cigar(b"2I6M")
    ow = full_window(0, cig)
    tseq = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    tqual = np.frombuffer(b"IIIIIIII", dtype=np.uint8)
    qseq = np.frombuffer(b"TTACGTAC", dtype=np.uint8)  # 2 inserted + 6 aligned
    qqual = np.frombuffer(b"12345678", dtype=np.uint8)

    mi = window_max_ins([ow], [cig], 0, 6)
    assert mi.tolist() == [0] * 6  # leading insertion reserved nothing

    results = []
    # numpy and native strided paths
    for use_native in ([False, True] if native.available() else [False]):
        import unittest.mock as mock

        with mock.patch.object(native, "available", lambda: use_native):
            bases, quals = fill_window_pileup(
                [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 6, mi, 1
            )
        results.append((bases.tobytes(), quals.tobytes()))
    # native batched path
    if native.available():
        wb = native.WindowBatch([cig.codes], [cig.lens], [ow], [0])
        bases, quals = fill_window_pileup(
            [ow], [cig], [False], [qseq], [qqual], tseq, tqual, 0, 6, mi, 1,
            wb=wb,
        )
        results.append((bases.tobytes(), quals.tobytes()))

    assert all(r == results[0] for r in results)
    b0 = np.frombuffer(results[0][0], dtype=np.uint8).reshape(6, -1)
    assert b0[:, 1].tobytes() == b"ACGTAC"  # inserted TT dropped, 6 M aligned
