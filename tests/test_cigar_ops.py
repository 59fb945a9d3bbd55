"""CIGAR algebra: parsing (incl. '='/'X' folding), query-side re-orientation,
and minimap2-style indel left-alignment. The left-alignment cases transcribe
the reference's unit tests (src/aligners.rs:295-341)."""

import numpy as np
import pytest

from herro_tpu.cigar.ops import (
    D,
    I,
    M,
    cigar_to_string,
    left_align_indels,
    orient_cigar,
    parse_cigar,
)


def _b(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)


def test_parse_eqx_folds_and_merges():
    cig = parse_cigar(b"5=1X4=2I3=")
    assert cigar_to_string(cig) == b"10M2I3M"
    assert cig.t_cum[-1] == 13 and cig.q_cum[-1] == 15


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_cigar(b"5M3Q")


def test_orient_target_identity():
    cig = parse_cigar(b"4M2D3M1I2M")
    assert orient_cigar(cig, True, False) is cig


def test_orient_query_swaps_indels():
    cig = parse_cigar(b"4M2D3M1I2M")
    q = orient_cigar(cig, False, False)
    assert cigar_to_string(q) == b"4M2I3M1D2M"
    # spans swap too
    assert q.t_cum[-1] == cig.q_cum[-1] and q.q_cum[-1] == cig.t_cum[-1]


def test_orient_query_reverse_strand():
    cig = parse_cigar(b"4M2D3M")
    q = orient_cigar(cig, False, True)
    assert cigar_to_string(q) == b"3M2I4M"


def test_orient_reverse_merges_adjacent():
    cig = parse_cigar(b"2M1I2M")  # palindromic op layout
    q = orient_cigar(cig, False, True)
    assert cigar_to_string(q) == b"2M1D2M"


# --- left_align_indels: the reference's fix_cigar tests ---


def test_left_align_deletion_homopolymer():
    t = _b("TTTTGTTTTTTTTTTCTTTTTTTTTTTTTTTTTTTGCT")
    q = _b("TTTTGTTTTTTTTTTCTTTTTTTTTTTTTTTGCT")
    cig = parse_cigar(b"31M4D3M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"16M4D18M"
    assert (ts, qs) == (0, 0)


def test_left_align_insertion_homopolymer():
    t = _b("AGCAAAAAAAAAAAAAAAGAAAAAAAAAACAAAA")
    q = _b("AGCAAAAAAAAAAAAAAAAAAAGAAAAAAAAAACAAAA")
    cig = parse_cigar(b"18M4I16M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"3M4I31M"
    assert (ts, qs) == (0, 0)


def test_left_align_tandem_repeat():
    t = _b("CACCAGGCCA")
    q = _b("CACCAGCCA")
    cig = parse_cigar(b"6M1D3M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"5M1D4M"
    assert (ts, qs) == (0, 0)


def test_left_align_reports_leading_shifts():
    # The shift consumes the whole leading match: the deletion becomes
    # leading and is dropped, reported as a target shift.
    t = _b("AAAAAG")
    q = _b("AAAAG")
    cig = parse_cigar(b"1M1D4M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"5M"
    assert (ts, qs) == (1, 0)

    t = _b("AAAAG")
    q = _b("AAAAAG")
    cig = parse_cigar(b"1M1I4M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"5M"
    assert (ts, qs) == (0, 1)


def test_left_align_no_shift_when_bases_differ():
    t = _b("ACGTACGT")
    q = _b("ACGTCGT")
    cig = parse_cigar(b"4M1D3M")
    out, ts, qs = left_align_indels(cig, t, q)
    assert cigar_to_string(out) == b"4M1D3M"
    assert (ts, qs) == (0, 0)


def test_left_align_spans_preserved():
    rng = np.random.default_rng(0)
    for _ in range(50):
        # random alignment over a repetitive alphabet to provoke shifts
        parts, t, q = [], [], []
        parts.append((M, int(rng.integers(1, 9))))
        for _ in range(int(rng.integers(1, 5))):
            parts.append((int(rng.choice([I, D])), int(rng.integers(1, 4))))
            parts.append((M, int(rng.integers(1, 9))))
        for c, l in parts:
            if c in (M, D):
                t.extend(rng.choice([65, 67], size=l).tolist())
        t = np.asarray(t, dtype=np.uint8)
        # build q consistent with the alignment walk
        q, tp = [], 0
        for c, l in parts:
            if c == M:
                q.extend(t[tp : tp + l].tolist())
                tp += l
            elif c == I:
                q.extend(rng.choice([65, 67], size=l).tolist())
            else:
                tp += l
        q = np.asarray(q, dtype=np.uint8)
        cig = parse_cigar(
            b"".join(b"%d%c" % (l, b"MID"[c]) for c, l in parts)
        )
        out, ts, qs = left_align_indels(cig, t, q)
        assert out.t_cum[-1] + ts == cig.t_cum[-1]
        assert out.q_cum[-1] + qs == cig.q_cum[-1]


def test_parse_native_numpy_parity(monkeypatch):
    import herro_tpu.native as native
    from herro_tpu.cigar import ops as cops

    rng = np.random.default_rng(11)
    cases = [b"", b"5M", b"1M1I1D", b"5=1X4=2I3=", b"100M" * 50]
    for _ in range(30):
        n = int(rng.integers(1, 40))
        parts = []
        for _ in range(n):
            parts.append(b"%d%c" % (rng.integers(1, 500), rng.choice(
                np.frombuffer(b"MID=X", dtype=np.uint8))))
        cases.append(b"".join(parts))
    for c in cases:
        a = cops.parse_cigar(c)
        monkeypatch.setattr(native, "available", lambda: False)
        b = cops.parse_cigar(c)
        monkeypatch.undo()
        np.testing.assert_array_equal(a.codes, b.codes)
        np.testing.assert_array_equal(a.lens, b.lens)
        np.testing.assert_array_equal(a.t_cum, b.t_cum)
        np.testing.assert_array_equal(a.q_cum, b.q_cum)

    for bad in (b"5M3Q", b"12", b"M", b"5MM"):
        with pytest.raises(ValueError):
            cops.parse_cigar(bad)
        monkeypatch.setattr(native, "available", lambda: False)
        with pytest.raises(ValueError):
            cops.parse_cigar(bad)
        monkeypatch.undo()


def test_long_indel_prefix_matches_direct_filter():
    from herro_tpu.cigar.ops import window_has_long_indel

    rng = np.random.default_rng(11)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        ops = "".join(
            f"{int(rng.integers(1, 120))}{rng.choice(list('MID'))}" for _ in range(n)
        )
        cig = parse_cigar(ops.encode())
        pre = cig.long_indel_prefix(60)
        for _ in range(10):
            s = int(rng.integers(0, len(cig)))
            e = int(rng.integers(s + 1, len(cig) + 1))
            assert (pre[e] > pre[s]) == window_has_long_indel(cig, s, e, 60)
