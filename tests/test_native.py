"""Parity tests: the C++ native kernels must match the numpy fallbacks
bit-for-bit on random data."""

import numpy as np
import pytest

from herro_tpu import native
from herro_tpu.cigar import ops as cops
from herro_tpu.cigar import windowing as cwin
from herro_tpu.cigar.ops import parse_cigar
from herro_tpu.features import pileup as fpile
from herro_tpu.io.seqstore import encode

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


@pytest.fixture
def no_native(monkeypatch):
    """Force the numpy fallback paths."""
    monkeypatch.setattr(native, "available", lambda: False)


def _rand_cigar(rng, W):
    parts = []
    prev_ins = True
    n_ops = int(rng.integers(1, 50))
    for k in range(n_ops):
        op = rng.choice([b"M", b"I", b"D"], p=[0.6, 0.2, 0.2])
        if (prev_ins or k == n_ops - 1) and op == b"I":
            op = b"M"
        parts.append(b"%d%s" % (int(rng.integers(1, 2 * W)), op))
        prev_ins = op == b"I"
    return parse_cigar(b"".join(parts))


def test_decode_parity():
    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=500)
    w = encode(seq.tobytes())
    for start, end, rc in [(0, 500, False), (13, 487, True), (100, 101, False)]:
        a = native.decode_2bit(w, start, end, rc)
        from herro_tpu.io import seqstore

        ref = seqstore._BASE_OF_CODE[
            (
                (w[np.arange(start, end) >> 5]
                 >> ((np.arange(start, end).astype(np.uint64) << np.uint64(1)) & np.uint64(63)))
                & np.uint64(3)
            ).astype(np.intp)
        ]
        if rc:
            comp = dict(zip(b"ACGT", b"TGCA"))
            ref = np.frombuffer(
                bytes(comp[b] for b in ref.tobytes()[::-1]), dtype=np.uint8
            )
        assert a.tobytes() == ref.tobytes()


@pytest.mark.parametrize("seed", range(15))
def test_windowing_parity(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    W = int(rng.choice([8, 16, 64]))
    cig = _rand_cigar(rng, W)
    t_span, q_span = int(cig.t_cum[-1]), int(cig.q_cum[-1])
    tstart = int(rng.integers(0, 2 * W))
    qstart = int(rng.integers(0, 2 * W))
    tlen = tstart + t_span + int(rng.integers(0, 2 * W))
    n_windows = (tlen + W - 1) // W

    wins_native = [[] for _ in range(n_windows)]
    cwin.extract_windows(
        wins_native, 0, cig, tstart, tstart + t_span, tlen, qstart,
        qstart + q_span, W,
    )
    monkeypatch.setattr(native, "available", lambda: False)
    wins_py = [[] for _ in range(n_windows)]
    cwin.extract_windows(
        wins_py, 0, cig, tstart, tstart + t_span, tlen, qstart,
        qstart + q_span, W,
    )
    assert [[vars(w) for w in ws] for ws in wins_native] == [
        [vars(w) for w in ws] for ws in wins_py
    ]


@pytest.mark.parametrize("seed", range(15))
def test_pileup_and_accuracy_parity(seed, monkeypatch):
    rng = np.random.default_rng(100 + seed)
    W = int(rng.choice([16, 32]))
    cig = _rand_cigar(rng, W)
    t_span, q_span = int(cig.t_cum[-1]), int(cig.q_cum[-1])
    tstart = 0
    tlen = t_span
    tseq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=tlen)
    tqual = rng.integers(33, 127, size=tlen, dtype=np.uint8)
    qseq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=q_span)
    qqual = rng.integers(33, 127, size=q_span, dtype=np.uint8)
    rev = bool(rng.integers(0, 2))

    n_windows = (tlen + W - 1) // W
    windows = [[] for _ in range(n_windows)]
    cwin.extract_windows(windows, 0, cig, 0, t_span, tlen, 0, q_span, W)

    for wid, ows in enumerate(windows):
        if not ows:
            continue
        ow = ows[0]
        win_start = wid * W
        win_len = min(W, tlen - win_start)
        qs = np.ascontiguousarray(qseq[ow.qstart : ow.qend])
        qq = np.ascontiguousarray(qqual[ow.qstart : ow.qend])

        mi_n = fpile.window_max_ins(ows, [cig], win_start, win_len)
        b_n, q_n = fpile.fill_window_pileup(
            [ow], [cig], [rev], [qs], [qq], tseq, tqual, win_start, win_len,
            mi_n, 1,
        )
        acc_n = cops.window_accuracy(
            cig, ow.op_start, ow.start_off, ow.op_end, ow.end_off,
            tseq[ow.tstart : win_start + win_len], qs,
        )

        monkeypatch.setattr(native, "available", lambda: False)
        mi_p = fpile.window_max_ins(ows, [cig], win_start, win_len)
        b_p, q_p = fpile.fill_window_pileup(
            [ow], [cig], [rev], [qs], [qq], tseq, tqual, win_start, win_len,
            mi_p, 1,
        )
        acc_p = cops.window_accuracy(
            cig, ow.op_start, ow.start_off, ow.op_end, ow.end_off,
            tseq[ow.tstart : win_start + win_len], qs,
        )
        monkeypatch.undo()

        assert mi_n.tolist() == mi_p.tolist()
        assert b_n.tobytes() == b_p.tobytes()
        assert q_n.tobytes() == q_p.tobytes()
        assert abs(acc_n - acc_p) < 1e-12


@pytest.mark.parametrize("seed", range(10))
def test_supported_mask_parity(seed, monkeypatch):
    rng = np.random.default_rng(300 + seed)
    L = int(rng.integers(1, 200))
    C = int(rng.integers(2, 64))
    symbols = np.frombuffer(b"ACGT*acgt#.", dtype=np.uint8)
    bases = rng.choice(symbols, size=(L, C))
    bases[:, 0] = rng.choice(np.frombuffer(b"ACGT*", dtype=np.uint8), size=L)

    sup_native = fpile.get_supported(bases)
    monkeypatch.setattr(native, "available", lambda: False)
    sup_py = fpile.get_supported(bases)
    np.testing.assert_array_equal(sup_native, sup_py)
