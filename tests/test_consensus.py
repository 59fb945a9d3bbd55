import numpy as np

from herro_tpu.constants import BASES_MAP
from herro_tpu.ops.consensus import (
    count_decisions_jnp,
    count_decisions_np,
    decode_window,
    stitch_read,
)


def toks(s: bytes) -> np.ndarray:
    return BASES_MAP[np.frombuffer(s, dtype=np.uint8)]


def col(target: bytes, *rows: bytes) -> np.ndarray:
    """Build a [L, R] token window from per-read strings."""
    mat = np.stack([toks(target)] + [toks(r) for r in rows], axis=1)
    return mat.astype(np.int32)


def test_counting_plurality_overrides_target():
    # 3 reads say C, target says A -> plurality wins
    w = col(b"A", b"C", b"C", b"C")
    d = count_decisions_np(w, n_alns=3)
    assert d.tolist() == [1]


def test_counting_low_count_keeps_target():
    # top count < 2 -> keep target
    w = col(b"A", b"C")
    d = count_decisions_np(w, n_alns=1)
    assert d.tolist() == [0]


def test_counting_tie_with_target_keeps_target():
    # 2 A (incl. target) vs 2 C -> tie involves target -> keep A
    w = col(b"A", b"a", b"C", b"c")
    d = count_decisions_np(w, n_alns=3)
    assert d.tolist() == [0]


def test_counting_tie_without_target():
    # target G; 2 A vs 2 C tie, target not in top2 -> plurality (A, smaller idx)
    w = col(b"G", b"A", b"a", b"C", b"c")
    d = count_decisions_np(w, n_alns=4)
    assert d.tolist() == [0]


def test_counting_dots_excluded_and_case_folded():
    w = col(b"A", b".", b"#", b"*", b"t", b"T")
    # counts: A1 (target), *2 ('#'+'*'), T2 -> top2: * and T tie at 2...
    # stable order: A=1,C=0,G=0,T=2,*=2 -> c0=T(3), c1=*(4); target A not in
    # top2, mc0==mc1 -> plurality T
    d = count_decisions_np(w, n_alns=5)
    assert d.tolist() == [3]


def test_jnp_matches_np_random():
    rng = np.random.default_rng(0)
    B, L, R = 4, 33, 31
    tokens = rng.integers(0, 11, size=(B, L, R)).astype(np.uint8)
    tokens[:, :, 0] = rng.integers(0, 5, size=(B, L))  # target: base or '*'
    n_alns = rng.integers(0, 31, size=B).astype(np.int32)
    # device op takes the row-major [B, R, L] layout; np twin stays [L, R]
    out_j = np.asarray(count_decisions_jnp(tokens.transpose(0, 2, 1), n_alns))
    for b in range(B):
        out_n = count_decisions_np(tokens[b], int(n_alns[b]))
        np.testing.assert_array_equal(out_j[b], out_n)


def test_decode_window_drops_gaps():
    d = np.array([0, 4, 1, 2, 4, 3], dtype=np.uint8)
    assert decode_window(d) == b"ACGT"


def test_stitch_read_trims_and_splits():
    d1 = np.array([0, 1], dtype=np.uint8)
    d2 = np.array([2, 3], dtype=np.uint8)
    # uncovered window at both ends is trimmed; middle gap splits
    windows = [
        (0, np.array([], dtype=np.uint8)),
        (3, d1),
        (1, np.array([0], dtype=np.uint8)),
        (3, d2),
        (0, np.array([], dtype=np.uint8)),
    ]
    assert stitch_read(windows) == [b"AC", b"GT"]


def test_stitch_read_no_coverage():
    assert stitch_read([(1, np.array([0], dtype=np.uint8))]) is None
