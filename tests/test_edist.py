import numpy as np
import pytest

from herro_tpu.utils.edist import banded_edit_distance, identity, qscore


def brute(a: bytes, b: bytes) -> int:
    n, m = len(a), len(b)
    d = list(range(m + 1))
    for i in range(1, n + 1):
        prev = d[0]
        d[0] = i
        for j in range(1, m + 1):
            cur = d[j]
            d[j] = min(
                d[j] + 1,
                d[j - 1] + 1,
                prev + (0 if a[i - 1] == b[j - 1] else 1),
            )
            prev = cur
    return d[m]


@pytest.mark.parametrize(
    "a,b,expected",
    [
        (b"", b"", 0),
        (b"ACGT", b"ACGT", 0),
        (b"ACGT", b"", 4),
        (b"ACGT", b"AGT", 1),
        (b"ACGT", b"ACGTT", 1),
        (b"AAAA", b"TTTT", 4),
        (b"kitten", b"sitting", 3),
    ],
)
def test_known_cases(a, b, expected):
    assert banded_edit_distance(a, b) == expected


@pytest.mark.parametrize("seed", range(10))
def test_random_vs_brute(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 120))
    a = rng.choice(list(b"ACGT"), size=n).astype(np.uint8).tobytes()
    # mutate a into b
    b = bytearray(a)
    for _ in range(int(rng.integers(0, 12))):
        op = rng.integers(0, 3)
        pos = int(rng.integers(0, max(len(b), 1)))
        if op == 0 and b:
            b[pos % len(b)] = rng.choice(list(b"ACGT"))
        elif op == 1:
            b.insert(pos, rng.choice(list(b"ACGT")))
        elif op == 2 and b:
            del b[pos % len(b)]
    b = bytes(b)
    assert banded_edit_distance(a, b) == brute(a, b)


def test_identity_and_q():
    assert identity(b"ACGT", b"ACGT") == 1.0
    assert abs(identity(b"ACGA", b"ACGT") - 0.75) < 1e-9
    assert qscore(0.99) == pytest.approx(20.0, abs=0.1)


def test_fitting_distance_free_end_gaps():
    from herro_tpu.utils.edist import fitting_edit_distance, infix_identity

    # exact substring: zero distance regardless of flanks
    assert fitting_edit_distance(b"ACGTACGT", b"TTTTACGTACGTGGGG") == 0
    assert infix_identity(b"ACGTACGT", b"TTTTACGTACGTGGGG") == 1.0
    # one substitution inside the matched span
    assert fitting_edit_distance(b"ACGTACGT", b"TTACGAACGTGG") == 1
    # empty corrected
    assert fitting_edit_distance(b"", b"ACGT") == 0


def test_fitting_distance_matches_global_when_full_span():
    from herro_tpu.utils.edist import banded_edit_distance, fitting_edit_distance

    rng = np.random.default_rng(5)
    for _ in range(20):
        a = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=200)
        b = a.copy()
        # mutate a few positions
        idx = rng.choice(200, size=5, replace=False)
        b[idx] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=5)
        fd = fitting_edit_distance(a, b)
        gd = banded_edit_distance(a, b)
        assert fd <= gd


def test_fitting_distance_brute_force_parity():
    from herro_tpu.utils.edist import banded_edit_distance, fitting_edit_distance

    rng = np.random.default_rng(9)
    sym = np.frombuffer(b"ACGT", dtype=np.uint8)
    for _ in range(15):
        a = rng.choice(sym, size=int(rng.integers(3, 12)))
        b = rng.choice(sym, size=int(rng.integers(3, 20)))
        brute = min(
            banded_edit_distance(a, b[i:j], band=64)
            for i in range(len(b) + 1)
            for j in range(i, len(b) + 1)
        )
        assert fitting_edit_distance(a, b, band=64) == brute
