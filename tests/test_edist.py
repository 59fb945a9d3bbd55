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
