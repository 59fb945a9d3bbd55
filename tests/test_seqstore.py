"""2-bit codec tests mirrored from the reference inline tests
(src/haec_io.rs:185-300)."""

import numpy as np

from herro_tpu.io.seqstore import PackedSeqs, decode, encode


def test_encode_acgt():
    assert encode(b"ACGT").tolist() == [0b11100100]


def test_encode_seven():
    assert encode(b"ACGTACG").tolist() == [0b10010011100100]


def test_decode_roundtrip():
    words = np.array([0b11100100], dtype=np.uint64)
    assert decode(words, 0, 4).tobytes() == b"ACGT"


def test_decode_seven():
    words = np.array([0b10010011100100], dtype=np.uint64)
    assert decode(words, 0, 7).tobytes() == b"ACGTACG"


def test_subrange():
    w = encode(b"ACGTACGTACGT")
    assert decode(w, 3, 10).tobytes() == b"TACGTAC"
    assert decode(w, 3, 12).tobytes() == b"TACGTACGT"
    assert decode(w, 0, 12).tobytes() == b"ACGTACGTACGT"
    assert decode(w, 8, 11).tobytes() == b"ACG"


def test_rc():
    w = encode(b"ATCGATCGATCG")
    assert decode(w, 0, 12, rc=True).tobytes() == b"CGATCGATCGAT"
    assert decode(w, 3, 12, rc=True).tobytes() == b"CGATCGATC"
    assert decode(w, 0, 9, rc=True).tobytes() == b"TCGATCGAT"


def test_long_sequence_roundtrip():
    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=1000).tobytes()
    w = encode(seq)
    assert decode(w, 0, 1000).tobytes() == seq
    # RC of RC is identity
    rc = decode(w, 100, 900, rc=True).tobytes()
    w2 = encode(rc)
    assert decode(w2, 0, 800, rc=True).tobytes() == seq[100:900]


def test_packed_arena():
    seqs = [b"ACGT", b"A" * 40, b"GATTACA"]
    ps = PackedSeqs.from_sequences(seqs)
    assert len(ps) == 3
    for i, s in enumerate(seqs):
        assert ps.get(i).tobytes() == s
    assert ps.get(1, 5, 35).tobytes() == b"A" * 30
    assert ps.get(2, 0, 7, rc=True).tobytes() == b"TGTAATC"
