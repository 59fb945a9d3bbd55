import io

from herro_tpu.overlaps.batches import BatchWriter, list_batches, read_batch
from herro_tpu.overlaps.paf import STRAND_REV, parse_paf


def _row(q, t, cigar=b"10M", strand=b"+"):
    return b"\t".join(
        [
            q,
            b"100",
            b"0",
            b"50",
            strand,
            t,
            b"120",
            b"10",
            b"60",
            b"40",
            b"50",
            b"60",
            b"cg:Z:" + cigar,
        ]
    )


NAMES = {b"a": 0, b"b": 1, b"c": 2}


def test_parse_groups_by_target():
    rows = [_row(b"a", b"b"), _row(b"c", b"b"), _row(b"a", b"c")]
    out = parse_paf(rows, NAMES)
    assert set(out.keys()) == {1, 2}
    assert len(out[1]) == 2
    assert out[1][0].qid == 0 and out[1][0].tid == 1
    assert out[1][0].tstart == 10 and out[1][0].tend == 60


def test_first_wins_dedup():
    rows = [_row(b"a", b"b", b"10M"), _row(b"a", b"b", b"20M")]
    out = parse_paf(rows, NAMES)
    assert len(out[1]) == 1
    assert out[1][0].cigar.lens.tolist() == [10]


def test_drops_self_and_unknown():
    rows = [_row(b"a", b"a"), _row(b"zz", b"b"), _row(b"a", b"zz")]
    assert parse_paf(rows, NAMES) == {}


def test_core_filter_on_target():
    rows = [_row(b"a", b"b"), _row(b"b", b"c")]
    out = parse_paf(rows, NAMES, core={"c"})
    assert set(out.keys()) == {2}


def test_strand_and_cigar():
    rows = [_row(b"a", b"b", b"5M2I3D1M", b"-")]
    aln = parse_paf(rows, NAMES)[1][0]
    assert aln.strand == STRAND_REV
    assert aln.cigar.codes.tolist() == [0, 1, 2, 0]
    assert aln.cigar.lens.tolist() == [5, 2, 3, 1]
    assert aln.cigar.t_cum.tolist() == [0, 5, 5, 8, 9]
    assert aln.cigar.q_cum.tolist() == [0, 5, 7, 7, 8]


def test_raw_passthrough_writer():
    buf = io.BytesIO()
    rows = [_row(b"a", b"b"), _row(b"a", b"a")]
    parse_paf(rows, NAMES, raw_writer=buf)
    # only the surviving row is persisted
    assert buf.getvalue() == rows[0] + b"\n"


def test_batch_roundtrip(tmp_path):
    lines = [_row(b"a", b"b") + b"\n", _row(b"c", b"b") + b"\n"]
    with BatchWriter(str(tmp_path), 0, [b"a", b"b"]) as bw:
        for l in lines:
            bw.write(l)
    paths = list_batches(str(tmp_path))
    assert len(paths) == 1
    ids, it = read_batch(paths[0])
    assert ids == [b"a", b"b"]
    assert list(it) == lines


def test_malformed_rows_skipped_and_counted():
    """Corrupted PAF rows are skipped with counters, never raised
    (the reference would panic on these — overlaps.rs:172)."""
    from herro_tpu.overlaps.paf import ParseStats

    good = _row(b"a", b"b")
    # distinct (q, t) pairs per bad row: a skipped first row consumes its
    # pair (see test_skipped_first_row_consumes_the_pair)
    names = {**NAMES, b"d": 3, b"e": 4}
    bad = [
        _row(b"a", b"c")[:30],                      # truncated mid-field
        b"a\tnotanint\t0\t50\t+\td\t120\t10\t60\t40\t50\t60\tcg:Z:10M",
        _row(b"a", b"e").replace(b"cg:Z:10M", b"xx:Z:10M"),  # tag missing
        _row(b"b", b"a", cigar=b"10M5S10M"),        # unsupported S op
        _row(b"b", b"c", cigar=b"MM10"),            # garbled CIGAR
        _row(b"b", b"d", cigar=b"99999999999999M"), # overflowing run length
        b"\x00\xff\xfe garbage line",
        b"",
    ]
    stats = ParseStats()
    out = parse_paf([good] + bad + [_row(b"c", b"b", cigar=b"20M")],
                    names, stats=stats)
    # the two good rows survive, grouped under target b
    assert sorted(a.qid for a in out[1]) == [0, 2]
    assert stats.n_kept == 2
    assert stats.n_bad_cigar == 3
    # the truncated row still has >= 10 fields, so it surfaces as a missing
    # cg:Z: tag rather than as malformed
    assert stats.n_no_cigar == 2
    assert stats.n_malformed == 2
    assert "skipped" in stats.summary()


def test_fuzzed_rows_never_raise():
    """Random byte-level mutations of valid rows must never escape parse_paf."""
    import numpy as np
    from herro_tpu.overlaps.paf import ParseStats

    rng = np.random.default_rng(0)
    base = _row(b"a", b"b", cigar=b"5M2I3M1D5M")
    rows = []
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(buf))) if buf else 0
            if op == 0 and buf:
                buf[pos] = int(rng.integers(0, 256))
            elif op == 1 and buf:
                del buf[pos]
            else:
                buf.insert(pos, int(rng.integers(0, 256)))
        rows.append(bytes(buf))
    stats = ParseStats()
    parse_paf(rows, NAMES, stats=stats)  # must not raise
    assert stats.n_rows <= 300


def test_cg_tag_found_among_other_tags():
    """cg:Z: is located even when other SAM-style tags follow it."""
    row = _row(b"a", b"b") + b"\tms:i:100\tAS:i:99"
    out = parse_paf([row], NAMES)
    assert len(out[1]) == 1 and len(out[1][0].cigar) == 1


def test_skipped_first_row_consumes_the_pair():
    # minimap2 orders rows best-first: when a pair's first row is skipped as
    # malformed, a later (inferior) row for the same pair must NOT be
    # accepted in its place — the pair is dropped entirely.
    bad_first = _row(b"a", b"b", b"not_a_cigar")
    rows = [bad_first, _row(b"a", b"b", b"20M")]
    out = parse_paf(rows, NAMES)
    assert out == {}
    # an unknown-id or core-filtered row does not consume the pair (the
    # reference never sees such rows as candidates either)
    rows = [_row(b"zz", b"b"), _row(b"a", b"b", b"20M")]
    out = parse_paf(rows, NAMES)
    assert len(out[1]) == 1
