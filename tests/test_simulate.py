"""Simulator self-consistency: generated PAF rows must describe real
alignments between the generated reads."""

import numpy as np
import pytest

from herro_tpu.cigar.ops import M, parse_cigar
from herro_tpu.io.fastx import load_reads
from herro_tpu.overlaps.paf import STRAND_REV, parse_paf
from herro_tpu.training.simulate import paf_rows, simulate, true_sequence


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    ds = simulate(
        genome_len=3000,
        n_reads=12,
        read_len=(1200, 2200),
        sub_rate=0.03,
        ins_rate=0.015,
        del_rate=0.015,
        seed=7,
    )
    path = tmp_path_factory.mktemp("sim") / "reads.fastq"
    ds.write_fastq(str(path))
    reads = load_reads(str(path), min_length=1)
    return ds, reads


def _oriented_query(reads, aln):
    if aln.strand == STRAND_REV:
        return reads.seq(aln.qid, aln.qstart, aln.qend, rc=True)
    return reads.seq(aln.qid, aln.qstart, aln.qend)


def test_paf_rows_are_real_alignments(sim):
    ds, reads = sim
    rows = paf_rows(ds, min_overlap=400)
    assert rows, "simulator produced no overlaps"
    grouped = parse_paf(rows, reads.name_to_id)
    n_checked = 0
    for tid, alns in grouped.items():
        tseq = reads.seq(tid)
        for aln in alns:
            # spans must be consistent with the cigar
            assert int(aln.cigar.t_cum[-1]) == aln.tend - aln.tstart
            assert int(aln.cigar.q_cum[-1]) == aln.qend - aln.qstart

            qseq = _oriented_query(reads, aln)
            # walk M ops comparing bases: only substitution errors may differ
            mismatches = 0
            total = 0
            for k in np.nonzero(aln.cigar.codes == M)[0]:
                t0 = aln.tstart + int(aln.cigar.t_cum[k])
                q0 = int(aln.cigar.q_cum[k])
                l = int(aln.cigar.lens[k])
                tb = tseq[t0 : t0 + l]
                qb = qseq[q0 : q0 + l]
                mismatches += int(np.count_nonzero(tb != qb))
                total += l
            assert total > 0
            # two reads at 3% sub rate each -> ~6% expected mismatch
            assert mismatches / total < 0.15, (
                f"cigar misaligned: {mismatches}/{total} mismatches "
                f"(tid={tid}, qid={aln.qid}, strand={aln.strand})"
            )
            n_checked += 1
    assert n_checked >= 20


def test_both_orientations_emitted(sim):
    ds, reads = sim
    rows = paf_rows(ds, min_overlap=400)
    pairs = set()
    for r in rows:
        f = r.split(b"\t")
        pairs.add((f[0], f[5]))
    # dual=yes semantics: if (a, b) overlaps, (b, a) is present too
    for q, t in pairs:
        assert (t, q) in pairs


def test_true_sequence_matches_genome(sim):
    ds, _ = sim
    r = ds.reads[0]
    t = true_sequence(ds, r)
    assert len(t) == r.end - r.start
    if not r.rc:
        assert t == ds.genome[r.start : r.end]
