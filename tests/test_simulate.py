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


def test_informative_quals_track_errors():
    """Per-base qualities are a real signal: erroneous bases (subs and
    insertions) score measurably lower phred than correct bases, and the
    stored string is reversed for RC reads (reference consumes quals as a
    model input, src/inference.rs:16-21)."""
    ds = simulate(
        genome_len=20_000,
        n_reads=16,
        read_len=(3000, 6000),
        sub_rate=0.03,
        ins_rate=0.02,
        del_rate=0.02,
        seed=21,
    )
    import numpy as np

    for r in ds.reads:
        assert r.quals is not None and len(r.quals) == r.length
        q = np.frombuffer(r.quals, dtype=np.uint8).astype(int) - 33
        assert q.std() > 2.0  # not constant
        assert q.min() >= 2 and q.max() <= 50

    # error/correct separation, checked in forward orientation
    src_fwd = [r for r in ds.reads if not r.rc]
    assert src_fwd
    err_q, ok_q = [], []
    for r in src_fwd:
        src = ds.hap_seq(r.hap)[r.start : r.end]
        per_pos = r.emitted.astype(np.int64) + r.ins_lens
        off = np.concatenate([[0], np.cumsum(per_pos)])
        is_err = np.ones(int(off[-1]), dtype=bool)
        em = np.nonzero(r.emitted)[0]
        is_err[off[em]] = (r.sub != src)[em]
        q = np.frombuffer(r.quals, dtype=np.uint8).astype(int) - 33
        err_q.append(q[is_err])
        ok_q.append(q[~is_err])
    err_mean = np.concatenate(err_q).mean()
    ok_mean = np.concatenate(ok_q).mean()
    assert err_mean < ok_mean - 5, (err_mean, ok_mean)


def test_constant_qual_mode():
    ds = simulate(genome_len=5000, n_reads=4, read_len=(1000, 2000),
                  seed=3, qual_mode="constant")
    assert all(r.quals is None for r in ds.reads)
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "r.fastq")
        ds.write_fastq(path)
        lines = open(path, "rb").read().split(b"\n")
        quals = lines[3]
        assert len(set(quals)) == 1  # flat Q40


def test_quals_flow_through_model():
    """The quality plane reaches the model: changing ONLY quals changes the
    logits (the channel is alive end-to-end through tensorize -> batch ->
    forward)."""
    import jax
    import numpy as np

    from herro_tpu.constants import N_ROWS
    from herro_tpu.models.model import TINY_CONFIG, CorrectionModel, init_params

    cfg = TINY_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = CorrectionModel(cfg)
    rng = np.random.default_rng(5)
    B, L, S = 1, 32, 4
    bases = rng.integers(0, 5, size=(B, N_ROWS, L)).astype(np.uint8)
    sidx = np.arange(S, dtype=np.int32)[None, :]
    smask = np.ones((B, S), dtype=bool)
    q1 = rng.uniform(-1, 1, size=(B, N_ROWS, L)).astype(np.float32)
    q2 = q1.copy()
    q2[:, 5:, :] = -q2[:, 5:, :]
    _, l1 = model.apply(params, bases, q1, sidx, smask)
    _, l2 = model.apply(params, bases, q2, sidx, smask)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
