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


# ---------------------------------------------------------------------------
# systematic-error knobs (locus-correlated hotspots, strand bias, chimeras,
# coverage dropouts) — the real-data robustness proxy regimes
# ---------------------------------------------------------------------------


def _wrong_calls_by_position(ds):
    """{genome pos: [(read, wrong base)]} of emitted bases differing from the
    read's own haplotype."""
    out = {}
    for r in ds.reads:
        truth = ds.hap_seq(r.hap)[r.start : r.end]
        em = np.nonzero(r.emitted & (r.sub != truth))[0]
        for j in em:
            out.setdefault(r.start + int(j), []).append((r, r.sub[int(j)]))
    return out


def test_systematic_hotspots_share_wrong_base():
    """Hotspot miscalls are locus-correlated: every read covering a hotspot
    miscalls to the SAME base, so the wrong base can win a plurality."""
    ds = simulate(
        genome_len=6000,
        n_reads=30,
        read_len=(2000, 3000),
        sub_rate=0.0,
        ins_rate=0.0,
        del_rate=0.0,
        seed=21,
        sys_rate=0.01,
        sys_strength=(0.9, 0.95),
        sys_strand_frac=0.0,
    )
    calls = _wrong_calls_by_position(ds)
    multi = {g: v for g, v in calls.items() if len(v) >= 3}
    assert multi, "no hotspot accumulated 3+ wrong calls"
    for g, v in calls.items():
        wrongs = {b for _, b in v}
        assert len(wrongs) == 1, f"position {g} has inconsistent wrong bases"


def test_systematic_strand_bias():
    """With sys_strand_frac=1 every hotspot is gated to one stored strand:
    all wrong calls at a position come from reads of a single rc class."""
    ds = simulate(
        genome_len=6000,
        n_reads=40,
        read_len=(2000, 3000),
        sub_rate=0.0,
        ins_rate=0.0,
        del_rate=0.0,
        seed=22,
        sys_rate=0.01,
        sys_strength=(0.95, 1.0),
        sys_strand_frac=1.0,
    )
    calls = _wrong_calls_by_position(ds)
    n_multi = 0
    for g, v in calls.items():
        strands = {r.rc for r, _ in v}
        assert len(strands) == 1, f"position {g} miscalled on both strands"
        if len(v) >= 2:
            n_multi += 1
    assert n_multi >= 3


def test_systematic_miscalls_look_confident():
    """Hotspot miscalls draw correct-base (confident) qualities — unlike
    random substitutions, which draw from the low-Q error distribution.
    That is what makes them systematic: quality cannot flag them."""
    ds = simulate(
        genome_len=8000,
        n_reads=40,
        read_len=(3000, 4000),
        sub_rate=0.03,
        ins_rate=0.0,
        del_rate=0.0,
        seed=23,
        sys_rate=0.01,
        sys_strength=(0.9, 1.0),
        sys_strand_frac=0.0,
    )
    calls = _wrong_calls_by_position(ds)
    hot = {g for g, v in calls.items() if len(v) >= 3}  # systematic loci
    sys_q, rand_q = [], []
    for r in ds.reads:
        truth = ds.hap_seq(r.hap)[r.start : r.end]
        q = np.frombuffer(r.quals, dtype=np.uint8)
        if r.rc:
            q = q[::-1]
        offsets = r.fwd_cum  # fwd position of each genome slot
        for j in np.nonzero(r.emitted & (r.sub != truth))[0]:
            phred = int(q[int(offsets[int(j)])]) - 33
            (sys_q if r.start + int(j) in hot else rand_q).append(phred)
    assert len(sys_q) >= 20 and len(rand_q) >= 20
    assert np.mean(sys_q) > np.mean(rand_q) + 3.0, (
        np.mean(sys_q),
        np.mean(rand_q),
    )


def test_chimera_structure_and_alignments():
    """Chimeric reads: stored seq/quals concatenate the parts, truth arrays
    cover the whole read, and per-segment PAF rows are real alignments
    (M-run walk over the parent-offset coordinates)."""
    from herro_tpu.cigar.ops import M as OP_M
    from herro_tpu.training.simulate import read_truth_arrays

    ds = simulate(
        genome_len=20000,
        n_reads=14,
        read_len=(3000, 5000),
        sub_rate=0.02,
        ins_rate=0.01,
        del_rate=0.01,
        seed=24,
        chimera_rate=0.5,
    )
    chims = [r for r in ds.reads if r.parts is not None]
    assert chims, "no chimeras at rate 0.5"
    for r in chims:
        assert r.seq == b"".join(p.seq for p in r.parts)
        assert r.quals == b"".join(p.quals for p in r.parts)
        t = true_sequence(ds, r)
        assert len(t) == sum(p.end - p.start for p in r.parts)
        at, _ins = read_truth_arrays(ds, r)
        assert at.shape[0] == len(r.seq)

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".fastq") as fh:
        ds.write_fastq(fh.name)
        reads = load_reads(fh.name, min_length=1)
    rows = paf_rows(ds, min_overlap=800)
    grouped = parse_paf(rows, reads.name_to_id)
    n_checked = 0
    chim_targets = 0
    chim_ids = {reads.name_to_id[r.name] for r in chims}
    for tid, alns in grouped.items():
        tseq = reads.seq(tid)
        if tid in chim_ids:
            chim_targets += 1
        for aln in alns:
            qseq = _oriented_query(reads, aln)
            mism = total = 0
            for k in np.nonzero(aln.cigar.codes == OP_M)[0]:
                t0 = aln.tstart + int(aln.cigar.t_cum[k])
                q0 = int(aln.cigar.q_cum[k])
                l = int(aln.cigar.lens[k])
                mism += int(np.count_nonzero(tseq[t0 : t0 + l] != qseq[q0 : q0 + l]))
                total += l
            assert total > 0
            assert mism / total < 0.15, (tid, aln.qid, mism / total)
            n_checked += 1
    assert n_checked >= 20 and chim_targets >= 1


def test_dropout_thins_coverage():
    ds = simulate(
        genome_len=30000,
        n_reads=80,
        read_len=(2500, 4000),
        sub_rate=0.01,
        ins_rate=0.005,
        del_rate=0.005,
        seed=25,
        n_dropouts=1,
        dropout_len=(5000, 8000),
        dropout_keep=0.05,
    )
    assert len(ds.dropouts) == 1
    d0, d1 = ds.dropouts[0]
    cov = np.zeros(30000, dtype=np.int32)
    for r in ds.reads:
        cov[r.start : r.end] += 1
    inside = cov[d0:d1].mean()
    outside_mask = np.ones(30000, dtype=bool)
    outside_mask[max(0, d0 - 4000) : min(30000, d1 + 4000)] = False
    outside = cov[outside_mask].mean()
    assert inside < 0.5 * outside, (inside, outside)


def test_eval_systematic_profile_smoke():
    """eval --profile systematic: runs end to end, scores are finite, and
    chimeric reads split into multiple fragments at the junction."""
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.training.eval import SIM_PROFILES, evaluate

    cfg, params = load_or_init("tiny")
    prof = dict(SIM_PROFILES["systematic"])
    prof["chimera_rate"] = 0.3  # small n_reads: make junctions likely
    prof["dropout_len"] = (1000, 2000)  # scaled to the 8kb toy genome
    res = evaluate(
        cfg,
        params,
        window_size=512,
        genome_len=8000,
        n_reads=28,
        het_rate=0.005,
        seed=11,
        batch_size=4,
        mode="counting",
        sim_extra=prof,
    )
    d = res.as_dict()
    assert np.isfinite(d["corrected_infix_q"])
    # full-read identity is trim/split-charged under this stress (junction
    # splits + dropout-uncovered spans), so the per-base claim is infix:
    # covered spans must still come out far cleaner than the raw reads.
    assert d["corrected_infix_q"] > d["raw_q"] + 5.0
    assert d["n_fragments"] > d["n_reads"], "no junction splits recorded"
