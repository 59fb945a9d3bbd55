"""Truth-mapping alignment kernel tests: native/numpy parity, span and
count sanity, and the eval score accumulator on known-perfect input."""

import numpy as np
import pytest

from herro_tpu import native
from herro_tpu.utils.align import (
    _fit_align_np,
    align_to_truth,
    estimate_diagonal,
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _mutate(s, sub, ind, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < ind / 2:
            continue  # deletion
        if r < ind:
            out.append(c)
            out.append(rng.choice(BASES))  # insertion
        elif rng.random() < sub:
            out.append(rng.choice(BASES))
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


@pytest.mark.parametrize("seed", range(8))
def test_fit_align_native_numpy_parity(seed):
    if not native.available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(seed)
    m = int(rng.integers(400, 2500))
    b = rng.choice(BASES, size=m)
    j0 = int(rng.integers(0, m // 3))
    j1 = int(rng.integers(2 * m // 3, m))
    a = _mutate(b[j0:j1], 0.01, 0.01, rng)
    d0 = estimate_diagonal(a, b)
    rn = native.fit_align(a, b, d0, 64)
    rp = _fit_align_np(a, b, d0, 64)
    assert (rn is None) == (rp is None)
    if rn is None:
        return
    dn, b2an, insn, spann, cn = rn
    dp, b2ap, insp, spanp, cp = rp
    assert dn == dp
    assert spann == spanp
    assert np.array_equal(b2an, b2ap)
    assert np.array_equal(insn, insp)
    assert np.array_equal(cn, cp)
    assert dn == cn[1] + cn[2] + cn[3]  # distance == subs + ins + dels


def test_align_to_truth_locates_mid_fragment():
    rng = np.random.default_rng(7)
    b = rng.choice(BASES, size=3000)
    a = _mutate(b[100:2900], 0.005, 0.005, rng)
    ta = align_to_truth(a.tobytes(), b.tobytes())
    assert ta is not None
    assert 80 <= ta.j0 <= 120 and 2880 <= ta.j1 <= 2920
    ident = ta.matches / (ta.matches + ta.subs + ta.ins + ta.dels)
    assert ident > 0.98


def test_align_perfect_fragment_zero_errors():
    rng = np.random.default_rng(1)
    b = rng.choice(BASES, size=1200)
    a = b[200:1000].copy()
    ta = align_to_truth(a.tobytes(), b.tobytes())
    assert ta.distance == 0
    assert (ta.j0, ta.j1) == (200, 1000)
    assert ta.subs == ta.ins == ta.dels == 0
    assert np.array_equal(ta.b2a[200:1000], a)
    assert ta.ins_after.sum() == 0


def test_score_accumulator_perfect_correction():
    """Feeding the exact truth as 'corrected' yields zero errors and 100%
    het preservation."""
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.training.eval import ScoreAccumulator, score_fragments
    from herro_tpu.training.simulate import simulate, true_sequence

    ds = simulate(
        genome_len=8000,
        n_reads=10,
        read_len=(1500, 3000),
        het_rate=0.01,
        seed=5,
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "r.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=100)
        fasta = os.path.join(tmp, "c.fasta")
        with open(fasta, "wb") as fh:
            for r in ds.reads:
                fh.write(b">" + r.name + b"\n" + true_sequence(ds, r) + b"\n")
        acc = ScoreAccumulator()
        score_fragments(ds, reads, fasta, acc)

    assert acc.n_reads == 10
    assert acc.subs == acc.ins == acc.dels == 0
    assert acc.het_covered > 0
    assert acc.het_preserved == acc.het_covered
    d = acc.as_dict()
    assert d["het"]["accuracy"] == 1.0
    assert d["homopolymer"]["hp_err_rate"] == 0.0


def test_score_split_read_combines_fragments():
    """Full-read identity covers ALL fragments of a split read: two perfect
    fragments with a small uncovered gap score ~1 - gap/len, not the ~50%
    the old longest-fragment definition gave."""
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.training.eval import ScoreAccumulator, score_fragments
    from herro_tpu.training.simulate import simulate, true_sequence

    ds = simulate(
        genome_len=9000, n_reads=4, read_len=(4000, 5000), het_rate=0.0, seed=9
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "r.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=100)
        fasta = os.path.join(tmp, "c.fasta")
        gap = 100
        with open(fasta, "wb") as fh:
            for r in ds.reads:
                t = true_sequence(ds, r)
                half = len(t) // 2
                fh.write(b">" + r.name + b":0\n" + t[:half] + b"\n")
                fh.write(b">" + r.name + b":1\n" + t[half + gap :] + b"\n")
        acc = ScoreAccumulator()
        score_fragments(ds, reads, fasta, acc)

    assert acc.n_fragments == 8
    for ident, r in zip(acc.read_idents, ds.reads):
        expected = 1.0 - gap / (r.end - r.start)
        assert abs(ident - expected) < 0.01, (ident, expected)


def test_evaluate_counting_mode_smoke():
    """The counting decode improves raw reads and emits the new breakdown."""
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.training.eval import evaluate

    cfg, params = load_or_init("tiny")
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
    )
    d = res.as_dict()
    assert d["mode"] == "counting"
    assert res.corrected_identity > res.raw_identity
    assert "het" in d and "homopolymer" in d and "errors" in d


def test_evaluate_oracle_beats_counting():
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.training.eval import evaluate

    cfg, params = load_or_init("tiny")
    kw = dict(
        window_size=512,
        genome_len=8000,
        n_reads=28,
        het_rate=0.005,
        seed=11,
        batch_size=4,
    )
    res_c = evaluate(cfg, params, mode="counting", **kw)
    res_o = evaluate(cfg, params, mode="oracle", **kw)
    assert res_o.corrected_infix_q >= res_c.corrected_infix_q
    assert (
        res_o.scores["het"]["accuracy"] >= res_c.scores["het"]["accuracy"]
    )


def test_evaluate_with_baseline_single_pass():
    """One pipeline pass emits both the model and counting decodes of the
    identical features, plus the matched-seed gain."""
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.training.eval import evaluate

    cfg, params = load_or_init("tiny")
    res = evaluate(
        cfg,
        params,
        window_size=512,
        genome_len=8000,
        n_reads=28,
        het_rate=0.005,
        seed=11,
        batch_size=4,
        with_baseline=True,
    )
    d = res.as_dict()
    assert "counting_baseline" in d and "model_gain_db" in d
    assert d["counting_baseline"]["n_reads"] == d["n_reads"]
