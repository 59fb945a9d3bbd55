"""Smoke test over the committed "real-like" PAF fixture.

tests/data/real_like.paf.zst is a frozen minimap2-ava-ont-shaped PAF (full
tag columns, mapq 255, M-form CIGARs on a third of the rows, and the
pathologies real all-vs-all files contain: unknown names, self-overlaps,
secondary duplicate rows, missing cg:Z:, corrupt fields, a CRLF row, a
truncated final line — see tools/make_paf_fixture.py for provenance; a
captured real run is impossible in this environment because minimap2 is not
installed). It drives parse -> window -> featurize -> consensus over
genuinely messy rows rather than pristine simulator output
(src/mm2.rs:15-37, src/overlaps.rs:117-202).
"""

import gzip
import os

import numpy as np
import pytest
import zstandard as zstd

DATA = os.path.join(os.path.dirname(__file__), "data")
PAF = os.path.join(DATA, "real_like.paf.zst")
FASTQ = os.path.join(DATA, "real_like.fastq.gz")


@pytest.fixture(scope="module")
def paf_lines():
    with open(PAF, "rb") as fh:
        raw = zstd.ZstdDecompressor().decompress(fh.read())
    return raw.split(b"\n")


@pytest.fixture(scope="module")
def reads(tmp_path_factory):
    from herro_tpu.io.fastx import load_reads

    return load_reads(FASTQ, min_length=1024)


def test_parse_stats_pinned(paf_lines, reads):
    """Every pathology lands in its ParseStats pocket; counts are frozen."""
    from herro_tpu.overlaps.paf import ParseStats, parse_paf

    st = ParseStats()
    grouped = parse_paf(paf_lines, reads.name_to_id, stats=st)

    assert st.n_rows == 266
    assert st.n_kept == 255
    assert st.n_unknown_id == 1  # superset-run row
    # self-overlap + secondary duplicate + 3 originals whose pair was
    # consumed by a skipped first row (first-row-per-pair even when bad)
    assert st.n_filtered == 5
    # corrupt coordinate, too-few-fields, truncated final line
    assert st.n_malformed == 3
    assert st.n_no_cigar == 1
    assert st.n_bad_cigar == 1  # 50S... soft-clip CIGAR
    assert sum(len(v) for v in grouped.values()) == st.n_kept
    assert len(grouped) == 26  # every read got overlaps


def test_m_form_cigars_survive(paf_lines, reads):
    """A third of the fixture rows carry M-form CIGARs (no --eqx): they must
    parse and featurize like =/X rows do."""
    from herro_tpu.overlaps.paf import parse_paf

    grouped = parse_paf(paf_lines, reads.name_to_id)
    has_m = 0
    for alns in grouped.values():
        for a in alns:
            codes = a.cigar.codes
            if (codes == 0).any():  # op 'M'
                has_m += 1
    assert has_m > 50


def test_end_to_end_over_fixture(tmp_path, paf_lines, reads):
    """parse -> window -> featurize -> counting consensus over the messy
    fixture: every target read with overlaps yields a corrected record made
    of ACGT bytes, and the correction moves reads toward each other (the
    smoke criterion — no model needed, counting-only decode)."""
    import jax

    from herro_tpu.models.model import TINY_CONFIG, init_params
    from herro_tpu.overlaps.paf import parse_paf
    from herro_tpu.pipeline.batching import BucketSpec
    from herro_tpu.pipeline.engine import run_correction
    from herro_tpu.pipeline.infer import CorrectionRunner

    grouped = parse_paf(paf_lines, reads.name_to_id)
    cfg = TINY_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    runner = CorrectionRunner(cfg, params, counting_only=True)
    out = tmp_path / "c.fasta"
    n = run_correction(
        reads,
        iter(sorted(grouped.items())),
        runner,
        str(out),
        window_size=1024,
        batch_size=8,
        bucket_spec=BucketSpec(
            lengths=(1536, 2048, 3072, 4096), sup_fractions=(0.25, 1.0)
        ),
    )
    assert n == len(grouped)
    data = out.read_bytes()
    seqs = [
        ln for ln in data.split(b"\n") if ln and not ln.startswith(b">")
    ]
    assert seqs and all(set(s) <= set(b"ACGT") for s in seqs)
