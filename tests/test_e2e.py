"""End-to-end pipeline test: simulated reads -> PAF -> features -> tiny model
-> consensus -> corrected FASTA, all on CPU."""

import difflib

import jax
import numpy as np
import pytest

from herro_tpu.io.fastx import load_reads
from herro_tpu.models.model import TINY_CONFIG, init_params
from herro_tpu.overlaps.paf import parse_paf
from herro_tpu.pipeline.batching import BucketSpec
from herro_tpu.pipeline.engine import run_correction
from herro_tpu.pipeline.infer import CorrectionRunner
from herro_tpu.training.simulate import paf_rows, simulate, true_sequence

WINDOW = 256


@pytest.fixture(scope="module")
def corrected(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ds = simulate(
        genome_len=2500,
        n_reads=30,
        read_len=(900, 1600),
        sub_rate=0.01,
        ins_rate=0.005,
        del_rate=0.005,
        seed=11,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    reads = load_reads(str(fastq), min_length=WINDOW)
    grouped = parse_paf(paf_rows(ds, min_overlap=200), reads.name_to_id)

    cfg = TINY_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    runner = CorrectionRunner(cfg, params)

    out = tmp / "corrected.fasta"
    n = run_correction(
        reads,
        iter(grouped.items()),
        runner,
        str(out),
        window_size=WINDOW,
        batch_size=4,
        bucket_spec=BucketSpec(lengths=(320, 512, 1024), sup_fractions=(0.25, 1.0)),
    )
    return ds, reads, out.read_bytes(), n


def _parse_fasta(data: bytes) -> dict[bytes, bytes]:
    seqs = {}
    name = None
    for line in data.split(b"\n"):
        if line.startswith(b">"):
            name = line[1:].split(b" ")[0]
            seqs[name] = b""
        elif line and name is not None:
            seqs[name] += line
    return seqs


def test_pipeline_produces_output(corrected):
    ds, reads, fasta, n = corrected
    assert n > 0
    seqs = _parse_fasta(fasta)
    assert len(seqs) == n or len(seqs) >= n  # split reads add :i entries
    # each corrected read is within 20% of original length
    for name, seq in seqs.items():
        base = name.split(b":")[0]
        rid = reads.name_to_id[base]
        assert 0.5 < len(seq) / reads.length(rid) < 1.5


def test_pipeline_improves_reads(corrected):
    """Counting consensus alone should push reads toward the truth even with
    a random-weight model (supported columns are rare at these error rates)."""
    ds, reads, fasta, _ = corrected
    seqs = _parse_fasta(fasta)
    gains = []
    for name, seq in seqs.items():
        base = name.split(b":")[0]
        rid = reads.name_to_id[base]
        sim_read = next(r for r in ds.reads if r.name == base)
        truth = true_sequence(ds, sim_read)
        raw = reads.seq(rid).tobytes()
        if len(seq) < 0.8 * len(truth):
            continue  # split fragment; skip ratio comparison
        r_corr = difflib.SequenceMatcher(None, seq, truth).ratio()
        r_raw = difflib.SequenceMatcher(None, raw, truth).ratio()
        gains.append(r_corr - r_raw)
    assert gains, "no full-length corrected reads to compare"
    # median corrected read should be closer to truth than the raw read
    assert float(np.median(gains)) > 0.0, f"median gain {np.median(gains)}"
