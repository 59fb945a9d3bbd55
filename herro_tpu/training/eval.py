"""Correction-quality evaluation on held-out simulated data.

Runs the full production pipeline (features -> model -> fused consensus ->
stitching) on a fresh simulated dataset and scores corrected reads against
the known truth: per-base identity and Q-score, versus the raw reads and
versus a counting-only decode (model disabled). The reference publishes
quality as downstream assembly stats (BASELINE.md); this is the
framework-local equivalent gate.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass

import numpy as np

from ..io.fastx import load_reads
from ..overlaps.paf import parse_paf
from ..pipeline.batching import BucketSpec
from ..pipeline.engine import run_correction
from ..pipeline.infer import CorrectionRunner
from ..utils.edist import identity, infix_identity, qscore
from .simulate import SimDataset, paf_rows, simulate, true_sequence


@dataclass
class EvalResult:
    n_reads: int
    raw_identity: float
    corrected_identity: float
    raw_q: float
    corrected_q: float
    # per-base identity of corrected fragments over the truth span they cover
    # (free end-gaps: doesn't charge the by-design window trimming)
    corrected_infix_identity: float = 0.0
    corrected_infix_q: float = 0.0

    def as_dict(self) -> dict:
        return self.__dict__.copy()


def _score(
    ds: SimDataset, reads, fasta_path: str
) -> tuple[float, float, float]:
    by_name: dict[bytes, list[bytes]] = {}
    name = None
    with open(fasta_path, "rb") as fh:
        for line in fh:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">"):
                name = line[1:].split(b" ")[0].rsplit(b":", 1)[0]
                by_name.setdefault(name, []).append(b"")
            elif line and name is not None:
                by_name[name][-1] += line

    idents = []
    raw_idents = []
    infix_idents = []
    for r in ds.reads:
        frags = by_name.get(r.name)
        if not frags:
            continue
        truth = true_sequence(ds, r)
        # score the longest fragment against the truth (split reads rare)
        corrected = max(frags, key=len)
        idents.append(identity(corrected, truth))
        infix_idents.append(infix_identity(corrected, truth))
        rid = reads.name_to_id[r.name]
        raw_idents.append(identity(reads.seq(rid).tobytes(), truth))
    return (
        float(np.mean(raw_idents)),
        float(np.mean(idents)),
        float(np.mean(infix_idents)),
    )


def evaluate(
    cfg,
    params,
    window_size: int = 4096,
    genome_len: int = 120_000,
    n_reads: int = 120,
    sub_rate: float = 0.02,
    ins_rate: float = 0.02,
    del_rate: float = 0.02,
    het_rate: float = 0.0,
    seed: int = 12345,
    batch_size: int = 16,
    bucket_spec: BucketSpec | None = None,
    counting_only: bool = False,
) -> EvalResult:
    ds = simulate(
        genome_len=genome_len,
        n_reads=n_reads,
        read_len=(3 * window_size, 8 * window_size),
        sub_rate=sub_rate,
        ins_rate=ins_rate,
        del_rate=del_rate,
        het_rate=het_rate,
        seed=seed,
    )
    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "reads.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=window_size)
        grouped = parse_paf(
            paf_rows(ds, min_overlap=window_size), reads.name_to_id
        )

        runner = CorrectionRunner(cfg, params, counting_only=counting_only)
        out = os.path.join(tmp, "corrected.fasta")
        n = run_correction(
            reads,
            iter(grouped.items()),
            runner,
            out,
            window_size,
            batch_size,
            bucket_spec=bucket_spec,
        )
        raw_i, cor_i, infix_i = _score(ds, reads, out)

    return EvalResult(
        n_reads=n,
        raw_identity=raw_i,
        corrected_identity=cor_i,
        raw_q=qscore(raw_i),
        corrected_q=qscore(cor_i),
        corrected_infix_identity=infix_i,
        corrected_infix_q=qscore(infix_i),
    )
