"""Regenerate the frozen featurization golden fixture.

Run from the repo root:  python tests/make_golden.py

Freezes the byte-exact output of the full featurization path (windowing ->
long-indel filter -> accuracy sort -> pileup fill -> supported counting ->
haplotype re-rank) on a fixed-seed simulated dataset. The committed .npz is
compared bit-for-bit by tests/test_golden.py (v2: simulator emits informative per-base qualities, so the frozen qual plane carries real variation), catching byte-level
featurization regressions that relative native-vs-numpy parity cannot
(both paths drifting together). Port of the intent of the reference's
commented-out golden tests (src/windowing.rs:295-606).

Only regenerate when a semantic change to featurization is *intended*, and
re-derive the expectation from SURVEY.md first (see CLAUDE.md invariants).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = 1024
SEED = 424242


def build_windows():
    import tempfile

    from herro_tpu.features.extract import extract_read_features
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.overlaps.paf import parse_paf
    from herro_tpu.training.simulate import paf_rows, simulate

    ds = simulate(
        genome_len=16_000,
        n_reads=24,
        read_len=(2500, 5000),
        sub_rate=0.03,
        ins_rate=0.02,
        del_rate=0.02,
        het_rate=0.005,
        seed=SEED,
    )
    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "r.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=W)
        grouped = parse_paf(paf_rows(ds, min_overlap=W), reads.name_to_id)
        out = {}
        for rid in sorted(grouped)[:6]:  # 6 reads is plenty of surface
            for wf in extract_read_features(rid, reads, grouped[rid], W):
                key = f"{rid}_{wf.wid}"
                out[f"{key}_bases"] = wf.bases
                out[f"{key}_quals"] = wf.quals
                out[f"{key}_sup_pos"] = wf.supported["pos"]
                out[f"{key}_sup_ins"] = wf.supported["ins"]
                out[f"{key}_meta"] = np.array(
                    [wf.n_alns, wf.n_total_wins] + wf.qids, dtype=np.int64
                )
    return out


def build_windows_sys():
    """Systematic-regime fixture: locus-correlated strand-biased miscall
    hotspots + adapter chimeras + coverage dropouts all active, locking the
    round-4 simulator regimes (SimProfile ``sys*`` shards) byte-exact the
    same way featgen_v3 locks the standard path. Chimeric junction reads and
    dropout-thinned pileups exercise windowing/filter branches the standard
    fixture never reaches."""
    import tempfile

    from herro_tpu.features.extract import extract_read_features
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.overlaps.paf import parse_paf
    from herro_tpu.training.simulate import paf_rows, simulate

    ds = simulate(
        genome_len=16_000,
        n_reads=32,
        read_len=(2500, 5000),
        sub_rate=0.03,
        ins_rate=0.02,
        del_rate=0.02,
        het_rate=0.005,
        sys_rate=0.004,
        sys_strength=(0.4, 0.9),
        sys_strand_frac=0.5,
        chimera_rate=0.15,
        n_dropouts=2,
        dropout_len=(1_500, 3_000),
        dropout_keep=0.3,
        seed=SEED + 1,
    )
    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "r.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=W)
        grouped = parse_paf(paf_rows(ds, min_overlap=W), reads.name_to_id)
        out = {}
        for rid in sorted(grouped)[:8]:
            for wf in extract_read_features(rid, reads, grouped[rid], W):
                key = f"{rid}_{wf.wid}"
                out[f"{key}_bases"] = wf.bases
                out[f"{key}_quals"] = wf.quals
                out[f"{key}_sup_pos"] = wf.supported["pos"]
                out[f"{key}_sup_ins"] = wf.supported["ins"]
                out[f"{key}_meta"] = np.array(
                    [wf.n_alns, wf.n_total_wins] + wf.qids, dtype=np.int64
                )
    return out


def _write(builder, name):
    out = builder()
    path = os.path.join(os.path.dirname(__file__), "golden", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    total = sum(v.nbytes for v in out.values())
    print(f"wrote {path}: {len(out)} arrays, {total/1e6:.1f} MB raw")


if __name__ == "__main__":
    _write(build_windows, "featgen_v3.npz")
    _write(build_windows_sys, "featgen_sys_v1.npz")
