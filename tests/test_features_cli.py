"""`features` subcommand end-to-end: CLI -> per-read npy dump directories in
the reference's FeatsGenOutput layout (src/features.rs:724-839), round-tripped
and checked against direct extraction."""

import os

import numpy as np
import pytest

from herro_tpu.cli import main as cli_main
from herro_tpu.features.extract import extract_read_features
from herro_tpu.features.npy import load_window_features
from herro_tpu.io.fastx import load_reads
from herro_tpu.overlaps.batches import BatchWriter
from herro_tpu.overlaps.paf import parse_paf
from herro_tpu.training.simulate import paf_rows, simulate

WINDOW = 512


@pytest.fixture(scope="module")
def dumped(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fcli")
    ds = simulate(
        genome_len=4000,
        n_reads=20,
        read_len=(1200, 1900),
        sub_rate=0.02,
        ins_rate=0.01,
        del_rate=0.01,
        seed=31,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    rows = paf_rows(ds, min_overlap=300)
    alns_dir = tmp / "alns"
    alns_dir.mkdir()
    with BatchWriter(str(alns_dir), 0, [r.name for r in ds.reads]) as w:
        for line in rows:
            w.write(line)

    out = tmp / "feats"
    cli_main(
        [
            "features",
            "--read-alns", str(alns_dir),
            "-w", str(WINDOW),
            str(fastq),
            str(out),
        ]
    )
    return ds, str(fastq), rows, str(out)


def test_layout(dumped):
    ds, fastq, rows, out = dumped
    read_dirs = sorted(os.listdir(out))
    assert read_dirs, "no per-read directories written"
    d0 = os.path.join(out, read_dirs[0])
    files = sorted(os.listdir(d0))
    wids = {f.split(".")[0] for f in files}
    for wid in wids:
        assert f"{wid}.features.npy" in files
        assert f"{wid}.supported.npy" in files
        assert f"{wid}.ids.txt" in files

    feats = np.load(os.path.join(d0, f"{sorted(wids)[0]}.features.npy"))
    assert feats.dtype == np.uint8
    assert feats.ndim == 3 and feats.shape[0] == 2 and feats.shape[2] == 31

    sup = np.load(os.path.join(d0, f"{sorted(wids)[0]}.supported.npy"))
    assert sup.dtype.names == ("pos", "ins")


def test_roundtrip_matches_direct_extraction(dumped):
    ds, fastq, rows, out = dumped
    reads = load_reads(fastq, min_length=WINDOW)
    grouped = parse_paf(list(rows), reads.name_to_id)

    checked = 0
    for rid, alns in list(grouped.items())[:4]:
        name = reads.ids[rid].decode()
        feats = extract_read_features(rid, reads, alns, WINDOW)
        for wf in feats:
            bases, quals, sup = load_window_features(
                os.path.join(out, name), wf.wid
            )
            np.testing.assert_array_equal(bases, wf.bases)
            np.testing.assert_array_equal(quals, wf.quals)
            np.testing.assert_array_equal(sup, wf.supported)
            checked += 1
    assert checked > 4
