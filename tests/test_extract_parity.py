"""Whole-pipeline featgen parity: the batched native path (one WindowBatch
call per window) must produce byte-identical windows to the pure-numpy
fallbacks."""

import numpy as np
import pytest

import herro_tpu.native as native
from herro_tpu.features.extract import extract_read_features
from herro_tpu.io.fastx import load_reads
from herro_tpu.overlaps.paf import parse_paf
from herro_tpu.training.simulate import paf_rows, simulate

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("xp")
    ds = simulate(
        genome_len=5000,
        n_reads=30,
        read_len=(1200, 2200),
        sub_rate=0.03,
        ins_rate=0.015,
        del_rate=0.015,
        het_rate=0.01,
        seed=77,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    reads = load_reads(str(fastq), min_length=256)
    grouped = parse_paf(paf_rows(ds, min_overlap=300), reads.name_to_id)
    return reads, grouped


def _assert_same(a, b):
    for fn, fp in zip(a, b):
        assert len(fn) == len(fp)
        for wn, wp in zip(fn, fp):
            assert wn.wid == wp.wid and wn.n_alns == wp.n_alns
            assert wn.qids == wp.qids
            np.testing.assert_array_equal(wn.bases, wp.bases)
            np.testing.assert_array_equal(wn.quals, wp.quals)
            np.testing.assert_array_equal(wn.supported, wp.supported)


def test_batched_native_matches_numpy(dataset, monkeypatch):
    """Three-way: read-level native == window-batched native == pure numpy."""
    import herro_tpu.features.extract as extract_mod

    reads, grouped = dataset
    items = list(grouped.items())[:8]

    read_level = [
        extract_read_features(rid, reads, alns, 512) for rid, alns in items
    ]
    monkeypatch.setattr(extract_mod, "_READ_LEVEL", False)
    window_batched = [
        extract_read_features(rid, reads, alns, 512) for rid, alns in items
    ]
    monkeypatch.setattr(native, "available", lambda: False)
    numpy_out = [
        extract_read_features(rid, reads, alns, 512) for rid, alns in items
    ]

    _assert_same(read_level, window_batched)
    _assert_same(window_batched, numpy_out)
