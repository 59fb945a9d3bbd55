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


def test_tensor_emit_matches_tensorize(dataset, monkeypatch):
    """The device-layout native emit (ht_read_emit_tensors) must reproduce
    tensorize()+pack byte-for-byte, both per window and through collate, and
    the fallback path must produce the identical layout."""
    import herro_tpu.features.extract as extract_mod
    from herro_tpu.features.extract import extract_read_tensors
    from herro_tpu.pipeline.batching import collate, pack_tokens, tensorize

    reads, grouped = dataset
    items = list(grouped.items())[:8]

    for rid, alns in items:
        ref = [
            tensorize(wf)
            for wf in extract_read_features(rid, reads, alns, 512)
        ]
        fast = extract_read_tensors(rid, reads, alns, 512)
        monkeypatch.setattr(extract_mod, "_READ_LEVEL", False)
        fallback = extract_read_tensors(rid, reads, alns, 512)
        monkeypatch.setattr(extract_mod, "_READ_LEVEL", True)
        assert len(ref) == len(fast) == len(fallback)
        for a, b, c in zip(ref, fast, fallback):
            assert b.tokens_packed is not None and b.tokens is None
            want_packed = np.ascontiguousarray(pack_tokens(a.tokens).T)
            for got in (b, c):
                np.testing.assert_array_equal(want_packed, got.tokens_packed)
                np.testing.assert_array_equal(
                    np.ascontiguousarray(a.quals.T), got.quals_rm
                )
                np.testing.assert_array_equal(
                    a.support_flat.astype(np.int32), got.support_flat
                )
                assert a.n_alns == got.n_alns and a.length == got.length
            # tokens_lc reconstructs the [L, 31] vocab matrix for the
            # host-side counting decode of no-supported windows
            np.testing.assert_array_equal(a.tokens, b.tokens_lc())

        n = min(len(ref), 4)
        if n:
            L = max(w.length for w in ref[:n])
            L = -(-L // 256) * 256
            S = max(max((w.n_supported for w in ref[:n]), default=1), 1)
            ba = collate(ref[:n], L, S, n + 1)
            bb = collate(fast[:n], L, S, n + 1)
            np.testing.assert_array_equal(ba.tokens_packed, bb.tokens_packed)
            np.testing.assert_array_equal(ba.quals, bb.quals)
            np.testing.assert_array_equal(ba.support_idx, bb.support_idx)
            np.testing.assert_array_equal(ba.support_mask, bb.support_mask)
            np.testing.assert_array_equal(ba.n_alns, bb.n_alns)
