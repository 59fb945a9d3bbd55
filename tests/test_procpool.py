"""Process-based featgen: byte-parity vs the serial path, error
propagation, and the features-subcommand wiring."""

import os

import numpy as np
import pytest

from herro_tpu.io.fastx import load_reads
from herro_tpu.overlaps.paf import parse_paf
from herro_tpu.pipeline.procpool import can_fork, parallel_featgen_procs
from herro_tpu.training.simulate import paf_rows, simulate

W = 512


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("proc")
    ds = simulate(genome_len=9000, n_reads=16, read_len=(1500, 3000), seed=33)
    fastq = tmp / "r.fastq"
    ds.write_fastq(str(fastq))
    reads = load_reads(str(fastq), min_length=W)
    grouped = parse_paf(paf_rows(ds, min_overlap=W), reads.name_to_id)
    return reads, grouped


def _collect_serial(reads, grouped):
    from herro_tpu.features.extract import extract_read_features
    from herro_tpu.pipeline.batching import tensorize

    out = {}
    for rid, alns in grouped.items():
        for wt in map(tensorize, extract_read_features(rid, reads, alns, W)):
            out[(wt.rid, wt.wid)] = wt
    return out


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_proc_featgen_byte_parity(dataset):
    reads, grouped = dataset
    serial = _collect_serial(reads, grouped)

    got = {}
    parallel_featgen_procs(
        reads,
        iter(grouped.items()),
        W,
        2,
        lambda wt: got.__setitem__((wt.rid, wt.wid), wt),
    )

    assert set(got) == set(serial)
    from herro_tpu.pipeline.batching import pack_tokens

    for key, wt in got.items():
        ref = serial[key]
        # pool workers emit device-layout windows (packed nibble rows +
        # row-major quals) — compare against the tensorize equivalent
        assert wt.tokens is None and wt.tokens_packed is not None
        assert (
            wt.tokens_packed.tobytes()
            == np.ascontiguousarray(pack_tokens(ref.tokens).T).tobytes()
        )
        assert wt.quals_rm.tobytes() == ref.quals.T.tobytes()
        assert wt.tokens_lc().tobytes() == ref.tokens.tobytes()
        assert np.array_equal(wt.support_flat, ref.support_flat)
        assert wt.n_alns == ref.n_alns and wt.n_total_wins == ref.n_total_wins


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_proc_featgen_error_propagates(dataset):
    reads, grouped = dataset
    bad = [(10**9, alns) for _, alns in list(grouped.items())[:1]]
    with pytest.raises(RuntimeError, match="feature worker process"):
        parallel_featgen_procs(reads, iter(bad), W, 2, lambda wt: None)


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_run_correction_with_procs_matches_serial(dataset, tmp_path):
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.pipeline.engine import run_correction
    from herro_tpu.pipeline.infer import CorrectionRunner

    reads, grouped = dataset
    cfg, params = load_or_init("tiny")
    runner = CorrectionRunner(cfg, params)

    serial_out = tmp_path / "serial.fasta"
    run_correction(reads, iter(grouped.items()), runner, str(serial_out), W, 4)
    proc_out = tmp_path / "proc.fasta"
    run_correction(
        reads, iter(grouped.items()), runner, str(proc_out), W, 4, feat_procs=2
    )

    def records(p):
        recs = {}
        name = None
        for line in p.read_bytes().splitlines():
            if line.startswith(b">"):
                name = line
                recs[name] = b""
            else:
                recs[name] += line
        return recs

    assert records(serial_out) == records(proc_out)


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_features_subcommand_procs(dataset, tmp_path, monkeypatch):
    """--feat-gen-procs on the features subcommand produces the identical
    npy tree as the serial run."""
    import subprocess
    import sys

    reads, grouped = dataset
    ds = simulate(genome_len=9000, n_reads=16, read_len=(1500, 3000), seed=33)
    fastq = tmp_path / "r.fastq"
    ds.write_fastq(str(fastq))
    from herro_tpu.overlaps.batches import BatchWriter

    os.makedirs(tmp_path / "batches", exist_ok=True)
    w = BatchWriter(str(tmp_path / "batches"), 0, [r.name for r in ds.reads])
    for line in paf_rows(ds, min_overlap=W):
        w.write(line)
    w.close()

    env = dict(os.environ, HERRO_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    for name, extra in (("serial", []), ("procs", ["--feat-gen-procs", "2"])):
        subprocess.run(
            [
                sys.executable, "-m", "herro_tpu.cli", "features",
                "--read-alns", str(tmp_path / "batches"),
                "-w", str(W), str(fastq), str(tmp_path / name), *extra,
            ],
            check=True,
            env=env,
            timeout=300,
        )

    serial_files = sorted(
        os.path.relpath(os.path.join(r, f), tmp_path / "serial")
        for r, _, fs in os.walk(tmp_path / "serial") for f in fs
    )
    procs_files = sorted(
        os.path.relpath(os.path.join(r, f), tmp_path / "procs")
        for r, _, fs in os.walk(tmp_path / "procs") for f in fs
    )
    assert serial_files == procs_files and serial_files
    for rel in serial_files:
        a = (tmp_path / "serial" / rel).read_bytes()
        b = (tmp_path / "procs" / rel).read_bytes()
        assert a == b, rel


def test_features_subcommand_threads(dataset, tmp_path):
    """-t 2 threads on the features subcommand produces the identical npy
    tree as the serial run (the tensorized=False threaded path)."""
    import subprocess
    import sys

    ds = simulate(genome_len=9000, n_reads=16, read_len=(1500, 3000), seed=33)
    fastq = tmp_path / "r.fastq"
    ds.write_fastq(str(fastq))
    from herro_tpu.overlaps.batches import BatchWriter

    os.makedirs(tmp_path / "batches", exist_ok=True)
    w = BatchWriter(str(tmp_path / "batches"), 0, [r.name for r in ds.reads])
    for line in paf_rows(ds, min_overlap=W):
        w.write(line)
    w.close()

    env = dict(os.environ, HERRO_TPU_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    for name, extra in (("tser", []), ("tthr", ["-t", "2"])):
        subprocess.run(
            [
                sys.executable, "-m", "herro_tpu.cli", "features",
                "--read-alns", str(tmp_path / "batches"),
                "-w", str(W), str(fastq), str(tmp_path / name), *extra,
            ],
            check=True, env=env, timeout=300,
        )
    a = sorted(
        os.path.relpath(os.path.join(r, f), tmp_path / "tser")
        for r, _, fs in os.walk(tmp_path / "tser") for f in fs
    )
    b = sorted(
        os.path.relpath(os.path.join(r, f), tmp_path / "tthr")
        for r, _, fs in os.walk(tmp_path / "tthr") for f in fs
    )
    assert a == b and a
    for rel in a:
        assert (tmp_path / "tser" / rel).read_bytes() == (
            tmp_path / "tthr" / rel
        ).read_bytes(), rel


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_pool_reuse_across_runs(dataset):
    """One FeatgenPool (forked before any device init) serves several runs —
    the CLI reuses it for warmup + timed passes."""
    from herro_tpu.pipeline.procpool import FeatgenPool

    reads, grouped = dataset
    serial = _collect_serial(reads, grouped)
    with FeatgenPool(reads, W, 2) as pool:
        for _ in range(3):
            got = {}
            pool.run(
                iter(grouped.items()),
                lambda wt: got.__setitem__((wt.rid, wt.wid), wt),
            )
            assert set(got) == set(serial)
            for key, wt in got.items():
                assert wt.tokens_lc().tobytes() == serial[key].tokens.tobytes()


@pytest.mark.skipif(not can_fork(), reason="fork unavailable")
def test_pool_detects_vanished_worker(dataset):
    """A worker killed without running its except handler (stand-in for a
    segfault/OOM-kill) is detected instead of hanging the run forever."""
    import os
    import signal
    import threading

    from herro_tpu.pipeline.procpool import FeatgenPool

    reads, grouped = dataset
    pool = FeatgenPool(reads, W, 2)

    def killer():
        for w in pool._workers:
            os.kill(w.pid, signal.SIGKILL)

    threading.Timer(0.5, killer).start()

    def slow_source():
        yield from iter(grouped.items())
        import time

        time.sleep(2.0)  # keep the run alive past the kill
        yield from iter(grouped.items())

    with pytest.raises(RuntimeError, match="died"):
        pool.run(slow_source(), lambda wt: None)
