"""Account for every host CPU second of the heavy-coverage e2e run.

The round-5 anomaly: the engine's featgen timer records ~2x the wall time a
standalone extract loop needs for the identical windows. On this one-core
host every thread (featgen/consumer, uploader, fetcher) time-slices the same
core, so any CPU the device bridge burns inflates the featgen thread's
wall-clock from *inside* its timed region. This tool runs the exact bench
heavy profile once with per-stage wall + per-thread CPU accounting:

* native featgen build phases (HT_PROF=1, ht_prof_dump);
* tensorize (vocab map + supported flatten, consumer thread);
* collate (batch padding + nibble pack, consumer thread);
* runner.dispatch (host->device upload, uploader thread);
* runner.finalize (fetch + unpack, fetcher thread);
* consensus stitch + FASTA write (consumer thread).

Usage: HT_PROF=1 python tools/profile_e2e.py [30|90]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("HT_PROF", "1")


class StageAcct:
    def __init__(self, name: str):
        self.name = name
        self.wall = 0.0
        self.cpu = 0.0
        self.calls = 0

    def wrap(self, fn):
        def inner(*a, **kw):
            w0 = time.perf_counter()
            c0 = time.thread_time()
            out = fn(*a, **kw)
            self.cpu += time.thread_time() - c0
            self.wall += time.perf_counter() - w0
            self.calls += 1
            return out

        return inner

    def row(self) -> str:
        return (
            f"  {self.name:18s} wall {self.wall:7.2f}s  cpu {self.cpu:7.2f}s"
            f"  ({self.calls} calls)"
        )


def main() -> None:
    prof = sys.argv[1] if len(sys.argv) > 1 else "90"
    if prof == "90":
        n_reads, genome_len = 264, 66_000
    else:
        n_reads, genome_len = 200, 150_000
    window_size, batch_size = 4096, 32

    from herro_tpu import native
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.models.checkpoint import load_model
    from herro_tpu.overlaps.paf import parse_paf
    from herro_tpu.pipeline import batching, engine
    from herro_tpu.pipeline.batching import BucketSpec
    from herro_tpu.pipeline.engine import StageTimers, run_correction
    from herro_tpu.pipeline.infer import CorrectionRunner
    from herro_tpu.training.simulate import paf_rows, simulate

    ds = simulate(
        genome_len=genome_len,
        n_reads=n_reads,
        read_len=(3 * window_size, 8 * window_size),
        sub_rate=0.02,
        ins_rate=0.02,
        del_rate=0.02,
        het_rate=0.005,
        seed=97,
    )
    rows = paf_rows(ds, min_overlap=window_size)
    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources",
        "model_r10_sim",
    )
    cfg, params = load_model(ckpt)
    runner = CorrectionRunner(cfg, params)

    from herro_tpu.features import extract as extract_mod

    acct = {
        k: StageAcct(k)
        for k in ("tensorize", "collate", "dispatch", "finalize", "extract")
    }
    engine.tensorize = acct["tensorize"].wrap(batching.tensorize)
    batching.collate = acct["collate"].wrap(batching.collate)
    # the engine imports extract_read_tensors inside run_correction, so
    # wrapping the module attribute catches the live path
    extract_mod.extract_read_tensors = acct["extract"].wrap(
        extract_mod.extract_read_tensors
    )
    runner.dispatch = acct["dispatch"].wrap(runner.dispatch)
    runner.finalize = acct["finalize"].wrap(runner.finalize)

    with tempfile.TemporaryDirectory() as tmp:
        fastq = os.path.join(tmp, "reads.fastq")
        ds.write_fastq(fastq)
        reads = load_reads(fastq, min_length=window_size)
        t0 = time.perf_counter()
        grouped = parse_paf(rows, reads.name_to_id)
        parse_s = time.perf_counter() - t0

        # warmup (compiles) over a quarter, same as bench
        warm = dict(list(grouped.items())[: max(6, len(grouped) // 4)])
        run_correction(
            reads, iter(warm.items()), runner,
            os.path.join(tmp, "warm.fasta"), window_size, batch_size,
            bucket_spec=BucketSpec(),
        )
        for a in acct.values():
            a.wall = a.cpu = 0.0
            a.calls = 0
        native.prof_dump(reset=True)

        n_windows = sum(
            -(-reads.length(rid) // window_size) for rid in grouped
        )
        timers = StageTimers()
        depth = int(os.environ.get("HT_DEPTH", "8"))
        w0 = time.perf_counter()
        c0 = time.process_time()
        run_correction(
            reads, iter(grouped.items()), runner,
            os.path.join(tmp, "corrected.fasta"), window_size, batch_size,
            bucket_spec=BucketSpec(), timers=timers, pipeline_depth=depth,
        )
        wall = time.perf_counter() - w0
        cpu = time.process_time() - c0

    print(f"profile={prof}x windows={n_windows} wall={wall:.2f}s "
          f"process_cpu={cpu:.2f}s -> {n_windows / wall:.1f} w/s")
    print(f"  engine featgen_s={timers.featgen_s:.2f} "
          f"device_stall_s={timers.device_s:.2f} batches={timers.n_batches}")
    print(f"  parse_paf {parse_s:.2f}s (outside the run)")
    for a in acct.values():
        print(a.row())
    nat = native.prof_dump()
    tot = nat.pop("total_build", 0.0)
    print(f"  native build total {tot:.2f}s:")
    for k, v in nat.items():
        print(f"    {k:18s} {v:7.2f}s")


if __name__ == "__main__":
    main()
