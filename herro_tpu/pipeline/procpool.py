"""Process-based feature-generation workers.

The reference dedicates ``-t`` OS threads per device to feature generation
(src/lib.rs:159-187; 8 per GPU needed to keep a V100 fed, README.md:96) —
real parallelism because Rust. Python threads only overlap inside the
GIL-releasing native kernels; the numpy glue between them serialises at
higher thread counts. Worker *processes* sidestep the GIL entirely: the
read set's 2-bit sequence arena and qual arena are inherited **zero-copy
through fork** (copy-on-write pages that are never written), which is
exactly what the single-arena layout was designed for (io/seqstore.py).

Dataflow mirrors the reference's featgen fan-in: a bounded task queue of
(rid, alignments) items, N workers running extract_read_features (+
tensorize), and one bounded result queue draining into the consumer thread,
which keeps batching/consensus state lock-free. Workers never touch JAX —
the device lives in the parent only.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as queue_mod
import sys
import threading
import traceback
from typing import Callable, Iterable

from ..constants import INFER_CHANNEL_CAP_FACTOR
from ..features.extract import extract_read_features
from ..io.fastx import ReadSet

# Fork-inherited worker state: set in the parent immediately before the
# workers are forked, read by the children. Fork gives every child the same
# arenas without copying or pickling them.
_WORKER_STATE: dict = {}


def _worker_loop(task_q, result_q, window_size: int, do_tensorize: bool):
    import time as _time

    reads: ReadSet = _WORKER_STATE["reads"]
    if do_tensorize:
        from ..pipeline.batching import tensorize

    while True:
        item = task_q.get()
        if item is None:
            result_q.put(None)
            return
        rid, alns = item
        try:
            t0 = _time.perf_counter()
            feats = extract_read_features(rid, reads, alns, window_size)
            out = [tensorize(wf) for wf in feats] if do_tensorize else feats
            dt = _time.perf_counter() - t0
        except BaseException:
            result_q.put(("error", rid, traceback.format_exc()))
            result_q.put(None)
            return
        result_q.put((out, dt))


def can_fork() -> bool:
    return "fork" in mp.get_all_start_methods()


def parallel_featgen_procs(
    reads: ReadSet,
    aln_source: Iterable,
    window_size: int,
    n_procs: int,
    handle_window: Callable,
    timers=None,
    tensorized: bool = True,
) -> None:
    """Fan (rid, alignments) items over ``n_procs`` forked feature workers.

    ``handle_window`` runs on the calling thread for every produced window
    (WindowTensors when ``tensorized``, WindowFeatures otherwise), so
    downstream batching/consensus state needs no locks.
    """
    assert can_fork(), "process featgen needs the fork start method (POSIX)"
    ctx = mp.get_context("fork")
    task_q = ctx.Queue(maxsize=4 * n_procs)
    result_q = ctx.Queue(
        maxsize=max(2 * INFER_CHANNEL_CAP_FACTOR * n_procs, 4)
    )

    _WORKER_STATE["reads"] = reads
    workers = [
        ctx.Process(
            target=_worker_loop,
            args=(task_q, result_q, window_size, tensorized),
            daemon=True,
        )
        for _ in range(n_procs)
    ]
    for w in workers:
        w.start()
    _WORKER_STATE.clear()  # children hold their fork-time copy

    def feeder():
        # Feeding can block on the bounded task queue; run it on a thread so
        # the consumer below keeps draining results (no deadlock).
        try:
            for item in aln_source:
                task_q.put(item)
        finally:
            for _ in workers:
                task_q.put(None)

    feeder_t = threading.Thread(target=feeder, daemon=True)
    feeder_t.start()

    done = 0
    failure: tuple | None = None
    try:
        while done < len(workers):
            item = result_q.get()
            if item is None:
                done += 1
                continue
            if isinstance(item, tuple) and len(item) == 3 and item[0] == "error":
                _, rid, tb = item
                failure = (rid, tb)
                break
            out, dt = item
            if timers is not None:
                timers.featgen_s += dt
            for w in out:
                handle_window(w)
    finally:
        for w in workers:
            if failure is not None:
                w.terminate()
            w.join(timeout=30)
    if failure is not None:
        rid, tb = failure
        print(tb, file=sys.stderr)
        raise RuntimeError(f"feature worker process failed on read {rid}")
