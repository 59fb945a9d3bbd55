"""Command-line interface.

Two subcommands mirroring the reference binary (src/main.rs:17-112):

    python -m herro_tpu.cli features  [--read-alns D | --write-alns D] \\
        [-w W] [-t N] READS OUTPUT_DIR
    python -m herro_tpu.cli inference [--read-alns D | --write-alns D] \\
        [-w W] [-t N] -m MODEL [-b B] [-c CLUSTER] [--devices ...] READS OUTPUT

``--devices`` takes a count of local TPU chips or an explicit index list
('0,1,3', like the reference's -d) to use data-parallel (default: all);
``--tp N`` adds tensor parallelism over a 2-D mesh; ``--coordinator`` /
``--num-processes`` / ``--process-id`` initialise the multi-host runtime.
"""

from __future__ import annotations

import argparse
import sys
import time

from .constants import DEFAULT_WINDOW_SIZE


def _add_common(p: argparse.ArgumentParser) -> None:
    g = p.add_mutually_exclusive_group()
    g.add_argument(
        "--read-alns",
        help="folder with *.oec.zst alignment batches to read",
    )
    g.add_argument(
        "--write-alns",
        help="folder where *.oec.zst alignment batches will be saved",
    )
    p.add_argument(
        "-w",
        "--window-size",
        type=int,
        default=DEFAULT_WINDOW_SIZE,
        help="target chunking window size (default 4096)",
    )
    p.add_argument(
        "-t",
        "--feat-gen-threads",
        type=int,
        default=1,
        help="feature generation threads (default 1)",
    )
    p.add_argument(
        "--feat-gen-procs",
        type=int,
        default=0,
        help="feature generation worker *processes* (GIL-free; read arenas "
        "shared zero-copy via fork). Overrides -t for featgen when > 1",
    )
    p.add_argument("reads", help="fastq reads, optionally gzipped (file or dir)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="herro-tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    pf = sub.add_parser("features", help="generate training features")
    _add_common(pf)
    pf.add_argument("output", help="folder where features will be stored")

    pi = sub.add_parser("inference", help="error-correct reads")
    _add_common(pi)
    pi.add_argument(
        "-m",
        "--model",
        required=True,
        help="model checkpoint dir, or a named config (tiny/r10/r9)",
    )
    pi.add_argument(
        "-b", "--batch-size", type=int, default=32, help="windows per device batch"
    )
    pi.add_argument(
        "-c", "--cluster", default="", help="path to a cluster .part file"
    )
    pi.add_argument(
        "--devices",
        default="0",
        help="local devices for data parallelism: a count, or an explicit "
        "index list like '0,1,3' (reference -d, src/main.rs:86-92); 0 = all",
    )
    pi.add_argument(
        "--tp",
        type=int,
        default=1,
        help="tensor-parallel degree (heads/FFN shard over a 2-D data x model "
        "mesh; must divide --devices). NOTE: tp > 1 runs the jnp twin kernels "
        "under GSPMD, not the fused pallas fast path — expect lower per-chip "
        "throughput than pure data parallelism",
    )
    pi.add_argument(
        "--int8",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="quantize the layer-stack matmuls to int8 (2x MXU rate on "
        "v5e); default follows the checkpoint config",
    )
    pi.add_argument(
        "--resume",
        action="store_true",
        help="append to an existing output, skipping already-corrected reads",
    )
    pi.add_argument(
        "--shard",
        default="",
        help="'i/n': correct only targets with rid %% n == i (multi-process "
        "sharding; combine per-shard outputs afterwards)",
    )
    pi.add_argument(
        "--pipeline-depth",
        type=int,
        default=8,
        help="device batches kept in flight (async dispatch depth; deeper "
        "pipelines hide per-batch device latency — on high-latency links "
        "throughput scales with depth until the link saturates)",
    )
    pi.add_argument(
        "--profile-dir",
        default="",
        help="write a jax.profiler trace of the run to this directory",
    )
    pi.add_argument(
        "--coordinator",
        default="",
        help="multi-host: coordinator address host:port for jax.distributed",
    )
    pi.add_argument(
        "--num-processes", type=int, default=0, help="multi-host: process count"
    )
    pi.add_argument(
        "--process-id", type=int, default=0, help="multi-host: this process's index"
    )
    pi.add_argument("output", help="corrected reads FASTA path")

    pt = sub.add_parser(
        "train", help="train a correction model (synthetic pretraining)"
    )
    pt.add_argument("--config", default="r10", help="model config name or ckpt dir")
    pt.add_argument("--steps", type=int, default=2000)
    pt.add_argument("--batch-size", type=int, default=32)
    pt.add_argument("--lr", type=float, default=3e-4)
    pt.add_argument("-w", "--window-size", type=int, default=DEFAULT_WINDOW_SIZE)
    pt.add_argument("--genome-len", type=int, default=200_000)
    pt.add_argument("--n-reads", type=int, default=400)
    pt.add_argument("--sub-rate", type=float, default=0.03)
    pt.add_argument("--indel-rate", type=float, default=0.04)
    pt.add_argument("--het-rate", type=float, default=0.005)
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument(
        "--data-cache",
        default="",
        help="cache path for the simulated labelled windows (featgen on one "
        "core takes minutes; restarts reuse the cache). A pickle file for "
        "the single-profile path, a directory with --curriculum",
    )
    pt.add_argument(
        "--curriculum",
        action="store_true",
        help="train on the pooled multi-regime curriculum (coverage 15-60x, "
        "R10/R9 error profiles, haploid/het shards) instead of one profile",
    )
    pt.add_argument(
        "--hard-weight",
        type=float,
        default=3.0,
        help="extra cross-entropy weight on columns where truth != target "
        "(0 = unweighted)",
    )
    pt.add_argument(
        "--max-len",
        type=int,
        default=0,
        help="pad every batch to one fixed window length instead of the "
        "(5120/8192/10240) production-width bucket ladder",
    )
    pt.add_argument(
        "--max-sup", type=int, default=640, help="padded supported count "
        "(only with --max-len)",
    )
    pt.add_argument(
        "--devices", default="0", help="devices: count or index list '0,1,3'"
    )
    pt.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    pt.add_argument("output", help="checkpoint output directory")

    pd = sub.add_parser(
        "distill",
        help="train a student model on teacher-labelled `features` dumps",
    )
    pd.add_argument("features_dir", help="output tree of the features subcommand")
    pd.add_argument("output", help="student checkpoint output directory")
    pd.add_argument("--teacher", required=True, help="teacher ckpt dir or config")
    pd.add_argument("--student", default="tiny", help="student config or ckpt dir")
    pd.add_argument("--steps", type=int, default=500)
    pd.add_argument("--batch-size", type=int, default=16)
    pd.add_argument("--lr", type=float, default=3e-4)
    pd.add_argument("--max-len", type=int, default=5120)
    pd.add_argument("--max-sup", type=int, default=640)
    pd.add_argument("--seed", type=int, default=0)

    pe = sub.add_parser(
        "eval", help="score correction quality on held-out simulated data"
    )
    pe.add_argument("model", help="checkpoint dir or named config")
    pe.add_argument("-w", "--window-size", type=int, default=DEFAULT_WINDOW_SIZE)
    pe.add_argument("-b", "--batch-size", type=int, default=16)
    pe.add_argument("--genome-len", type=int, default=120_000)
    pe.add_argument("--n-reads", type=int, default=120)
    pe.add_argument("--sub-rate", type=float, default=0.02)
    pe.add_argument("--indel-rate", type=float, default=0.04)
    pe.add_argument("--het-rate", type=float, default=0.005)
    pe.add_argument("--seed", type=int, default=12345)
    pe.add_argument(
        "--profile",
        choices=["systematic"],
        default=None,
        help="named simulator stress profile: 'systematic' adds "
        "locus-correlated confident miscalls (half strand-biased), "
        "adapter-chimera junction reads, and coverage dropouts "
        "(training/eval.py SIM_PROFILES)",
    )
    pe.add_argument(
        "--counting-only",
        action="store_true",
        help="diagnostic: decode with the counting rule only (model disabled "
        "at supported columns)",
    )
    pe.add_argument(
        "--mode",
        choices=["model", "counting", "oracle"],
        default=None,
        help="decode mode: model (default), counting (the floor), or oracle "
        "(truth at supported columns — the ceiling of any model)",
    )
    pe.add_argument(
        "--with-baseline",
        action="store_true",
        help="also decode the identical features with the counting rule and "
        "report the matched-seed model_gain_db",
    )
    pe.add_argument(
        "--int8",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="quantize the layer-stack matmuls to int8; default follows the "
        "checkpoint config",
    )
    pe.add_argument(
        "--shuffle-quals",
        action="store_true",
        help="ablation control: permute each read's quality string (seeded) "
        "before correction — the matched-seed gap vs a normal run is the "
        "quality channel's contribution",
    )
    return ap


def _parse_devices(spec, jax) -> "int | list[int]":
    """'0' -> all local devices (count); '4' -> 4; '0,1,3' -> index list."""
    spec = str(spec)
    if "," in spec:
        return [int(s) for s in spec.split(",") if s != ""]
    n = int(spec)
    return n or len(jax.local_devices())


def _build_mesh(n_dev, tp: int):
    """1-D data mesh, or a 2-D (data, model) mesh when tp > 1."""
    if isinstance(n_dev, list):
        if tp > 1:
            raise SystemExit("--tp with an explicit device list is unsupported")
        from .parallel.mesh import make_mesh

        # even a single-entry list pins the run to that specific chip
        return make_mesh(n_dev)
    if tp > 1:
        from .parallel.tensor import make_mesh_2d

        if n_dev % tp:
            raise SystemExit(f"--tp {tp} does not divide {n_dev} devices")
        return make_mesh_2d(n_dev // tp, tp)
    if n_dev > 1:
        from .parallel.mesh import make_mesh

        return make_mesh(n_dev)
    return None


def _load(args, core=None, neighbour=None):
    from .io.fastx import load_reads

    t0 = time.time()
    reads = load_reads(args.reads, args.window_size, core, neighbour)
    print(
        f"Parsed {len(reads)} reads in {time.time() - t0:.1f}s.",
        file=sys.stderr,
    )
    return reads


def cmd_features(args) -> None:
    from .features.extract import extract_read_features
    from .features.npy import write_window_features
    from .pipeline.engine import AlnMode, alignment_stream

    from .overlaps.paf import ParseStats
    from .pipeline.engine import _parallel_featgen

    reads = _load(args)
    mode = AlnMode(read_path=args.read_alns, write_path=args.write_alns)
    stats = ParseStats()
    source = alignment_stream(
        reads, args.reads, mode, args.feat_gen_threads, stats=stats
    )

    # Count reads at the (rid, alns) source level so the summary is
    # identical across the serial / threaded / process paths (zero-window
    # reads included everywhere).
    n_reads = 0

    def counted(src):
        nonlocal n_reads
        for item in src:
            n_reads += 1
            yield item

    source = counted(source)

    def handle(wf) -> None:
        write_window_features(args.output, reads, [wf])

    # Parallel featgen (reference: -t threads, src/lib.rs:84-104): worker
    # processes fork-share the read arenas; the npy writes stay on this
    # thread. Falls back to GIL-sharing threads, then serial.
    if args.feat_gen_procs > 1:
        from .pipeline.procpool import parallel_featgen_procs

        parallel_featgen_procs(
            reads, source, args.window_size, args.feat_gen_procs, handle,
            tensorized=False,
        )
    elif args.feat_gen_threads > 1:
        _parallel_featgen(
            reads, source, args.window_size, args.feat_gen_threads, handle,
            tensorized=False,
        )
    else:
        for rid, alns in source:
            feats = extract_read_features(rid, reads, alns, args.window_size)
            write_window_features(args.output, reads, feats)
    print(f"Generated features for {n_reads} reads.", file=sys.stderr)
    if stats.n_skipped:
        print(f"[herro-tpu] PAF ingest: {stats.summary()}", file=sys.stderr)


def cmd_inference(args) -> None:
    import jax

    from .io.fastx import read_cluster
    from .models.checkpoint import load_or_init
    from .parallel.mesh import init_distributed
    from .pipeline.engine import AlnMode, alignment_stream, run_correction
    from .pipeline.infer import CorrectionRunner

    core, neighbour = read_cluster(args.cluster)
    reads = _load(args, core, neighbour)

    # Fork the featgen worker pool BEFORE the first JAX use: forking a
    # process with a live device client (gRPC threads, held locks) can hang
    # the children. The arenas are inherited zero-copy; everything below
    # (distributed init, model load, mesh) happens only in the parent.
    featgen_pool = None
    if args.feat_gen_procs > 1:
        from .pipeline.procpool import FeatgenPool

        featgen_pool = FeatgenPool(reads, args.window_size, args.feat_gen_procs)

    if args.num_processes:
        init_distributed(
            args.coordinator or None, args.num_processes, args.process_id
        )

    cfg, params = load_or_init(args.model)
    n_dev = _parse_devices(args.devices, jax)
    mesh = _build_mesh(n_dev, args.tp)
    n_data = (len(n_dev) if isinstance(n_dev, list) else n_dev) // max(args.tp, 1)
    if mesh is not None and args.batch_size % n_data:
        raise SystemExit(
            f"batch size {args.batch_size} not divisible by data size {n_data}"
        )
    runner = CorrectionRunner(cfg, params, mesh=mesh, int8=args.int8)

    from .pipeline.engine import StageTimers
    from .pipeline.progress import Progress

    from .overlaps.paf import ParseStats

    progress = Progress()
    mode = AlnMode(read_path=args.read_alns, write_path=args.write_alns)
    paf_stats = ParseStats()
    # Multi-host (jax.distributed): each process takes every k-th
    # target-partitioned alignment batch and writes its own shard output.
    stride = (jax.process_index(), jax.process_count())
    output_path = args.output
    if stride[1] > 1:
        output_path = f"{args.output}.shard{stride[0]:03d}"
    source = alignment_stream(
        reads,
        args.reads,
        mode,
        args.feat_gen_threads,
        core=core,
        on_batch=progress.add_batch,
        stride=stride,
        stats=paf_stats,
    )

    if args.shard:
        i, _, n_shards = args.shard.partition("/")
        i, n_shards = int(i), int(n_shards)
        source = ((rid, a) for rid, a in source if rid % n_shards == i)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    timers = StageTimers()
    t0 = time.time()
    try:
        n = run_correction(
            reads,
            source,
            runner,
            output_path,
            args.window_size,
            args.batch_size,
            feat_threads=args.feat_gen_threads,
            on_read_done=lambda rid: progress.inc(),
            resume=args.resume,
            timers=timers,
            pipeline_depth=args.pipeline_depth,
            featgen_pool=featgen_pool,
        )
    finally:
        # Always tear the pool down: leaked worker queues wedge interpreter
        # shutdown on their feeder-thread join (see procpool.close).
        if featgen_pool is not None:
            featgen_pool.close(terminate=sys.exc_info()[0] is not None)
    if args.profile_dir:
        jax.profiler.stop_trace()
    progress.finish()
    print(
        f"Corrected {n} reads in {time.time() - t0:.1f}s "
        f"({timers.summary()}).",
        file=sys.stderr,
    )
    if paf_stats.n_skipped:
        print(f"[herro-tpu] PAF ingest: {paf_stats.summary()}", file=sys.stderr)


def cmd_train(args) -> None:
    import tempfile

    import jax

    from .models.checkpoint import load_or_init, save_model
    from .training.data import (
        batch_iterator,
        bucketed_batch_iterator,
        curriculum_windows,
        simulated_windows,
    )
    from .training.simulate import simulate
    from .training.train import Trainer

    cfg, params = load_or_init(args.config)
    n_dev = _parse_devices(args.devices, jax)
    mesh = _build_mesh(n_dev, args.tp)

    windows = None
    if args.curriculum:
        windows = curriculum_windows(
            args.window_size, cache_dir=args.data_cache or None
        )
    if windows is None and args.data_cache:
        import pickle

        try:
            with open(args.data_cache, "rb") as fh:
                windows = pickle.load(fh)
            print(
                f"Loaded {len(windows)} cached windows from {args.data_cache}.",
                file=sys.stderr,
            )
        except FileNotFoundError:
            pass
    if windows is None:
        print("Simulating training data...", file=sys.stderr)
        ds = simulate(
            genome_len=args.genome_len,
            n_reads=args.n_reads,
            read_len=(4 * args.window_size, 12 * args.window_size),
            sub_rate=args.sub_rate,
            ins_rate=args.indel_rate / 2,
            del_rate=args.indel_rate / 2,
            het_rate=args.het_rate,
            seed=args.seed,
        )
        with tempfile.TemporaryDirectory() as tmp:
            windows = simulated_windows(
                ds, f"{tmp}/reads.fastq", args.window_size
            )
        if args.data_cache:
            import pickle

            with open(args.data_cache, "wb") as fh:
                pickle.dump(windows, fh)
    print(f"{len(windows)} labelled windows.", file=sys.stderr)

    trainer = Trainer(
        cfg,
        params,
        lr=args.lr,
        total_steps=args.steps,
        mesh=mesh,
        hard_weight=args.hard_weight,
    )
    if args.max_len:
        it = batch_iterator(
            windows,
            args.batch_size,
            L=args.max_len,
            S=args.max_sup,
            n_epochs=10_000,
            seed=args.seed,
        )
    else:
        it = bucketed_batch_iterator(
            windows, args.batch_size, n_epochs=10_000, seed=args.seed
        )
    for batch in it:
        metrics = trainer.train_step(batch)
        if trainer.state.step % 50 == 0:
            print(
                f"step {trainer.state.step}: "
                + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                file=sys.stderr,
            )
        if trainer.state.step % 250 == 0:
            trainer.save(args.output)
        if trainer.state.step >= args.steps:
            break

    save_model(args.output, cfg, trainer.state.params)
    print(f"Saved checkpoint to {args.output}", file=sys.stderr)


def cmd_distill(args) -> None:
    from .training.distill import distill_from_dump

    res = distill_from_dump(
        args.features_dir,
        args.teacher,
        args.student,
        args.output,
        steps=args.steps,
        batch_size=args.batch_size,
        lr=args.lr,
        max_len=args.max_len,
        max_sup=args.max_sup,
        seed=args.seed,
    )
    print(
        f"Distilled {res['n_windows']} windows -> {args.output} "
        f"(final {res['final']})",
        file=sys.stderr,
    )


def cmd_eval(args) -> None:
    import json

    from .models.checkpoint import load_or_init
    from .training.eval import SIM_PROFILES, evaluate

    cfg, params = load_or_init(args.model)
    res = evaluate(
        cfg,
        params,
        window_size=args.window_size,
        genome_len=args.genome_len,
        n_reads=args.n_reads,
        sub_rate=args.sub_rate,
        ins_rate=args.indel_rate / 2,
        del_rate=args.indel_rate / 2,
        het_rate=args.het_rate,
        seed=args.seed,
        batch_size=args.batch_size,
        counting_only=args.counting_only,
        mode=args.mode,
        with_baseline=args.with_baseline,
        int8=args.int8,
        shuffle_quals=args.shuffle_quals,
        sim_extra=SIM_PROFILES[args.profile] if args.profile else None,
    )
    print(json.dumps(res.as_dict(), indent=1))


def main(argv: list[str] | None = None) -> None:
    import os

    # An ambient platform plugin can override JAX_PLATFORMS; honor an explicit
    # platform choice through jax.config before the backend initialises.
    forced = os.environ.get("HERRO_TPU_PLATFORM")
    if forced:
        import jax

        jax.config.update("jax_platforms", forced)
    args = build_parser().parse_args(argv)
    if args.command == "features":
        cmd_features(args)
    elif args.command == "train":
        cmd_train(args)
    elif args.command == "distill":
        cmd_distill(args)
    elif args.command == "eval":
        cmd_eval(args)
    else:
        cmd_inference(args)


if __name__ == "__main__":
    main()
