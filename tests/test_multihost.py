"""True multi-process run: two CLI processes under jax.distributed correct
disjoint strides of target-partitioned alignment batches; their shard outputs
must combine to exactly the single-process result.

This is the multi-host execution model (one replica pipeline per process,
work split upstream by batch striding) exercised for real — two coordinated
processes on the CPU backend.
"""

import os
import socket
import subprocess
import sys

import pytest

from herro_tpu.overlaps.batches import BatchWriter
from herro_tpu.training.simulate import paf_rows, simulate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 512


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    ds = simulate(
        genome_len=4000,
        n_reads=24,
        read_len=(1200, 2000),
        sub_rate=0.01,
        ins_rate=0.005,
        del_rate=0.005,
        seed=21,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    rows = paf_rows(ds, min_overlap=300)

    # Route PAF lines into two target-partitioned batches, like batch.py /
    # overlaps.rs:248-286: batch k owns a disjoint set of target reads.
    names = [r.name for r in ds.reads]
    half = set(names[: len(names) // 2])
    groups: dict[int, list[bytes]] = {0: [], 1: []}
    for line in rows:
        tname = line.split(b"\t")[5]
        groups[0 if tname in half else 1].append(line)
    alns = tmp / "alns"
    alns.mkdir()
    for k, ids in ((0, [n for n in names if n in half]),
                   (1, [n for n in names if n not in half])):
        with BatchWriter(str(alns), k, ids) as w:
            for line in groups[k]:
                w.write(line)
    return tmp, str(fastq), str(alns)


def _cli(extra, fastq, alns, out, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the ambient TPU plugin overrides JAX_PLATFORMS; this forces jax.config
    env["HERRO_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_PROCESSES", None)
    cmd = [
        sys.executable, "-m", "herro_tpu.cli", "inference",
        "--read-alns", alns, "-m", "tiny", "-w", str(WINDOW),
        "-b", "4", "--devices", "1", *extra, fastq, out,
    ]
    return subprocess.Popen(
        cmd, cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def _fasta_seqs(path: str) -> dict[bytes, bytes]:
    seqs: dict[bytes, bytes] = {}
    name = None
    with open(path, "rb") as fh:
        for line in fh:
            line = line.rstrip()
            if line.startswith(b">"):
                name = line[1:].split(b" ")[0]
                seqs[name] = b""
            elif name is not None:
                seqs[name] += line
    return seqs


def test_two_process_striding_matches_single(dataset):
    tmp, fastq, alns = dataset

    single = str(tmp / "single.fasta")
    p = _cli([], fastq, alns, single)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out.decode()

    port = _free_port()
    sharded = str(tmp / "sharded.fasta")
    procs = [
        _cli(
            [
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2",
                "--process-id", str(i),
            ],
            fastq, alns, sharded,
        )
        for i in range(2)
    ]
    outs = [pr.communicate(timeout=600)[0] for pr in procs]
    for pr, o in zip(procs, outs):
        assert pr.returncode == 0, o.decode()

    combined: dict[bytes, bytes] = {}
    for i in range(2):
        shard = _fasta_seqs(f"{sharded}.shard{i:03d}")
        assert shard, f"shard {i} corrected nothing"
        overlap = set(shard) & set(combined)
        assert not overlap, f"shards overlap on {overlap}"
        combined.update(shard)

    assert combined == _fasta_seqs(single)
