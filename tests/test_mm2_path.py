"""On-the-fly overlap path driven end-to-end with a stub `minimap2` binary.

The real minimap2 isn't installed in CI; a stub on PATH replays precomputed
PAF rows for whatever target batch is streamed to its stdin, which exercises
the subprocess driver (stdin feeding, stdout streaming), `overlap_batches`
batching/striding, and the `--write-alns` durable-batch writer — the same
plumbing a real minimap2 run uses (reference: src/mm2.rs, src/overlaps.rs).
"""

import os
import stat
import subprocess
import sys

import numpy as np
import pytest

from herro_tpu.io.fastx import load_reads
from herro_tpu.overlaps.batches import list_batches, read_batch
from herro_tpu.overlaps.mm2 import overlap_batches
from herro_tpu.overlaps.paf import parse_paf
from herro_tpu.training.simulate import paf_rows, simulate

WINDOW = 512

STUB = """#!{python}
import sys
# args: ... - reads_path ; batch arrives as FASTA on stdin
names = []
for line in sys.stdin.buffer.read().split(b"\\n"):
    if line.startswith(b">"):
        names.append(line[1:].split()[0])
targets = set(names)
with open({paf_path!r}, "rb") as fh:
    for row in fh:
        if row.split(b"\\t")[5] in targets:
            sys.stdout.buffer.write(row)
"""


@pytest.fixture(scope="module")
def stub_env(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mm2")
    ds = simulate(
        genome_len=3000,
        n_reads=18,
        read_len=(1000, 1600),
        sub_rate=0.01,
        ins_rate=0.005,
        del_rate=0.005,
        seed=8,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    paf_path = tmp / "all.paf"
    with open(paf_path, "wb") as fh:
        for row in paf_rows(ds, min_overlap=300):
            fh.write(row if row.endswith(b"\n") else row + b"\n")

    bin_dir = tmp / "bin"
    bin_dir.mkdir()
    mm2 = bin_dir / "minimap2"
    mm2.write_text(STUB.format(python=sys.executable, paf_path=str(paf_path)))
    mm2.chmod(mm2.stat().st_mode | stat.S_IEXEC)
    old_path = os.environ["PATH"]
    os.environ["PATH"] = f"{bin_dir}:{old_path}"
    yield str(fastq), str(paf_path), str(tmp)
    os.environ["PATH"] = old_path


def test_overlap_batches_streams_batched_paf(stub_env):
    fastq, paf_path, tmp = stub_env
    reads = load_reads(fastq, min_length=WINDOW)
    got = []
    for batch_idx, rids, lines in overlap_batches(reads, fastq, 1, 8):
        rows = list(lines)
        assert rows, f"batch {batch_idx} empty"
        for row in rows:
            tname = row.split(b"\t")[5]
            assert reads.name_to_id[tname] in rids
        got.append((batch_idx, len(rows)))
    assert [b for b, _ in got] == [0, 1, 2]
    total = sum(n for _, n in got)
    assert total == sum(1 for _ in open(paf_path, "rb"))


def test_overlap_batches_striding(stub_env):
    fastq, _, _ = stub_env
    reads = load_reads(fastq, min_length=WINDOW)
    b0 = [b for b, _, lines in overlap_batches(reads, fastq, 1, 8, stride=(0, 2))
          if list(lines) is not None]
    assert b0 == [0, 2]


def test_write_alns_through_stub(stub_env, tmp_path):
    fastq, paf_path, _ = stub_env
    from herro_tpu.pipeline.engine import AlnMode, alignment_stream

    reads = load_reads(fastq, min_length=WINDOW)
    out_dir = str(tmp_path / "alns")
    os.makedirs(out_dir)
    mode = AlnMode(write_path=out_dir)
    live = dict(alignment_stream(reads, fastq, mode, 1))

    # durable batches replay to the identical grouping (the engine batches
    # READS_BATCH_SIZE=50k targets at a time -> one batch here)
    batches = list_batches(out_dir)
    assert len(batches) == 1
    replayed = {}
    for p in batches:
        _, lines = read_batch(p)
        replayed.update(parse_paf(lines, reads.name_to_id))
    assert set(replayed) == set(live)
    for rid in live:
        assert len(replayed[rid]) == len(live[rid])
