"""Script-layer tests: batching router, cluster partitioner, postprocess."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def run(script, *args, stdin=None):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        input=stdin,
        capture_output=True,
        check=True,
    )


def test_batch_alignments_roundtrip(tmp_path):
    rids = tmp_path / "rids.txt"
    rids.write_bytes(b"a\nb\nc\n")
    paf = (
        b"b\t100\t0\t50\t+\ta\t100\t0\t50\t50\t50\t60\tcg:Z:50M\n"
        b"a\t100\t0\t50\t+\tc\t100\t0\t50\t50\t50\t60\tcg:Z:50M\n"
        b"a\t100\t0\t50\t+\tzz\t100\t0\t50\t50\t50\t60\tcg:Z:50M\n"
    )
    out = tmp_path / "batches"
    run(
        "batch_alignments.py",
        str(rids),
        "-",
        str(out),
        "--batch-size",
        "2",
        stdin=paf,
    )
    from herro_tpu.overlaps.batches import list_batches, read_batch

    paths = list_batches(str(out))
    assert len(paths) == 2
    ids0, lines0 = read_batch(paths[0])
    assert ids0 == [b"a", b"b"]
    assert len(list(lines0)) == 1  # target a
    ids1, lines1 = read_batch(paths[1])
    assert ids1 == [b"c"]
    assert len(list(lines1)) == 1  # target c; zz dropped


def test_create_clusters(tmp_path):
    # two 4-cliques joined by one edge -> 2 clusters with 1-edge cut
    edges = []
    for base in (0, 4):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append(f"r{base + i}\tr{base + j}")
    edges.append("r0\tr4")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(SCRIPTS, "create_clusters.py"),
            "2",
            "--outdir",
            str(tmp_path / "clusters"),
        ],
        input="\n".join(edges).encode(),
        capture_output=True,
        check=True,
    )
    assert b"Edgecuts:" in proc.stderr
    parts = sorted(os.listdir(tmp_path / "clusters"))
    assert parts == ["000.part", "001.part"]

    cores = []
    for p in parts:
        core, neigh = set(), set()
        for line in open(tmp_path / "clusters" / p):
            tag, rid = line.split()
            (core if tag == "0" else neigh).add(rid)
        cores.append(core)
        assert not core & neigh
    # every read core in exactly one cluster
    assert cores[0] | cores[1] == {f"r{i}" for i in range(8)}
    assert not cores[0] & cores[1]


def test_postprocess_chops(tmp_path):
    fa = tmp_path / "in.fasta"
    fa.write_bytes(
        b">long desc\n" + b"A" * 70_000 + b"\n"
        b">short\n" + b"C" * 5_000 + b"\n"
    )
    out = tmp_path / "out.fasta"
    run(
        "postprocess_corrected.py",
        str(fa),
        str(out),
        "--chop-len",
        "30000",
        "--keep-len",
        "10000",
    )
    data = out.read_bytes()
    heads = [l for l in data.split(b"\n") if l.startswith(b">")]
    # 70k -> 30k + 30k + 10k tail; 5k read dropped entirely
    assert heads == [b">long:1-30000", b">long:30001-60000", b">long:60001-70000"]


def test_length_filter(tmp_path):
    fq = tmp_path / "in.fastq"
    fq.write_bytes(
        b"@a\n" + b"A" * 60 + b"\n+\n" + b"I" * 60 + b"\n"
        b"@b\n" + b"C" * 10 + b"\n+\n" + b"I" * 10 + b"\n"
    )
    out = tmp_path / "out.fastq"
    run("length_filter.py", str(fq), "-o", str(out), "--min-len", "50")
    assert out.read_bytes().count(b"@") == 1
