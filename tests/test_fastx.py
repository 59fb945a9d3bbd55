import gzip

import pytest

from herro_tpu.io.fastx import load_reads, read_cluster


@pytest.fixture
def fastq(tmp_path):
    p = tmp_path / "reads.fastq"
    p.write_bytes(
        b"@r1 some description\n"
        b"ACGTACGTACGT\n"
        b"+\n"
        b"IIIIIIIIIIII\n"
        b"@r2\n"
        b"ACG\n"
        b"+\n"
        b"III\n"
        b"@r3\tdesc\ttab\n"
        b"GATTACAGATTA\n"
        b"+\n"
        b"!!!!!!!!!!!!\n"
    )
    return str(p)


def test_load_and_filter(fastq):
    rs = load_reads(fastq, min_length=5)
    assert rs.ids == [b"r1", b"r3"]  # r2 too short
    assert rs.descriptions[0] == b"some description"
    assert rs.descriptions[1] == b"desc\ttab"
    assert rs.seq(0).tobytes() == b"ACGTACGTACGT"
    assert rs.qual(1).tobytes() == b"!!!!!!!!!!!!"
    assert rs.name_to_id[b"r3"] == 1


def test_gzip_roundtrip(tmp_path, fastq):
    gz = tmp_path / "reads.fastq.gz"
    with open(fastq, "rb") as f:
        gz.write_bytes(gzip.compress(f.read()))
    rs = load_reads(str(gz), min_length=5)
    assert rs.ids == [b"r1", b"r3"]


def test_directory_glob(tmp_path, fastq):
    rs = load_reads(str(tmp_path), min_length=5)
    assert rs.ids == [b"r1", b"r3"]


def test_cluster_filter(fastq):
    rs = load_reads(fastq, min_length=5, core={"r1"}, neighbour={"nope"})
    assert rs.ids == [b"r1"]


def test_read_cluster(tmp_path):
    p = tmp_path / "c.part"
    p.write_text("0\tr1\n1\tr2\n0\tr3\n")
    core, neigh = read_cluster(str(p))
    assert core == {"r1", "r3"}
    assert neigh == {"r2"}
    assert read_cluster("") == (None, None)
