import numpy as np

from herro_tpu.pipeline.engine import _fold_resume_ids, corrected_read_ids


def test_resume_journal_roundtrip(tmp_path):
    out = tmp_path / "c.fasta"
    out.write_bytes(
        b">r1 desc\nACGT\n"
        b">r2:0 \nAC\n"
        b">r2:1 \nGT\n"
        b">we:ird\nAA\n"
    )
    names = corrected_read_ids(str(out))
    assert names == {b"r1", b"r2:0", b"r2:1", b"we:ird"}

    name_to_id = {b"r1": 0, b"r2": 1, b"we:ird": 2, b"r3": 3}
    skip = _fold_resume_ids(names, name_to_id)
    assert skip == {0, 1, 2}


def test_resume_missing_file(tmp_path):
    assert corrected_read_ids(str(tmp_path / "nope.fasta")) == set()
