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


def test_truncate_partial_tail(tmp_path):
    from herro_tpu.pipeline.engine import truncate_partial_tail

    full = b">r1 \nACGT\n>r2 \nGGTT\n"
    # cut at every byte offset: the journal must keep exactly the records
    # whose final newline survived the cut
    for cut in range(len(full) + 1):
        p = tmp_path / f"c{cut}.fasta"
        p.write_bytes(full[:cut])
        truncate_partial_tail(str(p))
        names = corrected_read_ids(str(p))
        if cut >= len(full):
            assert names == {b"r1", b"r2"}
        elif cut >= len(b">r1 \nACGT\n"):
            assert names == {b"r1"}
        else:
            assert names == set()


def test_resume_after_midwrite_crash_matches_clean_run(tmp_path):
    """Kill the output mid-record, resume, and get a byte-identical FASTA
    (up to record order) vs an uninterrupted run."""
    import numpy as np

    from herro_tpu.io.fastx import load_reads
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.overlaps.paf import parse_paf
    from herro_tpu.pipeline.engine import run_correction
    from herro_tpu.pipeline.infer import CorrectionRunner
    from herro_tpu.training.simulate import paf_rows, simulate

    W = 512
    ds = simulate(genome_len=6000, n_reads=12, read_len=(1200, 2500), seed=21)
    fastq = tmp_path / "r.fastq"
    ds.write_fastq(str(fastq))
    reads = load_reads(str(fastq), min_length=W)
    grouped = parse_paf(paf_rows(ds, min_overlap=W), reads.name_to_id)

    cfg, params = load_or_init("tiny")
    runner = CorrectionRunner(cfg, params)

    clean = tmp_path / "clean.fasta"
    run_correction(reads, iter(grouped.items()), runner, str(clean), W, 4)

    # simulate a crash: keep a prefix of the clean output cut mid-record
    crashed = tmp_path / "crashed.fasta"
    blob = clean.read_bytes()
    cut = blob.index(b"\n", blob.index(b">", 10)) + 3  # mid 2nd record's seq
    crashed.write_bytes(blob[:cut])

    run_correction(
        reads, iter(grouped.items()), runner, str(crashed), W, 4, resume=True
    )

    def records(p):
        txt = p.read_bytes().decode()
        recs = {}
        for chunk in txt.split(">")[1:]:
            head, _, seq = chunk.partition("\n")
            recs[head.split(" ")[0]] = seq.replace("\n", "")
        return recs

    assert records(crashed) == records(clean)


def test_resume_rejects_counting_output(tmp_path):
    """--resume + a counting output would desync the two FASTAs (append vs
    truncate); the engine rejects the combination up front. A runner without
    collect_counting is rejected too (the baseline file would silently get
    the model decode)."""
    import pytest

    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.pipeline.engine import run_correction
    from herro_tpu.pipeline.infer import CorrectionRunner
    from herro_tpu.io.fastx import load_reads
    from herro_tpu.training.simulate import simulate

    ds = simulate(genome_len=3000, n_reads=4, read_len=(800, 1200), seed=5)
    fastq = tmp_path / "r.fastq"
    ds.write_fastq(str(fastq))
    reads = load_reads(str(fastq), min_length=512)
    cfg, params = load_or_init("tiny")

    runner = CorrectionRunner(cfg, params, collect_counting=True)
    with pytest.raises(ValueError, match="resume"):
        run_correction(
            reads, iter([]), runner, str(tmp_path / "o.fa"), 512, 4,
            resume=True, counting_output_path=str(tmp_path / "c.fa"),
        )

    runner2 = CorrectionRunner(cfg, params)
    with pytest.raises(ValueError, match="collect_counting"):
        run_correction(
            reads, iter([]), runner2, str(tmp_path / "o.fa"), 512, 4,
            counting_output_path=str(tmp_path / "c.fa"),
        )
