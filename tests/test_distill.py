"""Distillation: features dump -> teacher labels -> student training.

The testable property is teacher-student agreement: a student trained on
teacher-labelled dumps must agree with the teacher's supported-column
verdicts far better than an untrained copy does."""

import numpy as np
import pytest

import jax

from herro_tpu.cli import main as cli_main
from herro_tpu.models.model import TINY_CONFIG, init_params
from herro_tpu.overlaps.batches import BatchWriter
from herro_tpu.training.distill import teacher_label_windows, windows_from_dump
from herro_tpu.training.simulate import paf_rows, simulate

WINDOW = 512


@pytest.fixture(scope="module")
def dump(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("distill")
    ds = simulate(
        genome_len=4000,
        n_reads=22,
        read_len=(1200, 1900),
        sub_rate=0.03,
        ins_rate=0.015,
        del_rate=0.015,
        seed=13,
    )
    fastq = tmp / "reads.fastq"
    ds.write_fastq(str(fastq))
    alns = tmp / "alns"
    alns.mkdir()
    with BatchWriter(str(alns), 0, [r.name for r in ds.reads]) as w:
        for line in paf_rows(ds, min_overlap=300):
            w.write(line)
    out = tmp / "feats"
    cli_main(
        ["features", "--read-alns", str(alns), "-w", str(WINDOW),
         str(fastq), str(out)]
    )
    return tmp, str(out)


def test_windows_from_dump(dump):
    _, feats_dir = dump
    dumped = windows_from_dump(feats_dir)
    assert len(dumped) > 10
    bases, quals, supported = dumped[0]
    assert bases.shape == quals.shape and bases.shape[1] == 31
    assert supported.dtype.names == ("pos", "ins")


def test_teacher_labelling_matches_direct_forward(dump):
    _, feats_dir = dump
    dumped = [d for d in windows_from_dump(feats_dir) if len(d[2])][:6]
    cfg = TINY_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(3))
    labelled = teacher_label_windows(cfg, params, dumped, batch_size=2)
    assert len(labelled) == len(dumped)
    for lw in labelled:
        assert lw.labels.shape == lw.support_flat.shape
        assert lw.labels.max(initial=0) <= 4


def test_distill_cli_student_agrees_with_teacher(dump, tmp_path):
    tmp, feats_dir = dump
    teacher_dir = str(tmp / "teacher")
    from herro_tpu.models.checkpoint import save_model

    cfg = TINY_CONFIG
    tparams = init_params(cfg, jax.random.PRNGKey(3))
    save_model(teacher_dir, cfg, tparams)

    student_dir = str(tmp_path / "student")
    cli_main(
        ["distill", feats_dir, student_dir, "--teacher", teacher_dir,
         "--student", "tiny", "--steps", "60", "--batch-size", "4",
         "--max-len", "1024", "--max-sup", "128", "--lr", "3e-3"]
    )

    # agreement of student vs teacher on the dumped windows
    from herro_tpu.models.checkpoint import load_model

    scfg, sparams = load_model(student_dir)
    dumped = [d for d in windows_from_dump(feats_dir) if len(d[2])]
    t_lab = teacher_label_windows(cfg, tparams, dumped, batch_size=4)
    s_lab = teacher_label_windows(scfg, sparams, dumped, batch_size=4)
    agree = np.concatenate(
        [(a.labels == b.labels) for a, b in zip(t_lab, s_lab)]
    ).mean()

    fresh = init_params(cfg, jax.random.PRNGKey(99))
    f_lab = teacher_label_windows(cfg, fresh, dumped, batch_size=4)
    base = np.concatenate(
        [(a.labels == b.labels) for a, b in zip(t_lab, f_lab)]
    ).mean()

    assert agree > base + 0.05, (agree, base)
    assert agree > 0.8, agree
