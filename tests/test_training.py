"""Training tests: labels are truthful, the loss decreases, and a trained
tiny model beats chance at supported columns — on an 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from herro_tpu.models.model import TINY_CONFIG, init_params
from herro_tpu.parallel.mesh import make_mesh
from herro_tpu.training.data import batch_iterator, simulated_windows
from herro_tpu.training.simulate import simulate
from herro_tpu.training.train import Trainer

WINDOW = 128


@pytest.fixture(scope="module")
def windows(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("train")
    # high error rates -> plenty of supported columns to learn from
    ds = simulate(
        genome_len=2000,
        n_reads=40,
        read_len=(600, 1100),
        sub_rate=0.05,
        ins_rate=0.03,
        del_rate=0.03,
        seed=5,
    )
    return simulated_windows(ds, str(tmp / "r.fastq"), WINDOW, min_overlap=150)


def test_labels_mostly_match_counting_consensus(windows):
    """Sanity: at supported columns the truth should usually equal the pileup
    majority (errors are random, not systematic)."""
    assert len(windows) > 20
    n_sup = sum(len(w.labels) for w in windows)
    assert n_sup > 100
    agree = 0
    total = 0
    from herro_tpu.constants import TOKEN_TO_CLASS

    for w in windows:
        cls = TOKEN_TO_CLASS[w.tokens]  # [L, R]
        for flat, lab in zip(w.support_flat, w.labels):
            col = cls[flat]
            counts = np.bincount(col[col < 5], minlength=5)
            agree += int(np.argmax(counts) == lab)
            total += 1
    assert agree / total > 0.7, f"labels vs majority: {agree}/{total}"


def test_training_learns(windows):
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    cfg = TINY_CONFIG
    params = init_params(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg, params, lr=1e-3, total_steps=400, mesh=mesh)

    it = batch_iterator(windows, batch_size=8, L=256, S=64, n_epochs=40, seed=0)
    history = []
    for batch in it:
        history.append(trainer.train_step(batch))
        if len(history) >= 120:
            break

    first = np.mean([h["ce"] for h in history[:10]])
    last = np.mean([h["ce"] for h in history[-10:]])
    acc = np.mean([h["acc"] for h in history[-10:]])
    assert last < 0.7 * first, f"CE did not decrease: {first:.3f} -> {last:.3f}"
    assert acc > 0.70, f"supported-column accuracy too low: {acc:.3f}"
