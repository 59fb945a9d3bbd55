import jax
import jax.numpy as jnp
import numpy as np
import pytest

from herro_tpu.constants import N_ROWS, TOKEN_PAD
from herro_tpu.models.model import CorrectionModel, TINY_CONFIG, init_params


@pytest.fixture(scope="module")
def params():
    return init_params(TINY_CONFIG, jax.random.PRNGKey(0))


def _inputs(rng, B=2, L=24, S=6):
    # row-major device layout [B, R, L] (models/model.py docstring)
    bases = rng.integers(0, 11, size=(B, N_ROWS, L)).astype(np.uint8)
    bases[:, 0, :] = rng.integers(0, 5, size=(B, L))
    quals = rng.uniform(-1, 1, size=(B, N_ROWS, L)).astype(np.float32)
    sidx = np.stack([rng.choice(L, size=S, replace=False) for _ in range(B)]).astype(
        np.int32
    )
    smask = np.ones((B, S), dtype=bool)
    return bases, quals, sidx, smask


def test_output_shapes(params):
    rng = np.random.default_rng(0)
    bases, quals, sidx, smask = _inputs(rng)
    model = CorrectionModel(TINY_CONFIG)
    info, logits = model.apply(params, bases, quals, sidx, smask)
    assert info.shape == (2, 6)
    assert logits.shape == (2, 6, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_padding_invariance(params):
    """Padding columns must not change the logits of real columns."""
    rng = np.random.default_rng(1)
    bases, quals, sidx, smask = _inputs(rng, B=1, L=16, S=4)
    model = CorrectionModel(TINY_CONFIG)
    _, logits_a = model.apply(params, bases, quals, sidx, smask)

    pad = 8
    bases_p = np.full((1, N_ROWS, 16 + pad), TOKEN_PAD, dtype=np.uint8)
    bases_p[:, :, :16] = bases
    quals_p = np.zeros((1, N_ROWS, 16 + pad), dtype=np.float32)
    quals_p[:, :, :16] = quals
    _, logits_b = model.apply(params, bases_p, quals_p, sidx, smask)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), atol=1e-5
    )


def test_support_mask_blocks_padded(params):
    rng = np.random.default_rng(2)
    bases, quals, sidx, smask = _inputs(rng)
    smask[:, -2:] = False
    model = CorrectionModel(TINY_CONFIG)
    info, logits = model.apply(params, bases, quals, sidx, smask)
    assert np.all(np.asarray(logits)[:, -2:, :] <= -1e8)
    assert np.all(np.asarray(info)[:, -2:] <= -1e8)


def test_local_window_runs(params):
    import dataclasses

    cfg = dataclasses.replace(TINY_CONFIG, local_window=4)
    p = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    bases, quals, sidx, smask = _inputs(rng)
    info, logits = CorrectionModel(cfg).apply(p, bases, quals, sidx, smask)
    assert logits.shape == (2, 6, 5)


def test_checkpoint_roundtrip(tmp_path, params):
    from herro_tpu.models.checkpoint import load_model, save_model

    save_model(str(tmp_path / "ckpt"), TINY_CONFIG, params)
    cfg, loaded = load_model(str(tmp_path / "ckpt"))
    assert cfg == TINY_CONFIG
    tree_a = jax.tree_util.tree_leaves(params)
    tree_b = jax.tree_util.tree_leaves(loaded)
    for a, b in zip(tree_a, tree_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
