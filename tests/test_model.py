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


def test_int8_close_to_bf16(params):
    """The int8-quantized forward (dynamic per-row activations, per-channel
    weights) must track the bf16 forward closely: same argmax decode on the
    overwhelming majority of columns, small logit deviation."""
    import dataclasses

    rng = np.random.default_rng(7)
    bases, quals, sidx, smask = _inputs(rng, B=4, L=64, S=16)
    model = CorrectionModel(TINY_CONFIG)
    cfg_q = dataclasses.replace(TINY_CONFIG, int8=True)
    model_q = CorrectionModel(cfg_q)

    info, logits = model.apply(params, bases, quals, sidx, smask)
    info_q, logits_q = model_q.apply(params, bases, quals, sidx, smask)
    logits, logits_q = np.asarray(logits), np.asarray(logits_q)

    agree = np.mean(np.argmax(logits, -1) == np.argmax(logits_q, -1))
    assert agree >= 0.95, agree
    err = np.max(np.abs(logits - logits_q))
    assert err < 1.5, err  # quantization noise, not a broken path


def test_int8_quantize_weight_roundtrip():
    from herro_tpu.ops.fused import quantize_weight

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.05, size=(32, 48)), dtype=jnp.float32)
    w_i8, s = quantize_weight(w)
    assert w_i8.dtype == jnp.int8
    back = np.asarray(w_i8, dtype=np.float32) * np.asarray(s)
    # per-channel max maps to +-127 exactly; everything within half a step
    step = np.asarray(s)
    assert np.all(np.abs(back - np.asarray(w)) <= step * 0.5 + 1e-9)
