import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from herro_tpu.ops.attention import (
    chunked_attention,
    flash_attention,
    naive_attention,
)


def _qkv(seed, B=2, H=2, L=256, D=32):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, L, D)).astype(np.float32)
    k = rng.normal(size=(B, H, L, D)).astype(np.float32)
    v = rng.normal(size=(B, H, L, D)).astype(np.float32)
    lengths = np.array([L, L - 64][:B], dtype=np.int32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths)


@pytest.mark.parametrize("local_window", [None, 32])
def test_chunked_matches_naive(local_window):
    q, k, v, lengths = _qkv(0)
    out_c = chunked_attention(q, k, v, lengths, local_window, blk_q=64)
    out_n = naive_attention(q, k, v, lengths, local_window)
    np.testing.assert_allclose(
        np.asarray(out_c)[:, :, :192], np.asarray(out_n)[:, :, :192], atol=2e-5
    )


@pytest.mark.parametrize("local_window", [None, 32])
def test_flash_interpret_matches_naive(local_window):
    q, k, v, lengths = _qkv(1)
    with pltpu.force_tpu_interpret_mode():
        out_f = flash_attention(q, k, v, lengths, local_window, blk_q=64, blk_k=64)
    out_n = naive_attention(q, k, v, lengths, local_window)
    # compare only valid query rows (padded rows are unused downstream)
    for b in range(q.shape[0]):
        l = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out_f)[b, :, :l], np.asarray(out_n)[b, :, :l], atol=2e-5
        )


def test_chunked_gradients_match_naive():
    q, k, v, lengths = _qkv(2, L=128)

    def loss_c(q, k, v):
        return jnp.sum(chunked_attention(q, k, v, lengths, None, blk_q=64) ** 2)

    def loss_n(q, k, v):
        return jnp.sum(naive_attention(q, k, v, lengths) ** 2)

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_n, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gc, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_chunked_banded_gradients_match_naive():
    """The banded (dynamic-sliced, checkpointed) backward must match the
    dense naive gradients. The loss reads only valid query rows — outputs at
    fully-padding-masked rows are unspecified (softmax over an all-masked
    band) and never consumed downstream."""
    q, k, v, lengths = _qkv(3, L=256)
    row_ok = (jnp.arange(256)[None, :] < lengths[:, None])[:, None, :, None]

    def loss_c(q, k, v):
        out = chunked_attention(q, k, v, lengths, 32, blk_q=64)
        return jnp.sum(jnp.where(row_ok, out, 0.0) ** 2)

    def loss_n(q, k, v):
        out = naive_attention(q, k, v, lengths, 32)
        return jnp.sum(jnp.where(row_ok, out, 0.0) ** 2)

    gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_n, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gc, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.parametrize("local_window,blk", [(64, 64), (96, 64)])
def test_banded_flash_outproj_interpret_matches_twin(local_window, blk):
    """The banded tiled kernel (K/V as 2*n_side+1 block-aligned tiles) must
    match the jnp twin on valid query rows, including clamped edge query
    blocks and suffix-length masking. n_side=2 at (96, 64)."""
    from herro_tpu.ops import fused

    B, H, L, D, d = 2, 2, 256, 32, 64
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    wo = jnp.asarray(rng.normal(0, 0.1, size=(H, D, d)), jnp.float32)
    bo = jnp.asarray(rng.normal(0, 0.1, size=(d,)), jnp.float32)
    lengths = jnp.asarray([L, L - 70], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        out_b = fused._banded_flash_outproj_pallas(
            q, k, v, x, wo, bo, lengths, local_window, blk=blk
        )
    out_t = fused._flash_outproj_jnp(q, k, v, x, wo, bo, lengths, local_window)
    for b in range(B):
        l = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out_b)[b, :l], np.asarray(out_t)[b, :l], atol=3e-4
        )


def test_rot_banded_flash_outproj_interpret_matches_twin():
    """The rotation-slot banded kernel (heads folded, K/V tile slot m pinned
    to the block = m (mod 3) around the query block) must match the jnp twin
    on valid rows, including edge query blocks (clamped duplicate slots) and
    suffix-length masking. Production condition: local_window == blk."""
    from herro_tpu.ops import fused

    B, H, L, D, d = 2, 2, 256, 32, 64
    blk = 64
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, L, D)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    wo = jnp.asarray(rng.normal(0, 0.1, size=(H, D, d)), jnp.float32)
    bo = jnp.asarray(rng.normal(0, 0.1, size=(d,)), jnp.float32)
    lengths = jnp.asarray([L, L - 70], jnp.int32)

    out_b = fused._banded_flash_outproj_rot_pallas(
        q, k, v, x, wo, bo, lengths, blk, blk=blk, interpret=True
    )
    out_t = fused._flash_outproj_jnp(q, k, v, x, wo, bo, lengths, blk)
    for b in range(B):
        l = int(lengths[b])
        np.testing.assert_allclose(
            np.asarray(out_b)[b, :l], np.asarray(out_t)[b, :l], atol=3e-4
        )


def test_rope_tbl_matches_split_interpret():
    """The table-fed lane-rotation rope epilogue (production default) must
    reproduce the in-kernel split-half formulation."""
    from herro_tpu.ops import fused

    B, L, d, H, D = 2, 128, 64, 2, 32
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, size=(d, 3 * H * D)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, size=(3 * H * D,)), jnp.float32)
    s1 = jnp.ones((d,), jnp.float32)
    b1 = jnp.zeros((d,), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        ref = fused._ln_qkv_rope_pallas(
            x, s1, b1, w, b, H, blk_t=64, rope_tbl=False
        )
        got = fused._ln_qkv_rope_pallas(
            x, s1, b1, w, b, H, blk_t=64, rope_tbl=True
        )
    for a, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=2e-5)
