"""Attention kernels for the correction transformer.

Three implementations with one interface:

* ``flash`` — Pallas TPU kernel: online-softmax tiling so the [Lq, Lk] score
  matrix never materialises in HBM (the naive masked attention on a 4.6k
  window batch would allocate >20 GB). Supports suffix-padding length masks
  and an optional local band.
* ``chunked`` — pure-jnp lax.scan over query blocks; differentiable, runs on
  any backend, used as the flash kernel's custom-vjp backward (recompute) and
  as the CPU fallback.
* ``naive`` — reference einsum implementation for tests.

All take q/k/v of shape [B, H, L, D] and per-example valid ``lengths`` [B]
(padding is always a suffix of the pileup column axis).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(
    len_ref,  # SMEM [B] valid key lengths (scalar-prefetched)
    q_ref,  # VMEM [1, 1, BLK_Q, D]
    k_ref,  # VMEM [1, 1, Lk, D]
    v_ref,  # VMEM [1, 1, Lk, D]
    o_ref,  # VMEM [1, 1, BLK_Q, D]
    *,
    blk_q: int,
    blk_k: int,
    lk: int,
    scale: float,
    local_window: int | None,
):
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # [BLK_Q, D] — keep input dtype; MXU runs bf16 at full rate
    length = len_ref[pl.program_id(0)]

    n_kb = lk // blk_k
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        s = scale * jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BLK_Q, BLK_K] f32 accumulators

        k_pos = kb * blk_k + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_k), 1
        )
        mask = k_pos < length
        if local_window is not None:
            mask &= jnp.abs(q_pos - k_pos) <= local_window
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype),  # bf16 operand, f32 accumulation on the MXU
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((blk_q, q.shape[1]), dtype=jnp.float32)
    m = jnp.full((blk_q,), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((blk_q,), dtype=jnp.float32)

    # Padding is a suffix, so K blocks past the valid length never
    # contribute — clamp the loop (buckets can pad L by ~10%).
    n_kb_valid = jnp.minimum((length + blk_k - 1) // blk_k, n_kb)
    if local_window is not None:
        # Only K blocks intersecting the band contribute.
        lo = jnp.maximum((qi * blk_q - local_window) // blk_k, 0)
        hi = jnp.minimum(
            ((qi + 1) * blk_q - 1 + local_window) // blk_k + 1, n_kb_valid
        )
        acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc, m, l))
    else:
        acc, m, l = jax.lax.fori_loop(0, n_kb_valid, body, (acc, m, l))

    out = acc / jnp.maximum(l, 1e-30)[:, None]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    local_window: int | None = None,
    blk_q: int = 512,
    blk_k: int = 512,
) -> jnp.ndarray:
    """Pallas TPU flash attention. q/k/v: [B, H, L, D]; lengths: [B] int32."""
    B, H, L, D = q.shape
    blk_q = min(blk_q, L)
    blk_k = min(blk_k, L)
    assert L % blk_q == 0 and L % blk_k == 0, (L, blk_q, blk_k)
    scale = 1.0 / math.sqrt(D)

    grid = (B, H, L // blk_q)
    kernel = functools.partial(
        _flash_kernel,
        blk_q=blk_q,
        blk_k=blk_k,
        lk=L,
        scale=scale,
        local_window=local_window,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, blk_q, D),
                    lambda b, h, i, lens: (b, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda b, h, i, lens: (b, h, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda b, h, i, lens: (b, h, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, blk_q, D),
                lambda b, h, i, lens: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * L * D,
            bytes_accessed=(3 * B * H * L * D + B * H * L * D) * q.dtype.itemsize,
            transcendentals=B * H * L * L,
        ),
    )(lengths.astype(jnp.int32), q, k, v)


# ---------------------------------------------------------------------------
# Chunked jnp implementation (differentiable, any backend)
# ---------------------------------------------------------------------------


def chunked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    local_window: int | None = None,
    blk_q: int = 512,
) -> jnp.ndarray:
    """Pure-jnp blocked attention (differentiable, any backend).

    With ``local_window`` only the static in-band K span per query block is
    sliced and scored (O(L·window) instead of O(L²)). The scan body is
    rematerialised: without it the vjp stacks every block's probability
    matrix — f32 [n_blocks, B, H, blk_q, span], tens of GB at production
    widths — which is what the backward of the flash kernel recomputes
    through this function.
    """
    B, H, L, D = q.shape
    blk_q = min(blk_q, L)
    if L % blk_q:
        blk_q = L  # irregular length: single chunk
    scale = 1.0 / math.sqrt(D)
    n_blocks = L // blk_q

    # static K span per query block: the whole axis, or just the band
    span = L if local_window is None else min(L, blk_q + 2 * local_window)

    qs = q.reshape(B, H, n_blocks, blk_q, D).transpose(2, 0, 1, 3, 4)

    def block(carry, inp):
        i, qb = inp  # qb: [B, H, BLK_Q, D]
        k0 = 0
        if local_window is not None:
            k0 = jnp.clip(i * blk_q - local_window, 0, L - span)
        kb = jax.lax.dynamic_slice(k, (0, 0, k0, 0), (B, H, span, D))
        vb = jax.lax.dynamic_slice(v, (0, 0, k0, 0), (B, H, span, D))
        k_pos = k0 + jnp.arange(span)

        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qb.astype(jnp.float32) * scale, kb.astype(jnp.float32)
        )
        mask = (k_pos[None, :] < lengths[:, None])[:, None, None, :]
        if local_window is not None:
            q_pos = i * blk_q + jnp.arange(blk_q)
            band = jnp.abs(q_pos[:, None] - k_pos[None, :]) <= local_window
            mask = mask & band[None, None, :, :]
        s = jnp.where(mask, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, vb.astype(jnp.float32))
        return carry, o.astype(q.dtype)

    _, outs = jax.lax.scan(
        jax.checkpoint(block), None, (jnp.arange(n_blocks), qs)
    )
    return outs.transpose(1, 2, 0, 3, 4).reshape(B, H, L, D)


def naive_attention(q, k, v, lengths, local_window=None):
    B, H, L, D = q.shape
    scale = 1.0 / math.sqrt(D)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32)
    )
    pos = jnp.arange(L)
    mask = (pos[None, :] < lengths[:, None])[:, None, None, :]
    if local_window is not None:
        band = jnp.abs(pos[:, None] - pos[None, :]) <= local_window
        mask = mask & band[None, None, :, :]
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


# ---------------------------------------------------------------------------
# Dispatch: flash forward with chunked-recompute backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_with_vjp(q, k, v, lengths, local_window):
    return flash_attention(q, k, v, lengths, local_window)


def _fwd(q, k, v, lengths, local_window):
    return flash_attention(q, k, v, lengths, local_window), (q, k, v, lengths)


def _bwd(local_window, res, g):
    q, k, v, lengths = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: chunked_attention(q_, k_, v_, lengths, local_window),
        q,
        k,
        v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_with_vjp.defvjp(_fwd, _bwd)


def _pallas_capable() -> bool:
    return jax.default_backend() not in ("cpu",)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    local_window: int | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """[B, H, L, D] attention with suffix-padding mask; impl in
    auto/flash/chunked/naive."""
    if impl == "auto":
        L = q.shape[2]
        impl = "flash" if _pallas_capable() and L % 512 == 0 else "chunked"
    if impl == "flash":
        return _flash_with_vjp(q, k, v, lengths, local_window)
    if impl == "chunked":
        return chunked_attention(q, k, v, lengths, local_window)
    return naive_attention(q, k, v, lengths, local_window)
