"""Fused device kernels for the correction transformer.

Round-3 on-chip ablation (tools/ablate_r3.py) showed the step was NOT
matmul-bound: of ~12.6 ms/layer at B=64 L=4608, the qkv/out projections were
2.4 ms and the FFN 2.7 ms — the other ~7.5 ms was pure layout traffic
(BLHD<->BHLD transposes, per-example rope tables materialised in HBM, qkv
slice copies), plus a 29 ms entry block dominated by lane-padded minor dims
(31 and 13 pad to 128 lanes on TPU). These kernels remove that traffic:

* ``ln_matmul``   — LayerNorm + matmul in one pass (the qkv projection);
* ``ln_ffn``      — LayerNorm + FFN + residual in one pass: the hidden
  activations never touch HBM;
* ``rope_attention`` — flash attention reading q/k/v straight out of the
  flat ``[B, L, 3*H*D]`` qkv buffer via block index maps (no transposes, no
  slice copies) with rotary embedding applied *inside* the kernel from
  position iota (positions are a static arange because padding is always a
  suffix — the pileup-column invariant).

Every op has a pure-jnp twin (CPU fallback + parity oracle) and a
custom_vjp whose backward recomputes through the twin, so the fused
forwards are usable in training too.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _use_pallas() -> bool:
    import os

    if os.environ.get("HERRO_TPU_PALLAS", "1") == "0":
        return False
    return jax.default_backend() not in ("cpu",)


# ---------------------------------------------------------------------------
# LayerNorm (f32 statistics, flax-equivalent) — shared by twins and kernels
# ---------------------------------------------------------------------------


def layernorm(x, scale, bias, eps: float = 1e-6):
    """flax.linen.LayerNorm semantics (fast variance, f32 stats), returning
    the input dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


# ---------------------------------------------------------------------------
# ln_matmul: y = LN(x) @ w + b        x [T, d], w [d, f] -> [T, f]
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref):
    y = layernorm(x_ref[...], scale_ref[0], bias_ref[0])
    o_ref[...] = (
        jax.lax.dot_general(
            y,
            w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)


def _ln_matmul_jnp(x, scale, bias, w, b):
    y = layernorm(x, scale, bias)
    return (y @ w + b).astype(x.dtype)


def _ln_matmul_pallas(x, scale, bias, w, b, blk_t: int = 512):
    T, d = x.shape
    f = w.shape[1]
    n = T // blk_t
    assert T % blk_t == 0, (T, blk_t)
    return pl.pallas_call(
        _ln_matmul_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * d * f,
            bytes_accessed=(T * d + T * f) * x.dtype.itemsize + d * f * 2,
            transcendentals=0,
        ),
    )(x, scale[None, :], bias[None, :], w, b[None, :])


@jax.custom_vjp
def ln_matmul(x, scale, bias, w, b):
    """LayerNorm over the last dim then matmul. x [..., T, d] -> [..., T, f].

    Leading dims are flattened; T*prod(lead) must divide into 512-token
    blocks on the pallas path (guaranteed by the bucket ladder).
    """
    return _ln_matmul_impl(x, scale, bias, w, b)


def _ln_matmul_impl(x, scale, bias, w, b):
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    T = xf.shape[0]
    if _use_pallas() and T % 512 == 0:
        out = _ln_matmul_pallas(xf, scale, bias, w, b)
    else:
        out = _ln_matmul_jnp(xf, scale, bias, w, b)
    return out.reshape(*lead, w.shape[1])


def _ln_matmul_fwd(x, scale, bias, w, b):
    return _ln_matmul_impl(x, scale, bias, w, b), (x, scale, bias, w, b)


def _ln_matmul_bwd(res, g):
    x, scale, bias, w, b = res
    _, vjp = jax.vjp(
        lambda *a: _ln_matmul_jnp(a[0].reshape(-1, x.shape[-1]), *a[1:]).reshape(
            g.shape
        ),
        x, scale, bias, w, b,
    )
    return vjp(g)


ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


# ---------------------------------------------------------------------------
# ln_ffn: y = x + gelu(LN(x) @ w1 + b1) @ w2 + b2
# ---------------------------------------------------------------------------


def _ln_ffn_kernel(x_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    y = layernorm(x, scale_ref[0], bias_ref[0])
    h = jax.lax.dot_general(
        y, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    # gelu in the compute dtype, mirroring the jnp twin / old flax Block
    h = jax.nn.gelu(h.astype(x.dtype))
    o = jax.lax.dot_general(
        h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def _ln_ffn_jnp(x, scale, bias, w1, b1, w2, b2):
    y = layernorm(x, scale, bias)
    h = jax.nn.gelu((y @ w1 + b1).astype(x.dtype))
    return (x + (h @ w2 + b2).astype(x.dtype)).astype(x.dtype)


def _ln_ffn_pallas(x, scale, bias, w1, b1, w2, b2, blk_t: int = 256):
    T, d = x.shape
    f = w1.shape[1]
    assert T % blk_t == 0, (T, blk_t)
    return pl.pallas_call(
        _ln_ffn_kernel,
        grid=(T // blk_t,),
        in_specs=[
            pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * d * f,
            bytes_accessed=2 * T * d * x.dtype.itemsize + 4 * d * f,
            transcendentals=T * f,
        ),
    )(x, scale[None, :], bias[None, :], w1, b1[None, :], w2, b2[None, :])


@jax.custom_vjp
def ln_ffn(x, scale, bias, w1, b1, w2, b2):
    """Pre-norm FFN block with residual: x + FF2(gelu(FF1(LN(x))))."""
    return _ln_ffn_impl(x, scale, bias, w1, b1, w2, b2)


def _ln_ffn_impl(x, scale, bias, w1, b1, w2, b2):
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    T = xf.shape[0]
    if _use_pallas() and T % 256 == 0:
        out = _ln_ffn_pallas(xf, scale, bias, w1, b1, w2, b2)
    else:
        out = _ln_ffn_jnp(xf, scale, bias, w1, b1, w2, b2)
    return out.reshape(*lead, d)


def _ln_ffn_fwd(*args):
    return _ln_ffn_impl(*args), args


def _ln_ffn_bwd(res, g):
    x = res[0]
    _, vjp = jax.vjp(
        lambda *a: _ln_ffn_jnp(a[0].reshape(-1, x.shape[-1]), *a[1:]).reshape(
            g.shape
        ),
        *res,
    )
    return vjp(g)


ln_ffn.defvjp(_ln_ffn_fwd, _ln_ffn_bwd)


# ---------------------------------------------------------------------------
# int8 variants: dynamic per-row activation quantization, per-column weight
# quantization, int8xint8->int32 on the MXU (v5e: 2x the bf16 MXU rate and
# half the HBM bytes on the weight/activation streams). Inference-only —
# training stays bf16 (the custom_vjp twins of the bf16 ops are used there).
# ---------------------------------------------------------------------------


def quantize_weight(w) -> tuple:
    """Per-output-channel symmetric int8: w [d, f] -> (w_i8 [d, f], s [f])."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    w_i8 = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return w_i8, s


def _quant_rows(y):
    """Per-row symmetric int8 of f32 y [T, d] -> (y_i8, s_row [T, 1])."""
    s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    y_i8 = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return y_i8, s


def _int8_mm(y_i8, s_row, w_i8, s_col):
    """(int8, int8) -> f32: int32 MXU accumulate then dequantize."""
    acc = jax.lax.dot_general(
        y_i8,
        w_i8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s_row * s_col


def _ln_matmul_q_kernel(x_ref, scale_ref, bias_ref, w_ref, s_ref, b_ref, o_ref):
    y = layernorm(x_ref[...], scale_ref[0], bias_ref[0]).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    o = _int8_mm(y_i8, s_row, w_ref[...], s_ref[0]) + b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _ln_matmul_q_jnp(x, scale, bias, w_i8, s_col, b):
    y = layernorm(x, scale, bias).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    return (_int8_mm(y_i8, s_row, w_i8, s_col) + b.astype(jnp.float32)).astype(
        x.dtype
    )


def _ln_matmul_q_pallas(x, scale, bias, w_i8, s_col, b, blk_t: int = 512):
    T, d = x.shape
    f = w_i8.shape[1]
    assert T % blk_t == 0, (T, blk_t)
    return pl.pallas_call(
        _ln_matmul_q_kernel,
        grid=(T // blk_t,),
        in_specs=[
            pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_t, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, f), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * d * f,
            bytes_accessed=T * d * x.dtype.itemsize + T * f * x.dtype.itemsize
            + d * f,
            transcendentals=0,
        ),
    )(x, scale[None, :], bias[None, :], w_i8, s_col[None, :], b[None, :])


def ln_matmul_q(x, scale, bias, w_i8, s_col, b):
    """int8 LayerNorm+matmul: LN in f32, per-row dynamic int8 activations,
    per-column int8 weights, int32 MXU accumulate. Inference only (no vjp)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    T = xf.shape[0]
    if _use_pallas() and T % 512 == 0:
        out = _ln_matmul_q_pallas(xf, scale, bias, w_i8, s_col, b)
    else:
        out = _ln_matmul_q_jnp(xf, scale, bias, w_i8, s_col, b)
    return out.reshape(*lead, w_i8.shape[1])


def _ln_ffn_q_kernel(
    x_ref, scale_ref, bias_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
    o_ref,
):
    x = x_ref[...]
    y = layernorm(x, scale_ref[0], bias_ref[0]).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    h = _int8_mm(y_i8, s_row, w1_ref[...], s1_ref[0]) + b1_ref[...].astype(
        jnp.float32
    )
    h = jax.nn.gelu(h.astype(x.dtype)).astype(jnp.float32)
    h_i8, hs_row = _quant_rows(h)
    o = _int8_mm(h_i8, hs_row, w2_ref[...], s2_ref[0]) + b2_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = (x.astype(jnp.float32) + o).astype(o_ref.dtype)


def _ln_ffn_q_jnp(x, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2):
    y = layernorm(x, scale, bias).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    h = _int8_mm(y_i8, s_row, w1_i8, s1) + b1.astype(jnp.float32)
    h = jax.nn.gelu(h.astype(x.dtype)).astype(jnp.float32)
    h_i8, hs_row = _quant_rows(h)
    o = _int8_mm(h_i8, hs_row, w2_i8, s2) + b2.astype(jnp.float32)
    return (x.astype(jnp.float32) + o).astype(x.dtype)


def _ln_ffn_q_pallas(x, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2,
                     blk_t: int = 256):
    T, d = x.shape
    f = w1_i8.shape[1]
    assert T % blk_t == 0, (T, blk_t)
    return pl.pallas_call(
        _ln_ffn_q_kernel,
        grid=(T // blk_t,),
        in_specs=[
            pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk_t, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * T * d * f,
            bytes_accessed=2 * T * d * x.dtype.itemsize + 2 * d * f,
            transcendentals=T * f,
        ),
    )(
        x, scale[None, :], bias[None, :], w1_i8, s1[None, :], b1[None, :],
        w2_i8, s2[None, :], b2[None, :],
    )


def ln_ffn_q(x, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2):
    """int8 pre-norm FFN block with residual. Inference only."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.reshape(-1, d)
    T = xf.shape[0]
    if _use_pallas() and T % 256 == 0:
        out = _ln_ffn_q_pallas(xf, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2)
    else:
        out = _ln_ffn_q_jnp(xf, scale, bias, w1_i8, s1, b1, w2_i8, s2, b2)
    return out.reshape(*lead, d)


# ---------------------------------------------------------------------------
# rope_attention: flash attention over the flat qkv buffer with in-kernel
# rotary embedding.
# ---------------------------------------------------------------------------


def _rope_rotate(x, pos2d, d_half: int):
    """Apply split-half rotary embedding to x [T, D] at positions pos2d [T, 1].

    Matches models.model._rope: out = [x1*cos - x2*sin, x2*cos + x1*sin].
    Positions are the column index (static arange — padding is a suffix, so
    real-column positions equal absolute positions). 2-D iota/position form
    because TPU pallas only supports >=2-D iota.
    """
    # integer iota then convert: mosaic's tpu.iota only produces integers
    freq = jnp.exp(
        -math.log(10000.0)
        * jax.lax.broadcasted_iota(jnp.int32, (1, d_half), 1).astype(jnp.float32)
        / d_half
    )
    ang = pos2d.astype(jnp.float32) * freq  # [T, d_half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    xf = x.astype(jnp.float32)
    x1, x2 = xf[:, :d_half], xf[:, d_half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _rope_flash_kernel(
    len_ref,  # SMEM [B]
    q_ref,  # VMEM [1, BLK_Q, D]   (head h's q columns of the qkv buffer)
    k_ref,  # VMEM [1, Lk, D]
    v_ref,  # VMEM [1, Lk, D]
    o_ref,  # VMEM [1, BLK_Q, D]
    *,
    blk_q: int,
    blk_k: int,
    lk: int,
    scale: float,
    local_window: int | None,
):
    qi = pl.program_id(2)
    length = len_ref[pl.program_id(0)]
    d = q_ref.shape[-1]
    d_half = d // 2

    q_pos2d = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, 1), 0)
    q = _rope_rotate(q_ref[0], q_pos2d, d_half)

    n_kb = lk // blk_k
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kb, carry):
        acc, m, l = carry
        k_pos2d = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_k, 1), 0)
        k = _rope_rotate(k_ref[0, pl.ds(kb * blk_k, blk_k), :], k_pos2d, d_half)
        v = v_ref[0, pl.ds(kb * blk_k, blk_k), :]
        s = scale * jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_pos = kb * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
        mask = k_pos < length
        if local_window is not None:
            mask &= jnp.abs(q_pos - k_pos) <= local_window
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((blk_q, d), dtype=jnp.float32)
    m = jnp.full((blk_q,), NEG_INF, dtype=jnp.float32)
    l = jnp.zeros((blk_q,), dtype=jnp.float32)

    n_kb_valid = jnp.minimum((length + blk_k - 1) // blk_k, n_kb)
    if local_window is not None:
        lo = jnp.maximum((qi * blk_q - local_window) // blk_k, 0)
        hi = jnp.minimum(
            ((qi + 1) * blk_q - 1 + local_window) // blk_k + 1, n_kb_valid
        )
        acc, m, l = jax.lax.fori_loop(lo, hi, body, (acc, m, l))
    else:
        acc, m, l = jax.lax.fori_loop(0, n_kb_valid, body, (acc, m, l))

    out = acc / jnp.maximum(l, 1e-30)[:, None]
    o_ref[0] = out.astype(o_ref.dtype)


def _rope_attention_pallas(
    qkv, lengths, n_heads: int, local_window: int | None,
    blk_q: int = 512, blk_k: int = 512,
):
    B, L, F = qkv.shape
    H = n_heads
    D = F // (3 * H)
    blk_q = min(blk_q, L)
    blk_k = min(blk_k, L)
    assert L % blk_q == 0 and L % blk_k == 0, (L, blk_q, blk_k)
    scale = 1.0 / math.sqrt(D)

    grid = (B, H, L // blk_q)
    kernel = functools.partial(
        _rope_flash_kernel,
        blk_q=blk_q, blk_k=blk_k, lk=L, scale=scale, local_window=local_window,
    )
    # qkv column blocks of width D: the DenseGeneral (3, H, D) kernel
    # flattens c-major, so q of head h is column-block h, k is H + h,
    # v is 2H + h. Three views of one buffer — no slicing copies.
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, blk_q, D), lambda b, h, i, lens: (b, i, h),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, L, D), lambda b, h, i, lens: (b, 0, H + h),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, L, D), lambda b, h, i, lens: (b, 0, 2 * H + h),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, blk_q, D), lambda b, h, i, lens: (b, i, h),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, H * D), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * (min(L, 2 * (local_window or L)) * D),
            bytes_accessed=4 * B * L * H * D * qkv.dtype.itemsize,
            transcendentals=B * H * L * min(L, 2 * (local_window or L)),
        ),
    )(lengths.astype(jnp.int32), qkv, qkv, qkv)


def _rope_attention_jnp(qkv, lengths, n_heads: int, local_window: int | None):
    """Twin: unpack the flat buffer, rope with static positions, chunked
    attention. Runs on any backend; the fused kernel's backward recomputes
    through this."""
    from .attention import chunked_attention

    B, L, F = qkv.shape
    H = n_heads
    D = F // (3 * H)
    x = qkv.reshape(B, L, 3, H, D)
    pos = jnp.tile(jnp.arange(L), B)[:, None]
    rot = lambda t: _rope_rotate(
        t.reshape(B * L, D), pos, D // 2
    ).reshape(B, L, D)
    outs = []
    for h in range(H):
        q = rot(x[:, :, 0, h])
        k = rot(x[:, :, 1, h])
        v = x[:, :, 2, h]
        o = chunked_attention(
            q[:, None], k[:, None], v[:, None], lengths, local_window
        )[:, 0]
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rope_attention(qkv, lengths, n_heads, local_window):
    """Flash attention with in-kernel rotary embedding.

    qkv [B, L, 3*H*D] (DenseGeneral (3,H,D) c-major flattening), lengths [B]
    -> [B, L, H*D]. Positions are a static arange over columns: padding is
    always a suffix, so valid-column positions equal absolute positions
    (models.model relies on the same invariant).
    """
    return _rope_attention_impl(qkv, lengths, n_heads, local_window)


def _rope_attention_impl(qkv, lengths, n_heads, local_window):
    L = qkv.shape[1]
    if _use_pallas() and L % 512 == 0:
        return _rope_attention_pallas(qkv, lengths, n_heads, local_window)
    return _rope_attention_jnp(qkv, lengths, n_heads, local_window)


def _rope_attention_fwd(qkv, lengths, n_heads, local_window):
    return _rope_attention_impl(qkv, lengths, n_heads, local_window), (
        qkv, lengths,
    )


def _rope_attention_bwd(n_heads, local_window, res, g):
    qkv, lengths = res
    _, vjp = jax.vjp(
        lambda q: _rope_attention_jnp(q, lengths, n_heads, local_window), qkv
    )
    (dqkv,) = vjp(g)
    return dqkv, None


rope_attention.defvjp(_rope_attention_fwd, _rope_attention_bwd)
