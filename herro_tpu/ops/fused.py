"""Fused device kernels for the correction transformer.

Kernel set shaped by the round-3 on-chip ablations (tools/ablate_fused.py on
real v5e silicon — interpret-mode numbers lie):

* ``entry_embed``     — pileup tokens + quals -> d_model stream; the one-hot
  only ever exists in VMEM (the XLA formulation burned ~15 ms of HBM traffic
  materialising a [B, R, V, L] bf16 one-hot at B=64 L=4608);
* ``attention_block`` — ln_qkv_rope (LN + qkv matmul + rotary epilogue,
  emitting contiguous per-head [B, H, L, D] buffers) + flash_outproj (flash
  attention + out projection + residual, the per-head projections
  accumulating in a VMEM-resident output block). Replaces a flat-qkv-buffer
  kernel whose strided 256-byte head-slice DMAs and per-visit K rope made
  the attention stack ~13 ms/layer;
* ``ln_ffn``          — LayerNorm + FFN + residual in one pass: the hidden
  activations never touch HBM;
* ``count_decisions_pallas`` — the counting consensus rule in one VMEM pass
  (~23 ms as XLA ops at B=64 L=4608);
* int8 variants (``attention_block_q``, ``ln_ffn_q``) — dynamic per-row
  activation + per-channel weight quantization, int32 MXU accumulate:
  2x the MXU rate and half the matmul HBM bytes on v5e. Inference-only.

Every op has a pure-jnp twin (CPU fallback + parity oracle); the
differentiable ops carry a custom_vjp whose backward recomputes through the
twin, so the fused forwards are usable in training too. Positions for the
rotary embedding are always the absolute column index — padding is a suffix
(the pileup-column invariant).
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


def _ln_matmul_jnp(x, scale, bias, w, b):
    y = layernorm(x, scale, bias)
    return (y @ w + b).astype(x.dtype)


# ---------------------------------------------------------------------------
# entry_embed: pileup tokens + quals -> d_model stream, one pass.
#
# The XLA formulation materialises the one-hot [B, R, V, L] in bf16 (~220 MB
# at B=64 L=4608) just to feed the embedding contraction — ~15 ms of pure
# HBM traffic (tools/ablate_fused.py "0 layers"). Here the one-hot lives
# only in VMEM per column block; HBM sees tokens (u8), quals and the
# finished [B, L, d] stream.
# ---------------------------------------------------------------------------


def _entry_embed_kernel(
    tok_ref,  # VMEM [1, R, blk_l] u8
    qual_ref,  # VMEM [1, R, blk_l] f32
    w_emb_ref,  # VMEM [d, R*V] (transposed embedding table)
    wq_ref,  # VMEM [d, R]
    cb_ref,  # VMEM [1, d]
    o_ref,  # VMEM [1, blk_l, d]
    *,
    vocab: int,
):
    tok = tok_ref[0].astype(jnp.int32)  # [R, blk_l]
    R, blk_l = tok.shape
    onehot = (
        tok[:, None, :]
        == jax.lax.broadcasted_iota(jnp.int32, (1, vocab, 1), 1)
    ).astype(o_ref.dtype)  # [R, V, blk_l]
    onehot = onehot.reshape(R * vocab, blk_l)
    xT = jax.lax.dot_general(
        w_emb_ref[...], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [d, blk_l]
    xT = xT + jax.lax.dot_general(
        wq_ref[...], qual_ref[0].astype(o_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xT = xT + cb_ref[0][:, None].astype(jnp.float32)
    o_ref[0] = xT.T.astype(o_ref.dtype)


def _entry_embed_pallas(bases, quals, w_embT, w_qT, cb, out_dtype,
                        blk_l: int = 512):
    B, R, L = bases.shape
    d = w_embT.shape[0]
    vocab = w_embT.shape[1] // R
    blk_l = min(blk_l, L)
    assert L % blk_l == 0, (L, blk_l)
    kernel = functools.partial(_entry_embed_kernel, vocab=vocab)
    return pl.pallas_call(
        kernel,
        grid=(B, L // blk_l),
        in_specs=[
            pl.BlockSpec((1, R, blk_l), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, blk_l), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, R * vocab), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, R), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_l, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * d * R * (vocab + 1),
            bytes_accessed=B * R * L * 5 + B * L * d * 2,
            transcendentals=0,
        ),
    )(bases, quals, w_embT, w_qT, cb[None, :])


def _entry_embed_jnp(bases, quals, w_embT, w_qT, cb, out_dtype):
    B, R, L = bases.shape
    vocab = w_embT.shape[1] // R
    dt = out_dtype
    onehot = (
        bases[:, :, None, :]
        == jnp.arange(vocab, dtype=bases.dtype)[None, None, :, None]
    ).astype(dt)  # [B, R, V, L]
    m = onehot.reshape(B, R * vocab, L)
    x = jax.lax.dot_general(
        m, w_embT.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, L, d]
    x = x + jax.lax.dot_general(
        quals.astype(dt), w_qT.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (x + cb).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def entry_embed(bases, quals, w_embT, w_qT, cb, out_dtype):
    """Column embedding: tokens u8 [B, R, L] + quals f32 [B, R, L] ->
    x [B, L, d]. w_embT [d, R*V] is the transposed one-hot table (row order
    r*V + v), w_qT [d, R] the per-row qual weights, cb [d] the bias."""
    return _entry_embed_impl(bases, quals, w_embT, w_qT, cb, out_dtype)


def _entry_embed_impl(bases, quals, w_embT, w_qT, cb, out_dtype):
    if _use_pallas() and bases.shape[2] % 512 == 0:
        return _entry_embed_pallas(bases, quals, w_embT, w_qT, cb, out_dtype)
    return _entry_embed_jnp(bases, quals, w_embT, w_qT, cb, out_dtype)


def _entry_embed_fwd(bases, quals, w_embT, w_qT, cb, out_dtype):
    return _entry_embed_impl(bases, quals, w_embT, w_qT, cb, out_dtype), (
        bases, quals, w_embT, w_qT, cb,
    )


def _entry_embed_bwd(out_dtype, res, g):
    bases, quals, w_embT, w_qT, cb = res
    _, vjp = jax.vjp(
        lambda q_, we, wq, c: _entry_embed_jnp(bases, q_, we, wq, c, out_dtype),
        quals, w_embT, w_qT, cb,
    )
    dq, dwe, dwq, dcb = vjp(g)
    return None, dq, dwe, dwq, dcb


entry_embed.defvjp(_entry_embed_fwd, _entry_embed_bwd)


# ---------------------------------------------------------------------------
# count_decisions kernel: the counting consensus rule in one VMEM pass.
# The XLA formulation costs ~23 ms at B=64 L=4608 (tools/ablate_fused.py)
# on u8->i32 promotions and repeated [B, R, L] traversals.
# ---------------------------------------------------------------------------


def _count_kernel(nalns_ref, tok_ref, o_ref):
    b = pl.program_id(0)
    tok = tok_ref[0].astype(jnp.int32)  # [R, blk_l]
    R, blk_l = tok.shape
    cls = jnp.where(tok < 10, jax.lax.rem(tok, 5), 5)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, blk_l), 0)
    valid = (row <= nalns_ref[b]) & (cls < 5)

    counts = [
        jnp.sum(
            jnp.where(valid & (cls == c), 1, 0), axis=0, keepdims=True,
            dtype=jnp.int32,
        )
        for c in range(5)
    ]  # five [1, blk_l]

    def top(cs):
        best_c = jnp.zeros_like(cs[0])
        best_v = cs[0]
        for c in range(1, 5):
            better = cs[c] > best_v
            best_c = jnp.where(better, c, best_c)
            best_v = jnp.maximum(best_v, cs[c])
        return best_c, best_v

    c0, mc0 = top(counts)
    counts2 = [jnp.where(c0 == c, -1, counts[c]) for c in range(5)]
    c1, mc1 = top(counts2)
    tbase = cls[0:1, :]
    keep = (mc0 < 2) | ((mc0 == mc1) & ((c0 == tbase) | (c1 == tbase)))
    o_ref[0] = jnp.where(keep, tbase, c0).astype(jnp.uint8)


def count_decisions_pallas(tokens, n_alns, blk_l: int = 512):
    """Pallas twin of consensus.count_decisions_jnp: tokens u8 [B, R, L],
    n_alns [B] -> [B, L] u8."""
    B, R, L = tokens.shape
    blk_l = min(blk_l, L)
    assert L % blk_l == 0, (L, blk_l)
    # out is [B, 1, L] (squeezed below): a 2-D [B, L] u8 block of height 1
    # violates the (8, 128) min-tile rule, a (1, 1, blk) block does not.
    out = pl.pallas_call(
        _count_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, L // blk_l),
            in_specs=[
                pl.BlockSpec(
                    (1, R, blk_l), lambda b, i, n: (b, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, blk_l), lambda b, i, n: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, L), jnp.uint8),
        cost_estimate=pl.CostEstimate(
            flops=20 * B * R * L,
            bytes_accessed=B * R * L + B * L,
            transcendentals=0,
        ),
    )(n_alns.astype(jnp.int32), tokens)
    return out[:, 0, :]




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


def _ln_ffn_pallas(x, scale, bias, w1, b1, w2, b2, blk_t: int | None = None):
    T, d = x.shape
    f = w1.shape[1]
    if blk_t is None:
        # bigger token blocks amortize grid overhead (on-chip A/B at
        # T=295k d512 f1024, tools/micro_ffn.py: 1024 -> 4.81, 512 -> 4.94,
        # 256 -> 5.07 ms); fall back when T doesn't divide
        blk_t = next(b for b in (1024, 512, 256, 128) if T % b == 0)
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


def _ln_matmul_q_jnp(x, scale, bias, w_i8, s_col, b):
    y = layernorm(x, scale, bias).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    return (_int8_mm(y_i8, s_row, w_i8, s_col) + b.astype(jnp.float32)).astype(
        x.dtype
    )



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
# ln_qkv_rope: LN + qkv projection + rotary epilogue in one pass, emitting
# q/k/v as CONTIGUOUS per-head [B, H, L, D] buffers.
#
# Round-3 on-chip ablation (tools/ablate_fused.py): reading head slices
# straight out of a flat [B, L, 3*H*D] buffer costs 256-byte-chunk strided
# DMAs (row stride 3*H*D), and re-roping K inside the attention kernel
# repeats the transcendentals per visiting query block — together ~13 ms of
# the ~14.4 ms/layer attention stack. Rope costs nothing here (the qkv block
# is already in VMEM between the matmul and the store), and [B, H, L, D]
# gives the attention kernel fully contiguous slabs.
# ---------------------------------------------------------------------------


def _rope_tables_blk(pos0, blk: int, d_half: int):
    """cos/sin [blk, d_half] for absolute positions pos0 + iota(blk)."""
    pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
    freq = jnp.exp(
        -math.log(10000.0)
        * jax.lax.broadcasted_iota(jnp.int32, (1, d_half), 1).astype(jnp.float32)
        / d_half
    )
    ang = pos.astype(jnp.float32) * freq
    return jnp.cos(ang), jnp.sin(ang)


def _rope_apply(x, cos, sin):
    """Split-half rotary on x [T, D] with tables [T, D/2] (f32 math)."""
    xf = x.astype(jnp.float32)
    d_half = cos.shape[1]
    x1, x2 = xf[:, :d_half], xf[:, d_half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _rope_apply_roll(x, cos_d, sin_signed):
    """Rotate-half rotary without sub-lane slice/concat: one hardware lane
    rotation by D/2 plus full-width multiplies. Mathematically identical to
    :func:`_rope_apply` with ``cos_d = [cos|cos]``, ``sin_signed =
    [-sin|sin]`` — the D/2-wide half-slices of the split formulation are
    lane-crossing relayouts on the 128-lane VPU; ``pltpu.roll`` is one
    shuffle."""
    xf = x.astype(jnp.float32)
    rolled = pltpu.roll(xf, shift=x.shape[-1] // 2, axis=1)
    return (xf * cos_d + rolled * sin_signed).astype(x.dtype)


def _ln_qkv_rope_kernel(
    x_ref,  # VMEM [1, blk_t, d]
    scale_ref, bias_ref,  # VMEM [1, d]
    w_ref,  # VMEM [d, 3*H*D]
    b_ref,  # VMEM [1, 3*H*D]
    q_ref, k_ref, v_ref,  # VMEM [1, H, blk_t, D] each
    *,
    n_heads: int,
    blk_t: int,
):
    y = layernorm(x_ref[0], scale_ref[0], bias_ref[0])
    qkv = (
        jax.lax.dot_general(
            y, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...].astype(jnp.float32)
    ).astype(q_ref.dtype)  # [blk_t, 3*H*D]

    H = n_heads
    D = q_ref.shape[-1]
    pos0 = pl.program_id(1) * blk_t  # positions are the absolute column
    cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
    rope = lambda t: _rope_apply(t, cos, sin)
    for h in range(H):
        q_ref[0, h] = rope(qkv[:, h * D : (h + 1) * D])
        k_ref[0, h] = rope(qkv[:, (H + h) * D : (H + h + 1) * D])
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def _ln_qkv_rope_tbl_kernel(
    x_ref,  # VMEM [1, blk_t, d]
    scale_ref, bias_ref,  # VMEM [1, d]
    w_ref,  # VMEM [d, 3*H*D]
    b_ref,  # VMEM [1, 3*H*D]
    cos_ref, sin_ref,  # VMEM [blk_t, D]: cos duplicated / sin sign-split
    q_ref, k_ref, v_ref,  # VMEM [1, H, blk_t, D] each
    *,
    n_heads: int,
):
    """Table-fed rotary epilogue: the on-chip A/B (tools/micro_rope.py at
    d512/H4 L=9216) put the in-kernel exp/cos/sin table build at ~0.9 ms of
    the 6.9 ms layer call — with tables arriving as a grid-indexed input the
    rope epilogue costs ~nothing over the no-rope floor (5.95 vs 5.90
    ms/iter; split-half in-kernel 6.87, rmat 7.07). The rotation itself is
    one lane roll (_rope_apply_roll)."""
    y = layernorm(x_ref[0], scale_ref[0], bias_ref[0])
    qkv = (
        jax.lax.dot_general(
            y, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...].astype(jnp.float32)
    ).astype(q_ref.dtype)  # [blk_t, 3*H*D]

    H = n_heads
    D = q_ref.shape[-1]
    cos_d, sin_signed = cos_ref[...], sin_ref[...]
    rope = lambda t: _rope_apply_roll(t, cos_d, sin_signed)
    for h in range(H):
        q_ref[0, h] = rope(qkv[:, h * D : (h + 1) * D])
        k_ref[0, h] = rope(qkv[:, (H + h) * D : (H + h + 1) * D])
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def _rope_tables_full(L: int, D: int):
    """cos_d / sin_signed [L, D] f32 for the table-fed rope kernel: XLA
    computes these once per compiled step (they depend only on the static
    bucket length), vs ~L*D/2 transcendentals per pallas *program* when
    built in-kernel."""
    pos = jnp.arange(L, dtype=jnp.float32)[:, None]
    half = D // 2
    freq = jnp.exp(
        -math.log(10000.0)
        * jnp.arange(half, dtype=jnp.float32)[None, :] / half
    )
    ang = pos * freq
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    cos_d = jnp.concatenate([cos, cos], axis=1)
    sin_signed = jnp.concatenate([-sin, sin], axis=1)
    return cos_d, sin_signed


def _ln_qkv_rope_pallas(x, scale, bias, w, b, n_heads: int, blk_t: int = 512,
                        rope_tbl: bool | None = None):
    B, L, d = x.shape
    H = n_heads
    D = w.shape[1] // (3 * H)
    blk_t = min(blk_t, L)
    assert L % blk_t == 0, (L, blk_t)
    if rope_tbl is None:
        import os

        # table-fed rope is the measured default (tools/micro_rope.py);
        # HERRO_TPU_ROPE=split restores the in-kernel split-half build
        rope_tbl = os.environ.get("HERRO_TPU_ROPE", "tbl") == "tbl"
    out_shape = jax.ShapeDtypeStruct((B, H, L, D), x.dtype)
    out_spec = pl.BlockSpec(
        (1, H, blk_t, D), lambda b_, i: (b_, 0, i, 0), memory_space=pltpu.VMEM
    )
    base_specs = [
        pl.BlockSpec((1, blk_t, d), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * H * D), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * H * D), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * B * L * d * 3 * H * D,
        bytes_accessed=(B * L * d + 3 * B * L * H * D) * x.dtype.itemsize,
        transcendentals=B * L * D,
    )
    if rope_tbl:
        cos_d, sin_signed = _rope_tables_full(L, D)
        tbl_spec = pl.BlockSpec(
            (blk_t, D), lambda b_, i: (i, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(_ln_qkv_rope_tbl_kernel, n_heads=H),
            grid=(B, L // blk_t),
            in_specs=base_specs + [tbl_spec, tbl_spec],
            out_specs=[out_spec, out_spec, out_spec],
            out_shape=[out_shape, out_shape, out_shape],
            cost_estimate=cost,
        )(x, scale[None, :], bias[None, :], w, b[None, :], cos_d, sin_signed)
    kernel = functools.partial(
        _ln_qkv_rope_kernel, n_heads=H, blk_t=blk_t
    )
    return pl.pallas_call(
        kernel,
        grid=(B, L // blk_t),
        in_specs=base_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        cost_estimate=cost,
    )(x, scale[None, :], bias[None, :], w, b[None, :])


def _ln_qkv_rope_jnp(x, scale, bias, w, b, n_heads: int):
    """Twin: LN + matmul + rope with static positions, [B, H, L, D] outs."""
    B, L, d = x.shape
    H = n_heads
    D = w.shape[1] // (3 * H)
    qkv = _ln_matmul_jnp(x.reshape(-1, d), scale, bias, w, b).reshape(
        B, L, 3, H, D
    )
    pos = jnp.tile(jnp.arange(L, dtype=jnp.int32), B)[:, None]
    freq = jnp.exp(
        -math.log(10000.0) * jnp.arange(D // 2, dtype=jnp.float32)[None, :] / (D // 2)
    )
    ang = pos.astype(jnp.float32) * freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rot(t):  # [B, L, D]
        return _rope_apply(t.reshape(B * L, D), cos, sin).reshape(B, L, D)

    q = jnp.stack([rot(qkv[:, :, 0, h]) for h in range(H)], axis=1)
    k = jnp.stack([rot(qkv[:, :, 1, h]) for h in range(H)], axis=1)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def ln_qkv_rope(x, scale, bias, w, b, n_heads: int):
    """LN + qkv projection + rotary: x [B, L, d] -> (q, k, v) [B, H, L, D].

    Positions are the absolute column index (padding is a suffix — the
    pileup-column invariant). No custom_vjp: the training path uses the jnp
    twin via attention_block's vjp recompute.
    """
    if _use_pallas() and x.shape[1] % 512 == 0:
        return _ln_qkv_rope_pallas(x, scale, bias, w, b, n_heads)
    return _ln_qkv_rope_jnp(x, scale, bias, w, b, n_heads)


def _ln_qkv_rope_q_kernel(
    x_ref, scale_ref, bias_ref, w_ref, s_ref, b_ref, q_ref, k_ref, v_ref,
    *, n_heads: int, blk_t: int,
):
    """int8 variant: LN -> per-row int8 activations -> int8 MXU matmul ->
    dequant -> rope epilogue."""
    y = layernorm(x_ref[0], scale_ref[0], bias_ref[0]).astype(jnp.float32)
    y_i8, s_row = _quant_rows(y)
    qkv = (
        _int8_mm(y_i8, s_row, w_ref[...], s_ref[0])
        + b_ref[...].astype(jnp.float32)
    ).astype(q_ref.dtype)

    H = n_heads
    D = q_ref.shape[-1]
    pos0 = pl.program_id(1) * blk_t
    cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
    for h in range(H):
        q_ref[0, h] = _rope_apply(qkv[:, h * D : (h + 1) * D], cos, sin)
        k_ref[0, h] = _rope_apply(
            qkv[:, (H + h) * D : (H + h + 1) * D], cos, sin
        )
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def _ln_qkv_rope_q_pallas(x, scale, bias, w_i8, s_col, b, n_heads: int,
                          blk_t: int = 512):
    B, L, d = x.shape
    H = n_heads
    D = w_i8.shape[1] // (3 * H)
    blk_t = min(blk_t, L)
    assert L % blk_t == 0, (L, blk_t)
    kernel = functools.partial(_ln_qkv_rope_q_kernel, n_heads=H, blk_t=blk_t)
    out_shape = jax.ShapeDtypeStruct((B, H, L, D), x.dtype)
    out_spec = pl.BlockSpec(
        (1, H, blk_t, D), lambda b_, i: (b_, 0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, L // blk_t),
        in_specs=[
            pl.BlockSpec((1, blk_t, d), lambda b_, i: (b_, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * H * D), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H * D), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H * D), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * d * 3 * H * D,
            bytes_accessed=B * L * d * x.dtype.itemsize
            + 3 * B * L * H * D * x.dtype.itemsize + d * 3 * H * D,
            transcendentals=B * L * D,
        ),
    )(x, scale[None, :], bias[None, :], w_i8, s_col[None, :], b[None, :])


def _ln_qkv_rope_q_jnp(x, scale, bias, w_i8, s_col, b, n_heads: int):
    B, L, d = x.shape
    H = n_heads
    D = w_i8.shape[1] // (3 * H)
    qkv = _ln_matmul_q_jnp(
        x.reshape(-1, d), scale, bias, w_i8, s_col, b
    ).reshape(B, L, 3, H, D)
    pos = jnp.tile(jnp.arange(L, dtype=jnp.int32), B)[:, None]
    freq = jnp.exp(
        -math.log(10000.0) * jnp.arange(D // 2, dtype=jnp.float32)[None, :] / (D // 2)
    )
    ang = pos.astype(jnp.float32) * freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    rot = lambda t: _rope_apply(t.reshape(B * L, D), cos, sin).reshape(B, L, D)
    q = jnp.stack([rot(qkv[:, :, 0, h]) for h in range(H)], axis=1)
    k = jnp.stack([rot(qkv[:, :, 1, h]) for h in range(H)], axis=1)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def attention_block_q(x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths, n_heads,
                      local_window):
    """int8 attention block (inference only): the qkv projection runs int8
    (dynamic per-row activations, per-channel weights); attention itself and
    the out projection stay bf16 (D=128 scores are MXU-cheap; softmax/exp is
    the cost and unaffected by operand dtype)."""
    w_i8, s_col = quantize_weight(w_qkv)
    if _use_pallas() and x.shape[1] % 512 == 0:
        q, k, v = _ln_qkv_rope_q_pallas(
            x, ln_s, ln_b, w_i8, s_col, b_qkv, n_heads
        )
        return _flash_outproj_pallas(q, k, v, x, wo, bo, lengths, local_window)
    q, k, v = _ln_qkv_rope_q_jnp(x, ln_s, ln_b, w_i8, s_col, b_qkv, n_heads)
    return _flash_outproj_jnp(q, k, v, x, wo, bo, lengths, local_window)


# ---------------------------------------------------------------------------
# flash_outproj: flash attention + output projection + residual in one
# kernel. The output block (b, i) stays resident in VMEM while the grid's
# innermost head dimension cycles, accumulating each head's attn @ Wo_h —
# the concatenated [B, L, H*D] attention output never exists in HBM.
# ---------------------------------------------------------------------------


def _flash_outproj_kernel(
    len_ref,  # SMEM [B]
    q_ref,  # VMEM [1, 1, blk_q, D]
    k_ref,  # VMEM [1, 1, Lk, D]
    v_ref,  # VMEM [1, 1, Lk, D]
    x_ref,  # VMEM [1, blk_q, d_model] (residual stream)
    wo_ref,  # VMEM [1, D, d_model] (head h's slice of the out projection)
    bo_ref,  # VMEM [1, d_model]
    o_ref,  # VMEM [1, blk_q, d_model]
    *,
    blk_q: int,
    blk_k: int,
    lk: int,
    scale: float,
    local_window: int | None,
    n_heads: int,
):
    qi = pl.program_id(1)
    h = pl.program_id(2)
    length = len_ref[pl.program_id(0)]
    q = q_ref[0, 0]  # [blk_q, D]

    n_kb = lk // blk_k
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
        v = v_ref[0, 0, pl.ds(kb * blk_k, blk_k), :]
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

    acc = jnp.zeros((blk_q, q.shape[1]), dtype=jnp.float32)
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

    attn = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(q.dtype)  # [blk_q, D]
    part = jax.lax.dot_general(
        attn, wo_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk_q, d_model] f32

    @pl.when(h == 0)
    def _init():
        o_ref[0] = (
            x_ref[0].astype(jnp.float32) + bo_ref[...].astype(jnp.float32) + part
        ).astype(o_ref.dtype)

    @pl.when(h != 0)
    def _acc():
        o_ref[0] = (o_ref[0].astype(jnp.float32) + part).astype(o_ref.dtype)


def _banded_flash_outproj_kernel(
    len_ref,  # SMEM [B]
    q_ref,  # VMEM [1, 1, blk, D]
    *rest,  # 2*n_tiles k/v tile refs, x_ref, wo_ref, bo_ref, o_ref
    blk: int,
    n_side: int,
    nq: int,
    scale: float,
    local_window: int,
):
    n_tiles = 2 * n_side + 1
    k_refs = rest[:n_tiles]
    v_refs = rest[n_tiles : 2 * n_tiles]
    x_ref, wo_ref, bo_ref, o_ref = rest[2 * n_tiles :]

    qi = pl.program_id(1)
    h = pl.program_id(2)
    length = len_ref[pl.program_id(0)]
    q = q_ref[0, 0]  # [blk, D]

    # iq - ik plane, shared by every tile's band mask (the per-tile mask is
    # |c_j + iq - ik| <= w with a scalar c_j, so the expensive [blk, blk]
    # part is computed once).
    d0 = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) - \
        jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    ik_row = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)

    # Block-aligned band (w == n_side*blk, the production shape): the band
    # test degenerates to a *static* triangle on the two edge tiles and to
    # no test at all on the inner tiles — the general |d0+c|<=w evaluation
    # (4-5 VPU ops over [blk, blk] per tile) was ~1/3 of the measured flash
    # time at L=9216 (tools/ablate_fused.py round 3).
    aligned = local_window % blk == 0
    if aligned:
        tri_lo = d0 <= 0  # leftmost tile: ik >= iq
        tri_hi = d0 >= 0  # rightmost tile: ik <= iq

    parts = []
    for t in range(n_tiles):
        j = t - n_side
        kb = jnp.clip(qi + j, 0, nq - 1)
        s = scale * jax.lax.dot_general(
            q, k_refs[t][0, 0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk, blk]
        if aligned:
            # Clamped (duplicated) edge tiles contribute nothing: the valid
            # scalar folds into the [1, blk] length mask for free.
            valid = qi + j == kb
            mask = valid & ((kb * blk + ik_row) < length)  # [1, blk]
            if t == 0:
                mask = mask & tri_lo
            elif t == n_tiles - 1:
                mask = mask & tri_hi
        else:
            # General band: poison the offset of clamped tiles so the band
            # test fails everywhere.
            c = jnp.where(qi + j != kb, jnp.int32(1 << 20), (qi - kb) * blk)
            band = jnp.abs(d0 + c) <= local_window
            mask = band & ((kb * blk + ik_row) < length)
        parts.append(jnp.where(mask, s, NEG_INF))

    s = jnp.concatenate(parts, axis=1)  # [blk, n_tiles*blk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v_cat = jnp.concatenate([vr[0, 0] for vr in v_refs], axis=0)
    pv = jax.lax.dot_general(
        p.astype(v_cat.dtype), v_cat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, D]
    attn = (pv / jnp.maximum(l, 1e-30)).astype(q.dtype)
    part = jax.lax.dot_general(
        attn, wo_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk, d_model] f32

    @pl.when(h == 0)
    def _init():
        o_ref[0] = (
            x_ref[0].astype(jnp.float32) + bo_ref[...].astype(jnp.float32) + part
        ).astype(o_ref.dtype)

    @pl.when(h != 0)
    def _acc():
        o_ref[0] = (o_ref[0].astype(jnp.float32) + part).astype(o_ref.dtype)


def _banded_flash_outproj_rot_kernel(
    len_ref,  # SMEM [B]
    *refs,  # q, M k-slots, M v-slots, x, wo, bo, o   (M = 2*n_side+1)
    blk: int,
    nq: int,
    n_side: int,
    scale: float,
):
    M = 2 * n_side + 1
    q_ref = refs[0]
    k_refs = refs[1 : 1 + M]
    v_refs = refs[1 + M : 1 + 2 * M]
    x_ref, wo_ref, bo_ref, o_ref = refs[1 + 2 * M :]

    qi = pl.program_id(1)
    length = len_ref[pl.program_id(0)]
    H = q_ref.shape[1]

    # iq - ik plane shared by the two triangular band edges. With the band
    # block-aligned (w == n_side*blk) only the outermost slots need a
    # triangle: offset j = -n_side demands ik >= iq, j = +n_side ik <= iq,
    # |j| < n_side is always in band — d0 * j >= 0 with d0 scaled by
    # whether |j| == n_side covers all three cases in one expression.
    d0 = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0) - \
        jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    ik_row = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)

    base = qi - n_side
    masks = []
    for m in range(M):
        j = ((m - base) % M) - n_side  # this slot's block offset from qi
        b_raw = qi + j
        valid = jnp.logical_and(b_raw >= 0, b_raw < nq)
        edge = jnp.abs(j) == n_side  # only edge slots carry a triangle
        band = d0 * jnp.where(edge, j, 0) >= 0
        masks.append(band & ((b_raw * blk + ik_row) < length) & valid)

    acc = jnp.zeros((blk, x_ref.shape[-1]), dtype=jnp.float32)
    for h in range(H):
        qh = q_ref[0, h]  # [blk, D]
        parts = []
        for m in range(M):
            s = scale * jax.lax.dot_general(
                qh, k_refs[m][0, h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk, blk]
            parts.append(jnp.where(masks[m], s, NEG_INF))
        s = jnp.concatenate(parts, axis=1)  # [blk, M*blk] slot order
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v_cat = jnp.concatenate([v_refs[m][0, h] for m in range(M)], axis=0)
        pv = jax.lax.dot_general(
            p.astype(v_cat.dtype), v_cat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk, D]
        attn = (pv / jnp.maximum(l, 1e-30)).astype(qh.dtype)
        acc = acc + jax.lax.dot_general(
            attn, wo_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    o_ref[0] = (
        x_ref[0].astype(jnp.float32) + bo_ref[...].astype(jnp.float32) + acc
    ).astype(o_ref.dtype)


def _banded_flash_outproj_rot_pallas(
    q, k, v, x, wo, bo, lengths, local_window, blk: int = 256,
    interpret: bool = False,
):
    """Rotation-slot banded flash for block-aligned bands (w % blk == 0):
    heads fold into the kernel (grid (B, nq)) and K/V tile slot m always
    holds the block ≡ m (mod M) inside [qi-n_side, qi+n_side], so as the
    query block advances exactly ONE slot's tiles change and Mosaic's
    revisit cache keeps the rest resident — the tile-per-head kernel
    refetched all 2M tiles for every (block, head) program, ~2/3 of its
    HBM bytes at L=9216. blk=256 (M=5 at w=512) keeps the folded-head
    working set inside the 16 MB VMEM scoped limit (blk=512 with folded
    heads OOMs at 17.7 MB) and trims per-row band waste from 3*512 to
    5*256 key columns. Numerics: softmax/PV run over the slot-rotated key
    order, a pure permutation of the contraction axis (outputs equal up
    to f32 accumulation order; parity tested against the jnp twin)."""
    B, H, L, D = q.shape
    d_model = x.shape[-1]
    assert L % blk == 0 and local_window % blk == 0, (L, blk, local_window)
    nq = L // blk
    n_side = local_window // blk
    M = 2 * n_side + 1
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(
        _banded_flash_outproj_rot_kernel, blk=blk, nq=nq, n_side=n_side,
        scale=scale,
    )

    def slot_spec(m):
        def idx(b, i, lens, m=m):
            base = i - n_side
            return (b, 0, jnp.clip(base + ((m - base) % M), 0, nq - 1), 0)

        return pl.BlockSpec((1, H, blk, D), idx, memory_space=pltpu.VMEM)

    kv_specs = [slot_spec(m) for m in range(M)]
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nq),
            in_specs=[
                pl.BlockSpec(
                    (1, H, blk, D), lambda b, i, lens: (b, 0, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                *kv_specs,
                *kv_specs,
                pl.BlockSpec(
                    (1, blk, d_model), lambda b, i, lens: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (H, D, d_model), lambda b, i, lens: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, d_model), lambda b, i, lens: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, blk, d_model), lambda b, i, lens: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, d_model), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * M * blk * D + 2 * B * L * H * D * d_model,
            bytes_accessed=B * H * L * D * 2 * 3
            + 2 * B * L * d_model * x.dtype.itemsize,
            transcendentals=B * H * L * M * blk,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, *([k] * M), *([v] * M), x, wo, bo[None, :])


def _banded_flash_outproj_pallas(
    q, k, v, x, wo, bo, lengths, local_window, blk: int = 512
):
    """Banded flash: K/V arrive as 2*n_side+1 block-aligned tiles around the
    query block instead of the full [L, D] slab, cutting the per-(query
    block, head) HBM traffic ~6x at L=9216 (the measured flash bottleneck —
    tools/ablate_fused.py round 3: 7.3 of 9 ms/layer). Semantics identical
    to the full kernel: |q_pos - k_pos| <= local_window and k_pos < length."""
    B, H, L, D = q.shape
    d_model = x.shape[-1]
    blk = min(blk, L)
    assert L % blk == 0, (L, blk)
    nq = L // blk
    n_side = -(-local_window // blk)  # ceil
    n_tiles = 2 * n_side + 1
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(
        _banded_flash_outproj_kernel,
        blk=blk, n_side=n_side, nq=nq, scale=scale,
        local_window=local_window,
    )

    def tile_spec(j):
        return pl.BlockSpec(
            (1, 1, blk, D),
            lambda b, i, h, lens, j=j: (b, h, jnp.clip(i + j, 0, nq - 1), 0),
            memory_space=pltpu.VMEM,
        )

    kv_specs = [tile_spec(t - n_side) for t in range(n_tiles)]
    grid = (B, nq, H)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, blk, D), lambda b, i, h, lens: (b, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                *kv_specs,
                *kv_specs,
                pl.BlockSpec(
                    (1, blk, d_model), lambda b, i, h, lens: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, D, d_model), lambda b, i, h, lens: (h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, d_model), lambda b, i, h, lens: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, blk, d_model), lambda b, i, h, lens: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, d_model), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * n_tiles * blk * D
            + 2 * B * L * H * D * d_model,
            bytes_accessed=B * H * L * D * 2 * (1 + 2 * n_tiles)
            + 2 * B * L * d_model * x.dtype.itemsize,
            transcendentals=B * H * L * n_tiles * blk,
        ),
    )(
        lengths.astype(jnp.int32),
        q, *([k] * n_tiles), *([v] * n_tiles), x, wo, bo[None, :],
    )


def _flash_outproj_pallas(
    q, k, v, x, wo, bo, lengths, local_window,
    blk_q: int = 512, blk_k: int = 512,
):
    import os

    # Kernel choice for the banded case (production): the rotation-slot
    # folded-head kernel measures 8.34 vs 9.20 ms/layer-call at d512/H4
    # L=9216 (tools/micro_flash.py, on-chip A/B, parity 2 bf16 ulps).
    # HERRO_TPU_FLASH=tile restores the tile-per-head kernel.
    if (
        local_window is not None
        and local_window % 256 == 0
        and q.shape[2] % 256 == 0
        and os.environ.get("HERRO_TPU_FLASH", "rot") == "rot"
    ):
        return _banded_flash_outproj_rot_pallas(
            q, k, v, x, wo, bo, lengths, local_window, blk=256
        )
    if local_window is not None and q.shape[2] % max(blk_q, blk_k) == 0:
        return _banded_flash_outproj_pallas(
            q, k, v, x, wo, bo, lengths, local_window, blk=max(blk_q, blk_k)
        )
    return _flash_outproj_full_pallas(
        q, k, v, x, wo, bo, lengths, local_window, blk_q, blk_k
    )


def _flash_outproj_full_pallas(
    q, k, v, x, wo, bo, lengths, local_window,
    blk_q: int = 512, blk_k: int = 512,
):
    B, H, L, D = q.shape
    d_model = x.shape[-1]
    blk_q = min(blk_q, L)
    blk_k = min(blk_k, L)
    assert L % blk_q == 0 and L % blk_k == 0, (L, blk_q, blk_k)
    scale = 1.0 / math.sqrt(D)
    kernel = functools.partial(
        _flash_outproj_kernel,
        blk_q=blk_q, blk_k=blk_k, lk=L, scale=scale,
        local_window=local_window, n_heads=H,
    )
    # h innermost: the output block (b, i) is revisited while h cycles, so
    # the per-head projections accumulate in VMEM.
    grid = (B, L // blk_q, H)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, blk_q, D), lambda b, i, h, lens: (b, h, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda b, i, h, lens: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, L, D), lambda b, i, h, lens: (b, h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, blk_q, d_model), lambda b, i, h, lens: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, D, d_model), lambda b, i, h, lens: (h, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, d_model), lambda b, i, h, lens: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, blk_q, d_model), lambda b, i, h, lens: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, d_model), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * L * (min(L, 2 * (local_window or L)) * D)
            + 2 * B * L * H * D * d_model,
            bytes_accessed=4 * B * L * H * D * q.dtype.itemsize
            + 2 * B * L * d_model * x.dtype.itemsize,
            transcendentals=B * H * L * min(L, 2 * (local_window or L)),
        ),
    )(lengths.astype(jnp.int32), q, k, v, x, wo, bo[None, :])


def _flash_outproj_jnp(q, k, v, x, wo, bo, lengths, local_window):
    from .attention import chunked_attention

    B, H, L, D = q.shape
    attn = chunked_attention(q, k, v, lengths, local_window)  # [B, H, L, D]
    out = jnp.einsum(
        "bhld,hdo->blo",
        attn.astype(jnp.float32),
        wo.astype(jnp.float32),
    )
    return (x.astype(jnp.float32) + out + bo.astype(jnp.float32)).astype(
        x.dtype
    )


def flash_outproj(q, k, v, x, wo, bo, lengths, local_window):
    """Flash attention + out projection + residual:
    y = x + concat_h(attn_h) @ Wo + bo, with wo passed as [H, D, d_model]."""
    if _use_pallas() and x.shape[1] % 512 == 0:
        return _flash_outproj_pallas(q, k, v, x, wo, bo, lengths, local_window)
    return _flash_outproj_jnp(q, k, v, x, wo, bo, lengths, local_window)


# ---------------------------------------------------------------------------
# attention_block: ln_qkv_rope + flash_outproj with a recompute backward so
# the training path can use the fused forward too.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def attention_block(x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths, n_heads,
                    local_window):
    """Pre-norm attention block: x + MHA(rope(LN(x)·Wqkv)) @ Wo + bo.

    x [B, L, d]; w_qkv [d, 3*H*D] ((3,H,D) c-major flattening); wo
    [H, D, d]; lengths [B]. Fused pallas on TPU, jnp twins elsewhere."""
    return _attention_block_impl(
        x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths, n_heads, local_window
    )


def _attention_block_impl(x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths,
                          n_heads, local_window):
    q, k, v = ln_qkv_rope(x, ln_s, ln_b, w_qkv, b_qkv, n_heads)
    return flash_outproj(q, k, v, x, wo, bo, lengths, local_window)


def _attention_block_twin(x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths,
                          n_heads, local_window):
    q, k, v = _ln_qkv_rope_jnp(x, ln_s, ln_b, w_qkv, b_qkv, n_heads)
    return _flash_outproj_jnp(q, k, v, x, wo, bo, lengths, local_window)


def _attention_block_fwd(x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths,
                         n_heads, local_window):
    out = _attention_block_impl(
        x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths, n_heads, local_window
    )
    return out, (x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths)


def _attention_block_bwd(n_heads, local_window, res, g):
    x, ln_s, ln_b, w_qkv, b_qkv, wo, bo, lengths = res
    _, vjp = jax.vjp(
        lambda *a: _attention_block_twin(*a, lengths, n_heads, local_window),
        x, ln_s, ln_b, w_qkv, b_qkv, wo, bo,
    )
    return vjp(g) + (None,)


attention_block.defvjp(_attention_block_fwd, _attention_block_bwd)
