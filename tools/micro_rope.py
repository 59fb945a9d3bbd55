"""Chip micro-ablation: what does rope cost inside the fused qkv kernel?

The round-5 ablation (tools/ablate_fused.py at the promoted d512x3L,
B=32 L=9216) put ln_qkv_rope at 17 ms for 3 layers vs a ~7 ms roofline
(matmul 2.4 ms/layer at MXU peak + ~1.5 ms q/k/v HBM writes). The prime
suspect is `_rope_apply`: 64-wide minor-dim half-slices + concat force
lane-crossing relayouts on a 128-lane VPU. Variants, all timed with the
DCE/memoization-proof chained recipe (cheap sum-mix carry — an earlier
version of this tool folded outputs through full [B,L,d] transposes and
the harness swamped the 6 ms signal under ~890 ms of relayouts):

  none      LN + qkv matmul + head split only — the kernel's floor
  split     current production kernel (_rope_apply half-slices)
  roll      out = x*cos_d + pltpu.roll(x, 64, lanes)*sin_signed — one
            hardware lane rotation, full-width multiplies
  rmat      rotate-half via a constant 128x128 rotation matrix on the MXU
  roll_tbl  roll + cos/sin tables passed in as a kernel input instead of
            exp/cos/sin recomputed per program

Usage: python tools/micro_rope.py [B] [L]
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from herro_tpu.ops.fused import _rope_apply, _rope_tables_blk, layernorm


def _rope_roll(x, cos_d, sin_signed):
    """Rotate-half rope without slice/concat: one lane roll by D/2."""
    xf = x.astype(jnp.float32)
    rolled = pltpu.roll(xf, shift=x.shape[-1] // 2, axis=1)
    return (xf * cos_d + rolled * sin_signed).astype(x.dtype)


def _kernel_variant(
    x_ref, scale_ref, bias_ref, w_ref, b_ref, q_ref, k_ref, v_ref,
    *, n_heads: int, blk_t: int, mode: str,
):
    y = layernorm(x_ref[0], scale_ref[0], bias_ref[0])
    qkv = (
        jax.lax.dot_general(
            y, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...].astype(jnp.float32)
    ).astype(q_ref.dtype)

    H, D = n_heads, q_ref.shape[-1]
    pos0 = pl.program_id(1) * blk_t
    if mode == "none":
        for h in range(H):
            q_ref[0, h] = qkv[:, h * D : (h + 1) * D]
            k_ref[0, h] = qkv[:, (H + h) * D : (H + h + 1) * D]
            v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]
        return

    if mode == "split":
        cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
        rope = lambda t: _rope_apply(t, cos, sin)
    elif mode in ("roll", "roll_tbl"):
        cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
        cos_d = jnp.concatenate([cos, cos], axis=1)
        sin_signed = jnp.concatenate([-sin, sin], axis=1)
        rope = lambda t: _rope_roll(t, cos_d, sin_signed)
    else:  # rmat: x_rot = concat(-x2, x1) = x @ R, R = [[0, I], [-I, 0]]
        cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
        half = D // 2
        row = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
        rmat = (
            jnp.where(col == row + half, 1.0, 0.0)
            - jnp.where(row == col + half, 1.0, 0.0)
        ).astype(qkv.dtype)
        cos_d = jnp.concatenate([cos, cos], axis=1)
        sin_d = jnp.concatenate([sin, sin], axis=1)

        def rope(t):
            rot = jax.lax.dot_general(
                t, rmat, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (t.astype(jnp.float32) * cos_d + rot * sin_d).astype(t.dtype)

    for h in range(H):
        q_ref[0, h] = rope(qkv[:, h * D : (h + 1) * D])
        k_ref[0, h] = rope(qkv[:, (H + h) * D : (H + h + 1) * D])
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def _kernel_tbl(
    x_ref, scale_ref, bias_ref, w_ref, b_ref, cos_ref, sin_ref,
    q_ref, k_ref, v_ref, *, n_heads: int, blk_t: int,
):
    """roll_tbl: tables arrive precomputed [blk_t, D] (cos dup / sin signed)."""
    y = layernorm(x_ref[0], scale_ref[0], bias_ref[0])
    qkv = (
        jax.lax.dot_general(
            y, w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ref[...].astype(jnp.float32)
    ).astype(q_ref.dtype)
    H, D = n_heads, q_ref.shape[-1]
    cos_d, sin_signed = cos_ref[...], sin_ref[...]
    rope = lambda t: _rope_roll(t, cos_d, sin_signed)
    for h in range(H):
        q_ref[0, h] = rope(qkv[:, h * D : (h + 1) * D])
        k_ref[0, h] = rope(qkv[:, (H + h) * D : (H + h + 1) * D])
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def build(mode: str, B, L, d, H, D, blk_t=512):
    out_shape = jax.ShapeDtypeStruct((B, H, L, D), jnp.bfloat16)
    out_spec = pl.BlockSpec(
        (1, H, blk_t, D), lambda b_, i: (b_, 0, i, 0), memory_space=pltpu.VMEM
    )
    base_specs = [
        pl.BlockSpec((1, blk_t, d), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 3 * H * D), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * H * D), lambda b_, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]

    if mode == "roll_tbl":
        kernel = functools.partial(_kernel_tbl, n_heads=H, blk_t=blk_t)
        tbl_spec = pl.BlockSpec(
            (blk_t, D), lambda b_, i: (i, 0), memory_space=pltpu.VMEM
        )
        pos = np.arange(L)[:, None]
        freq = np.exp(-math.log(10000.0) * np.arange(D // 2) / (D // 2))
        ang = pos * freq[None, :]
        cos_d = np.concatenate([np.cos(ang), np.cos(ang)], axis=1)
        sin_signed = np.concatenate([-np.sin(ang), np.sin(ang)], axis=1)
        cos_d = jnp.asarray(cos_d, jnp.float32)
        sin_signed = jnp.asarray(sin_signed, jnp.float32)

        def f(x, scale, bias, w, b):
            return pl.pallas_call(
                kernel,
                grid=(B, L // blk_t),
                in_specs=base_specs + [tbl_spec, tbl_spec],
                out_specs=[out_spec, out_spec, out_spec],
                out_shape=[out_shape, out_shape, out_shape],
            )(x, scale[None, :], bias[None, :], w, b[None, :], cos_d,
              sin_signed)

        return f

    kernel = functools.partial(
        _kernel_variant, n_heads=H, blk_t=blk_t, mode=mode
    )

    def f(x, scale, bias, w, b):
        return pl.pallas_call(
            kernel,
            grid=(B, L // blk_t),
            in_specs=base_specs,
            out_specs=[out_spec, out_spec, out_spec],
            out_shape=[out_shape, out_shape, out_shape],
        )(x, scale[None, :], bias[None, :], w, b[None, :])

    return f


def time_variant(mode: str, B, L, d=512, H=4, D=128, n=50) -> float:
    f = build(mode, B, L, d, H, D)

    def chained(x, scale, bias, w, b):
        def body(i, x):
            q, k, v = f(x, scale, bias, w, b)
            # cheap DCE-proof carry: one reduction per output, fold into a
            # single column of x, perturb per iteration
            mix = (
                q.sum(axis=(1, 3)) + k.sum(axis=(1, 3)) + v.sum(axis=(1, 3))
            )  # [B, L] f32
            return x.at[:, :, 0].add(
                (mix * 1e-6 + (i % 7) * 1e-7).astype(x.dtype)
            )
        return jax.lax.fori_loop(0, n, body, x)

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (d, 3 * H * D)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.02, (3 * H * D,)), jnp.bfloat16)
    scale = jnp.ones((d,), jnp.float32)
    bias = jnp.zeros((d,), jnp.float32)
    g = jax.jit(chained)
    best = float("inf")
    for seed in (3, 4, 5):
        x = jnp.asarray(rng.normal(0, 1, (B, L, d)), jnp.bfloat16)
        # settle the 300 MB input on device before timing (tiny real fetch;
        # block_until_ready is unreliable on the axon remote executor)
        np.asarray(jnp.sum(x[:1, :1]))
        t0 = time.perf_counter()
        out = g(x, scale, bias, w, b)
        np.asarray(out[0, :1, :128])  # small real fetch
        dt = (time.perf_counter() - t0) / n
        if seed > 3:  # first run pays compile
            best = min(best, dt)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 9216
    print(f"micro_rope B={B} L={L} backend={jax.default_backend()}", flush=True)

    # correctness first: every rope variant must match `split` exactly
    d, H, D = 512, 4, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, 512, d)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, (d, 3 * H * D)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.02, (3 * H * D,)), jnp.bfloat16)
    s1 = jnp.ones((d,), jnp.float32)
    b1 = jnp.zeros((d,), jnp.float32)
    ref = build("split", B, 512, d, H, D)(x, s1, b1, w, b)
    for mode in ("roll", "rmat", "roll_tbl"):
        got = build(mode, B, 512, d, H, D)(x, s1, b1, w, b)
        for t1, t2, nm in zip(ref, got, "qkv"):
            diff = np.abs(
                np.asarray(t1, np.float32) - np.asarray(t2, np.float32)
            )
            print(f"  parity {mode}/{nm}: max abs diff {diff.max():.6f}",
                  flush=True)

    for mode in ("none", "split", "roll", "rmat", "roll_tbl"):
        dt = time_variant(mode, B, L)
        print(f"  {mode:8s} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
