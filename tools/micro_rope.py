"""Chip micro-ablation: is split-half rope the ln_qkv_rope bottleneck?

Times three variants of the fused LN+qkv+rope kernel at the production
layer shape, chained DCE/memoization-proof (bench._chip_only recipe):

  a) current kernel (split-half rope: 64-wide minor-dim slices + concat)
  b) no-rope control (LN + matmul + head split only) — the roofline
  c) R-matmul rope: x*cos_d + (x @ R)*sin_d with R the constant
     [[0,-I],[I,0]] rotation, cos_d/sin_d duplicated to [T, D] — the
     rotation rides the MXU instead of lane-shuffling the VPU.

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

from herro_tpu.ops import fused
from herro_tpu.ops.fused import _rope_tables_blk, layernorm


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

    cos, sin = _rope_tables_blk(pos0, blk_t, D // 2)
    if mode == "split":
        from herro_tpu.ops.fused import _rope_apply

        for h in range(H):
            q_ref[0, h] = _rope_apply(qkv[:, h * D : (h + 1) * D], cos, sin)
            k_ref[0, h] = _rope_apply(
                qkv[:, (H + h) * D : (H + h + 1) * D], cos, sin
            )
            v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]
        return

    # mode == "rmat": rope via constant rotation matrix on the MXU.
    # R[i, j]: column j of x@R is x[:, j+Dh] * -1 for j < Dh else x[:, j-Dh]
    # i.e. x_rot = concat(-x2, x1) = x @ R with R[[0, I], [-I, 0]] layout.
    half = D // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    rmat = (
        jnp.where((row == col + half), 1.0, 0.0)
        - jnp.where((col == row + half), 1.0, 0.0)
    ).astype(qkv.dtype)
    cos_d = jnp.concatenate([cos, cos], axis=1)  # [blk, D] f32
    sin_d = jnp.concatenate([sin, sin], axis=1)

    def rope_r(t):  # [blk, D]
        rot = jax.lax.dot_general(
            t, rmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (t.astype(jnp.float32) * cos_d + rot * sin_d).astype(t.dtype)

    for h in range(H):
        q_ref[0, h] = rope_r(qkv[:, h * D : (h + 1) * D])
        k_ref[0, h] = rope_r(qkv[:, (H + h) * D : (H + h + 1) * D])
        v_ref[0, h] = qkv[:, (2 * H + h) * D : (2 * H + h + 1) * D]


def build(mode: str, B, L, d, H, D, blk_t=512):
    kernel = functools.partial(
        _kernel_variant, n_heads=H, blk_t=blk_t, mode=mode
    )
    out_shape = jax.ShapeDtypeStruct((B, H, L, D), jnp.bfloat16)
    out_spec = pl.BlockSpec(
        (1, H, blk_t, D), lambda b_, i: (b_, 0, i, 0), memory_space=pltpu.VMEM
    )

    def f(x, scale, bias, w, b):
        return pl.pallas_call(
            kernel,
            grid=(B, L // blk_t),
            in_specs=[
                pl.BlockSpec((1, blk_t, d), lambda b_, i: (b_, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, 3 * H * D), lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * H * D), lambda b_, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[out_spec, out_spec, out_spec],
            out_shape=[out_shape, out_shape, out_shape],
        )(x, scale[None, :], bias[None, :], w, b[None, :])

    return f


def time_variant(mode: str, B, L, d=512, H=4, D=128, n=20) -> float:
    f = build(mode, B, L, d, H, D)

    def chained(x, scale, bias, w, b):
        def body(i, x):
            q, k, v = f(x, scale, bias, w, b)
            # fold all outputs back into the carry, perturb per iteration
            mix = (
                q.transpose(0, 2, 1, 3).reshape(B, L, d)
                + k.transpose(0, 2, 1, 3).reshape(B, L, d)
                + v.transpose(0, 2, 1, 3).reshape(B, L, d)
            )
            return x + mix * 1e-3 + (i % 7) * 1e-6
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
        t0 = time.perf_counter()
        np.asarray(g(x, scale, bias, w, b))
        dt = (time.perf_counter() - t0) / n
        if seed > 3:  # first run pays compile
            best = min(best, dt)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 9216
    print(f"micro_rope B={B} L={L} backend={jax.default_backend()}", flush=True)

    # correctness first: rmat must equal split exactly in f32 elementwise
    d, H, D = 512, 4, 128
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, 512, d)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.02, (d, 3 * H * D)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.02, (3 * H * D,)), jnp.bfloat16)
    s1 = jnp.ones((d,), jnp.float32)
    b1 = jnp.zeros((d,), jnp.float32)
    qa, ka, va = build("split", B, 512, d, H, D)(x, s1, b1, w, b)
    qb, kb, vb = build("rmat", B, 512, d, H, D)(x, s1, b1, w, b)
    for t1, t2, nm in ((qa, qb, "q"), (ka, kb, "k"), (va, vb, "v")):
        diff = np.abs(np.asarray(t1, np.float32) - np.asarray(t2, np.float32))
        print(f"  parity {nm}: max abs diff {diff.max():.6f}")

    for mode in ("none", "split", "rmat"):
        dt = time_variant(mode, B, L)
        print(f"  {mode:6s} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
