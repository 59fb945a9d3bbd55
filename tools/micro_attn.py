"""Microbench the two halves of attention_block on real silicon.

Chained (DCE/memoization-proof) timings of ln_qkv_rope and flash_outproj
standalone at step shapes, plus full-step variants at other (B, window)
points.

    python tools/micro_attn.py [B] [L]
"""

from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from herro_tpu.models.model import R10_CONFIG
from herro_tpu.ops import fused


def _time(f, args_sets, n, label):
    t0 = time.perf_counter()
    np.asarray(jax.jit(f)(*args_sets[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(jax.jit(f)(*args_sets[1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:8.2f} ms/iter  [compile {tc:.0f}s]", flush=True)
    return dt


def bench_qkv(B, L, n=20):
    cfg = R10_CONFIG
    d, H = cfg.d_model, cfg.n_heads
    D = d // H
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.02, (d, 3 * d)), dt)
    b = jnp.zeros((3 * d,), dt)
    s = jnp.ones((d,), jnp.float32)
    bb = jnp.zeros((d,), jnp.float32)

    def chained(x):
        def body(i, x):
            q, k, v = fused.ln_qkv_rope(x, s, bb, w, b, H)
            # fold all three outputs back into the carry without layout
            # changes: reduce over the head axis -> [B, L]
            mix = (q.sum(axis=(1, 3)) + k.sum(axis=(1, 3)) + v.sum(axis=(1, 3)))
            return x + (mix[:, :, None] * (1e-6 * (1 + i % 3))).astype(dt)

        return jax.lax.fori_loop(0, n, body, x)

    sets = [
        [jnp.asarray(np.random.default_rng(sd).normal(0, 1, (B, L, d)), dt)]
        for sd in (3, 4)
    ]
    return _time(chained, sets, n, f"ln_qkv_rope B={B} L={L}")


def bench_flash(B, L, window, n=20):
    cfg = R10_CONFIG
    d, H = cfg.d_model, cfg.n_heads
    D = d // H
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    wo = jnp.asarray(rng.normal(0, 0.02, (H, D, d)), dt)
    bo = jnp.zeros((d,), dt)
    lengths = jnp.full((B,), L, jnp.int32)

    def chained(q, k, v, x):
        def body(i, x):
            y = fused.flash_outproj(q, k, v, x, wo, bo, lengths, window)
            return (
                x + (y - x) * (1e-3 * (1 + i % 3)).astype(dt)
            )  # data-dependent but bounded

        return jax.lax.fori_loop(0, n, body, x)

    sets = []
    for sd in (3, 4):
        r = np.random.default_rng(sd)
        q = jnp.asarray(r.normal(0, 1, (B, H, L, D)), dt)
        k = jnp.asarray(r.normal(0, 1, (B, H, L, D)), dt)
        v = jnp.asarray(r.normal(0, 1, (B, H, L, D)), dt)
        x = jnp.asarray(r.normal(0, 1, (B, L, d)), dt)
        sets.append([q, k, v, x])
    return _time(chained, sets, n, f"flash_outproj B={B} L={L} w={window}")


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 9216
    print(f"backend={jax.default_backend()}  B={B} L={L}", flush=True)
    tq = bench_qkv(B, L)
    tf = bench_flash(B, L, 512)
    bench_flash(B, L, 256)
    print(f"\nper-layer: qkv {tq*1e3:.2f} ms + flash {tf*1e3:.2f} ms")


if __name__ == "__main__":
    main()
