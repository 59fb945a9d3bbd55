"""Chip A/B: ln_ffn block size at the production shape.

The FFN stack measures 3.9 ms/layer at B=32 L=9216 vs a 3.1 ms MXU-peak
bound — already ~80% efficient; this checks whether a bigger token block
(fewer grid programs, larger matmuls) buys the remainder. Settled-input
chained timing per tools/micro_flash.py.

Usage: python tools/micro_ffn.py [B] [L]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from herro_tpu.ops.fused import _ln_ffn_pallas


def time_blk(blk_t: int, T: int, d=512, f=1024, n=50) -> float:
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(0, 0.02, (d, f)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.02, (f,)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.02, (f, d)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.02, (d,)), jnp.bfloat16)
    s = jnp.ones((d,), jnp.float32)
    bb = jnp.zeros((d,), jnp.float32)

    def chained(x):
        def body(i, x):
            y = _ln_ffn_pallas(x, s, bb, w1, b1, w2, b2, blk_t=blk_t)
            return y + ((i % 7).astype(x.dtype) * 1e-6)
        return jax.lax.fori_loop(0, n, body, x)

    g = jax.jit(chained)
    best = float("inf")
    for seed in (3, 4, 5):
        x = jnp.asarray(
            np.random.default_rng(seed).normal(0, 1, (T, 512)), jnp.bfloat16
        )
        np.asarray(jnp.sum(x[:1]))  # settle the input before timing
        t0 = time.perf_counter()
        out = g(x)
        np.asarray(out[0, :128])
        dt = (time.perf_counter() - t0) / n
        if seed > 3:
            best = min(best, dt)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 9216
    T = B * L
    print(f"micro_ffn T={T} backend={jax.default_backend()}", flush=True)
    for blk in (256, 512, 1024):
        dt = time_blk(blk, T)
        print(f"  blk_t={blk:5d} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
