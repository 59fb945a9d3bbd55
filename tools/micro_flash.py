"""Chip A/B: tile-per-head banded flash vs the rotation-slot variant.

The production banded flash (_banded_flash_outproj_pallas) refetches all
six K/V tiles for every (query block, head) program — ~2/3 of its HBM
bytes at d512/H4/L9216. The rotation-slot kernel folds heads into the
program and pins tile slot m to the block ≡ m (mod 3) around the query
block, so one slot at most changes per grid step and the revisit cache
keeps the rest resident. Chained DCE/memoization-proof timing per
bench._chip_only; parity asserted on-chip before timing.

Usage: python tools/micro_flash.py [B] [L]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from herro_tpu.ops.fused import (
    _banded_flash_outproj_pallas,
    _banded_flash_outproj_rot_pallas,
)


def time_variant(fn, B, H, L, D, d, lengths, n=50) -> float:
    rng = np.random.default_rng(0)
    wo = jnp.asarray(rng.normal(0, 0.05, (H, D, d)), jnp.bfloat16)
    bo = jnp.asarray(rng.normal(0, 0.05, (d,)), jnp.bfloat16)

    def chained(q, k, v, x):
        def body(i, x):
            y = fn(q, k, v, x, wo, bo, lengths, 512)
            return y + ((i % 7).astype(x.dtype) * 1e-6)
        return jax.lax.fori_loop(0, n, body, x)

    g = jax.jit(chained)
    best = float("inf")
    for seed in (3, 4, 5):
        r = np.random.default_rng(seed)
        q = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
        k = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
        v = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
        x = jnp.asarray(r.normal(0, 1, (B, L, d)), jnp.bfloat16)
        # settle the ~1.2 GB of inputs on device BEFORE the timed region
        # (block_until_ready is unreliable on the axon remote executor —
        # force tiny real fetches instead); the dispatch would otherwise
        # wait on the tunnel uploads and read ~50x high
        for a in (q, k, v, x):
            np.asarray(jnp.sum(a[:1, :1]))
        t0 = time.perf_counter()
        out = g(q, k, v, x)
        np.asarray(out[0, 0, :128])  # small real fetch; output whole on dev
        dt = (time.perf_counter() - t0) / n
        if seed > 3:  # first run pays compile
            best = min(best, dt)
    return best


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 9216
    H, D, d = 4, 128, 512
    print(f"micro_flash B={B} L={L} backend={jax.default_backend()}",
          flush=True)
    lengths = jnp.asarray(
        np.clip(np.random.default_rng(1).integers(L - 900, L + 1, B), 1, L),
        jnp.int32,
    )

    # on-chip parity first (valid rows only; padding rows are discarded)
    r = np.random.default_rng(2)
    q = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
    k = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
    v = jnp.asarray(r.normal(0, 1, (B, H, L, D)), jnp.bfloat16)
    x = jnp.asarray(r.normal(0, 1, (B, L, d)), jnp.bfloat16)
    wo = jnp.asarray(r.normal(0, 0.05, (H, D, d)), jnp.bfloat16)
    bo = jnp.asarray(r.normal(0, 0.05, (d,)), jnp.bfloat16)
    a = np.asarray(
        _banded_flash_outproj_pallas(q, k, v, x, wo, bo, lengths, 512),
        np.float32,
    )
    b = np.asarray(
        _banded_flash_outproj_rot_pallas(q, k, v, x, wo, bo, lengths, 512),
        np.float32,
    )
    ln = np.asarray(lengths)
    valid = np.arange(L)[None, :] < ln[:, None]
    print(f"  parity: max abs diff {np.abs(a - b)[valid].max():.6f}",
          flush=True)

    for name, fn in (
        ("tile-per-head", _banded_flash_outproj_pallas),
        ("rotation-slot", _banded_flash_outproj_rot_pallas),
    ):
        dt = time_variant(fn, B, H, L, D, d, lengths)
        print(f"  {name:14s} {dt * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
