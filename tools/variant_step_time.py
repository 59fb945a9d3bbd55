"""Step-time probe for model-shape variants (VERDICT r2 item 10).

Measures the fused correct step on the real chip for the flagship shape vs
same-parameter-budget wider-shallower candidates (head_dim pinned at 128 so
flash tiles stay lane-aligned). Uses the DCE/memoization-proof chained
method from bench.py. Only shapes that beat the flagship step time are worth
training for the quality gate.
"""

from __future__ import annotations

import dataclasses
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from herro_tpu.models.model import R10_CONFIG, ModelConfig, init_params  # noqa: E402


def n_params(cfg: ModelConfig) -> int:
    import jax

    params = init_params(cfg, jax.random.PRNGKey(0))
    return sum(p.size for p in jax.tree.leaves(params))


def main() -> None:
    import bench

    shapes = {
        "flagship d256x8L ff1024": R10_CONFIG,
        "wide d512x3L ff1024": dataclasses.replace(
            R10_CONFIG, d_model=512, n_layers=3, n_heads=4, d_ff=1024
        ),
        "wide d384x5L ff1280": dataclasses.replace(
            R10_CONFIG, d_model=384, n_layers=5, n_heads=3, d_ff=1280
        ),
    }
    for name, cfg in shapes.items():
        print(f"{name}: {n_params(cfg)/1e6:.2f}M params", flush=True)
        for B, L, S in ((64, 4608, 128), (32, 9216, 256)):
            ws = bench._chip_only_cfg(cfg, B, L, S)
            print(f"  B={B} L={L}: {ws:.0f} windows/s ({B/ws*1e3:.1f} ms/step)",
                  flush=True)


if __name__ == "__main__":
    main()
