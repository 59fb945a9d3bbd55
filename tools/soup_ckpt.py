"""Interpolate two checkpoints of the same topology (model soup).

Writes theta = (1-alpha) * base + alpha * other for every parameter leaf.
Used to trade off a fine-tune's target-regime gain against base-regime
drift: when a focused fine-tune (e.g. tools/finetune_sys.py) overshoots
and regresses the gated standard regime, an interpolated soup frequently
recovers the base behaviour while keeping most of the specialist gain —
one battery eval per alpha, no retraining.

Usage: python tools/soup_ckpt.py BASE OTHER OUT --alpha 0.5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("other")
    ap.add_argument("output")
    ap.add_argument("--alpha", type=float, default=0.5,
                    help="weight on OTHER (0 = pure base, 1 = pure other)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host arithmetic

    from herro_tpu.models.checkpoint import load_model, save_model

    cfg_b, pb = load_model(args.base)
    cfg_o, po = load_model(args.other)
    assert cfg_b == cfg_o, f"topology mismatch: {cfg_b} vs {cfg_o}"

    a = args.alpha
    mixed = jax.tree_util.tree_map(lambda x, y: (1.0 - a) * x + a * y, pb, po)
    save_model(args.output, cfg_b, mixed)
    print(f"[soup] wrote {args.output} (alpha={a} on {args.other})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
