"""Round-4 systematic-robustness fine-tune of the flagship checkpoint.

Fine-tunes the promoted d512x3L flagship on a focused shard mix: the three
systematic-error shards (locus-correlated confident miscalls, strand bias,
chimeras, coverage dropouts — the regime where the committed battery shows
Q31.25 vs an oracle ceiling of Q38.72) plus a representative slice of the
standard curriculum (R10 coverage ladder, R9 noise, R9 low-coverage) so the
short fine-tune cannot drift off the already-gated regimes. The full
14-shard curriculum rebuild costs ~45 min of single-core featgen in this
environment; this subset reuses the per-profile cache and adds only the new
shards.

Usage: python tools/finetune_sys.py OUT_DIR [--steps 600] [--lr 1e-4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--base", default="resources/model_r10_sim")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--cache", default="/tmp/currcache")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from herro_tpu.models.checkpoint import load_or_init, save_model
    from herro_tpu.training.data import (
        CURRICULUM,
        bucketed_batch_iterator,
        curriculum_windows,
    )
    from herro_tpu.training.train import Trainer

    by_name = {p.name: p for p in CURRICULUM}
    mix = tuple(
        by_name[n]
        for n in (
            # systematic-error shards: the fine-tune target
            "sys30x",
            "sys-noisy22x",
            "sys-rough18x",
            # anchors: keep the gated regimes in the gradient
            "r10-low15x",
            "r10-mid28x",
            "r10-high60x",
            "r10-clean30x",
            "r9-noisy30x",
            "r9-mid45x",
            "r9-low10x",
        )
    )
    windows = curriculum_windows(4096, cache_dir=args.cache, profiles=mix)
    print(f"[finetune] {len(windows)} windows from {len(mix)} shards",
          file=sys.stderr)

    cfg, params = load_or_init(args.base)
    trainer = Trainer(
        cfg, params, lr=args.lr, total_steps=args.steps, hard_weight=3.0
    )
    it = bucketed_batch_iterator(
        windows, args.batch_size, n_epochs=10_000, seed=args.seed
    )
    for batch in it:
        metrics = trainer.train_step(batch)
        if trainer.state.step % 50 == 0:
            print(
                f"step {trainer.state.step}: "
                + " ".join(f"{k}={v:.4f}" for k, v in metrics.items()),
                file=sys.stderr, flush=True,
            )
        if trainer.state.step % 250 == 0:
            trainer.save(args.output)
        if trainer.state.step >= args.steps:
            break
    save_model(args.output, cfg, trainer.state.params)
    print(f"[finetune] saved {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
