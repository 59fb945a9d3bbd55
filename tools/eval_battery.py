"""Matched-seed eval battery: regimes x checkpoints -> one JSON artifact.

The single source of truth for quality claims (README's table is generated
from this file's output by tools/quality_table.py) and the promotion gate
for flagship-candidate checkpoints: every run in a regime shares the seed,
so floors (counting), candidates, and ceilings (oracle) are scored on
byte-identical features — the matched-seed methodology the reference can't
offer (its quality is only observable through downstream assembly QV,
README.md:106-145).

Usage:
    python tools/eval_battery.py OUT.json CKPT [CKPT ...]
        [--regimes standard,r9,lowcov10x] [--skip-oracle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# One eval regime = one simulated dataset (simulator kwargs); matched seeds
# within a regime. `standard`/`r9` mirror the shipped-checkpoint table;
# `lowcov10x` stresses sparse pileups (~10x with the 3-8 window read ladder).
REGIMES: dict[str, dict] = {
    "standard": dict(),
    "r9": dict(sub_rate=0.05, ins_rate=0.03, del_rate=0.03),
    "lowcov10x": dict(n_reads=55),
    # resolved to sim_extra=SIM_PROFILES["systematic"] at run time
    "systematic": dict(profile="systematic"),
}

DEFAULTS = dict(
    window_size=4096,
    genome_len=120_000,
    n_reads=120,
    sub_rate=0.02,
    ins_rate=0.02,
    del_rate=0.02,
    het_rate=0.005,
    seed=12345,
    batch_size=16,
)


def run_battery(
    ckpts: list[str],
    regimes: list[str],
    with_oracle: bool = True,
) -> dict:
    from herro_tpu.models.checkpoint import load_or_init
    from herro_tpu.training.eval import SIM_PROFILES, evaluate

    out: dict = {"defaults": DEFAULTS, "regimes": {}}
    loaded = [(c, *load_or_init(c)) for c in ckpts]
    for reg in regimes:
        kw = {**DEFAULTS, **REGIMES[reg]}
        if "profile" in kw:
            kw["sim_extra"] = SIM_PROFILES[kw.pop("profile")]
        entry: dict = {"params": {k: v for k, v in kw.items() if k != "batch_size"}}
        if with_oracle:
            t0 = time.time()
            res = evaluate(loaded[0][1], loaded[0][2], mode="oracle", **kw)
            entry["oracle"] = res.as_dict()
            print(
                f"[battery] {reg}/oracle: infix Q"
                f"{res.corrected_infix_q:.2f} ({time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
        for name, cfg, params in loaded:
            t0 = time.time()
            res = evaluate(cfg, params, with_baseline=True, **kw)
            d = res.as_dict()
            entry[name] = d
            het = d.get("het", {}).get("accuracy")
            print(
                f"[battery] {reg}/{name}: infix Q{res.corrected_infix_q:.2f}"
                f" het={het if het is None else f'{het:.3f}'}"
                f" gain={d.get('model_gain_db'):.2f}dB"
                f" ({time.time() - t0:.0f}s)",
                file=sys.stderr,
            )
        out["regimes"][reg] = entry
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("ckpts", nargs="+")
    ap.add_argument("--regimes", default=",".join(REGIMES))
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    regimes = [r for r in args.regimes.split(",") if r]
    unknown = set(regimes) - set(REGIMES)
    if unknown:
        ap.error(f"unknown regimes: {sorted(unknown)}")
    result = run_battery(args.ckpts, regimes, with_oracle=not args.skip_oracle)
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(f"[battery] wrote {args.output}", file=sys.stderr)


if __name__ == "__main__":
    main()
