"""Merge a candidate checkpoint's matched-seed battery into an existing
eval-battery artifact and print the promotion-gate comparison.

The committed battery (resources/eval_battery.json) already holds the
oracle ceilings and the current flagship's numbers at the battery seeds;
re-scoring them for every candidate wastes ~half the chip time. This tool
runs ONLY the candidate (tools/eval_battery.py --skip-oracle semantics),
merges its per-regime entries into the artifact, and prints the gate table
(candidate vs incumbent: standard-regime dB delta, het preservation, and
the systematic-regime gain the fine-tune targets).

Usage:
    python tools/merge_battery.py BATTERY.json CANDIDATE_CKPT [--run]
        [--promote-as resources/model_r10_sim]

With --promote-as NAME the candidate's entries are *also* written under
that key (used after copying the weights over the flagship path, so the
artifact keys keep matching shipped checkpoint paths).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gate_table(bat: dict, incumbent: str, candidate: str) -> list[str]:
    """Render the candidate-vs-incumbent comparison and the PASS/FAIL verdict.

    The gate: the ``standard`` regime must be present for both checkpoints,
    within 0.2 dB of the incumbent, and keep het accuracy >= 99%. A missing
    standard comparison FAILS (a vacuous pass here would let a battery run
    that silently skipped the gating regime promote a regressed checkpoint).
    """
    lines = []
    ok = True
    gated = False
    for reg, entry in bat["regimes"].items():
        if incumbent not in entry or candidate not in entry:
            lines.append(f"{reg:12s} (not compared: missing entry)")
            continue
        inc, cand = entry[incumbent], entry[candidate]
        dq = cand["corrected_infix_q"] - inc["corrected_infix_q"]
        het_i = (inc.get("het") or {}).get("accuracy")
        het_c = (cand.get("het") or {}).get("accuracy")
        lines.append(
            f"{reg:12s} Q{inc['corrected_infix_q']:.2f} -> "
            f"Q{cand['corrected_infix_q']:.2f} ({dq:+.2f} dB)"
            + (
                f"  het {het_i:.3f} -> {het_c:.3f}"
                if het_i is not None and het_c is not None
                else ""
            )
        )
        if reg == "standard":
            gated = True
            # 1e-6 absorbs float noise so an exactly-0.2 delta still passes
            if dq < -0.2 - 1e-6 or (het_c or 0) < 0.99:
                ok = False
    if not gated:
        ok = False
        lines.append("standard     MISSING — gate cannot pass")
    lines.append(f"gate: {'PASS' if ok else 'FAIL'} "
                 "(standard within 0.2 dB and het >= 99%)")
    return lines


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("battery")
    ap.add_argument("candidate")
    ap.add_argument("--incumbent", default="resources/model_r10_sim")
    ap.add_argument("--run", action="store_true",
                    help="run the candidate's battery (chip) before merging")
    ap.add_argument("--promote-as", default="")
    args = ap.parse_args()

    with open(args.battery) as f:
        bat = json.load(f)

    if args.run:
        from eval_battery import REGIMES, run_battery

        fresh = run_battery([args.candidate], list(REGIMES), with_oracle=False)
        for reg, entry in fresh["regimes"].items():
            bat["regimes"][reg][args.candidate] = entry[args.candidate]

    for line in gate_table(bat, args.incumbent, args.candidate):
        print(line)

    if args.promote_as:
        for entry in bat["regimes"].values():
            if args.candidate in entry:
                entry[args.promote_as] = entry[args.candidate]

    with open(args.battery, "w") as f:
        json.dump(bat, f, indent=1)
    print(f"[merge] wrote {args.battery}", file=sys.stderr)


if __name__ == "__main__":
    main()
