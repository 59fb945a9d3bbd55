#!/usr/bin/env python
"""Split a fastq(.gz) into N roughly equal parts (seqkit split2 -p equivalent)."""

from __future__ import annotations

import argparse
import gzip
import os


def open_in(path: str):
    fh = open(path, "rb")
    if fh.peek(2)[:2] == b"\x1f\x8b":
        return gzip.open(fh, "rb")
    return fh


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("outdir")
    ap.add_argument("--parts", type=int, required=True)
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    outs = [
        gzip.open(os.path.join(args.outdir, f"part_{i:03d}.fastq.gz"), "wb")
        for i in range(args.parts)
    ]
    with open_in(args.input) as fh:
        i = 0
        while True:
            rec = [fh.readline() for _ in range(4)]
            if not rec[0]:
                break
            outs[i % args.parts].writelines(rec)
            i += 1
    for o in outs:
        o.close()


if __name__ == "__main__":
    main()
