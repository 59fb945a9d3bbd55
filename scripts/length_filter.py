#!/usr/bin/env python
"""Length-filter fastq(.gz) files (seqkit seq -m equivalent, no seqkit)."""

from __future__ import annotations

import argparse
import gzip
import sys


def open_in(path: str):
    fh = open(path, "rb")
    if fh.peek(2)[:2] == b"\x1f\x8b":
        return gzip.open(fh, "rb")
    return fh


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--min-len", type=int, default=10_000)
    args = ap.parse_args()

    opener = gzip.open if args.output.endswith(".gz") else open
    n_in = n_out = 0
    with opener(args.output, "wb") as out:
        for path in args.inputs:
            with open_in(path) as fh:
                while True:
                    header = fh.readline()
                    if not header:
                        break
                    seq = fh.readline()
                    plus = fh.readline()
                    qual = fh.readline()
                    n_in += 1
                    if len(seq.rstrip(b"\r\n")) >= args.min_len:
                        out.write(header + seq + plus + qual)
                        n_out += 1
    print(f"{n_out}/{n_in} reads kept (>= {args.min_len} bp).", file=sys.stderr)


if __name__ == "__main__":
    main()
