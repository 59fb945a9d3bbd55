#!/usr/bin/env python
"""Chop corrected reads for hifiasm assembly.

Native equivalent of the reference's scripts/postprocess_corrected.sh
(seqkit sliding -s 30000 -W 30000 -g + seqkit seq -m 10000): slices each
corrected read into non-overlapping 30 kb pieces (the final, greedy remainder
piece included) and keeps pieces >= 10 kb. No seqkit dependency.
"""

from __future__ import annotations

import argparse
import sys


def sliding(seq: bytes, window: int, step: int):
    """seqkit sliding -g semantics: greedy tail piece included."""
    n = len(seq)
    start = 0
    while start < n:
        end = min(start + window, n)
        yield start, end, seq[start:end]
        if end == n:
            break
        start += step


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="corrected reads FASTA")
    ap.add_argument("output", help="chopped FASTA")
    ap.add_argument("--chop-len", type=int, default=30_000)
    ap.add_argument("--keep-len", type=int, default=10_000)
    args = ap.parse_args()

    n_in = n_out = 0
    with open(args.input, "rb") as fin, open(args.output, "wb") as fout:
        name = None
        chunks: list[bytes] = []

        def flush():
            nonlocal n_out
            if name is None:
                return
            seq = b"".join(chunks)
            for start, end, piece in sliding(seq, args.chop_len, args.chop_len):
                if len(piece) >= args.keep_len:
                    # seqkit sliding naming convention: id:start-end (1-based)
                    fout.write(
                        b">%s:%d-%d\n%s\n" % (name, start + 1, end, piece)
                    )
                    n_out += 1

        for line in fin:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">"):
                flush()
                name = line[1:].split(b" ")[0]
                chunks = []
                n_in += 1
            elif line:
                chunks.append(line)
        flush()

    print(f"{n_in} reads in, {n_out} pieces out.", file=sys.stderr)


if __name__ == "__main__":
    main()
