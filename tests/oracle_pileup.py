"""Test oracle: per-base transcription of the reference pileup fill
(src/features.rs:44-266), used to property-test the vectorised
implementation in herro_tpu.features.pileup."""

from __future__ import annotations

import numpy as np

from herro_tpu.cigar.ops import Cigar, D, I, M
from herro_tpu.constants import BASE_LOWER


def _slice_ops(cig: Cigar, op_s, off_s, op_e, off_e):
    """(code, effective_len) list with the reference's offset rules."""
    out = []
    n = op_e - op_s
    for j in range(n):
        code = int(cig.codes[op_s + j])
        l = int(cig.lens[op_s + j])
        if n == 1:
            l = off_e - off_s
        elif j == 0:
            l -= off_s
        elif j == n - 1:
            l = off_e
        out.append((code, l))
    return out


def oracle_max_ins(ows, cigars, win_start, win_len):
    max_ins = [0] * win_len
    for ow in ows:
        tpos = ow.tstart - win_start
        cig = cigars[ow.aln_idx]
        n = ow.op_end - ow.op_start
        for j in range(n):
            code = int(cig.codes[ow.op_start + j])
            l = int(cig.lens[ow.op_start + j])
            if code == I:
                # insertions use RAW length in the reference (features.rs:64-79)
                max_ins[tpos - 1] = max(max_ins[tpos - 1], l)
                continue
            if n == 1:
                tpos += ow.end_off - ow.start_off
            elif j == 0:
                tpos += l - ow.start_off
            elif j == n - 1:
                tpos += ow.end_off
            else:
                tpos += l
    return np.asarray(max_ins, dtype=np.int32)


def oracle_fill_row(bases, quals, ow, cig, strand_rev, qseq, qqual, max_ins, win_start):
    gap = ord("#") if strand_rev else ord("*")
    bases.fill(gap)
    if strand_rev:
        qseq = BASE_LOWER[qseq]

    offset = ow.tstart - win_start
    tpos = offset
    idx = offset + int(np.sum(max_ins[:offset]))
    if idx > 0:
        bases[:idx] = ord(".")

    qp = 0
    for code, l in _slice_ops(cig, ow.op_start, ow.start_off, ow.op_end, ow.end_off):
        if code == M:
            for i in range(l):
                bases[idx] = qseq[qp]
                quals[idx] = qqual[qp]
                qp += 1
                idx += 1 + int(max_ins[tpos + i])
            tpos += l
        elif code == D:
            for i in range(l):
                idx += 1 + int(max_ins[tpos + i])
            tpos += l
        else:  # I
            idx -= int(max_ins[tpos - 1])
            for i in range(l):
                bases[idx + i] = qseq[qp]
                quals[idx + i] = qqual[qp]
                qp += 1
            idx += int(max_ins[tpos - 1])
    if idx < bases.shape[0]:
        bases[idx:] = ord(".")


def oracle_supported(bases):
    """Per-column supported flags (src/features.rs:681-722)."""
    L, n_cols = bases.shape
    thresh = int(n_cols * 0.1)
    sup = []
    tpos, ins = -1, 0
    from herro_tpu.constants import BASE_FORWARD

    for r in range(L):
        if bases[r, 0] == ord("*"):
            ins += 1
        else:
            tpos += 1
            ins = 0
        counts = {s: 0 for s in b"ACGT*"}
        for b in bases[r]:
            if b == ord("."):
                continue
            counts[int(BASE_FORWARD[b])] += 1
        n_sup = sum(1 for c in counts.values() if c >= thresh)
        if n_sup >= 2:
            sup.append((tpos, ins))
    return sup
