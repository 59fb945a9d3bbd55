"""Test oracle: per-op transcription of the reference windowing walk
(src/windowing.rs:44-273), used to property-test the per-boundary
implementation in herro_tpu.cigar.windowing.

Operates on parsed op arrays; window op ranges use op indices (op i maps to
the reference's byte range [i, i+1))."""

from __future__ import annotations

from herro_tpu.cigar.ops import Cigar, D, I, M


def oracle_extract_windows(
    windows: list[list[tuple]],
    aln_idx: int,
    cig: Cigar,
    tstart: int,
    tend: int,
    tlen: int,
    qstart: int,
    qend: int,
    window_size: int,
) -> None:
    W = window_size
    if (tend - tstart) < W or (qend - qstart) < W:
        return

    zeroth_thresh = int(0.1 * W)
    nth_thresh = tlen - zeroth_thresh

    first_window = 0 if tstart < zeroth_thresh else (tstart + W - 1) // W
    last_window = (tend - 1) // W + 1 if tend > nth_thresh else tend // W
    if last_window - first_window < 1:
        return

    tpos = tstart
    qpos = 0

    t_ws = q_ws = cs_idx = cs_off = None
    if tpos % W == 0 or tstart < zeroth_thresh:
        t_ws, q_ws, cs_idx, cs_off = tpos, qpos, 0, 0

    codes, lens = cig.codes, cig.lens
    n_ops = len(codes)
    k = 0
    while k < n_ops:
        op, l = int(codes[k]), int(lens[k])
        if op == I:
            qpos += l
            k += 1
            continue
        tnew = tpos + l
        qnew = qpos + l if op == M else qpos

        current_w = tpos // W
        new_w = tnew // W
        diff_w = new_w - current_w
        if diff_w == 0:
            tpos, qpos = tnew, qnew
            k += 1
            continue

        for i in range(1, diff_w):
            offset = (current_w + i) * W - tpos
            q_start_new = qpos + offset if op == M else qpos
            if cs_idx is not None:
                windows[current_w + i - 1].append(
                    (aln_idx, t_ws, q_ws, q_start_new, cs_idx, cs_off, k + 1, offset)
                )
            t_ws = tpos + offset
            q_ws = qpos + offset if op == M else qpos
            cs_idx, cs_off = k, offset

        offset = new_w * W - tpos
        qend_w = qpos + offset if op == M else qpos
        if tnew == new_w * W:
            if k + 1 < n_ops and codes[k + 1] == I:
                qend_w += int(lens[k + 1])
                ce_idx, ce_off = k + 2, int(lens[k + 1])
            else:
                ce_idx, ce_off = k + 1, l
            ns_idx, ns_off = ce_idx, 0
        else:
            ce_idx, ce_off = k + 1, offset
            ns_idx, ns_off = k, offset

        if cs_idx is not None:
            windows[new_w - 1].append(
                (aln_idx, t_ws, q_ws, qend_w, cs_idx, cs_off, ce_idx, ce_off)
            )
        t_ws, q_ws = tpos + offset, qend_w
        cs_idx, cs_off = ns_idx, ns_off

        tpos, qpos = tnew, qnew
        k += 1

    if tpos > nth_thresh and tpos % W != 0:
        windows[last_window - 1].append(
            (aln_idx, t_ws, q_ws, qpos, cs_idx, cs_off, n_ops, int(lens[-1]))
        )
