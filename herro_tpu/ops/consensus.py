"""Consensus decoding.

The reference decodes per pileup column (src/consensus.rs:86-227): at
supported columns take the model's 5-way argmax; elsewhere apply a counting
rule over the (case-folded) column symbols:

    keep the target base if the top count < 2, or if the top two counts tie
    and either is the target base; else take the plurality base; drop '*'.

Here the counting rule runs as a vectorised kernel over whole batches — on
device (jnp, fused into the jitted correction step so decisions ride along
with the model forward) with a numpy twin for windows that skip the model
(no supported columns). ``stitch_read`` then assembles corrected fragments,
splitting at windows with < 2 alignments (src/consensus.rs:90-110).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import CLASS_TO_BASE, N_ROWS, TOKEN_TO_CLASS

# Decision value for "not decodable" (padding columns).
DECISION_PAD = 255


def count_decisions_jnp(tokens: jnp.ndarray, n_alns: jnp.ndarray) -> jnp.ndarray:
    """Counting-rule class per column. tokens [B, R, L] uint8 (vocab 0-11,
    row-major — L on the 128-lane minor axis), n_alns [B] -> decisions
    [B, L] uint8 in {0..4}.

    Laid out TPU-first: all reductions/selects run on [B, L] planes rather
    than the tiny R/class minor dims, the input stays uint8 end-to-end, and
    the vocab->class table is the arithmetic identity ``t % 5`` (t < 10), so
    no gathers at all.
    """
    B, R, L = tokens.shape
    cls = jnp.where(tokens < 10, tokens % 5, 5).astype(jnp.uint8)
    valid = (
        jnp.arange(R, dtype=jnp.int32)[None, :, None] <= n_alns[:, None, None]
    ) & (cls < 5)

    # per-class counts as five [B, L] planes
    counts = [
        jnp.sum((cls == c) & valid, axis=1, dtype=jnp.int32) for c in range(5)
    ]

    # top-2 with ties resolved to the smallest class index — matching the
    # stable descending sort of the reference (src/consensus.rs:186-193).
    def top(cs):
        best_c = jnp.zeros_like(cs[0])
        best_v = cs[0]
        for c in range(1, 5):
            better = cs[c] > best_v
            best_c = jnp.where(better, c, best_c)
            best_v = jnp.maximum(best_v, cs[c])
        return best_c, best_v

    c0, mc0 = top(counts)
    counts2 = [jnp.where(c0 == c, -1, counts[c]) for c in range(5)]
    c1, mc1 = top(counts2)

    tbase = cls[:, 0, :].astype(jnp.int32)
    keep_target = (mc0 < 2) | ((mc0 == mc1) & ((c0 == tbase) | (c1 == tbase)))
    return jnp.where(keep_target, tbase, c0).astype(jnp.uint8)


def count_decisions(tokens: jnp.ndarray, n_alns: jnp.ndarray) -> jnp.ndarray:
    """Backend dispatcher: the pallas kernel on TPU (one VMEM pass; the XLA
    formulation costs ~23 ms at B=64 L=4608 on u8 promotions and repeated
    [B, R, L] traversals), the jnp formulation elsewhere."""
    from .fused import _use_pallas, count_decisions_pallas

    if _use_pallas() and tokens.shape[2] % 512 == 0:
        return count_decisions_pallas(tokens, n_alns)
    return count_decisions_jnp(tokens, n_alns)


def count_decisions_np(tokens: np.ndarray, n_alns: int) -> np.ndarray:
    """Numpy twin of :func:`count_decisions_jnp` for one window [L, R]."""
    cls = TOKEN_TO_CLASS[tokens].astype(np.int32)
    cls[:, n_alns + 1 :] = 5
    counts = np.zeros((tokens.shape[0], 5), dtype=np.int32)
    for k in range(5):
        counts[:, k] = (cls == k).sum(axis=1)
    c0 = np.argmax(counts, axis=-1)
    mc0 = np.take_along_axis(counts, c0[:, None], axis=-1)[:, 0]
    counts2 = counts.copy()
    np.put_along_axis(counts2, c0[:, None], -1, axis=-1)
    c1 = np.argmax(counts2, axis=-1)
    mc1 = np.take_along_axis(counts2, c1[:, None], axis=-1)[:, 0]
    tbase = TOKEN_TO_CLASS[tokens[:, 0]].astype(np.int32)
    keep_target = (mc0 < 2) | ((mc0 == mc1) & ((c0 == tbase) | (c1 == tbase)))
    return np.where(keep_target, tbase, c0).astype(np.uint8)


_CLASS_BYTES = np.frombuffer(CLASS_TO_BASE, dtype=np.uint8)


def decode_window(decisions: np.ndarray) -> bytes:
    """Column decisions -> corrected bases ('*' columns removed)."""
    d = decisions[decisions != DECISION_PAD]
    return _CLASS_BYTES[d[d != 4]].tobytes()


def stitch_read(
    windows: list[tuple[int, np.ndarray]],
) -> list[bytes] | None:
    """Assemble a read's corrected fragments.

    ``windows`` is a list of (n_alns, decisions[L_true]) ordered by window id.
    Returns None when no window has > 1 alignment; otherwise the list of
    corrected fragments, split wherever a window has < 2 alignments
    (reference: src/consensus.rs:86-227).
    """
    covered = [i for i, (n_alns, _) in enumerate(windows) if n_alns > 1]
    if not covered:
        return None
    lo, hi = covered[0], covered[-1] + 1

    fragments: list[bytes] = []
    current: list[bytes] = []
    for n_alns, decisions in windows[lo:hi]:
        if n_alns < 2:
            frag = b"".join(current)
            if frag:
                fragments.append(frag)
            current = []
            continue
        current.append(decode_window(decisions))
    frag = b"".join(current)
    if frag:
        fragments.append(frag)
    return fragments
