"""Training data generation.

Builds labelled TrainBatches either from the simulator (synthetic
pretraining / smoke tests) or from `features`-subcommand npy dumps plus a
labels source. Windows are padded to fixed (L, S) like inference batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..constants import QUAL_PAD, TOKEN_PAD
from ..features.extract import extract_read_features
from ..io.fastx import load_reads
from ..overlaps.paf import parse_paf
from ..pipeline.batching import tensorize
from .labels import read_labels
from .simulate import SimDataset, paf_rows, simulate
from .train import TrainBatch


@dataclass
class LabelledWindow:
    tokens: np.ndarray  # uint8 [L, 31]
    quals: np.ndarray  # uint8 [L, 31]
    support_flat: np.ndarray  # int32 [n_sup]
    labels: np.ndarray  # uint8 [n_sup]
    info: np.ndarray  # uint8 [n_sup]


def simulated_windows(
    ds: SimDataset,
    fastq_path: str,
    window_size: int,
    min_overlap: int = 500,
) -> list[LabelledWindow]:
    """All labelled windows of a simulated dataset."""
    ds.write_fastq(fastq_path)
    reads = load_reads(fastq_path, min_length=window_size)
    grouped = parse_paf(paf_rows(ds, min_overlap), reads.name_to_id)

    out: list[LabelledWindow] = []
    for rid, alns in grouped.items():
        sim_read = next(r for r in ds.reads if r.name == reads.ids[rid])
        feats = extract_read_features(rid, reads, alns, window_size)
        labels = read_labels(ds, sim_read, feats, window_size)
        for wf, (lab, info) in zip(feats, labels):
            if len(lab) == 0:
                continue
            wt = tensorize(wf)
            out.append(
                LabelledWindow(wt.tokens, wt.quals, wt.support_flat, lab, info)
            )
    return out


def collate_train(
    windows: list[LabelledWindow], L: int, S: int
) -> TrainBatch:
    B = len(windows)
    R = windows[0].tokens.shape[1]
    tokens = np.full((B, L, R), TOKEN_PAD, dtype=np.uint8)
    quals = np.full((B, L, R), QUAL_PAD, dtype=np.uint8)
    sidx = np.zeros((B, S), dtype=np.int32)
    smask = np.zeros((B, S), dtype=bool)
    labels = np.zeros((B, S), dtype=np.int32)
    info = np.zeros((B, S), dtype=np.float32)
    for i, w in enumerate(windows):
        l = min(w.tokens.shape[0], L)
        s = min(w.support_flat.shape[0], S)
        tokens[i, :l] = w.tokens[:l]
        quals[i, :l] = w.quals[:l]
        keep = w.support_flat[:s] < L
        sidx[i, :s][keep] = w.support_flat[:s][keep]
        smask[i, :s] = keep
        labels[i, :s][keep] = w.labels[:s][keep]
        info[i, :s][keep] = w.info[:s][keep]
    return TrainBatch(tokens, quals, sidx, smask, labels, info)


def batch_iterator(
    windows: list[LabelledWindow],
    batch_size: int,
    L: int,
    S: int,
    n_epochs: int,
    seed: int = 0,
) -> Iterator[TrainBatch]:
    rng = np.random.default_rng(seed)
    for _ in range(n_epochs):
        order = rng.permutation(len(windows))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = [windows[j] for j in order[i : i + batch_size]]
            yield collate_train(batch, L, S)
