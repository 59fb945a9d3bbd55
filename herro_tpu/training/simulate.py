"""Synthetic nanopore-style data simulator.

Generates a random genome, error-laden reads (substitutions / insertions /
deletions at configurable rates), *exact* pairwise PAF rows between
overlapping reads (by composing each read's edit script against the genome),
and per-window ground-truth labels — everything needed to exercise and train
the pipeline without minimap2 or real data.

Per-read edit model: walking the genome positions of its span, each position
is either emitted (possibly substituted) or deleted, and may be followed by
inserted bases. The pairwise CIGAR of reads A (target) and B (query) is the
composition of their scripts over the shared genome interval: genome-emitted
bases pair as M/I/D; co-located inserted runs pair greedily as M.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGT", b"TGCA"):
    _COMP[_a] = _b


@dataclass
class SimRead:
    name: bytes
    start: int  # genome start of the span
    end: int  # genome end (exclusive)
    rc: bool  # stored reverse-complemented
    seq: bytes  # stored (possibly RC'd) sequence
    emitted: np.ndarray  # bool [span]: genome position present in the read
    sub: np.ndarray  # uint8 [span]: emitted base (valid where emitted)
    ins_after: list[bytes]  # inserted bases after each genome position (fwd)

    @property
    def length(self) -> int:
        return len(self.seq)


@dataclass
class SimDataset:
    genome: bytes
    reads: list[SimRead]

    def write_fastq(self, path: str, qual: int = 40) -> None:
        with open(path, "wb") as fh:
            for r in self.reads:
                q = bytes([33 + qual]) * r.length
                fh.write(b"@" + r.name + b"\n" + r.seq + b"\n+\n" + q + b"\n")


def simulate(
    genome_len: int = 20_000,
    n_reads: int = 40,
    read_len: tuple[int, int] = (6_000, 12_000),
    sub_rate: float = 0.02,
    ins_rate: float = 0.01,
    del_rate: float = 0.01,
    rc_prob: float = 0.5,
    seed: int = 0,
    circular: bool = False,
) -> SimDataset:
    rng = np.random.default_rng(seed)
    genome = rng.choice(_BASES, size=genome_len)

    reads = []
    for i in range(n_reads):
        length = int(rng.integers(read_len[0], read_len[1] + 1))
        length = min(length, genome_len)
        start = int(rng.integers(0, genome_len - length + 1))
        end = start + length

        span = genome[start:end]
        emitted = rng.random(length) >= del_rate
        sub = span.copy()
        subs = rng.random(length) < sub_rate
        # substitution: shift by 1-3 in base space so it always differs
        shift = rng.integers(1, 4, size=length)
        base_idx = np.searchsorted(_BASES, span)
        sub[subs] = _BASES[(base_idx[subs] + shift[subs]) % 4]

        ins_mask = rng.random(length) < ins_rate
        ins_after: list[bytes] = [b""] * length
        for j in np.nonzero(ins_mask)[0]:
            k = int(rng.integers(1, 4))
            ins_after[j] = rng.choice(_BASES, size=k).tobytes()

        chunks = []
        for j in range(length):
            if emitted[j]:
                chunks.append(sub[j : j + 1].tobytes())
            if ins_after[j]:
                chunks.append(ins_after[j])
        fwd = b"".join(chunks)

        rc = bool(rng.random() < rc_prob)
        seq = _COMP[np.frombuffer(fwd, dtype=np.uint8)][::-1].tobytes() if rc else fwd

        reads.append(
            SimRead(
                name=b"read_%d" % i,
                start=start,
                end=end,
                rc=rc,
                seq=seq,
                emitted=emitted,
                sub=sub,
                ins_after=ins_after,
            )
        )

    return SimDataset(genome.tobytes(), reads)


def _fwd_offset(read: SimRead, g0: int) -> int:
    """Forward-sequence position where genome position ``g0`` lands in the
    read (bases emitted before it, including trailing insertions)."""
    s0 = g0 - read.start
    return int(read.emitted[:s0].sum()) + sum(
        len(read.ins_after[j]) for j in range(s0)
    )


def _compose_cigar(a: SimRead, b: SimRead, g0: int, g1: int) -> list[tuple[int, bytes]]:
    """CIGAR of target a vs query b over genome interval [g0, g1), in target
    orientation, as (len, op) runs. M consumes both, I query-only, D
    target-only."""
    runs: list[tuple[int, bytes]] = []

    def push(l: int, op: bytes) -> None:
        if l <= 0:
            return
        if runs and runs[-1][1] == op:
            runs[-1] = (runs[-1][0] + l, op)
        else:
            runs.append((l, op))

    for g in range(g0, g1):
        ae = bool(a.emitted[g - a.start])
        be = bool(b.emitted[g - b.start])
        if ae and be:
            push(1, b"M")
        elif ae:
            push(1, b"D")
        elif be:
            push(1, b"I")
        ka = len(a.ins_after[g - a.start])
        kb = len(b.ins_after[g - b.start])
        m = min(ka, kb)
        push(m, b"M")
        push(ka - m, b"D")  # target-inserted bases the query lacks
        push(kb - m, b"I")  # query-inserted bases the target lacks
    return runs


def _trim_to_m(
    runs: list[tuple[int, bytes]]
) -> tuple[list[tuple[int, bytes]], int, int, int, int]:
    """Trim leading/trailing non-M ops (minimap2 alignments are M-anchored).
    Returns (runs, t_trim_front, q_trim_front, t_trim_back, q_trim_back)."""
    tf = qf = tb = qb = 0
    while runs and runs[0][1] != b"M":
        l, op = runs.pop(0)
        if op == b"D":
            tf += l
        else:
            qf += l
    while runs and runs[-1][1] != b"M":
        l, op = runs.pop()
        if op == b"D":
            tb += l
        else:
            qb += l
    return runs, tf, qf, tb, qb


def paf_rows(ds: SimDataset, min_overlap: int = 500) -> list[bytes]:
    """Exact PAF rows (with cg:Z: tags) for every overlapping read pair.

    Both orientations are emitted, like minimap2 --dual=yes
    (reference: src/mm2.rs:30)."""
    rows = []
    n = len(ds.reads)
    for ti in range(n):
        for qi in range(n):
            if ti == qi:
                continue
            a, b = ds.reads[ti], ds.reads[qi]
            g0, g1 = max(a.start, b.start), min(a.end, b.end)
            if g1 - g0 < min_overlap:
                continue

            runs = _compose_cigar(a, b, g0, g1)
            runs, tf, qf, tb, qb = _trim_to_m(runs)
            if not runs:
                continue

            ta_off = _fwd_offset(a, g0)
            qb_off = _fwd_offset(b, g0)
            t_span = sum(l for l, op in runs if op != b"I")
            q_span = sum(l for l, op in runs if op != b"D")

            tstart = ta_off + tf
            tend = tstart + t_span
            q_fwd_start = qb_off + qf
            q_fwd_end = q_fwd_start + q_span

            # Orientation: the cigar is computed with both reads in genome
            # orientation. PAF coordinates are on each read's *stored* strand,
            # so each flips independently; the strand field is '-' when
            # exactly one of the two is stored RC'd. When the target is
            # stored RC'd the cigar reverses so it walks the stored target
            # forward (and hence the oriented query backward, which is what a
            # '-' row's query walk decodes).
            strand = b"-" if a.rc != b.rc else b"+"
            if a.rc:
                tstart, tend = a.length - tend, a.length - tstart
                runs = runs[::-1]
            if b.rc:
                q_fwd_start, q_fwd_end = (
                    b.length - q_fwd_end,
                    b.length - q_fwd_start,
                )

            cigar = b"".join(b"%d%s" % (l, op) for l, op in runs)
            rows.append(
                b"\t".join(
                    [
                        b.name,
                        b"%d" % b.length,
                        b"%d" % q_fwd_start,
                        b"%d" % q_fwd_end,
                        strand,
                        a.name,
                        b"%d" % a.length,
                        b"%d" % tstart,
                        b"%d" % tend,
                        b"0",
                        b"%d" % max(t_span, q_span),
                        b"60",
                        b"cg:Z:" + cigar,
                    ]
                )
                + b"\n"
            )
    return rows


def true_sequence(ds: SimDataset, read: SimRead) -> bytes:
    """The error-free sequence a perfect corrector would output for ``read``
    (its genome span, in stored orientation)."""
    span = np.frombuffer(ds.genome[read.start : read.end], dtype=np.uint8)
    return _COMP[span][::-1].tobytes() if read.rc else span.tobytes()


def read_truth_arrays(ds: SimDataset, read: SimRead) -> tuple[np.ndarray, list[bytes]]:
    """Ground truth along the read's *stored* orientation.

    Returns (anchor_truth, ins_truth):
      anchor_truth[p]  — true class of read position p: 0-3 = A,C,G,T (the
                         genome base, fixing substitutions), 4 = '*' (the
                         position is a read insertion error);
      ins_truth[p]     — genome bases deleted from the read right after
                         position p (to be restored in insertion columns).
    """
    lut = np.full(256, 255, dtype=np.uint8)
    for k, c in enumerate(b"ACGT"):
        lut[c] = k

    genome = np.frombuffer(ds.genome, dtype=np.uint8)
    anchors: list[int] = []
    ins_runs: list[bytes] = []
    pending_del: list[int] = []

    # Walk forward orientation, building per-emitted-base truth.
    for j in range(read.end - read.start):
        g = read.start + j
        if read.emitted[j]:
            anchors.append(int(lut[genome[g]]))
            ins_runs.append(b"")
            pending_del = []
        else:
            # deleted genome base: attach to the previous emitted position
            if ins_runs:
                ins_runs[-1] += genome[g : g + 1].tobytes()
        for c in read.ins_after[j]:
            anchors.append(4)  # read insertion error -> '*'
            ins_runs.append(b"")

    anchor_truth = np.asarray(anchors, dtype=np.uint8)
    if read.rc:
        # flip to stored orientation: complement classes 0-3, reverse order;
        # a deletion run after p (fwd) precedes the complementary position.
        comp = np.array([3, 2, 1, 0, 4], dtype=np.uint8)
        anchor_truth = comp[anchor_truth][::-1].copy()
        n = len(ins_runs)
        flipped: list[bytes] = [b""] * n
        for p in range(n):
            run = ins_runs[p]
            if not run:
                continue
            rc_run = _COMP[np.frombuffer(run, dtype=np.uint8)][::-1].tobytes()
            # run after fwd p maps to run after stored position (n-1-p)-1
            tgt = n - 2 - p
            if tgt >= 0:
                flipped[tgt] = rc_run
        ins_runs = flipped
    return anchor_truth, ins_runs
