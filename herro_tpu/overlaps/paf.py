"""PAF alignment ingest.

Parsing semantics match the reference exactly (src/overlaps.rs:117-202):

* rows whose query or target id is unknown are dropped;
* with a core-cluster filter, rows whose *target* is outside the core are
  dropped (neighbour reads still contribute as queries);
* self-overlaps are dropped;
* only the *first* row per (qid, tid) pair is kept — minimap2 reports the best
  overlap first;
* the CIGAR is taken from the last tab field, stripping its ``cg:Z:`` prefix;
* surviving rows are grouped by target id.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import IO, Iterable

from ..cigar.ops import Cigar, parse_cigar

STRAND_FWD = 0
STRAND_REV = 1


@dataclass
class Alignment:
    """One overlap row (reference: src/overlaps.rs:44-101)."""

    qid: int
    qlen: int
    qstart: int
    qend: int
    strand: int  # STRAND_FWD / STRAND_REV
    tid: int
    tlen: int
    tstart: int
    tend: int
    cigar: Cigar

    def other_id(self, rid: int) -> int:
        return self.tid if self.qid == rid else self.qid


def parse_paf(
    lines: Iterable[bytes],
    name_to_id: dict[bytes, int],
    core: set[str] | None = None,
    raw_writer: IO[bytes] | None = None,
) -> dict[int, list[Alignment]]:
    """Parse PAF rows into a target-id -> alignments map."""
    core_b = {c.encode() for c in core} if core is not None else None
    processed: set[tuple[int, int]] = set()
    tid_to_alns: dict[int, list[Alignment]] = {}

    for line in lines:
        row = line.rstrip(b"\n").split(b"\t")
        if len(row) < 10:
            continue
        qid = name_to_id.get(row[0])
        if qid is None:
            continue
        if core_b is not None and row[5] not in core_b:
            continue
        tid = name_to_id.get(row[5])
        if tid is None:
            continue
        if tid == qid:
            continue
        key = (qid, tid)
        if key in processed:
            continue
        processed.add(key)

        cigar_field = row[-1]
        aln = Alignment(
            qid=qid,
            qlen=int(row[1]),
            qstart=int(row[2]),
            qend=int(row[3]),
            strand=STRAND_FWD if row[4] == b"+" else STRAND_REV,
            tid=tid,
            tlen=int(row[6]),
            tstart=int(row[7]),
            tend=int(row[8]),
            cigar=parse_cigar(cigar_field[5:]),
        )
        tid_to_alns.setdefault(tid, []).append(aln)

        if raw_writer is not None:
            raw_writer.write(line if line.endswith(b"\n") else line + b"\n")

    return tid_to_alns
