#!/usr/bin/env python
"""Partition the read-overlap graph into clusters for sharded correction.

Equivalent of the reference's scripts/create_clusters.py (METIS k-way
partition): reads overlap edges as TSV (source<TAB>target) from stdin, splits
the graph into k balanced parts, and writes ``clusters/NNN.part`` files of
``0\\tid`` (core) and ``1\\tid`` (neighbour) lines, consumed by
``herro-tpu inference -c``.

METIS isn't assumed present: the partitioner is a BFS-grown multi-seed
balanced partition with a greedy boundary-refinement pass — lower cut quality
than METIS but the same contract: every read appears as core in exactly one
cluster; reads adjacent to a core read appear as its neighbours.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import deque


def read_edges(stream) -> tuple[list[str], list[list[int]]]:
    names: list[str] = []
    index: dict[str, int] = {}
    adj: list[list[int]] = []

    def node(name: str) -> int:
        i = index.get(name)
        if i is None:
            i = len(names)
            index[name] = i
            names.append(name)
            adj.append([])
        return i

    for line in stream:
        parts = line.rstrip("\n").split("\t")
        if len(parts) < 2:
            continue
        a, b = node(parts[0]), node(parts[1])
        if a != b:
            adj[a].append(b)
            adj[b].append(a)
    return names, adj


def partition(adj: list[list[int]], k: int) -> list[int]:
    """Balanced k-way partition: BFS growth from spread seeds + refinement."""
    n = len(adj)
    target = (n + k - 1) // k
    part = [-1] * n
    sizes = [0] * k

    order = sorted(range(n), key=lambda v: -len(adj[v]))
    frontiers: list[deque[int]] = [deque() for _ in range(k)]
    seeds = iter(order)

    def seed(p: int) -> None:
        for v in seeds:
            if part[v] == -1:
                part[v] = p
                sizes[p] += 1
                frontiers[p].append(v)
                return

    for p in range(k):
        seed(p)

    assigned = sum(1 for x in part if x != -1)
    while assigned < n:
        progressed = False
        for p in range(k):
            if sizes[p] >= target:
                continue
            while frontiers[p]:
                v = frontiers[p][0]
                nxt = None
                for u in adj[v]:
                    if part[u] == -1:
                        nxt = u
                        break
                if nxt is None:
                    frontiers[p].popleft()
                    continue
                part[nxt] = p
                sizes[p] += 1
                frontiers[p].append(nxt)
                assigned += 1
                progressed = True
                break
        if not progressed:
            # disconnected remainder: reseed the smallest part
            p = min(range(k), key=lambda x: sizes[x])
            before = sizes[p]
            seed(p)
            if sizes[p] == before:
                break
            assigned += 1

    # one greedy refinement sweep: move boundary nodes to their majority part
    # when it doesn't unbalance
    for v in range(n):
        if not adj[v]:
            continue
        votes: dict[int, int] = {}
        for u in adj[v]:
            if part[u] >= 0:
                votes[part[u]] = votes.get(part[u], 0) + 1
        best = max(votes, key=lambda p: (votes[p], -p))
        if best != part[v] and sizes[best] < target + max(2, target // 10):
            sizes[part[v]] -= 1
            sizes[best] += 1
            part[v] = best
    return part


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("k", type=int, nargs="?", default=10)
    ap.add_argument("--outdir", default="clusters")
    args = ap.parse_args()

    names, adj = read_edges(sys.stdin)
    part = partition(adj, args.k)

    cut = sum(
        1
        for v in range(len(adj))
        for u in adj[v]
        if u > v and part[u] != part[v]
    )
    print(f"Edgecuts: {cut}", file=sys.stderr)

    os.makedirs(args.outdir, exist_ok=True)
    for p in range(args.k):
        core = [v for v in range(len(names)) if part[v] == p]
        neigh = {
            u for v in core for u in adj[v] if part[u] != p
        }
        with open(os.path.join(args.outdir, f"{p:03d}.part"), "w") as fh:
            for v in core:
                fh.write(f"0\t{names[v]}\n")
            for v in sorted(neigh):
                fh.write(f"1\t{names[v]}\n")


if __name__ == "__main__":
    main()
