"""Pure NumPy/Python reference oracles for the graph algorithms.

Independent single-node implementations (no Spark, no scipy) used to verify
the distributed operators exactly — the same role the reference's serial
``bfs_local`` oracle plays for CoreBFS
(/root/reference/external/indexed_bfs/bfs/corebfs.hpp:217-261).
"""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np


def adj_from_edges(edges: list[tuple[int, int]]) -> dict[int, set[int]]:
    """Undirected adjacency (self-loops dropped)."""
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    return adj


def bfs_levels(edges: list[tuple[int, int]], root: int) -> dict[int, int]:
    adj = adj_from_edges(edges)
    levels = {root: 0}
    q = deque([root])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in levels:
                levels[w] = levels[u] + 1
                q.append(w)
    return levels


def connected_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """v -> min vertex id of its component (union-find)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    verts = set()
    for s, d in edges:
        verts.add(s)
        verts.add(d)
    for v in verts:
        parent[v] = v
    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in verts}


def pagerank(
    edges: list[tuple[int, int]], damping: float = 0.85, max_iter: int = 200, tol: float = 1e-12
) -> dict[int, float]:
    """Dense power iteration with dangling-mass redistribution over the
    *directed* edge list; vertex set = union of endpoints."""
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    by_dst: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        by_dst[idx[d]].append(idx[s])
    for _ in range(max_iter):
        dangling = r[out == 0].sum()
        base = (1 - damping) / n + damping * dangling / n
        new = np.full(n, base)
        contrib = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        for di, srcs in by_dst.items():
            new[di] += damping * contrib[srcs].sum()
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return {v: float(r[idx[v]]) for v in verts}


def label_propagation(edges: list[tuple[int, int]], max_iter: int = 20) -> dict[int, int]:
    """Synchronous LPA, most-frequent neighbor label, min-label tie-break —
    must match graph500_bfs_spark.operators.label_propagation exactly."""
    adj = adj_from_edges(edges)
    labels = {v: v for v in adj}
    for _ in range(max_iter):
        new = {}
        changed = 0
        for v in adj:
            counts: dict[int, int] = defaultdict(int)
            for w in adj[v]:
                counts[labels[w]] += 1
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[v] = best
            changed += best != labels[v]
        labels = new
        if changed == 0:
            break
    return labels


def triangle_count(edges: list[tuple[int, int]]) -> int:
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    a = np.zeros((n, n), dtype=np.int64)
    for s, d in edges:
        if s != d:
            a[idx[s], idx[d]] = 1
            a[idx[d], idx[s]] = 1
    return int(np.trace(a @ a @ a) // 6)
