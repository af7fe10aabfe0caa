"""Reference graph kernels in pure NumPy / Python — the correctness oracles.

Mirrors the reference's exact-expected-value kernel tests
(``internal/app/embedding/similarity/calculator_test.go:28-80`` asserts
cosine==1.0 for identical vectors etc.): each Spark kernel in
``tiktok_whisper_spark.graph`` must match these within allclose(1e-6)
(PageRank) or exactly (CC / LPA / triangles). All math is float64; all
semantics (dangling redistribution, synchronous updates, min-label
tie-breaks) are documented in the Spark kernels' docstrings and implemented
identically here.

Edges come in as plain Python lists of ``(src, dst, weight)`` tuples —
typically ``df.collect()``-ed from the Spark-derived edge table, so vertex
ids are the same opaque int64s on both sides.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

__all__ = ["pagerank_oracle", "cc_oracle", "kcore_oracle", "lpa_oracle", "triangle_oracle"]

Edge = tuple[int, int, float]


def _index(edges: list[Edge]) -> tuple[list[int], dict[int, int]]:
    vids = sorted({e[0] for e in edges} | {e[1] for e in edges})
    return vids, {v: i for i, v in enumerate(vids)}


def pagerank_oracle(
    edges: list[Edge],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    teleport_seeds: list[int] | None = None,
) -> dict[int, float]:
    """Weighted power iteration with dangling-mass redistribution.

    r'(v) = (1-d)·t(v) + d * (Σ_u p(u→v) r(u) + D·t(v)),
    D = Σ_{dangling} r(u), p(u→v) = w(u,v)/Σ_x w(u,x), stop at L∞ < tol.
    t is uniform (1/N) for global PageRank, or uniform over
    ``teleport_seeds`` for the personalized variant. Init is 1/N in BOTH
    cases (matching the engine): the fixpoint is init-independent for d<1,
    and fixed-iteration comparisons replay the same trajectory.
    """
    vids, idx = _index(edges)
    n = len(vids)
    w = defaultdict(float)
    for s, d_, wt in edges:
        w[(idx[s], idx[d_])] += float(wt)
    out_w = np.zeros(n)
    for (s, _), wt in w.items():
        out_w[s] += wt
    dangling = out_w == 0.0

    t = np.full(n, 1.0 / n)
    if teleport_seeds is not None:
        t = np.zeros(n)
        t[[idx[v] for v in teleport_seeds]] = 1.0 / len(set(teleport_seeds))

    r = np.full(n, 1.0 / n)
    items = [(s, d_, wt / out_w[s]) for (s, d_), wt in w.items()]
    src = np.array([s for s, _, _ in items], dtype=np.int64)
    dst = np.array([d_ for _, d_, _ in items], dtype=np.int64)
    p = np.array([pp for _, _, pp in items], dtype=np.float64)

    d = damping
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, p * r[src])
        r_new = (1.0 - d) * t + d * (contrib + r[dangling].sum() * t)
        if np.max(np.abs(r_new - r)) < tol:
            r = r_new
            break
        r = r_new
    return {v: float(r[idx[v]]) for v in vids}


def cc_oracle(edges: list[Edge]) -> dict[int, int]:
    """Union-find; component label = min vertex id in the component."""
    vids, _ = _index(edges)
    parent = {v: v for v in vids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d_, _ in edges:
        if s == d_:
            continue
        rs, rd = find(s), find(d_)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # path-compress fully, then relabel to component minimum
    roots = {v: find(v) for v in vids}
    comp_min: dict[int, int] = {}
    for v, r in roots.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[roots[v]] for v in vids}


def lpa_oracle(edges: list[Edge], max_iter: int = 20) -> dict[int, int]:
    """Synchronous weighted LPA, tie-break (max votes, then min label)."""
    vids, _ = _index(edges)
    nbrs: dict[int, dict[int, float]] = defaultdict(lambda: defaultdict(float))
    for s, d_, wt in edges:
        if s == d_:
            continue
        nbrs[s][d_] += float(wt)
        nbrs[d_][s] += float(wt)
    labels = {v: v for v in vids}
    for _ in range(max_iter):
        new_labels = {}
        for v in vids:
            if not nbrs[v]:
                new_labels[v] = labels[v]
                continue
            votes: dict[int, float] = defaultdict(float)
            for u, wt in nbrs[v].items():
                votes[labels[u]] += wt
            # max votes, then smallest label
            new_labels[v] = min(votes, key=lambda lbl: (-votes[lbl], lbl))
        if new_labels == labels:
            break
        labels = new_labels
    return labels


def triangle_oracle(edges: list[Edge]) -> tuple[int, dict[int, int]]:
    """Brute-force exact triangle count: global total + per-vertex counts."""
    vids, _ = _index(edges)
    adj: dict[int, set[int]] = defaultdict(set)
    for s, d_, _ in edges:
        if s == d_:
            continue
        adj[s].add(d_)
        adj[d_].add(s)
    per_vertex = dict.fromkeys(vids, 0)
    total = 0
    order = sorted(vids)
    pos = {v: i for i, v in enumerate(order)}
    for u in order:
        higher = [x for x in adj[u] if pos[x] > pos[u]]
        for i, v in enumerate(higher):
            for w_ in higher[i + 1 :]:
                if w_ in adj[v]:
                    total += 1
                    per_vertex[u] += 1
                    per_vertex[v] += 1
                    per_vertex[w_] += 1
    return total, {v: c for v, c in per_vertex.items() if c > 0}


def kcore_oracle(edges: list[Edge], k: int) -> dict[int, int]:
    """Exact k-core by sequential peeling: {vid: degree-in-core}."""
    adj: dict[int, set[int]] = {}
    for s, d_, _ in edges:
        if s == d_:
            continue
        adj.setdefault(s, set()).add(d_)
        adj.setdefault(d_, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(ns) for v, ns in adj.items()}
