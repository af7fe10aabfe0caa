"""Triangle counting via degree orientation (non-iterative DataFrame job).

Reference motivation: intra-cluster connection edges rendered by the
visualization (``web/static/js/visualization.js:393-419``) and the
near-duplicate similarity graph — triangle density measures how clique-like
duplicate groups / role-tool communities are.

Algorithm (standard, shuffle-minimal):

1. symmetrize + dedup to canonical undirected edges ``a < b``;
2. **orient** every edge from the endpoint with (degree, id)-smaller to the
   larger — each triangle is then counted exactly once, and the 2-path
   (wedge) join is bounded by Σ min-degree², not Σ degree² — the classical
   trick that keeps the self-join feasible on skewed (Zipf-hub) graphs;
3. wedges = oriented ⋈ oriented on ``e1.dst == e2.src``;
4. triangles = wedges semi-joined with the closing oriented edge;
5. **heavy-hitter split** (``hub_split``): wedge centers whose oriented
   out-degree exceeds a data-driven cutoff generate their wedges via a
   broadcast adjacency-list join + ``explode`` instead of the shuffled
   self-join — the escape hatch for residual skew at 10^12 edges, where
   one hot middle vertex would otherwise own an entire shuffle partition.

Everything is plain DataFrame joins — Catalyst picks sort-merge with AQE
skew splitting; no Python crossings at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import symmetrize

__all__ = ["triangle_counts", "TriangleResult"]


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (vid, triangles)


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges oriented by (degree, id) order: lo → hi."""
    und = (
        symmetrize(edges)
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("deg_b"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_counts(
    edges: DataFrame,
    *,
    hub_split: bool = True,
    hub_threshold: int | None = None,
) -> TriangleResult:
    """Exact global + per-vertex triangle counts for the undirected graph.

    ``hub_split=True`` (default) is the 100×-scale escape hatch for the one
    remaining skew point: the wedge self-join hash-partitions on the middle
    vertex ``v``, so a hot wedge center (a hub whose oriented out-degree
    survives the degree-orientation bound) concentrates its entire
    ``in(v) × out(v)`` wedge set in one shuffle partition. Hot centers
    (oriented out-degree > ``hub_threshold``, default 10× the mean, min 64
    — the same data-driven cutoff as ``prepare_edges``) are handled
    map-side instead: their out-adjacency lists (each ≤ O(√m) by
    orientation, and only the few keys above the cutoff) broadcast, and a
    broadcast-join + ``explode`` generates their wedges with NO shuffle
    keyed on the hot vertex — the closing semi-join keys on the well-spread
    ``(u, w)`` pair. Cold centers keep the plain wedge join. A wedge center
    is hot or cold exclusively, so the union double-counts nothing.
    """
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2_all = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))

    hot = None
    if hub_split:
        odeg = o.groupBy("lo").agg(F.count(F.lit(1)).alias("odeg"))
        if hub_threshold is None:
            mean_deg = odeg.agg(F.avg("odeg")).collect()[0][0] or 0.0
            hub_threshold = max(int(10 * mean_deg), 64)
        hot = odeg.where(F.col("odeg") > hub_threshold).select(F.col("lo").alias("hv")).persist()
        if hot.count() == 0:
            hot.unpersist()
            hot = None

    if hot is None:
        wedges = e1.join(e2_all, "v").select("u", "v", "w")
    else:
        e2_cold = (
            o.join(F.broadcast(hot), o["lo"] == hot["hv"], "left_anti")
            .select(F.col("lo").alias("v"), F.col("hi").alias("w"))
        )
        hot_adj = (
            o.join(F.broadcast(hot), o["lo"] == hot["hv"], "left_semi")
            .groupBy(F.col("lo").alias("v"))
            .agg(F.collect_list("hi").alias("ws"))
        )
        wedges_hot = (
            o.join(F.broadcast(hot_adj), o["hi"] == hot_adj["v"], "inner")
            .select(F.col("lo").alias("u"), "v", F.explode("ws").alias("w"))
        )
        wedges = e1.join(e2_cold, "v").select("u", "v", "w").unionByName(wedges_hot)

    closing = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tris = wedges.join(closing, ["u", "w"], "left_semi").persist()

    per_vertex = (
        tris.select(F.col("u").alias("vid"))
        .unionByName(tris.select(F.col("v").alias("vid")))
        .unionByName(tris.select(F.col("w").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    total = tris.count()
    o.unpersist()
    if hot is not None:
        hot.unpersist()
    return TriangleResult(total=total, per_vertex=per_vertex)
