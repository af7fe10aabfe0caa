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
4. triangles = wedges semi-joined with the closing oriented edge.

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


def triangle_counts(edges: DataFrame) -> TriangleResult:
    """Exact global + per-vertex triangle counts for the undirected graph."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
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
    return TriangleResult(total=total, per_vertex=per_vertex)
