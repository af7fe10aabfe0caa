"""Partition-quality metrics over the link graph (Newman modularity).

Reference motivation: the reference surfaces cluster *quality* alongside
cluster membership (per-cluster cohesion stats in the browser clustering UI,
``web/static/js/clustering.js:331-361``); modularity is the graph-native
analog for the communities LPA emits — one number scoring how much
intra-community weight exceeds the degree-preserving random expectation.

Scale shape: two endpoint joins on ``vid`` (shuffle-partitioned, AQE-planned)
feeding ONE per-community aggregate and ONE global fold — no Python
crossings, no collect, no window. At 10^12 edges the cost is the same two
hash joins LPA's own vote step already pays; everything after is a
|communities|-row relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["modularity"]


def modularity(edges: DataFrame, labels: DataFrame, *, check_coverage: bool = False) -> DataFrame:
    """Newman modularity ``Q = e_in/2m − Σ_c (a_c/2m)²`` of a vertex
    partition, on the weighted undirected graph.

    ``edges(src, dst, weight)`` is symmetrized with summed weights (both
    directions, self-loops dropped) — the exact symmetrization
    :func:`~tiktok_whisper_spark.graph.label_propagation` votes over, so its
    ``state`` plugs in as ``labels(vid, label)`` directly.

    In the symmetrized ordered-pair relation ``s``: ``2m = Σ w``, the
    strength of community ``c`` is ``a_c = Σ_{src∈c} w`` and its internal
    weight ``e_in_c = Σ_{src∈c, dst∈c} w`` — both fall out of one
    ``groupBy(community)`` pass. Communities are counted over vertices with
    ≥1 incident edge (isolated vertices have ``a_c = 0`` and contribute
    nothing to Q).

    **Contract: ``labels`` must cover every non-isolated vertex.** The
    endpoint joins are inner, so an edge with an unlabeled endpoint would be
    silently dropped — deflating 2m and skewing Q with no error. Labels
    produced by the engine's own LPA/CC runs over the same edge set cover
    every vertex by construction; for externally supplied partitions pass
    ``check_coverage=True`` to pay one extra count job that verifies no
    edge was dropped and raises on mismatch.

    Returns a one-row DataFrame ``(n_communities:long, modularity:double)``,
    unrounded — callers comparing across engines apply their own rounding.
    """
    fwd = edges.select("src", "dst", "weight")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    s = (
        fwd.unionByName(rev)
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("c_src"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("c_dst"))
    joined = s.join(la, "src").join(lb, "dst")
    if check_coverage:
        n_s, n_j = s.count(), joined.count()
        if n_s != n_j:
            raise ValueError(
                f"modularity: labels do not cover every non-isolated vertex "
                f"({n_s - n_j} of {n_s} symmetrized edges dropped by the label join)"
            )
    per_c = (
        joined
        .groupBy("c_src")
        .agg(
            F.sum("w").alias("a_c"),
            F.sum(
                F.when(F.col("c_src") == F.col("c_dst"), F.col("w")).otherwise(0.0)
            ).alias("e_in_c"),
        )
    )
    # Σ_c a_c = 2m exactly (count-valued weights stay integer-exact in
    # float64), so the final expression is bit-reproducible in any engine
    # that aggregates the same values: e_in/2m − Σ a_c² / (2m)²
    return per_c.agg(
        F.count(F.lit(1)).alias("n_communities"),
        (
            F.sum("e_in_c") / F.sum("a_c")
            - F.sum(F.col("a_c") * F.col("a_c")) / (F.sum("a_c") * F.sum("a_c"))
        ).alias("modularity"),
    )
