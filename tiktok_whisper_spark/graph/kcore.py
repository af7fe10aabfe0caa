"""k-core extraction: iterative peeling as checkpoint-free DataFrame rounds.

Reference motivation: the reference surfaces "dense duplicate groups" and
community cohesion (clustering.js:579-623); the k-core — the maximal
subgraph where every vertex keeps degree ≥ k — is the graph-native dense
subset. PageRank/CC/LPA answer "who matters / who connects"; the k-core
answers "who is embedded in a dense neighbourhood".

Algorithm (exact, synchronous peeling): repeatedly drop every vertex whose
degree in the CURRENT subgraph is < k, until a fixpoint. Each round is one
degree aggregate + two semi-joins, all Catalyst; the edge relation is
``localCheckpoint``-ed per round so the plan does not grow. Extra rounds
past the fixpoint are the identity (removals are monotone), which is what
lets fixed-unroll oracles replay a run-to-convergence result.

Scale note: rounds = peeling depth. Zipf/hub graphs peel in a handful of
rounds; a long path at k=2 peels one leaf layer per round (O(diameter)).
For 10^12-edge chains route through the locality engine the way CC does —
the DataFrame form here is the generic-graph path and the oracle surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import symmetrize

__all__ = ["kcore"]


def kcore(edges: DataFrame, k: int, *, max_iter: int = 200) -> DataFrame:
    """Vertices of the k-core of the undirected simple graph.

    Returns ``(vid:long, degree:long)`` — the surviving vertices with their
    degree inside the core (all ≥ k by construction). Empty DataFrame if the
    core is empty. Raises if the peel has not converged in ``max_iter``
    rounds (a silent cap would return a superset of the core).
    """
    if k < 1:
        raise ValueError("kcore: k must be ≥ 1")
    # directed-pair form of the undirected simple graph: degree(v) is then
    # one groupBy("src") over rows where v is src
    e = (
        symmetrize(edges)
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.where(F.col("degree") >= k).select("src")
        pruned = (
            e.join(keep, "src", "left_semi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        n2 = pruned.count()
        if n2 == n_edges:
            return deg.where(F.col("degree") >= k).select(
                F.col("src").alias("vid"), "degree"
            )
        e, n_edges = pruned, n2
    if n_edges == 0:
        spark = edges.sparkSession
        return spark.createDataFrame([], "vid long, degree long")
    raise RuntimeError(f"kcore(k={k}) did not converge within {max_iter} rounds")
