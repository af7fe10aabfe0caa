"""Connected components via synchronous min-label propagation.

Reference semantics being generalized: duplicate groups — ``embed duplicates
--threshold 0.95`` (reference ``README.md:216``) emits near-duplicate pairs;
the transitive closure of those pairs (the duplicate *groups*) is exactly
connected components over the similarity graph.

Algorithm: every vertex starts labeled with its own id; each superstep every
vertex takes ``min(own label, min over in+out neighbors' labels)``;
convergence when no label changes. Deterministic by construction (min is a
total order on int64 ids) → exact match with the union-find oracle.
Supersteps are O(graph diameter); for the Zipf-ish transcript graphs used
here the diameter is tiny. (Large-diameter graphs would want
large-star/small-star; noted as future work in SURVEY.md §7.3.)

Edges are treated as **undirected**: the edge table is symmetrized once and
prepared through the same salted/persisted scatter machinery as PageRank.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import CheckpointStore
from .runner import GraphRun, run_supersteps
from .scatter import prepare_edges, scatter_gather

__all__ = ["connected_components", "symmetrize"]


def symmetrize(edges: DataFrame) -> DataFrame:
    """Distinct undirected adjacency ``(src, dst)`` — both directions, no loops."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    edges: DataFrame,
    *,
    max_iter: int = 50,
    store: CheckpointStore | None = None,
    run_id: str | None = None,
    resume: bool = True,
    scatter_mode: str = "arrow",
    num_salts: int = 8,
    hot_threshold: int | None = None,
    checkpoint_every: int = 1,
) -> GraphRun:
    """Min-id connected components over ``edges(src, dst, ...)``.

    Returns a :class:`GraphRun` whose ``state`` has
    ``(vid:long, label:long, prev_label:long)``; ``label`` is the minimum
    vertex id of the component.
    """
    spark: SparkSession = edges.sparkSession
    store = store or CheckpointStore(tempfile.mkdtemp(prefix="twspark_cc_"))
    run_id = run_id or f"cc-{uuid.uuid4().hex[:12]}"

    sym = symmetrize(edges)
    pe = prepare_edges(sym, payload=(), num_salts=num_salts, hot_threshold=hot_threshold)
    vertices = sym.select(F.col("src").alias("vid")).distinct().persist()
    n = vertices.count()

    def init_fn() -> tuple[DataFrame, dict]:
        return vertices.select("vid", F.col("vid").alias("label"), F.col("vid").alias("prev_label")), {}

    def step_fn(state: DataFrame, carry: dict, k: int) -> DataFrame:
        nbr_min = scatter_gather(
            pe, state.select("vid", "label"), F.col("label"), agg="min", mode=scatter_mode
        )
        return (
            state.join(nbr_min.hint("shuffle_hash"), state["vid"] == nbr_min["dst"], "left_outer")
            .select(
                state["vid"],
                F.least(state["label"], F.coalesce(nbr_min["c"], state["label"])).alias("label"),
                state["label"].alias("prev_label"),
            )
        )

    partition_aggs = [
        F.count(F.when(F.col("label") != F.col("prev_label"), 1)).alias("p_changed"),
    ]

    def combine_fn(partials: list[dict], carry: dict, k: int) -> tuple[dict, dict, bool]:
        changed = sum(p["p_changed"] for p in partials)
        converged = k > 0 and changed == 0
        metrics = {
            "kernel": "connected_components",
            "changed": changed,
            "active_vertices": changed,
            "edges_processed": pe.num_edges,
            "n_vertices": n,
        }
        return metrics, {}, converged

    try:
        return run_supersteps(
            spark,
            store=store,
            run_id=run_id,
            init_fn=init_fn,
            step_fn=step_fn,
            partition_aggs=partition_aggs,
            combine_fn=combine_fn,
            max_iter=max_iter,
            resume=resume,
            checkpoint_every=checkpoint_every,
        )
    finally:
        pe.unpersist()
        vertices.unpersist()
