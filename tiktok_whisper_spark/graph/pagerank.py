"""Weighted PageRank as a checkpointed iterative DataFrame job.

Semantics (matched exactly by the NumPy oracle in ``oracle/graph_oracle.py``):

* edge weights are combined per (src, dst) and row-normalized per src:
  ``p(u→v) = w(u,v) / Σ_x w(u,x)``;
* damping ``d`` (default 0.85), uniform teleport;
* **dangling mass redistribution** — vertices with no out-edges spread their
  rank uniformly: ``r'(v) = (1-d)/N + d·(Σ_u p(u→v)·r(u) + D/N)`` where
  ``D = Σ_{dangling u} r(u)`` from the previous superstep;
* convergence: ``L∞(r' - r) < tol`` (default 1e-6), float64 throughout.

The reference motivates the graph: its duplicate/similarity graph and the
role→tool usage graph (SURVEY.md §1.5); its rank-like surface is the user
leaderboard (``web/handlers/api.go:377-388``) — PageRank generalizes "who
matters" from raw counts to link structure.

Scale design: the edge table is partitioned and persisted once
(:func:`~tiktok_whisper_spark.graph.scatter.prepare_edges` — hub keys
salted); each superstep shuffles only the vertex-sized rank frame, gathers
via Arrow-batch NumPy partial sums, and commits state + metrics + lineage
through :class:`~tiktok_whisper_spark.sources.catalog.CheckpointStore`, so a
killed job resumes from the last complete superstep.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import CheckpointStore
from .runner import GraphRun, run_supersteps
from .scatter import csr_gather, prepare_edges, scatter_gather, write_edge_shards

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    store: CheckpointStore | None = None,
    run_id: str | None = None,
    resume: bool = True,
    scatter_mode: str = "csr",
    num_salts: int = 8,
    hot_threshold: int | None = None,
    checkpoint_every: int = 1,
) -> GraphRun:
    """Run PageRank over ``edges(src, dst, weight, ...)`` to convergence.

    Returns a :class:`GraphRun` whose ``state`` has
    ``(vid:long, rank:double, prev_rank:double, dangling:boolean)``.
    """
    spark: SparkSession = edges.sparkSession
    store = store or CheckpointStore(tempfile.mkdtemp(prefix="twspark_pr_"))
    run_id = run_id or f"pagerank-{uuid.uuid4().hex[:12]}"
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # -- one-time graph preparation (recomputed cheaply on resume) ----------
    e = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    enorm = e.join(out_w, "src").select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))

    pe = None
    shard_dir: str | None = None
    num_edges = 0
    if scatter_mode == "csr":
        # adjacency shards aligned with the state's hash partitioning —
        # written once per run (reused on resume), worker-cached thereafter
        shard_dir = os.path.join(store.root, run_id, "_edge_shards")
        if not os.path.exists(os.path.join(shard_dir, "_DONE")):
            write_edge_shards(enorm, shard_dir, num_partitions)
            open(os.path.join(shard_dir, "_DONE"), "w").close()
        num_edges = enorm.count()
    else:
        pe = prepare_edges(
            enorm, payload=("p",), num_salts=num_salts, hot_threshold=hot_threshold
        )
        num_edges = pe.num_edges

    vertices = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
        .join(out_w.select(F.col("src").alias("vid"), F.lit(True).alias("has_out")), "vid", "left")
        .select("vid", F.coalesce(F.col("has_out"), F.lit(False)).alias("has_out"))
        .persist()
    )
    n = vertices.count()
    if n == 0:
        raise ValueError("pagerank: empty edge set")

    def init_fn() -> tuple[DataFrame, dict]:
        state = vertices.select(
            "vid",
            F.lit(1.0 / n).alias("rank"),
            F.lit(1.0 / n).alias("prev_rank"),
            (~F.col("has_out")).alias("dangling"),
        )
        return state, {}

    def step_fn(state: DataFrame, carry: dict, k: int) -> DataFrame:
        d = damping
        dangling_per_vertex = carry["dangling_sum"] / n
        if scatter_mode == "csr":
            sums = csr_gather(state.select("vid", "rank"), shard_dir)
        else:
            sums = scatter_gather(
                pe, state.select("vid", "rank"), F.col("p") * F.col("rank"), mode=scatter_mode
            )
        # both sides are hash-partitioned on the join key (state by vid from
        # localCheckpoint, sums by dst from the gather groupBy) — the
        # shuffle_hash hint turns the exchange-free SMJ into an exchange-free
        # hash join, skipping two 15M-row sorts per superstep.
        return (
            state.join(sums.hint("shuffle_hash"), state["vid"] == sums["dst"], "left_outer")
            .select(
                state["vid"],
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * (F.coalesce(sums["c"], F.lit(0.0)) + F.lit(dangling_per_vertex))
                ).alias("rank"),
                state["rank"].alias("prev_rank"),
                state["dangling"],
            )
        )

    # distributive per-partition partials, combined on the driver (one job
    # per superstep computes these together with the lineage rows)
    partition_aggs = [
        F.max(F.abs(F.col("rank") - F.col("prev_rank"))).alias("p_delta_max"),
        F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(F.lit(0.0))).alias(
            "p_dangling_sum"
        ),
        F.sum("rank").alias("p_total_mass"),
        F.count(F.when(F.abs(F.col("rank") - F.col("prev_rank")) > tol, 1)).alias("p_active"),
    ]

    def combine_fn(partials: list[dict], carry: dict, k: int) -> tuple[dict, dict, bool]:
        delta_max = max((p["p_delta_max"] for p in partials), default=0.0)
        dangling_sum = sum(p["p_dangling_sum"] for p in partials)
        total_mass = sum(p["p_total_mass"] for p in partials)
        active = sum(p["p_active"] for p in partials)
        converged = k > 0 and delta_max < tol
        metrics = {
            "kernel": "pagerank",
            "delta_max": delta_max,
            "total_mass": total_mass,
            "active_vertices": active,
            "edges_processed": num_edges,
            "n_vertices": n,
        }
        return metrics, {"dangling_sum": dangling_sum}, converged

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
        if pe is not None:
            pe.unpersist()
        vertices.unpersist()
