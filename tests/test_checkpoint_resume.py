"""Checkpoint protocol + kill-resume semantics (north rule: resumable mid-algorithm).

Pattern from the reference's resumable migration
(``internal/app/repository/migrate/migrate.go:16-32``): persist progress
after each committed batch, resume from the last committed marker, never
recompute completed work.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oracle.graph_oracle import pagerank_oracle
from tiktok_whisper_spark.graph import pagerank
from tiktok_whisper_spark.graph.runner import run_supersteps
from tiktok_whisper_spark.sources.catalog import CheckpointStore

EDGES = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 1, 1.0), (1, 5, 1.0), (5, 2, 3.0)]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long, weight double")


def test_manifest_commit_and_lineage(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))
    run = pagerank(_edges_df(spark), store=store, run_id="r1")
    steps = store.completed_supersteps("r1")
    assert steps == list(range(run.supersteps + 1))
    man = store.manifest("r1", run.supersteps)
    assert man["complete"] and man["carry"]["_converged"]
    # lineage rows cover every state row exactly once
    assert sum(l["n_rows"] for l in man["lineage"]) == 5
    # metrics history recorded per superstep
    hist = store.metrics_history("r1")
    assert [m["superstep"] for m in hist] == steps
    assert all("edges_processed" in m and "wall_ms" in m for m in hist[1:])


def test_kill_resume_identical_ranks(spark, tmp_path):
    """Kill after superstep k → resume → identical final ranks, no recompute."""
    store = CheckpointStore(str(tmp_path / "ckpt"))
    edges = _edges_df(spark)

    full = pagerank(edges, store=store, run_id="full")
    assert full.converged

    # simulate a kill: run only 3 supersteps, then resume to convergence
    partial = pagerank(edges, store=store, run_id="killed", max_iter=3)
    assert not partial.converged
    committed_before = store.completed_supersteps("killed")
    assert committed_before == [0, 1, 2, 3]
    t_before = store.manifest("killed", 3)["committed_at"]

    resumed = pagerank(edges, store=store, run_id="killed", resume=True)
    assert resumed.converged
    assert resumed.resumed_from == 3
    # supersteps ≤ 3 were NOT recomputed: manifests unchanged (same commit time)
    assert store.manifest("killed", 3)["committed_at"] == t_before

    got_full = {r["vid"]: r["rank"] for r in full.state.collect()}
    got_res = {r["vid"]: r["rank"] for r in resumed.state.collect()}
    assert got_full.keys() == got_res.keys()
    np.testing.assert_allclose(
        [got_res[v] for v in sorted(got_res)],
        [got_full[v] for v in sorted(got_full)],
        rtol=0,
        atol=1e-12,
    )
    # and both match the oracle
    want = pagerank_oracle(EDGES)
    np.testing.assert_allclose(
        [got_res[v] for v in sorted(got_res)], [want[v] for v in sorted(want)], atol=1e-6
    )


def test_resume_of_converged_run_is_noop(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "ckpt"))
    edges = _edges_df(spark)
    first = pagerank(edges, store=store, run_id="done")
    again = pagerank(edges, store=store, run_id="done")
    assert again.converged and again.resumed_from == first.supersteps
    assert store.completed_supersteps("done") == list(range(first.supersteps + 1))


def test_torn_write_is_cleared(spark, tmp_path):
    """A state dir without a manifest (kill mid-write) is redone cleanly."""
    store = CheckpointStore(str(tmp_path / "ckpt"))
    df = spark.range(5).select(F.col("id").alias("vid"), F.lit(1.0).alias("rank"))
    store.write_state("torn", 0, df)  # no finalize → torn
    assert store.latest("torn") is None
    # retry commits fine
    store.write_state("torn", 0, df)
    store.finalize("torn", 0, [{"partition_id": 0, "n_rows": 5, "checksum": 1}], {"m": 1}, {})
    assert store.latest("torn") == 0


def test_runner_generic_loop(spark, tmp_path):
    """run_supersteps drives an arbitrary kernel (here: halving a value)."""
    store = CheckpointStore(str(tmp_path / "ckpt"))

    def init_fn():
        return spark.range(4).select(
            F.col("id").alias("vid"), F.lit(1.0).alias("x"), F.lit(1.0).alias("prev_x")
        ), {}

    def step_fn(state, carry, k):
        return state.select("vid", (F.col("x") / 2).alias("x"), F.col("x").alias("prev_x"))

    def combine_fn(partials, carry, k):
        mx = max(p["p_max_x"] for p in partials if p["p_max_x"] is not None)
        return {"max_x": mx}, {}, k > 0 and mx < 0.01

    out = run_supersteps(
        spark, store=store, run_id="halve", init_fn=init_fn, step_fn=step_fn,
        partition_aggs=[F.max("x").alias("p_max_x")], combine_fn=combine_fn, max_iter=20,
    )
    assert out.converged and out.supersteps == 7  # 1/2^7 < 0.01
