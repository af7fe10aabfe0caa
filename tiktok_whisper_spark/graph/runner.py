"""Shared superstep loop: checkpoint, resume, metrics, lineage.

Catalyst has no fixpoint operator, so iterative graph jobs are a driver
``while`` loop over DataFrame transformations — the same shape as the
reference's resumable batch loops (``internal/app/repository/migrate/
migrate.go:34-85`` and ``internal/app/embedding/orchestrator/
batch_processor.go:96-170``), with the checkpoint protocol of
:class:`~tiktok_whisper_spark.sources.catalog.CheckpointStore` replacing
``last_id.txt``.

Contract between the loop and a kernel:

* ``init_fn() -> (state_df, carry)`` — superstep 0 state. The state schema
  is kernel-owned but must embed whatever the measure step needs (kernels
  keep both the new and previous value per vertex, e.g. ``rank`` +
  ``prev_rank``, so convergence is measurable from the committed files
  alone — a resumed run recomputes nothing).
* ``step_fn(state_df, carry, superstep) -> state_df`` — one superstep as a
  pure DataFrame transformation (lazy; the loop materializes it via the
  checkpoint write).
* ``measure_fn(reloaded_state_df, carry, superstep) -> (metrics, carry,
  converged)`` — ONE small aggregation over the committed state.

Per superstep the loop runs exactly two Spark actions on vertex-sized data
(the Parquet write and the measure aggregation) plus one tiny lineage
aggregation — the edge-sized work happens inside ``step_fn``'s plan.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import CheckpointStore

__all__ = ["GraphRun", "run_supersteps"]


@dataclass
class GraphRun:
    """Result of an iterative graph job."""

    state: DataFrame
    run_id: str
    supersteps: int  # number of the last committed superstep
    converged: bool
    metrics: list[dict[str, Any]] = field(default_factory=list)
    resumed_from: int | None = None


def run_supersteps(
    spark: SparkSession,
    *,
    store: CheckpointStore,
    run_id: str,
    init_fn: Callable[[], tuple[DataFrame, dict[str, Any]]],
    step_fn: Callable[[DataFrame, dict[str, Any], int], DataFrame],
    measure_fn: Callable[[DataFrame, dict[str, Any], int], tuple[dict[str, Any], dict[str, Any], bool]],
    max_iter: int,
    resume: bool = True,
    checkpoint_every: int = 1,
) -> GraphRun:
    """Drive ``step_fn`` to convergence with per-superstep atomic commits.

    ``checkpoint_every`` sets the durable-commit cadence: 1 (default)
    commits every superstep per the engine contract; k>1 persists
    intermediate supersteps in memory and commits every k-th (plus the
    final/converged one) — resume then recomputes at most k-1 supersteps.
    """
    state: DataFrame | None = None
    carry: dict[str, Any] = {}
    history: list[dict[str, Any]] = []
    resumed_from: int | None = None
    start = 0

    if resume:
        latest = store.latest(run_id)
        if latest is not None:
            man = store.manifest(run_id, latest)
            carry = man["carry"]
            history = store.metrics_history(run_id)
            state = store.load_state(spark, run_id, latest)
            resumed_from = latest
            if carry.get("_converged"):
                return GraphRun(state, run_id, latest, True, history, resumed_from)
            start = latest + 1

    if state is None:
        t0 = time.monotonic()
        init_state, carry = init_fn()
        reloaded = store.write_state(run_id, 0, init_state)
        metrics, carry, _ = measure_fn(reloaded, carry, 0)
        metrics.update(superstep=0, wall_ms=round(1000 * (time.monotonic() - t0), 1))
        store.finalize(run_id, 0, reloaded, metrics, carry)
        history.append(metrics)
        state = reloaded
        start = 1

    converged = bool(carry.get("_converged"))
    last = start - 1
    uncommitted: DataFrame | None = None
    for k in range(start, max_iter + 1):
        t0 = time.monotonic()
        new_state = step_fn(state, carry, k)
        commit = checkpoint_every <= 1 or k % checkpoint_every == 0 or k == max_iter
        if commit:
            reloaded = store.write_state(run_id, k, new_state)
        else:
            # localCheckpoint truncates the logical plan (plain persist would
            # let Catalyst re-analyze an ever-growing plan each superstep)
            # without the durable-commit cost; resume recomputes these.
            reloaded = new_state.localCheckpoint(eager=True)
        metrics, carry, converged = measure_fn(reloaded, carry, k)
        carry["_converged"] = converged
        metrics.update(superstep=k, wall_ms=round(1000 * (time.monotonic() - t0), 1))
        if converged and not commit:
            durable = store.write_state(run_id, k, reloaded)
            reloaded.unpersist()
            reloaded = durable
            commit = True
        if commit:
            store.finalize(run_id, k, reloaded, metrics, carry)
        history.append(metrics)
        if uncommitted is not None:
            uncommitted.unpersist()
        uncommitted = None if commit else reloaded
        state = reloaded
        last = k
        if converged:
            break
    if uncommitted is not None:
        uncommitted.unpersist()

    return GraphRun(state, run_id, last, converged, history, resumed_from)
