"""Checkpointed table catalog — the engine's `_runs` / `_checkpoints` / `_metrics`.

The north rule requires per-superstep checkpoints of rank/component/label
vectors **plus per-partition lineage and iteration metrics**, resumable
mid-algorithm. The reference's analog is its checkpointed batch migration
(``internal/app/repository/migrate/migrate.go:16-32`` persists the last
committed id; ``:34-85`` resumes with ``WHERE id > ? ORDER BY id LIMIT
1000``) and its Redis job state machine
(``internal/api/v1/services/redis_job_service.go:144-163``).

Backend seam
------------
``backend="parquet"`` (default, always available): each superstep commits

* ``<root>/<run_id>/superstep=NNNNNN/state/`` — the vertex-state DataFrame
  as Parquet;
* ``<root>/<run_id>/superstep=NNNNNN/manifest.json`` — written atomically
  (tmp file + ``os.replace``) AFTER the state write succeeds; a superstep
  exists iff its manifest exists, which makes commits all-or-nothing even if
  the job is killed mid-write. The manifest carries iteration metrics,
  carried scalars (e.g. PageRank dangling mass), and per-partition lineage
  rows ``(partition_id, n_rows, checksum)``.

``backend="iceberg"``: on a real cluster the same protocol maps 1:1 onto
Iceberg tables (state snapshots + ``_checkpoints``/``_metrics`` rows in one
transaction); the runtime jar is not present in this sandbox, so that
backend raises with instructions rather than silently degrading.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession

__all__ = ["CheckpointStore"]

_MANIFEST = "manifest.json"


def _superstep_dir(root: str, run_id: str, superstep: int) -> str:
    return os.path.join(root, run_id, f"superstep={superstep:06d}")


class CheckpointStore:
    """Per-superstep atomic state + metrics + lineage commits on local/DFS paths."""

    def __init__(self, root: str, backend: str = "parquet", codec: str | None = None) -> None:
        if backend == "iceberg":
            raise NotImplementedError(
                "Iceberg backend needs iceberg-spark-runtime on the classpath; "
                "configure spark.sql.catalog.* and swap this seam. The parquet "
                "backend implements the identical commit protocol."
            )
        if backend != "parquet":
            raise ValueError(f"unknown backend {backend!r}")
        self.root = root
        self.backend = backend
        # Checkpoint codec: 'none' on tmpfs/NVMe-local stores (CPU-bound
        # compression costs more than the bytes), snappy/zstd on object
        # stores where the bytes dominate. Env override for benches.
        self.codec = codec or os.environ.get("SPARK_GRAFT_CKPT_CODEC", "snappy")
        os.makedirs(root, exist_ok=True)

    # -- write path ---------------------------------------------------------
    #
    # Two-phase commit per superstep:
    #   store.write_state(run_id, k, state)            # data files (from cache)
    #   store.finalize(run_id, k, lineage, metrics, carry)  # manifest = commit point
    # A superstep exists iff its manifest exists; a kill between the two
    # phases leaves a torn directory that write_state clears on retry.

    def clear_run(self, run_id: str) -> None:
        """Drop every committed/torn superstep of ``run_id`` (fresh-run reset).

        A fresh run (``resume=False``) under a reused run_id must not leave
        committed supersteps from an earlier, longer run above the new run's
        last superstep — a later ``resume=True`` would silently resume from
        the stale ``latest()``. Non-superstep artifacts (e.g. edge shards,
        which are deterministic re-derivations) are preserved.
        """
        run_dir = os.path.join(self.root, run_id)
        if not os.path.isdir(run_dir):
            return
        for name in os.listdir(run_dir):
            if name.startswith("superstep="):
                shutil.rmtree(os.path.join(run_dir, name), ignore_errors=True)

    def write_state(self, run_id: str, superstep: int, state: DataFrame) -> str:
        """Write the superstep's state Parquet; returns the state dir path.

        The caller keeps iterating on its in-memory (localCheckpoint-ed)
        state; these files exist for durability/resume only.
        """
        step_dir = _superstep_dir(self.root, run_id, superstep)
        state_dir = os.path.join(step_dir, "state")
        if os.path.exists(step_dir) and not os.path.exists(os.path.join(step_dir, _MANIFEST)):
            shutil.rmtree(step_dir)  # torn write from a killed run — redo
        state.write.mode("overwrite").option("compression", self.codec).parquet(state_dir)
        return state_dir

    def finalize(
        self,
        run_id: str,
        superstep: int,
        lineage: list[dict[str, Any]],
        metrics: dict[str, Any],
        carry: dict[str, Any] | None = None,
    ) -> None:
        """Write the manifest (the atomic commit point).

        ``lineage`` rows are ``(partition_id, n_rows, checksum)`` computed by
        the runner in the same aggregation as the convergence metrics —
        mirroring how an Iceberg commit records per-file stats.
        """
        step_dir = _superstep_dir(self.root, run_id, superstep)
        manifest = {
            "run_id": run_id,
            "superstep": superstep,
            "complete": True,
            "committed_at": time.time(),
            "metrics": metrics,
            "carry": carry or {},
            "lineage": lineage,
        }
        tmp = os.path.join(step_dir, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(step_dir, _MANIFEST))

    # -- read path ----------------------------------------------------------

    def completed_supersteps(self, run_id: str) -> list[int]:
        run_dir = os.path.join(self.root, run_id)
        if not os.path.isdir(run_dir):
            return []
        out = []
        for name in sorted(os.listdir(run_dir)):
            if name.startswith("superstep=") and os.path.exists(
                os.path.join(run_dir, name, _MANIFEST)
            ):
                out.append(int(name.split("=")[1]))
        return out

    def latest(self, run_id: str) -> int | None:
        steps = self.completed_supersteps(run_id)
        return steps[-1] if steps else None

    def manifest(self, run_id: str, superstep: int) -> dict[str, Any]:
        with open(os.path.join(_superstep_dir(self.root, run_id, superstep), _MANIFEST)) as f:
            return json.load(f)

    def load_state(self, spark: SparkSession, run_id: str, superstep: int) -> DataFrame:
        return spark.read.parquet(
            os.path.join(_superstep_dir(self.root, run_id, superstep), "state")
        )

    def metrics_history(self, run_id: str) -> list[dict[str, Any]]:
        return [self.manifest(run_id, s)["metrics"] for s in self.completed_supersteps(run_id)]
