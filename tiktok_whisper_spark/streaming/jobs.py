"""Job-state table semantics (SURVEY §2.9) — the reference's Redis job store
and Temporal batch workflow re-expressed as table operations.

Reference state machine: jobs move through pending → processing →
completed/failed, indexed per status (``internal/api/v1/services/
redis_job_service.go:46-61`` Job struct, ``:144-163`` status-set moves).
Here the jobs table is a DataFrame (Iceberg on a cluster, parquet in the
sandbox) and every mutation is a pure transformation returning the new
table state — MERGE-style upsert emulated with anti-join + union, exactly
the pattern Iceberg's ``MERGE INTO`` replaces at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "JOBS_SCHEMA",
    "empty_jobs",
    "upsert_jobs",
    "transition_status",
    "queue_stats",
    "ttl_cleanup",
    "retry_failed_subset",
]

# whisper_jobs shape (scripts/migrations/002_create_whisper_jobs_table.sql:2-25)
JOBS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("whisper_job_id", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("file_name", T.StringType(), True),
        T.StructField("retry_count", T.IntegerType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

VALID_STATUSES = ("pending", "processing", "completed", "failed")


def empty_jobs(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], JOBS_SCHEMA)


def upsert_jobs(jobs: DataFrame, incoming: DataFrame) -> DataFrame:
    """CreateJob/UpdateJob (``redis_job_service.go:64-97``): replace rows by
    id, insert new ones. Iceberg: MERGE INTO ... WHEN MATCHED UPDATE."""
    kept = jobs.join(incoming.select("id"), "id", "left_anti")
    return kept.unionByName(incoming.select(*[f.name for f in JOBS_SCHEMA.fields]))


def transition_status(jobs: DataFrame, job_ids: DataFrame, new_status: str) -> DataFrame:
    """Status-set move (``redis_job_service.go:144-163``): flip status for the
    given ids, bump updated_at. One broadcast-able semi-join, no shuffle of
    the big side beyond the join itself."""
    if new_status not in VALID_STATUSES:
        raise ValueError(f"invalid status {new_status!r}; one of {VALID_STATUSES}")
    flagged = jobs.join(
        F.broadcast(job_ids.select(F.col("id"), F.lit(True).alias("_hit"))), "id", "left"
    )
    return flagged.select(
        *[c for c in jobs.columns if c not in ("status", "updated_at")],
        F.when(F.col("_hit"), F.lit(new_status)).otherwise(F.col("status")).alias("status"),
        F.when(F.col("_hit"), F.current_timestamp()).otherwise(F.col("updated_at")).alias(
            "updated_at"
        ),
    ).select(*jobs.columns)


def queue_stats(jobs: DataFrame) -> DataFrame:
    """ZCard-per-status + HLen total (``redis_job_service.go:294-316``)."""
    return jobs.groupBy("status").agg(F.count(F.lit(1)).alias("cnt"))


def ttl_cleanup(jobs: DataFrame, cutoff_ts: str) -> DataFrame:
    """T6: drop completed/failed jobs older than the cutoff
    (``redis_job_service.go:319-349``)."""
    expired = (
        F.col("status").isin("completed", "failed")
        & (F.col("updated_at") < F.lit(cutoff_ts).cast("timestamp"))
    )
    return jobs.where(~expired)


def retry_failed_subset(jobs: DataFrame, max_retries: int = 2) -> DataFrame:
    """T3: re-queue failed jobs under the retry cap (``workflows/batch.go:
    216-260`` retries only the failed subset, ≤2 attempts)."""
    retryable = (F.col("status") == "failed") & (F.coalesce("retry_count", F.lit(0)) < max_retries)
    return jobs.select(
        *[c for c in jobs.columns if c not in ("status", "retry_count")],
        F.when(retryable, F.lit("pending")).otherwise(F.col("status")).alias("status"),
        F.when(retryable, F.coalesce("retry_count", F.lit(0)) + 1)
        .otherwise(F.col("retry_count"))
        .alias("retry_count"),
    ).select(*jobs.columns)
