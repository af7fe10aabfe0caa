"""Dual-provider embedding columns (T9) — the reference's defining feature.

The reference stores TWO embedding columns per row (``embedding_openai``
1536-d, ``embedding_gemini`` 3072-d) with per-provider status columns and
per-user status rollups (``scripts/pg/sql/add_dual_embeddings.sql:30-49``),
filled by a concurrent fan-out orchestrator
(``internal/app/embedding/orchestrator/orchestrator.go:60-136``) that only
commits a row when BOTH providers succeeded (``StoreDualEmbeddings``).

Spark-first re-expression: the "orchestrator" is a DataFrame overlay — the
per-provider work queue is an ``IS NULL`` filter, fan-out is partition
parallelism, the dual-commit rule is a row filter on both columns, and the
status rollup is one conditional-count aggregation (A4 shape). Everything
stays in Catalyst; no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dual_status_rollup",
    "pending_for_provider",
    "store_dual_embeddings",
    "provider_status",
]

PROVIDERS = ("openai", "gemini")


def provider_status(df: DataFrame, vec_col: str, status_name: str | None = None) -> DataFrame:
    """Derive a per-provider status column from presence: completed/pending
    (the SQL schema's ``embedding_<p>_status`` default ``'pending'``,
    ``add_dual_embeddings.sql:33-36``)."""
    name = status_name or f"{vec_col}_status"
    return df.withColumn(
        name, F.when(F.col(vec_col).isNotNull(), F.lit("completed")).otherwise(F.lit("pending"))
    )


def dual_status_rollup(
    df: DataFrame, openai_col: str, gemini_col: str, group_col: str | None = None
) -> DataFrame:
    """Per-provider completion rollup (per group when ``group_col`` given) —
    the reference's per-user status queries (``add_dual_embeddings.sql:
    38-40`` composite indexes exist exactly for this shape).

    Columns: total, with_openai, with_gemini, with_both, with_either,
    pending_openai, pending_gemini.
    """
    has_a = F.col(openai_col).isNotNull()
    has_b = F.col(gemini_col).isNotNull()
    aggs = [
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(has_a, 1)).alias("with_openai"),
        F.count(F.when(has_b, 1)).alias("with_gemini"),
        F.count(F.when(has_a & has_b, 1)).alias("with_both"),
        F.count(F.when(has_a | has_b, 1)).alias("with_either"),
        F.count(F.when(~has_a, 1)).alias("pending_openai"),
        F.count(F.when(~has_b, 1)).alias("pending_gemini"),
    ]
    return df.groupBy(group_col).agg(*aggs) if group_col else df.agg(*aggs)


def pending_for_provider(
    df: DataFrame, id_col: str, vec_col: str, limit: int | None = None
) -> DataFrame:
    """The provider's backfill work queue: rows missing that embedding
    (the orchestrator's batch selection, ``batch_processor.go:96-170``)."""
    out = df.where(F.col(vec_col).isNull())
    return out.limit(limit) if limit else out


def store_dual_embeddings(
    existing: DataFrame,
    computed: DataFrame,
    id_col: str,
    openai_col: str,
    gemini_col: str,
) -> DataFrame:
    """Overlay newly computed embeddings onto the table, committing a row's
    update only when BOTH providers are present — the reference's
    ``StoreDualEmbeddings`` dual-commit rule (``orchestrator.go:125-133``:
    stored only if ``openaiEmbedding != nil && geminiEmbedding != nil``).
    """
    both = computed.where(F.col(openai_col).isNotNull() & F.col(gemini_col).isNotNull())
    upd = both.select(
        id_col,
        F.col(openai_col).alias("_new_a"),
        F.col(gemini_col).alias("_new_b"),
    )
    out = existing.join(upd, id_col, "left")
    return out.select(
        *[
            c
            for c in existing.columns
            if c not in (openai_col, gemini_col)
        ],
        F.coalesce(F.col("_new_a"), F.col(openai_col)).alias(openai_col),
        F.coalesce(F.col("_new_b"), F.col(gemini_col)).alias(gemini_col),
    )
