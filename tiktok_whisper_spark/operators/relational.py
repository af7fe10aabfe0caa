"""Relational operators (SURVEY §2.2 filters, §2.3 joins, §2.4 aggs, §2.5 windows, §2.6 sets).

Each function re-expresses one reference operation as a composable DataFrame
transformation. Everything stays inside Catalyst (pushdown/pruning/codegen
for free); there is deliberately no Python data path in this module.

These are wired into the driver contract (``__spark_entry__.queries()``)
with DuckDB oracle SQL twins; aliases here must match the SQL aliases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.strings import preview

__all__ = [
    "group_stats",
    "top_groups",
    "conditional_counts",
    "non_empty_text",
    "like_search",
    "exclude_soft_deleted",
    "date_range",
    "paginate",
    "top_k_per_group",
    "unprocessed_anti_join",
    "processed_semi_join",
    "union_dedup",
    "retry_overlay",
    "upsert",
    "preview_projection",
    "ewma",
]


# -- aggregations (§2.4) -----------------------------------------------------

def group_stats(df: DataFrame, key: str, value: str) -> DataFrame:
    """A1: ``SELECT key, COUNT(*), AVG(value) GROUP BY key``
    (reference ``scripts/sqlite/sql/query.sql:1-4``)."""
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("cnt"), F.avg(value).alias("avg_value")
    )


def top_groups(df: DataFrame, key: str, limit: int = 20) -> DataFrame:
    """A2: top groups by count desc (reference ``web/handlers/api.go:377-388``),
    deterministic tie-break on the key."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(key).asc())
        .limit(limit)
    )


def conditional_counts(df: DataFrame, conds: dict[str, F.Column]) -> DataFrame:
    """A3/A4: one pass, many ``COUNT(CASE WHEN …)`` aggregates
    (reference ``web/handlers/api.go:415-423``,
    ``internal/app/storage/vector/pgvector.go:258-288``)."""
    aggs = [F.count(F.lit(1)).alias("total")]
    aggs += [F.count(F.when(cond, 1)).alias(name) for name, cond in conds.items()]
    return df.agg(*aggs)


# -- filters / projections (§2.2) --------------------------------------------

def non_empty_text(df: DataFrame, col: str) -> DataFrame:
    """F4: ``text IS NOT NULL AND text != ''``
    (reference ``web/handlers/api.go:299-301``)."""
    return df.where(F.col(col).isNotNull() & (F.col(col) != ""))


def like_search(df: DataFrame, col: str, needle: str) -> DataFrame:
    """F3: LIKE substring search (reference ``scripts/sqlite/sql/query.sql:19``)."""
    return df.where(F.col(col).contains(needle))


def exclude_soft_deleted(df: DataFrame, deleted_col: str = "deleted_at") -> DataFrame:
    """F6: soft-delete filter — ``WHERE deleted_at IS NULL`` (reference
    ``internal/app/repository/sqlite/transcription_v2.go:167,204,235,312``).

    Every read path of the reference's v2 repository appends this predicate;
    here it's a plain null filter that Catalyst pushes to the scan."""
    return df.where(F.col(deleted_col).isNull())


def date_range(df: DataFrame, col: str, start: str, end: str) -> DataFrame:
    """F7: inclusive timestamp range (reference ``repository/dao_extended.go:59-62``)."""
    return df.where(F.col(col).between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")))


def preview_projection(df: DataFrame, col: str, n: int = 100) -> DataFrame:
    """F9: computed preview column (reference ``web/handlers/api.go:323-328``)."""
    return df.withColumn("preview", preview(col, n))


# -- windows / ordering (§2.5) ------------------------------------------------

def paginate(df: DataFrame, order_by: list, page: int, page_size: int) -> DataFrame:
    """W3: limit/offset pagination (reference ``repository/dao_extended.go:52,62``).

    ``orderBy().limit(hi)`` plans as TakeOrderedAndProject — each partition
    keeps its local top-``hi`` and the driver merges — then the offset slice
    is a row_number window over those ≤``hi`` already-collected rows. An
    un-partitioned window over the full table (the naive translation) would
    funnel every row through ONE task; this never materializes more than one
    page-depth of rows anywhere. Deep scans should use keyset pagination
    (``WHERE key > last_seen ORDER BY key LIMIT n``) instead of offsets.
    """
    lo, hi = page * page_size, (page + 1) * page_size
    top = df.orderBy(*order_by).limit(hi)
    w = Window.orderBy(*order_by)  # ≤ hi rows by construction — bounded
    return (
        top.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > lo)
        .drop("rn")
    )


def top_k_per_group(df: DataFrame, key: str, order_by: list, k: int) -> DataFrame:
    """W4: top-k within each group (reference ``web/handlers/search_helpers.go:62-63``
    generalized per-group)."""
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def ewma(df: DataFrame, key: str, order_col: str, value: str, alpha: float = 0.2) -> DataFrame:
    """A6: exponentially weighted moving average per group, closed form.

    The reference updates ``avg = (1-α)·avg + α·new`` per observation
    (``internal/app/api/provider/metrics.go:33-41``). Over an ordered
    sequence v₁..vₙ (v₁ seeds the average) that recursion unrolls to
    ``EWMA = (1-α)^(n-1)·v₁ + Σ_{i≥2} α(1-α)^(n-i)·vᵢ`` — a window sum, no
    recursion needed. Emits one row per key with ``ewma_value``.
    """
    w = Window.partitionBy(key).orderBy(order_col)
    n = F.count(F.lit(1)).over(Window.partitionBy(key))
    i = F.row_number().over(w)
    coef = F.when(i == 1, F.pow(F.lit(1 - alpha), n - 1)).otherwise(
        F.lit(alpha) * F.pow(F.lit(1 - alpha), n - i)
    )
    return (
        df.withColumn("_coef", coef)
        .groupBy(key)
        .agg(F.sum(F.col("_coef") * F.col(value)).alias("ewma_value"))
    )


# -- joins / sets (§2.3, §2.6) -------------------------------------------------

def unprocessed_anti_join(files: DataFrame, done: DataFrame, key: str, limit: int | None = None) -> DataFrame:
    """F12/J4: files not yet processed, capped at n
    (reference ``internal/app/converter/convert.go:232-262``)."""
    out = files.join(done, key, "left_anti")
    return out.limit(limit) if limit else out


def processed_semi_join(rows: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """J4: existence probe as a semi join
    (reference ``repository/sqlite/transcription.go:29-35``)."""
    return rows.join(done, key, "left_semi")


def union_dedup(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """J2/U1: union worklists, dedup by id, keep the first-seen payload
    deterministically (min over remaining columns per key)
    (reference ``batch_processor.go:177-195``)."""
    u = a.unionByName(b)
    others = [c for c in u.columns if c != key]
    if not others:
        return u.distinct()
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc_nulls_last() for c in others])
    return u.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


def retry_overlay(first: DataFrame, retry: DataFrame, key: str) -> DataFrame:
    """J3: overlay retry results over the first pass, keyed merge
    (reference ``internal/app/temporal/workflows/batch.go:40-81``)."""
    cols = [c for c in first.columns if c != key]
    r = retry.select(key, *[F.col(c).alias(f"_r_{c}") for c in cols])
    out = first.join(r, key, "left")
    return out.select(
        key, *[F.coalesce(F.col(f"_r_{c}"), F.col(c)).alias(c) for c in cols]
    )


def upsert(existing: DataFrame, incoming: DataFrame, key: str) -> DataFrame:
    """J5/S6: UPDATE-if-exists-else-INSERT by natural key, emulated as
    anti-join + union (Iceberg ``MERGE INTO`` on a cluster; reference
    ``repository/sqlite/transcription_v2.go:84-148`` upserts by file_hash)."""
    kept = existing.join(incoming.select(key), key, "left_anti")
    return kept.unionByName(incoming.select(existing.columns))
