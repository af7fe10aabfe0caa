"""Export sinks (SURVEY §2.1 S7-S10) — the reference's export surfaces on Spark.

Each writer takes the DataFrame as-is; formatting/derivation mirrors the
reference column-for-column:

* S7 Excel: ``ToExcel`` writes 7 fixed columns
  (``internal/app/converter/export/export.go:11-42``) — driver-side pandas
  (openpyxl gated behind an import-try; not in this image).
* S8 CSV: 11 columns incl. ``Has OpenAI/Gemini Embedding`` booleans
  (``internal/api/v1/services/export.go:74-117``).
* S9 JSON: embeddings elided (``export.go:120-143``).
* S10 Markdown: per-row sections (``tools/export-to-md/export_to_md.py:143-165``).

Distributed formats (csv/json/parquet) write partition-parallel; Excel and
Markdown are driver-side by nature (single human-readable artifact) and are
documented as such.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rfc3339", "with_rfc3339_timestamps", "to_csv", "to_json", "to_excel", "to_markdown"]

# Go's time.RFC3339 ("2006-01-02T15:04:05Z07:00") — the reference formats
# every exported timestamp with it (export.go:31; api/v1/services/export.go:
# 105). XXX renders "Z" for UTC, "+08:00" otherwise, matching Go exactly.
_RFC3339 = "yyyy-MM-dd'T'HH:mm:ssXXX"


def rfc3339(col: Column | str) -> Column:
    """C6: RFC3339 timestamp formatting (``export.go:31``)."""
    return F.date_format(col, _RFC3339)


def with_rfc3339_timestamps(df: DataFrame) -> DataFrame:
    """Format every timestamp column as an RFC3339 string, like the
    reference's export rows."""
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz"):
            out = out.withColumn(f.name, rfc3339(f.name))
    return out


def with_embedding_flags(df: DataFrame, openai_col: str = "embedding_openai",
                         gemini_col: str = "embedding_gemini") -> DataFrame:
    """S8's derived boolean columns (``export.go:95-100``)."""
    out = df
    if openai_col in df.columns:
        out = out.withColumn("has_openai_embedding", F.col(openai_col).isNotNull())
    if gemini_col in df.columns:
        out = out.withColumn("has_gemini_embedding", F.col(gemini_col).isNotNull())
    return out


def to_csv(df: DataFrame, path: str, drop_vectors: bool = True) -> None:
    """S8: header CSV; vector columns become has_* booleans, timestamps
    RFC3339 strings, not payloads."""
    out = with_rfc3339_timestamps(with_embedding_flags(df))
    if drop_vectors:
        arrays = [f.name for f in out.schema.fields if f.dataType.typeName() == "array"]
        out = out.drop(*arrays)
    out.write.mode("overwrite").option("header", True).csv(path)


def to_json(df: DataFrame, path: str) -> None:
    """S9: JSON-lines export, embeddings elided, timestamps RFC3339
    (``export.go:120-143``)."""
    arrays = [f.name for f in df.schema.fields if f.dataType.typeName() == "array"]
    with_rfc3339_timestamps(df.drop(*arrays)).write.mode("overwrite").json(path)


def to_excel(df: DataFrame, path: str, max_rows: int = 100_000) -> bool:
    """S7: driver-side Excel (``export.go:11-42``). Returns False when
    openpyxl isn't installed (sandbox image) — caller falls back to CSV."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        return False
    df.limit(max_rows).toPandas().to_excel(path, index=False)
    return True


def to_markdown(df: DataFrame, path: str, title_col: str, body_col: str) -> None:
    """S10: one markdown section per row (``export_to_md.py:143-165``),
    formatted distributed, written as text partitions."""
    md = df.select(
        F.concat(
            F.lit("## "), F.col(title_col).cast("string"), F.lit("\n\n"),
            F.col(body_col).cast("string"), F.lit("\n"),
        ).alias("value")
    )
    md.write.mode("overwrite").text(path)
