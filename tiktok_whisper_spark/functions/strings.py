"""String/scalar column functions mirrored from the reference (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["preview", "basename", "strip_ext", "file_hash_sha256", "speedup_factor"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def preview(text: Column | str, n: int = 100) -> Column:
    """First-n-chars preview with ``...`` suffix when truncated
    (reference ``web/handlers/api.go:323-328``)."""
    t = _c(text)
    return F.when(F.length(t) > n, F.concat(F.substring(t, 1, n), F.lit("..."))).otherwise(t)


def basename(path: Column | str) -> Column:
    """Last path segment (reference ``internal/app/converter/convert.go:127-130``)."""
    return F.element_at(F.split(_c(path), "/"), -1)


def strip_ext(name: Column | str) -> Column:
    """Drop the final extension (reference ``convert.go:269-270``)."""
    return F.regexp_replace(_c(name), r"\.[^.]*$", "")


def file_hash_sha256(col: Column | str) -> Column:
    """SHA-256 content hash (reference ``internal/app/utils/hash.go:12-25``)."""
    return F.sha2(_c(col).cast("binary"), 256)


def speedup_factor(duration: Column | str, elapsed: Column | str) -> Column:
    """audio_duration / processing_time ratio
    (reference ``scripts/python/transcribe_utils.py:53``)."""
    e = _c(elapsed)
    return F.when(e > 0, _c(duration).cast("double") / e.cast("double"))
