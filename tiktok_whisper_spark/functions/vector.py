"""Vector math over ``array<float>`` columns.

Reference kernels being re-expressed (same semantics, float64 accumulation):

* cosine similarity — ``internal/app/embedding/similarity/calculator.go:23-46``
  (float32 dot/norms, error on dim mismatch → here: null on dim mismatch);
* Euclidean distance — ``calculator.go:57-73``;
* L2 normalize — ``web/handlers/api.go:358-371``;
* deterministic mock embedding (id-seeded) — ``web/handlers/api.go:341-373``,
  reused for fixtures: ``v[i] = (id*13 + i*7)/1000 - 0.5`` then L2-normalize.

Two implementations of each hot kernel:

* ``*_expr`` — Catalyst higher-order functions (``zip_with`` /
  ``aggregate`` / ``transform``), fully JVM-side, whole-stage codegen'd.
  The default for expressions embedded in larger plans.
* ``cosine_pudf`` — Arrow-vectorized pandas UDF that stacks each batch into
  one NumPy matrix; wins for wide vectors (1536-d OpenAI / 3072-d Gemini
  columns) where per-element codegen loses to BLAS-style row reductions.

No row-at-a-time Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

__all__ = [
    "dot_expr",
    "norm_expr",
    "cosine_expr",
    "euclidean_expr",
    "l2_normalize_expr",
    "cosine_pudf",
    "mock_embedding_expr",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in float64 (JVM-side fold)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column | str) -> Column:
    """L2 norm in float64."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null when dims mismatch or a norm is zero
    (the reference errors on dim mismatch, ``calculator.go:28-31``)."""
    a, b = _c(a), _c(b)
    return F.when(
        (F.size(a) == F.size(b)) & (norm_expr(a) > 0) & (norm_expr(b) > 0),
        dot_expr(a, b) / (norm_expr(a) * norm_expr(b)),
    )


def euclidean_expr(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance in float64 (``calculator.go:57-73`` semantics)."""
    a, b = _c(a), _c(b)
    diff_sq = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))
    )
    return F.when(
        F.size(a) == F.size(b), F.sqrt(F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x))
    )


def l2_normalize_expr(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through (``api.go:362-365`` keeps them)."""
    a = _c(a)
    n = norm_expr(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n)).otherwise(
        F.transform(a, lambda x: x.cast("double"))
    )


@F.pandas_udf(DoubleType())
def _cosine_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine: stack the batch into matrices, one vectorized pass."""
    am = np.stack(a.to_numpy()).astype(np.float64)
    bm = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", am, bm)
    na = np.linalg.norm(am, axis=1)
    nb = np.linalg.norm(bm, axis=1)
    denom = na * nb
    out = np.where(denom > 0, dots / np.where(denom == 0, 1.0, denom), np.nan)
    return pd.Series(out)


def cosine_pudf(a: Column | str, b: Column | str) -> Column:
    """Pandas-UDF cosine (Arrow batches, NumPy einsum). Requires equal dims
    within a batch — use for fixed-width embedding columns."""
    return _cosine_batch(_c(a), _c(b))


def mock_embedding_expr(id_col: Column | str, dim: int) -> Column:
    """The reference's deterministic mock embedding (``api.go:341-373``):
    v[i] = (id*13 + i*7)/1000 − 0.5, then L2-normalized. Used as a fixture
    generator so Spark and oracle vectors agree bit-for-bit."""
    idc = _c(id_col).cast("double")
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (idc * 13.0 + i.cast("double") * 7.0) / 1000.0 - 0.5,
    )
    return l2_normalize_expr(raw)
