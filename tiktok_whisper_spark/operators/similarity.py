"""Vector similarity search + clustering (reference web/CLI features, Spark-first).

* ``knn_search`` — the reference's ``GET /api/embeddings/search`` path
  (``web/handlers/search_helpers.go:35-100``): query vector vs corpus,
  threshold + top-k. pgvector's HNSW index becomes a brute-force scored scan
  (exact, oracle-checkable) with :func:`ann_ivf_search` as the scale path.
* ``pairwise_similarity`` — ``embed similarity --id1 --id2``
  (``README.md:213``; kernel ``similarity/calculator.go:23-46``).
* ``kmeans`` — the browser k-means++/Lloyd clustering
  (``web/static/js/clustering.js:431-558``) as an iterative DataFrame job:
  assign = broadcast-centroid pandas UDF (Arrow-vectorized argmin), update =
  groupBy mean; deterministic seeding.
* ``pca_project`` — the browser PCA (``clustering.js:137-227``): exact
  covariance eigendecomposition on the driver (dims are small: ≤3072),
  projection distributed via a pandas UDF matmul against broadcast
  components.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_expr

__all__ = ["knn_search", "pairwise_similarity", "kmeans", "pca_project", "ann_ivf_search"]


def knn_search(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    threshold: float | None = None,
) -> DataFrame:
    """Exact cosine top-k: ``(id, similarity)``, deterministic tie-break on id.

    The threshold filter mirrors ``1 - (emb <=> $1) >= $t``
    (``search_helpers.go:60-61``).
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col).alias("id"), cosine_expr(F.col(vec_col), q).alias("similarity")
    ).where(F.col("similarity").isNotNull())
    if threshold is not None:
        scored = scored.where(F.col("similarity") >= threshold)
    # orderBy+limit → TakeOrderedAndProject (distributed per-partition top-k
    # then driver merge), never the single-partition global window.
    return scored.orderBy(F.col("similarity").desc(), F.col("id").asc()).limit(k)


def pairwise_similarity(df: DataFrame, id_col: str, vec_col: str, id1: int, id2: int) -> DataFrame:
    """Cosine between two rows by id: one-row DataFrame ``(id1, id2, cos)``."""
    a = df.where(F.col(id_col) == id1).select(F.col(vec_col).alias("va"))
    b = df.where(F.col(id_col) == id2).select(F.col(vec_col).alias("vb"))
    return a.crossJoin(b).select(
        F.lit(id1).alias("id1"), F.lit(id2).alias("id2"), cosine_expr("va", "vb").alias("cos")
    )


# -- k-means ------------------------------------------------------------------


@dataclass
class KMeansResult:
    assignments: DataFrame  # (id, cluster)
    centroids: np.ndarray  # (k, dim)
    inertia: float
    iterations: int


def _assign_udf(centroids: np.ndarray):
    """mapInPandas: argmin squared distance to broadcast centroids, batched."""
    c = centroids  # captured; small (k × dim)
    c_sq = (c * c).sum(axis=1)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin over c (vectorized)
            d = x @ c.T * -2.0 + c_sq[None, :]
            cluster = np.argmin(d, axis=1).astype(np.int32)
            sq = (x * x).sum(axis=1) + d[np.arange(len(x)), cluster]
            yield pd.DataFrame({"id": pdf["id"], "cluster": cluster, "sq_dist": sq})

    return assign


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
) -> KMeansResult:
    """k-means++ seeding + Lloyd iterations as DataFrame jobs.

    Matches the reference's convergence shape (ε on centroid movement, iter
    cap — ``clustering.js:453-518``) with deterministic seeding: k-means++
    D²-sampling over a seeded driver-side sample (the reference samples ≤200
    points for PCA the same way, ``clustering.js:160-164``).
    """
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    n = data.count()
    if n == 0 or k <= 0:
        raise ValueError("kmeans: empty input or k<=0")

    # k-means++ on a bounded sample (deterministic): D² sampling in NumPy.
    sample_pdf = (
        data.orderBy(F.xxhash64("id"))  # seeded-hash order = deterministic sample
        .limit(max(1000, 20 * k))
        .toPandas()
    )
    pts = np.stack(sample_pdf["vec"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    centroids = [pts[rng.integers(len(pts))]]
    for _ in range(1, k):
        d2 = np.min(
            ((pts[:, None, :] - np.asarray(centroids)[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(len(pts), 1.0 / len(pts))
        centroids.append(pts[rng.choice(len(pts), p=probs)])
    c = np.asarray(centroids)

    inertia = float("inf")
    iterations = 0
    assigned = None
    for it in range(1, max_iter + 1):
        iterations = it
        assigned = data.mapInPandas(
            _assign_udf(c), schema="id long, cluster int, sq_dist double"
        ).persist()
        stats = (
            assigned.join(data, "id")
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.array(*[
                    F.avg(F.element_at("vec", i + 1).cast("double")) for i in range(c.shape[1])
                ]).alias("mean"),
                F.sum("sq_dist").alias("inertia"),
            )
            .collect()
        )
        new_c = c.copy()
        new_inertia = 0.0
        for r in stats:
            new_c[r["cluster"]] = np.asarray(r["mean"], dtype=np.float64)
            new_inertia += r["inertia"]
        shift = float(np.max(np.linalg.norm(new_c - c, axis=1)))
        c = new_c
        inertia = new_inertia
        if shift < tol:
            break
        assigned.unpersist()

    result = assigned.select("id", "cluster")
    data.unpersist()
    return KMeansResult(assignments=result, centroids=c, inertia=inertia, iterations=iterations)


# -- PCA ------------------------------------------------------------------------


def pca_project(df: DataFrame, id_col: str, vec_col: str, n_components: int = 3) -> DataFrame:
    """Project vectors onto the top principal components: ``(id, pc: array<double>)``.

    Covariance is accumulated distributed (Gram matrix via one pandas-UDF
    pass + driver eigh — exact, unlike the reference's random-projection
    approximation ``clustering.js:169-227``); projection is a second
    distributed pass. Sound while dim ≤ a few thousand (embedding widths).
    """
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    n = data.count()

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            yield pd.DataFrame(
                {"g": [g.ravel().tolist()], "s": [s.tolist()], "cnt": [len(x)]}
            )

    parts = data.select("vec").mapInPandas(
        gram, schema="g array<double>, s array<double>, cnt long"
    ).collect()
    dim = len(parts[0]["s"])
    G = np.zeros((dim, dim))
    S = np.zeros(dim)
    for r in parts:
        G += np.asarray(r["g"]).reshape(dim, dim)
        S += np.asarray(r["s"])
    mean = S / n
    cov = G / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :n_components]  # (dim, n_components), descending
    # deterministic sign convention: largest-|x| coordinate positive
    for j in range(comps.shape[1]):
        i = np.argmax(np.abs(comps[:, j]))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf["vec"].to_numpy()).astype(np.float64) - mean
            p = x @ comps
            yield pd.DataFrame({"id": pdf["id"], "pc": list(p)})

    out = data.mapInPandas(project, schema="id long, pc array<double>")
    data.unpersist()
    return out


# -- ANN (scale path) -------------------------------------------------------------


def ann_ivf_search(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate nearest neighbors: cluster once, probe nearest cells.

    The engine's stand-in for pgvector's HNSW (``add_dual_embeddings.sql:
    52-56``): k-means coarse quantizer → search only the ``n_probe`` cells
    closest to the query. Exact :func:`knn_search` is the recall oracle.
    """
    km = kmeans(df, id_col, vec_col, k=n_centroids, max_iter=10, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    d2 = ((km.centroids - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(d2)[:n_probe].tolist()
    cand_ids = km.assignments.where(F.col("cluster").isin(probe)).select("id")
    cand = df.join(cand_ids, df[id_col] == cand_ids["id"], "left_semi")
    return knn_search(cand, id_col, vec_col, query, k=k)
