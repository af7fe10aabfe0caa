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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_expr

__all__ = [
    "knn_search",
    "pairwise_similarity",
    "kmeans",
    "elbow_k",
    "assign_to_centroids",
    "cluster_info",
    "intra_cluster_edges",
    "pca_project",
    "ann_ivf_search",
]


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

    Scoring is one NumPy matvec per Arrow batch inside ``mapInPandas``: the
    Catalyst HOF form (``aggregate``/``zip_with``) never enters whole-stage
    codegen, and the null-guard filter duplicated the full interpreted
    cosine into Filter AND Project (~6 interpreted 64-element folds per
    row). Null semantics match ``cosine_expr`` exactly: rows with a dim
    mismatch or a zero norm (or a zero-norm query) produce no output, like
    the previous ``isNotNull`` filter.
    """
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    idtype = df.schema[id_col].dataType.simpleString()
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf) or qn <= 0:
                continue
            vecs = pdf["vec"].to_numpy()
            dims = np.fromiter(
                (len(v) if v is not None else -1 for v in vecs),
                dtype=np.int64, count=len(vecs),
            )
            ok = dims == len(q)
            if not ok.any():
                continue
            x = np.stack(vecs[ok]).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", x, x))
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = (x @ q) / (norms * qn)
            good = norms > 0  # NaN norms (null elements) compare False too
            if threshold is not None:
                good &= cos >= threshold
            if good.any():
                yield pd.DataFrame(
                    {"id": pdf["id"].to_numpy()[ok][good], "similarity": cos[good]}
                )

    scored = data.mapInPandas(score, schema=f"id {idtype}, similarity double")
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


def _lloyd_stats_udf(centroids: np.ndarray):
    """mapInPandas: one Lloyd pass per partition, fully in NumPy.

    Emits ONE row per (partition, non-empty cluster): ``(cluster, n,
    inertia, s:array<double>)`` where ``s`` is the per-cluster coordinate
    sum. The update then needs only a tiny ``groupBy(cluster, pos)`` over
    #partitions × k rows — never ``dim`` separate Catalyst aggregates
    (codegen blowup at 1536/3072-d) and never a by-id re-join of the
    assignments back to the data.
    """
    c = centroids
    k, dim = c.shape
    c_sq = (c * c).sum(axis=1)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = np.zeros(k, dtype=np.int64)
        s = np.zeros((k, dim), dtype=np.float64)
        inertia = np.zeros(k, dtype=np.float64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            x = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            d = x @ c.T * -2.0 + c_sq[None, :]
            cluster = np.argmin(d, axis=1)
            n += np.bincount(cluster, minlength=k)
            np.add.at(s, cluster, x)
            sq = (x * x).sum(axis=1) + d[np.arange(len(x)), cluster]
            inertia += np.bincount(cluster, weights=sq, minlength=k)
        if not seen:
            return
        nz = np.flatnonzero(n)
        yield pd.DataFrame(
            {"cluster": nz.astype(np.int32), "n": n[nz], "inertia": inertia[nz], "s": list(s[nz])}
        )

    return stats


def kmeans(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
    init_centroids: np.ndarray | None = None,
) -> KMeansResult:
    """k-means++ seeding + Lloyd iterations as DataFrame jobs.

    Matches the reference's convergence shape (ε on centroid movement, iter
    cap — ``clustering.js:453-518``) with deterministic seeding: k-means++
    D²-sampling over a seeded driver-side sample (the reference samples ≤200
    points for PCA the same way, ``clustering.js:160-164``).
    ``init_centroids`` replaces the seeding with a caller-fixed (k, dim)
    start — the SQL-replayable driver twin uses it (with ``tol=0.0`` the
    loop runs exactly ``max_iter`` Lloyd iterations, no early stop).
    """
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    n = data.count()
    if n == 0 or k <= 0:
        raise ValueError("kmeans: empty input or k<=0")

    if init_centroids is not None:
        c = np.asarray(init_centroids, dtype=np.float64)
        if c.shape[0] != k:
            raise ValueError(f"init_centroids has {c.shape[0]} rows, expected k={k}")
    else:
        # k-means++ on a bounded sample (deterministic): D² sampling in NumPy
        # over a seeded-hash-ordered driver sample.
        c = _kmeanspp_seeds(data, k, seed)

    inertia = float("inf")
    iterations = 0
    dim = c.shape[1]
    for it in range(1, max_iter + 1):
        iterations = it
        # one distributed pass: per-partition (cluster, n, inertia, sum-vec)
        # partials in NumPy, reduced by a k×dim-row groupBy — no by-id
        # re-join, no per-dimension aggregate expressions.
        partials = data.select("vec").mapInPandas(
            _lloyd_stats_udf(c),
            schema="cluster int, n long, inertia double, s array<double>",
        )
        rows = (
            partials.select("cluster", "n", "inertia", F.posexplode("s").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                F.sum("val").alias("s"),
                F.sum(F.when(F.col("pos") == 0, F.col("n"))).alias("n"),
                F.sum(F.when(F.col("pos") == 0, F.col("inertia"))).alias("inertia"),
            )
            .collect()
        )
        new_c = c.copy()
        sums = np.zeros((c.shape[0], dim))
        counts = np.zeros(c.shape[0], dtype=np.int64)
        new_inertia = 0.0
        for r in rows:
            sums[r["cluster"], r["pos"]] = r["s"]
            if r["pos"] == 0:
                counts[r["cluster"]] = r["n"]
                new_inertia += r["inertia"]
        nz = counts > 0
        new_c[nz] = sums[nz] / counts[nz, None]
        shift = float(np.max(np.linalg.norm(new_c - c, axis=1)))
        c = new_c
        inertia = new_inertia
        if shift < tol:
            break

    # final assignment pass against the converged centroids
    result = data.mapInPandas(
        _assign_udf(c), schema="id long, cluster int, sq_dist double"
    ).select("id", "cluster")
    data.unpersist()
    return KMeansResult(assignments=result, centroids=c, inertia=inertia, iterations=iterations)


def _kmeanspp_seeds(
    data: DataFrame, k: int, seed: int, sample_cap: int | None = None
) -> np.ndarray:
    """Deterministic k-means++ D²-sampling over a seeded-hash driver sample."""
    sample_pdf = (
        data.orderBy(F.xxhash64("id")).limit(sample_cap or max(1000, 20 * k)).toPandas()
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
    return np.asarray(centroids)


def elbow_k(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k_max: int | None = None,
    seed: int = 42,
    seeds_fn=None,
) -> tuple[int, list[tuple[int, float]]]:
    """Elbow method for choosing k (reference ``web/static/js/clustering.js:
    331-361``): inertia of the k-means++ seeds for k = 2..k_max, optimal k =
    the interior point with the largest rate-of-change drop
    (``diff1 - diff2``), capped at 10, default 3.

    Each inertia is ONE distributed assignment pass (the per-partition NumPy
    Lloyd-stats kernel), matching the reference's seeding-only inertia — it
    never runs Lloyd to convergence per candidate k.
    Returns ``(optimal_k, [(k, inertia), ...])``.

    ``seeds_fn(k) -> (k, dim) ndarray`` overrides the k-means++ seeding with
    fixed centroids per candidate k — the inertia curve then becomes
    ANSI-SQL-expressible (min squared distance to literal centroids), so the
    driver oracle can replay it; the default D²-sampled seeding stays the
    production path (pytest-verified).
    """
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).persist()
    n = data.count()
    if k_max is None:
        k_max = min(15, n // 3)
    inertias: list[tuple[int, float]] = []
    for k in range(2, k_max + 1):
        c = seeds_fn(k) if seeds_fn is not None else _kmeanspp_seeds(data, k, seed)
        rows = (
            data.select("vec")
            .mapInPandas(
                _lloyd_stats_udf(c), schema="cluster int, n long, inertia double, s array<double>"
            )
            .agg(F.sum("inertia").alias("inertia"))
            .collect()
        )
        inertias.append((k, float(rows[0]["inertia"] or 0.0)))
    data.unpersist()

    optimal, max_rate = 3, 0.0
    for i in range(1, len(inertias) - 1):
        diff1 = inertias[i - 1][1] - inertias[i][1]
        diff2 = inertias[i][1] - inertias[i + 1][1]
        rate = diff1 - diff2
        if rate > max_rate:
            max_rate = rate
            optimal = inertias[i][0]
    return min(optimal, 10), inertias


def assign_to_centroids(df: DataFrame, id_col: str, vec_col: str, centroids) -> DataFrame:
    """Nearest-centroid assignment under FIXED centroids: ``(id, cluster)``.

    The K2 assignment kernel (Arrow-batched argmin, ties to the smaller
    centroid index) exposed standalone — fixed centroids make the result
    ANSI-SQL-expressible, so driver oracles can verify the exact kernel the
    iterative k-means runs.
    """
    c = np.asarray(centroids, dtype=np.float64)
    data = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return data.mapInPandas(
        _assign_udf(c), schema="id long, cluster int, sq_dist double"
    ).select("id", "cluster")


def cluster_info(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    max_exemplars: int = 100,
    seed: int = 42,
    centroids=None,
) -> DataFrame:
    """Full cluster-info surface (reference ``clustering.js:579-623``):
    one row per non-empty cluster, **sorted by size desc and re-numbered**
    like the reference — ``(cluster_id, size, center: array<double>,
    exemplar_ids: array<long>)``; exemplars are the ``max_exemplars``
    smallest member ids (deterministic stand-in for the reference's
    insertion-ordered point list).

    ``centroids`` (optional ``(k, dim)`` array) skips the k-means and builds
    the surface from fixed-centroid assignment — the driver-verifiable form.
    """
    if centroids is None:
        km = kmeans(df, id_col, vec_col, k=k, seed=seed)
        assignments, cents = km.assignments, km.centroids
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        assignments = assign_to_centroids(df, id_col, vec_col, cents)
    # bound the per-cluster aggregation buffer BEFORE collecting: rank members
    # by id per cluster, null out ranks beyond max_exemplars (collect_list
    # skips nulls) — a billion-member cluster buffers max_exemplars ids, not
    # its full membership.
    wm = Window.partitionBy("cluster").orderBy("id")
    ranked = assignments.withColumn("rn", F.row_number().over(wm))
    sizes = ranked.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("size"),
        F.sort_array(
            F.collect_list(F.when(F.col("rn") <= max_exemplars, F.col("id")))
        ).alias("exemplar_ids"),
    )
    spark = df.sparkSession
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster int, center array<double>",
    )
    w = Window.orderBy(F.col("size").desc(), F.col("cluster"))  # ≤ k rows — bounded
    return (
        sizes.join(F.broadcast(centers), "cluster")
        .withColumn("cluster_id", F.row_number().over(w) - 1)
        .select("cluster_id", "size", "center", "exemplar_ids")
    )


def intra_cluster_edges(
    assignments: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    max_connections: int = 5,
) -> DataFrame:
    """Intra-cluster ring edges (reference ``web/static/js/visualization.js:
    393-419``): per cluster, connect member i → member (i+1) mod n for
    i < min(max_connections, n-1), members ordered deterministically by id.

    Pure window + self-join per cluster — feeds the engine's edge table so
    cluster structure can flow into the graph kernels.
    """
    w = Window.partitionBy(cluster_col).orderBy(id_col)
    members = assignments.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("id"),
        (F.row_number().over(w) - 1).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy(cluster_col)).alias("n"),
    )
    lhs = members.where(
        F.col("i") < F.least(F.lit(max_connections), F.col("n") - 1)
    ).select("cluster", F.col("id").alias("src"), ((F.col("i") + 1) % F.col("n")).alias("j"))
    rhs = members.select("cluster", F.col("id").alias("dst"), F.col("i").alias("j"))
    return lhs.join(rhs, ["cluster", "j"]).select("cluster", "src", "dst")


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
        # ONE partial per partition (accumulated across Arrow batches), so the
        # reduce sees #partitions rows, not #batches rows.
        G = S = None
        cnt = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            if G is None:
                G = np.zeros((x.shape[1], x.shape[1]))
                S = np.zeros(x.shape[1])
            G += x.T @ x
            S += x.sum(axis=0)
            cnt += len(x)
        if G is not None:
            yield pd.DataFrame({"g": [G.ravel().tolist()], "s": [S.tolist()], "cnt": [cnt]})

    def reduce_gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G = S = None
        cnt = 0
        for pdf in batches:
            for _, row in pdf.iterrows():
                g = np.asarray(row["g"])
                if G is None:
                    G, S = np.zeros_like(g), np.zeros(len(row["s"]))
                G += g
                S += np.asarray(row["s"])
                cnt += int(row["cnt"])
        if G is not None:
            yield pd.DataFrame({"g": [G.tolist()], "s": [S.tolist()], "cnt": [cnt]})

    schema = "g array<double>, s array<double>, cnt long"
    # tree-reduce the dim²-sized partials INSIDE Spark (partitions → ≤8 → 1);
    # the driver collects exactly ONE dim² row, never #partitions of them —
    # at 3072-d each partial is ~75 MB, so collecting thousands would OOM
    # the driver while this stays bounded.
    partials = data.select("vec").mapInPandas(gram, schema=schema)
    reduced = (
        partials.repartition(8)
        .mapInPandas(reduce_gram, schema=schema)
        .coalesce(1)
        .mapInPandas(reduce_gram, schema=schema)
        .collect()
    )
    r = reduced[0]
    dim = len(r["s"])
    G = np.asarray(r["g"]).reshape(dim, dim)
    S = np.asarray(r["s"])
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
    centroids=None,
) -> DataFrame:
    """IVF approximate nearest neighbors: cluster once, probe nearest cells.

    The engine's stand-in for pgvector's HNSW (``add_dual_embeddings.sql:
    52-56``): k-means coarse quantizer → search only the ``n_probe`` cells
    closest to the query. Exact :func:`knn_search` is the recall oracle.

    ``centroids`` (optional) fixes the coarse quantizer — cell assignment +
    probe selection + exact KNN within the probed cells is then plain SQL,
    the driver-verifiable form of the same index structure.
    """
    if centroids is None:
        km = kmeans(df, id_col, vec_col, k=n_centroids, max_iter=10, seed=seed)
        cents, assignments = km.centroids, km.assignments
    else:
        cents = np.asarray(centroids, dtype=np.float64)
        assignments = assign_to_centroids(df, id_col, vec_col, cents)
    q = np.asarray(query, dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = np.argsort(d2)[:n_probe].tolist()
    cand_ids = assignments.where(F.col("cluster").isin(probe)).select("id")
    cand = df.join(cand_ids, df[id_col] == cand_ids["id"], "left_semi")
    return knn_search(cand, id_col, vec_col, query, k=k)
