"""Clustering surface (elbow / cluster-info / ring edges), LSH-gated embedding
dedup, dual-embedding columns, RFC3339 export formatting.

Reference semantics: elbow ``web/static/js/clustering.js:331-361``, cluster
info ``clustering.js:579-623``, intra-cluster connections
``web/static/js/visualization.js:393-419``, per-user duplicate scope
``README.md:216``, dual embeddings ``scripts/pg/sql/add_dual_embeddings.sql``
+ ``orchestrator.go:60-136``, RFC3339 ``export.go:31``.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiktok_whisper_spark.operators import dedup, similarity
from tiktok_whisper_spark.operators.dual_embedding import (
    dual_status_rollup,
    pending_for_provider,
    provider_status,
    store_dual_embeddings,
)
from tiktok_whisper_spark.sources.exports import rfc3339, to_excel


def _clustered_df(spark, k=4, per=30, dim=8, scale=0.05, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 10
    rows = []
    for i in range(k * per):
        c = centers[i % k]
        rows.append((i, [float(x) for x in c + rng.normal(scale=scale, size=dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), centers


# -- elbow method (K3) --------------------------------------------------------

def test_elbow_curve_decreases_and_picks_reasonable_k(spark):
    df, _ = _clustered_df(spark, k=4, per=40)
    optimal, curve = similarity.elbow_k(df, "vec_id", "embedding", k_max=8)
    ks = [k for k, _ in curve]
    assert ks == list(range(2, 9))
    inertias = [i for _, i in curve]
    # inertia at the true k is a tiny fraction of k=2's (separated clusters)
    assert inertias[2] < 0.05 * inertias[0]
    assert 3 <= optimal <= 6
    # deterministic: same seed → same answer
    optimal2, curve2 = similarity.elbow_k(df, "vec_id", "embedding", k_max=8)
    assert optimal2 == optimal and curve2 == curve


# -- cluster info (K4) --------------------------------------------------------

def test_cluster_info_sorted_renumbered_with_exemplars(spark):
    df, _ = _clustered_df(spark, k=3, per=25)
    info = similarity.cluster_info(df, "vec_id", "embedding", k=3, max_exemplars=5).collect()
    sizes = [r["size"] for r in info]
    assert sizes == sorted(sizes, reverse=True)  # sorted by size desc
    assert [r["cluster_id"] for r in info] == list(range(len(info)))  # renumbered
    assert sum(sizes) == 75
    for r in info:
        assert 1 <= len(r["exemplar_ids"]) <= 5
        assert len(r["center"]) == 8
        # exemplars are the smallest member ids → sorted
        assert r["exemplar_ids"] == sorted(r["exemplar_ids"])


# -- intra-cluster ring edges (K8) ---------------------------------------------

def test_intra_cluster_ring_edges_exact(spark):
    assignments = spark.createDataFrame(
        [(1, "a"), (5, "a"), (9, "a"),          # 3 members → min(5,2)=2 edges
         (7, "b"),                                # singleton → no edges
         *[(i, "c") for i in range(20, 27)]],    # 7 members → 5 edges
        "id long, cluster string",
    )
    got = {
        (r["cluster"], r["src"], r["dst"])
        for r in similarity.intra_cluster_edges(assignments).collect()
    }
    want = {
        ("a", 1, 5), ("a", 5, 9),
        ("c", 20, 21), ("c", 21, 22), ("c", 22, 23), ("c", 23, 24), ("c", 24, 25),
    }
    assert got == want


# -- LSH-gated embedding dedup --------------------------------------------------

def test_lsh_gate_subset_of_exact_and_finds_true_dups(spark):
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # true near-duplicates: tiny perturbations that cannot flip sign bits
    for j in range(5):
        dup = base[j] + np.sign(base[j]) * 0.001
        rows.append((100 + j, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_dups(df, "vec_id", "embedding", 0.999).collect()
    }
    gated = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_dups_lsh(
            df, "vec_id", "embedding", threshold=0.999, bands=4, band_width=8
        ).collect()
    }
    assert gated <= exact
    # same-sign construction → every true dup pair survives the sign-LSH gate
    assert {(j, 100 + j) for j in range(5)} <= gated


def test_group_scoped_duplicates_respect_scope(spark):
    v = [1.0, 2.0, 3.0, 4.0]
    df = spark.createDataFrame(
        [(1, v, "alice"), (2, v, "alice"), (3, v, "bob")],
        "vec_id long, embedding array<double>, user string",
    )
    got = dedup.embedding_near_dups_grouped(
        df, "vec_id", "embedding", "user", threshold=0.99
    ).collect()
    # identical vectors, but only the same-user pair is reported
    assert [(r["a"], r["b"], r["user"]) for r in got] == [(1, 2, "alice")]


# -- dual embeddings (T9) --------------------------------------------------------

def _dual_df(spark):
    va = [1.0, 0.0]
    return spark.createDataFrame(
        [
            (1, "u1", va, va),      # both
            (2, "u1", va, None),    # openai only
            (3, "u1", None, va),    # gemini only
            (4, "u2", None, None),  # neither
        ],
        "id long, user string, embedding_openai array<double>, embedding_gemini array<double>",
    )


def test_dual_status_rollup_counts(spark):
    out = {
        r["user"]: r
        for r in dual_status_rollup(
            _dual_df(spark), "embedding_openai", "embedding_gemini", "user"
        ).collect()
    }
    u1 = out["u1"]
    assert (u1["total"], u1["with_openai"], u1["with_gemini"]) == (3, 2, 2)
    assert (u1["with_both"], u1["with_either"]) == (1, 3)
    assert (u1["pending_openai"], u1["pending_gemini"]) == (1, 1)
    u2 = out["u2"]
    assert (u2["total"], u2["with_both"], u2["pending_openai"]) == (1, 0, 1)


def test_pending_queue_and_status_columns(spark):
    df = _dual_df(spark)
    pend = pending_for_provider(df, "id", "embedding_gemini")
    assert {r["id"] for r in pend.collect()} == {2, 4}
    st = provider_status(df, "embedding_openai").collect()
    got = {r["id"]: r["embedding_openai_status"] for r in st}
    assert got == {1: "completed", 2: "completed", 3: "pending", 4: "pending"}


def test_store_dual_embeddings_commits_only_complete_pairs(spark):
    existing = _dual_df(spark)
    vb = [9.0, 9.0]
    computed = spark.createDataFrame(
        [(3, vb, vb), (4, vb, None)],  # id=3 complete pair; id=4 openai only
        "id long, embedding_openai array<double>, embedding_gemini array<double>",
    )
    merged = store_dual_embeddings(
        existing, computed, "id", "embedding_openai", "embedding_gemini"
    )
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[3]["embedding_openai"] == vb and rows[3]["embedding_gemini"] == vb
    # id=4's partial result must NOT be committed (StoreDualEmbeddings rule)
    assert rows[4]["embedding_openai"] is None and rows[4]["embedding_gemini"] is None
    assert rows[1]["embedding_openai"] == [1.0, 0.0]  # untouched


# -- RFC3339 export formatting (C6) -----------------------------------------------

def test_rfc3339_golden(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05",)], "raw string"
    ).select(F.col("raw").cast("timestamp").alias("ts"))
    got = df.select(rfc3339("ts").alias("s")).collect()[0]["s"]
    assert got == "2024-01-02T03:04:05Z"  # Go time.RFC3339, UTC session


def test_excel_export_path(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id long, t string")
    try:
        import openpyxl  # noqa: F401

        has_openpyxl = True
    except ImportError:
        has_openpyxl = False
    out = to_excel(df, str(tmp_path / "out.xlsx"))
    if has_openpyxl:
        assert out and (tmp_path / "out.xlsx").exists()
    else:
        # sandbox image: documented False → caller falls back to CSV
        assert out is False
