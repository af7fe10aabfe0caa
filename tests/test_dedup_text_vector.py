"""Dedup / text / similarity operators vs pure-Python oracles + known fixtures."""

from __future__ import annotations

import hashlib
import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiktok_whisper_spark.functions.vector import (
    cosine_expr,
    euclidean_expr,
    l2_normalize_expr,
    mock_embedding_expr,
)
from tiktok_whisper_spark.operators import dedup, similarity, text

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text with unique words here"),
    (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (5, "short text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    # docs with < n tokens produce NO shingles — they can't participate in
    # n-gram similarity; matches the engine and its DuckDB twin exactly
    toks = text.lower().strip().split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup_groups(spark, docs_df):
    got = {r["fp"]: (r["n_copies"], r["keep_id"]) for r in dedup.exact_dedup(docs_df, "doc_id", "text").collect()}
    fp1 = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert got[fp1] == (2, 1)  # docs 1 and 4 collapse, keep min id
    assert sum(n for n, _ in got.values()) == 5


def test_shingles_match_python(spark, docs_df):
    got = {}
    for r in dedup.shingles(docs_df, "doc_id", "text", 3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    for doc_id, t in DOCS:
        assert got.get(doc_id, set()) == _py_shingles(t, 3), doc_id


def test_ngram_jaccard_pairs_oracle(spark, docs_df):
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           dedup.ngram_jaccard_pairs(docs_df, "doc_id", "text", 3, threshold=0.0).collect()}
    want = {}
    sh = {d: _py_shingles(t, 3) for d, t in DOCS}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            want[(a, b)] = inter / len(sh[a] | sh[b])
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_minhash_signatures_oracle(spark, docs_df):
    """MinHash components equal min(md5(shingle:k)) computed in Python."""
    sigs = {r["doc_id"]: r["sig"] for r in
            dedup.minhash_signatures(docs_df, "doc_id", "text", 3, num_hashes=4).collect()}
    for doc_id, t in DOCS:
        sh = _py_shingles(t, 3)
        if not sh:  # < n tokens → no shingles → no signature row
            assert doc_id not in sigs
            continue
        for k in range(4):
            want = min(hashlib.md5(f"{s}:{k}".encode()).hexdigest() for s in sh)
            assert sigs[doc_id][k] == want


def test_minhash_lsh_finds_exact_dups(spark, docs_df):
    sigs = dedup.minhash_signatures(docs_df, "doc_id", "text", 3, num_hashes=8)
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in
             dedup.minhash_lsh_candidates(sigs, bands=4, rows_per_band=2).collect()}
    assert pairs[(1, 4)] == 1.0  # exact dups always collide with est 1.0


def test_simhash_properties(spark, docs_df):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs_df, "doc_id", "text", 32).collect()}
    assert fps[1] == fps[4]  # identical text → identical fingerprint
    ham_near = bin(fps[1] ^ fps[2]).count("1")  # one word differs
    ham_far = bin(fps[1] ^ fps[3]).count("1")  # unrelated text
    assert ham_near < ham_far
    near = {(r["a"], r["b"]) for r in
            dedup.simhash_near_dups(dedup.simhash(docs_df, "doc_id", "text", 32),
                                    max_hamming=ham_near).collect()}
    assert (1, 4) in near and (1, 2) in near


def test_embedding_near_dups_vs_bruteforce(spark):
    """Block-matrix kernel == NumPy brute force, across multiple blocks."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(10, 16))
    vecs = [base[i % 10] + rng.normal(scale=0.05, size=16) for i in range(60)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    got = {(r["a"], r["b"]): r["cos"] for r in
           dedup.embedding_near_dups(df, "vec_id", "embedding", 0.9, block_size=16).collect()}
    x = np.stack(vecs)
    sims = (x @ x.T) / np.outer(np.linalg.norm(x, axis=1), np.linalg.norm(x, axis=1))
    want = {(a, b): sims[a, b] for a in range(60) for b in range(a + 1, 60) if sims[a, b] >= 0.9}
    assert got.keys() == want.keys()
    np.testing.assert_allclose(
        [got[k] for k in sorted(got)], [want[k] for k in sorted(want)], atol=1e-9
    )


def test_text_ops(spark, docs_df):
    prof = {r["doc_id"]: r for r in text.text_profile(docs_df, "text").collect()}
    assert prof[1]["n_tokens"] == 9
    assert prof[5]["n_tokens"] == 2
    assert prof[1]["fp"] == prof[4]["fp"]
    assert prof[1]["lang_guess"] == "en"
    assert 0.0 <= prof[5]["quality"] <= 1.0 and prof[5]["quality"] < prof[1]["quality"]


def test_vector_functions_reference_semantics(spark):
    """Mirrors the reference's calculator tests (calculator_test.go:28-198):
    identical → 1.0, orthogonal → 0.0, dim mismatch → null."""
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0], [1.0, 2.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        cosine_expr("a", "b").alias("cos"), euclidean_expr("a", "b").alias("dist")
    ).collect()
    assert abs(rows[0]["cos"] - 1.0) < 1e-12 and rows[0]["dist"] == 0.0
    assert rows[1]["cos"] == 0.0 and abs(rows[1]["dist"] - np.sqrt(2)) < 1e-12
    assert rows[2]["cos"] is None and rows[2]["dist"] is None

    norm = spark.range(1).select(l2_normalize_expr(F.array(F.lit(3.0), F.lit(4.0))).alias("v")).collect()[0]["v"]
    assert abs(norm[0] - 0.6) < 1e-12 and abs(norm[1] - 0.8) < 1e-12

    # deterministic mock embedding (api.go:341-373): unit norm, reproducible
    m = spark.createDataFrame([(7,), (7,), (8,)], "id long").select(
        mock_embedding_expr("id", 8).alias("v")
    ).collect()
    assert m[0]["v"] == m[1]["v"] != m[2]["v"]
    assert abs(np.linalg.norm(m[0]["v"]) - 1.0) < 1e-9


def test_knn_and_ivf_recall(spark):
    df = spark.range(200).select(
        F.col("id").alias("vec_id"), mock_embedding_expr("id", 16).alias("embedding")
    )
    q = df.where(F.col("vec_id") == 5).collect()[0]["embedding"]
    exact = [r["id"] for r in similarity.knn_search(df, "vec_id", "embedding", list(q), k=10).collect()]
    assert exact[0] == 5  # the query vector itself is its own nearest neighbor
    approx = [r["id"] for r in
              similarity.ann_ivf_search(df, "vec_id", "embedding", list(q), k=10,
                                        n_centroids=8, n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5  # probing half the cells must recover most neighbors


def test_kmeans_separated_clusters(spark):
    rng = np.random.default_rng(3)
    centers = np.eye(4) * 10
    pts = [(i, [float(x) for x in centers[i % 4] + rng.normal(scale=0.1, size=4)]) for i in range(100)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    km = similarity.kmeans(df, "vec_id", "embedding", k=4, max_iter=15, seed=42)
    got = {r["id"]: r["cluster"] for r in km.assignments.collect()}
    # perfect separation: cluster assignment is constant on each true group
    groups = {g: {got[i] for i in range(100) if i % 4 == g} for g in range(4)}
    assert all(len(s) == 1 for s in groups.values())
    assert len({next(iter(s)) for s in groups.values()}) == 4
    assert km.inertia < 5.0


def test_pca_projects_variance(spark):
    rng = np.random.default_rng(11)
    comp = np.array([1.0, 1.0, 0.0, 0.0]) / np.sqrt(2)
    pts = [(i, [float(x) for x in rng.normal() * 5 * comp + rng.normal(scale=0.05, size=4)]) for i in range(200)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    out = {r["id"]: r["pc"] for r in similarity.pca_project(df, "vec_id", "embedding", 2).collect()}
    pcs = np.stack([out[i] for i in range(200)])
    # first PC carries nearly all the variance
    assert pcs[:, 0].var() > 50 * pcs[:, 1].var()
