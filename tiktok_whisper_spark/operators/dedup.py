"""Deduplication suite for training-data pipelines.

The reference's duplicate detection is embedding-cosine only (``embed
duplicates --threshold 0.95``, reference ``README.md:216``); a 100 TB corpus
pipeline needs the full ladder, cheapest-first:

* exact (fingerprint groupBy) — one shuffle on a 32-byte key;
* word-n-gram Jaccard — shingle-join with stop-shingle suppression;
* MinHash + LSH — signature/banding so near-dup candidate generation is a
  bucket join instead of all-pairs;
* SimHash — bitwise fingerprint, hamming-band candidates;
* embedding-cosine — exact all-pairs (testable) + the blocked scale path.

Determinism notes: MinHash uses ``min(md5(shingle || seed))`` — md5 emits
identical lowercase hex in Spark and DuckDB, and lexicographic min over a
uniform hash family is a valid MinHash, so the *driver oracle can verify
signatures byte-for-byte*. SimHash uses xxhash64 (JVM-side) and is verified
by property tests instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint

__all__ = [
    "exact_dedup",
    "shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash",
    "simhash_near_dups",
    "embedding_near_dups",
    "embedding_near_dups_lsh",
    "embedding_near_dups_grouped",
]


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the scan under-splits.

    A small corpus arrives as one parquet split (maxPartitionBytes), which
    would run the CPU-heavy per-doc expression chains (tokenize → grams →
    per-shingle hashes, interpreted HOFs) on a single core. At real corpus
    scale the scan already has ≥ parallelism splits and this is a no-op —
    the check is on the plan, no job runs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: ``(fp, n_copies, keep_id)``, keep = min id."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_id"))
    )


def _gram_sets(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Per-doc distinct shingle ARRAY: ``(doc_id, grams: array<string>)``.

    The tokens array is materialized as a real column before the gram
    transform — inlining the ``split`` expression into the HOF lambda makes
    Catalyst re-evaluate the split per sequence element (O(tokens²) per doc;
    measured 4× slower at 54 tokens/doc). Dedup happens per-row via
    ``array_distinct`` — NO shuffle; docs with fewer than ``n`` tokens
    produce no row (they cannot participate in n-gram similarity, matching
    the SQL oracle's ``WHERE len(t) >= n``).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    tk = _spread(df).select(F.col(id_col).alias("doc_id"), toks.alias("toks")).where(
        F.size("toks") >= n
    )
    # greatest(…, 0) keeps the expression total: rows with < n tokens are
    # dropped by the filter above, but expression evaluation isn't
    # guaranteed to happen strictly after it (local-relation folding), and
    # an unclamped sequence would go descending into slice(start=0) errors.
    grams = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i + 1, n)),
            ),
            lambda s: F.length(s) > 0,
        )
    )
    # No emptiness filter on grams: tokens from a \s+ split of trimmed text
    # are never empty, so >=n tokens always yield >=1 gram — and a
    # ``where(size(grams) > 0)`` would be rewritten by predicate pushdown
    # into a condition that inlines the whole gram pipeline WITH the token
    # split re-evaluated per element (O(tokens²) per row; measured 20×
    # slower than the map itself).
    return tk.select("doc_id", grams.alias("grams"))


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word-n-gram shingles per document: ``(doc_id, shingle)``.

    Built with sequence+transform+explode — no Python. Normalization:
    lowercase, whitespace-split. Dedup is per-row (``array_distinct`` before
    the explode), so no global distinct shuffle.
    """
    return _gram_sets(df, id_col, text_col, n).select(
        "doc_id", F.explode("grams").alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.4,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard ≥ threshold: ``(a, b, jaccard)``.

    Scale path: the shingle self-join explodes on stop-shingles (a shingle in
    k docs yields k² pair rows) — ``max_doc_freq`` drops shingles more
    frequent than the cap before the join, the standard suppression used at
    corpus scale (slightly lowers recall, bounded by the cap choice).
    """
    # persist: the shingle relation feeds the size aggregate AND both sides
    # of the pair join (plus the doc-frequency filter) — the cached fragment
    # substitutes at ANALYSIS time, before join-key null-filter pushdown can
    # inline the gram pipeline into per-branch predicates (the same
    # O(tokens²)-per-row rewrite minhash guards against).
    sh = shingles(df, id_col, text_col, n).persist()
    try:
        return _ngram_jaccard_pairs_inner(sh, threshold, max_doc_freq)
    finally:
        # the result below is eagerly materialized (localCheckpoint), so the
        # shingle cache is no longer referenced — unpersisting here keeps
        # repeated calls in a long-lived session from leaking cached blocks
        sh.unpersist()


def _ngram_jaccard_pairs_inner(
    sh: DataFrame, threshold: float, max_doc_freq: int | None
) -> DataFrame:
    if max_doc_freq:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b")), "b")
        .select(
            "a",
            "b",
            (
                F.col("shared").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("shared")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    # eager: the surviving pairs (tiny — only those ≥ threshold) are pinned
    # so the caller never re-runs the shingle join after the cache is dropped;
    # localCheckpoint blocks are GC-cleaned with the DataFrame, unlike persist
    return out.localCheckpoint()


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per doc: ``(doc_id, sig: array<string>)``.

    Component k = ``min(md5(shingle || ':' || k))``; md5-hex min is
    engine-portable. The hash loop runs in ``mapInPandas`` over exactly
    ``(doc_id, text)`` — one narrow map, ZERO shuffles — with the md5 states
    amortized: one digest pass over each shingle, then ``num_hashes`` cheap
    ``copy()+update(':k')`` continuations (md5 is sequential, so
    ``md5(s):k`` shares the state of ``md5(s)``). CPython's ``hashlib`` is
    native code, so this replaces the previous per-shingle chain of
    interpreted Catalyst HOF lambdas (higher-order functions never enter
    whole-stage codegen) — measured 3.48 s → 0.6 s for the 50k-doc
    signature stage at bench sf1.0. Mins compare on raw digest bytes (hex
    encoding is byte-monotone) and convert to hex once per component.

    Tokenization replicates the previous JVM expression exactly:
    Java ``trim`` (strip chars ≤ U+0020), lower, split on Java ``\\s+``
    (``[ \\t\\n\\x0b\\f\\r]+`` — ASCII-only, unlike Python's unicode
    ``\\s``), docs with < n tokens dropped, per-doc distinct shingles.
    """
    from collections.abc import Iterator

    base = _spread(df).select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    suffixes = [f":{k}".encode() for k in range(num_hashes)]

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re

        ws = re.compile("[ \t\n\x0b\f\r]+")        # Java regex \s, exactly
        java_trim = "".join(chr(i) for i in range(0x21))  # String.trim: ≤ U+0020
        md5 = hashlib.md5
        nh = range(num_hashes)
        for pdf in batches:
            ids: list = []
            out: list = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if not isinstance(text, str):
                    continue  # null text → no tokens → dropped (as before)
                toks = ws.split(text.strip(java_trim).lower())
                if len(toks) < n:
                    continue
                grams = set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
                mins: list = [None] * num_hashes
                for g in grams:
                    m = md5(g.encode())
                    for k in nh:
                        h = m.copy()
                        h.update(suffixes[k])
                        d = h.digest()
                        if mins[k] is None or d < mins[k]:
                            mins[k] = d
                ids.append(doc_id)
                out.append([d.hex() for d in mins])
            if ids:  # empty frames trip Arrow's list<string> conversion
                yield pd.DataFrame(
                    {"doc_id": pd.Series(ids, dtype="int64"),
                     "sig": pd.Series(out, dtype="object")}
                )

    return base.mapInPandas(sigs, schema="doc_id long, sig array<string>")


def minhash_lsh_candidates(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: pairs sharing ≥1 band: ``(a, b, est_jaccard)``.

    est_jaccard = fraction of equal signature components — the MinHash
    estimator. Candidate generation stays bucketed (never all-pairs): each
    signature row is replicated once per band and hash-partitioned on its
    band's slice, then ONE ``mapInPandas`` pass groups the buckets
    vectorized (lexsort + boundary scan) and scores pairs in place. A pair
    belongs to the FIRST band whose bucket it shares — every earlier band's
    slice differs — so pairs are emitted exactly once with NO ``distinct``
    exchange, and the signatures ride the single shuffle, replacing the
    previous id-only band self-join + pair distinct + two signature
    re-attach joins (4 joins/exchanges → 1 exchange)."""
    r = rows_per_band
    replicated = sigs.select(
        "doc_id", "sig",
        F.explode(F.array(*[F.lit(b) for b in range(bands)])).alias("band"),
    )
    # partition key = the band's signature slice itself (components are
    # fixed-width md5 hex, so concat_ws equality ⟺ slice equality); grouping
    # inside the partition re-compares the full components, so key collisions
    # across buckets that share a partition are impossible by construction
    parts = replicated.repartition(
        F.col("band"),
        F.concat_ws("|", F.slice("sig", F.col("band") * r + 1, F.lit(r))),
    )

    def score_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        comp = np.array([list(s) for s in pdf["sig"]], dtype="U32")  # (n, H)
        nh = comp.shape[1]
        band = pdf["band"].to_numpy().astype(np.int64)
        ids = pdf["doc_id"].to_numpy()
        # bucket key = (band, its slice components); full-width comparisons
        slice_cols = [comp[np.arange(len(pdf)), band * r + j] for j in range(r)]
        order = np.lexsort((ids, *reversed(slice_cols), band))
        band, ids, comp = band[order], ids[order], comp[order]
        keys = [c[order] for c in slice_cols]
        change = np.diff(band) != 0
        for kk in keys:
            change |= kk[1:] != kk[:-1]
        starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(band)]])
        out_a, out_b, out_e = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k < 2:
                continue
            b0 = int(band[s])
            gid, gc = ids[s:e], comp[s:e]
            iu, ju = np.triu_indices(k, 1)
            keep = np.ones(len(iu), dtype=bool)
            for lb in range(b0):  # first-matching-band dedup
                keep &= ~np.all(
                    gc[iu, lb * r : (lb + 1) * r] == gc[ju, lb * r : (lb + 1) * r],
                    axis=1,
                )
            iu, ju = iu[keep], ju[keep]
            if not len(iu):
                continue
            eq = (gc[iu] == gc[ju]).sum(axis=1)
            out_a.append(np.minimum(gid[iu], gid[ju]))
            out_b.append(np.maximum(gid[iu], gid[ju]))
            out_e.append(eq / float(nh))
        if out_a:
            yield pd.DataFrame(
                {"a": np.concatenate(out_a), "b": np.concatenate(out_b),
                 "est_jaccard": np.concatenate(out_e)}
            )

    return parts.mapInPandas(score_partition, schema="a long, b long, est_jaccard double")


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: ``(doc_id, simhash: long)``.

    Token hash = first 8 hex chars of ``md5(token)`` as a 32-bit int — like
    MinHash's ``min(md5(...))`` this makes the hash family *engine-portable*
    (DuckDB computes the identical value via ``('0x'||substr(md5(t),1,8))::
    BIGINT``), so the driver oracle can verify fingerprints byte-for-byte.
    Bit i of the fingerprint is the sign of Σ_tokens (±1 by token's bit i).
    One explode + one groupBy with ``bits`` conditional sums — all Catalyst,
    no Python.
    """
    toks = _spread(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10).cast("long")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    fingerprint_col = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint_col = bit if fingerprint_col is None else fingerprint_col + bit
    return sums.select("doc_id", fingerprint_col.alias("simhash"))


def simhash_near_dups(
    fps: DataFrame, bits: int = 32, chunks: int = 4, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: band on equal chunks, verify hamming ≤ k.

    Pigeonhole: hamming ≤ chunks-1 guarantees one equal chunk, so candidate
    generation is an equi-join on (chunk_idx, chunk_value).
    """
    width = bits // chunks
    mask = (1 << width) - 1
    chunked = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask)).alias("cv"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", F.col("ck.chunk").alias("chunk"), F.col("ck.cv").alias("cv"))
    a = chunked.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "chunk", "cv")
    b = chunked.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "chunk", "cv")
    cand = a.join(b, ["chunk", "cv"]).where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb").distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("a", "b", hamming.alias("hamming")).where(F.col("hamming") <= max_hamming)


def embedding_near_dups_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bands: int = 4,
    band_width: int = 8,
    group_col: str | None = None,
) -> DataFrame:
    """Embedding near-duplicates, LSH-gated: ``(a, b, cos)`` — the 100-TB path.

    This is the reference's ``embed duplicates --threshold`` / ``--user``
    (``README.md:216``; scoping per ``docs/02-features/DUAL_EMBEDDING_TDD_
    PLAN.md:742-743``) without the all-pairs blowup:

    1. **Candidates** come from sign-random-projection LSH: band ``b``'s
       bucket key is the sign bit-string of coordinates
       ``b·band_width .. b·band_width+band_width-1``. For zero-centered
       embedding spaces the coordinate hyperplanes are a valid SRP family
       (cosine-similar vectors agree on most sign bits), and the bucketing is
       exactly reproducible in ANSI SQL (``vec[d] >= 0``), so the driver
       oracle replays the identical candidate set — no float-sum ordering
       involved. Candidate generation is a bucket equi-join, never a cross
       join.
    2. **Exact scoring** re-attaches the vectors to the deduped candidate id
       pairs and keeps cosine ≥ threshold (JVM-side HOF expression).

    ``group_col`` scopes duplicate detection within a group (the reference's
    per-user scope): candidates must share the group, like
    ``embed duplicates --user <name>`` restricted to one user's rows.
    """
    gcols = [group_col] if group_col else []
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec"), *gcols
    )

    def band_key(b: int) -> F.Column:
        # integer bucket key: bit d set iff vec[b*w+d] >= 0; out-of-range /
        # NaN coordinates contribute 0 (element_at past the end is NULL)
        bit = None
        for d in range(band_width):
            term = F.when(
                F.element_at("vec", b * band_width + d + 1) >= 0, F.lit(1 << d)
            ).otherwise(F.lit(0))
            bit = term if bit is None else bit + term
        return bit

    # Bucket rows CARRY the vector: each vec travels `bands` times through
    # the one groupBy shuffle, against ~2×|candidate pairs| vector copies
    # under the previous id-only join + re-attach design (candidates per
    # vector routinely exceed `bands` — 3.1M pairs from 20k vectors at bench
    # sf1.0), and the per-bucket scorer below replaces both the 3.1M-row
    # pair `distinct` exchange and the interpreted per-pair HOF cosine
    # (measured 5.7 s → ~0.4 s for the registered query at sf1.0).
    buckets = base.select(
        "id",
        "vec",
        *gcols,
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), band_key(b).alias("bits")) for b in range(bands)])
        ).alias("bk"),
    ).select("id", "vec", *gcols, F.col("bk.band").alias("band"), F.col("bk.bits").alias("bits"))

    if band_width > 32:
        raise ValueError("band_width > 32 is not supported (bucket keys pack into int64)")
    nbits = bands * band_width
    thr = float(threshold)
    gtype = df.schema[group_col].dataType.simpleString() if group_col else None

    # ONE shuffle keyed on the bucket, then a single mapInPandas per
    # partition that groups the buckets VECTORIZED (lexsort + boundary scan)
    # — not groupBy().applyInPandas, whose ~1 ms per-group pandas/Arrow
    # overhead dominates when buckets are small and numerous (measured
    # 1.3 s at sf0.1's ~1000 8-row buckets vs 0.2 s for this form).
    parts = buckets.repartition("band", "bits", *gcols)

    def score_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        band = pdf["band"].to_numpy().astype(np.int64)
        bits = pdf["bits"].to_numpy().astype(np.int64)
        ids = pdf["id"].to_numpy()
        if group_col:
            gcodes, guniq = pd.factorize(pdf[group_col], use_na_sentinel=False)
            gcodes = gcodes.astype(np.int64)
        else:
            gcodes = np.zeros(len(pdf), dtype=np.int64)
        order = np.lexsort((ids, gcodes, bits, band))
        band, bits, ids, gcodes = band[order], bits[order], ids[order], gcodes[order]
        arrs = pdf["vec"].to_numpy()[order]
        dims = np.fromiter((len(v) for v in arrs), dtype=np.int64, count=len(arrs))
        dmax = int(dims.max()) if len(dims) else 0
        if dims.min(initial=dmax) == dmax and dmax > 0:
            x = np.stack(arrs).astype(np.float64, copy=False)
        else:
            x = np.zeros((len(arrs), max(dmax, 1)), dtype=np.float64)
            for i, v in enumerate(arrs):
                x[i, : len(v)] = v
        # per-band bucket bytes from the sign bits (0-padded past dim/nbits),
        # identical to the JVM band_key above; NaN >= 0 is False there too
        signs = np.zeros((len(arrs), nbits), dtype=bool)
        w = min(nbits, x.shape[1])
        signs[:, :w] = x[:, :w] >= 0
        weights = 1 << np.arange(band_width, dtype=np.int64)
        bytes_per_band = signs.reshape(len(arrs), bands, band_width) @ weights
        norms = np.sqrt(np.einsum("ij,ij->i", x, x))
        # bucket boundaries on the sorted (band, bits, gcode) key
        change = (np.diff(band) != 0) | (np.diff(bits) != 0) | (np.diff(gcodes) != 0)
        starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(band)]])
        out_a, out_b, out_c, out_g = [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k < 2:
                continue
            b0 = int(band[s])
            gid, gv, gd, gb = ids[s:e], x[s:e], dims[s:e], bytes_per_band[s:e]
            iu, ju = np.triu_indices(k, 1)
            # candidate dedup without a distinct: a pair belongs to the FIRST
            # band whose bucket it shares — keep it iff every lower band's
            # byte differs (its byte at band b0 is shared by construction)
            keep = gd[iu] == gd[ju]  # dim-mismatched pairs are null cosine
            for lb in range(b0):
                keep &= gb[iu, lb] != gb[ju, lb]
            iu, ju = iu[keep], ju[keep]
            if not len(iu):
                continue
            sims = gv @ gv.T
            denom = norms[s:e][iu] * norms[s:e][ju]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(denom > 0, sims[iu, ju] / denom, np.nan)
            hit = cos >= thr  # NaN compares False, like the null cosine
            if hit.any():
                out_a.append(gid[iu[hit]])
                out_b.append(gid[ju[hit]])
                out_c.append(cos[hit])
                if group_col:
                    out_g.append(np.full(int(hit.sum()), gcodes[s]))
        if out_a:
            res = {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
            if group_col:  # column order must match the declared schema
                res[group_col] = guniq.take(np.concatenate(out_g))
            res["cos"] = np.concatenate(out_c)
            yield pd.DataFrame(res)

    schema = "a long, b long, cos double"
    if group_col:
        schema = f"a long, b long, {group_col} {gtype}, cos double"
    out = parts.mapInPandas(score_partition, schema=schema)
    return out.select("a", "b", *gcols, "cos")


def embedding_near_dups_grouped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Group-scoped exact near-duplicates: ``(a, b, <group>, cos)``.

    The reference's ``embed duplicates --user <name>`` (``README.md:216``;
    per-user scope in ``docs/02-features/DUAL_EMBEDDING_TDD_PLAN.md:742-743``)
    — duplicate pairs are only meaningful within one user's corpus. The group
    key equi-join bounds the pair blowup to Σ n_g² (per-user corpus sizes),
    NOT the global n²; at corpus scale combine with the LSH gate
    (:func:`embedding_near_dups_lsh` with ``group_col``).
    """
    from ..functions.vector import cosine_expr

    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.col(group_col).alias("grp"),
    )
    a = base.select(F.col("id").alias("a"), F.col("vec").alias("va"), "grp")
    b = base.select(F.col("id").alias("b"), F.col("vec").alias("vb"), "grp")
    return (
        a.join(b, "grp")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.col("grp").alias(group_col), cosine_expr("va", "vb").alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    block_size: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicates (the reference's ``embed duplicates``,
    ``README.md:216``): all exact pairs with cosine ≥ threshold, ``(a, b, cos)``.

    Exact all-pairs, executed as a **block-matrix** job instead of a row-wise
    cross join: vectors are hashed into √-scale blocks, block *pairs* are the
    cross-joined unit, and each pair is scored with one float64 NumPy matmul
    inside ``mapInPandas``. That turns O(n²) per-row expression evaluation
    into O((n/B)²) BLAS calls — the shape that survives a 100× scale-up
    (and parallelizes over block pairs). At true corpus scale, candidates
    come from :func:`minhash_lsh_candidates` or a random-hyperplane bucket
    join first, and this exact kernel scores only candidate blocks.
    """
    from collections.abc import Iterator

    spark = df.sparkSession
    n = df.count()
    n_blocks = max(1, (n + block_size - 1) // block_size)
    base = df.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    blocks = base.groupBy("blk").agg(
        F.collect_list("id").alias("ids"), F.collect_list("vec").alias("vecs")
    )
    lhs = blocks.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    rhs = blocks.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    pairs = lhs.crossJoin(rhs).where(F.col("blk_a") <= F.col("blk_b"))
    # spread block-pair tasks across the cluster; clamp to a small multiple
    # of the parallelism — at 10M docs the raw pair count (~n_blocks²/2) is
    # tens of millions and a partition per pair would drown the scheduler
    n_pairs = n_blocks * (n_blocks + 1) // 2
    pairs = pairs.repartition(
        max(1, min(n_pairs, 4 * spark.sparkContext.defaultParallelism))
    )

    thr = float(threshold)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():  # ≤ a few block pairs per batch
                ia = np.asarray(row["ids_a"], dtype=np.int64)
                ib = np.asarray(row["ids_b"], dtype=np.int64)
                xa = np.stack(row["vecs_a"]).astype(np.float64)
                xb = np.stack(row["vecs_b"]).astype(np.float64)
                na = np.linalg.norm(xa, axis=1)
                nb = np.linalg.norm(xb, axis=1)
                denom = np.outer(na, nb)
                sims = (xa @ xb.T) / np.where(denom == 0, 1.0, denom)
                ii, jj = np.where(sims >= thr)
                va, vb, cs = ia[ii], ib[jj], sims[ii, jj]
                if row["blk_a"] == row["blk_b"]:
                    # same block: matrix holds both orders + the diagonal
                    keep = va < vb
                    va, vb, cs = va[keep], vb[keep], cs[keep]
                if len(va) == 0:
                    continue
                # canonical (min, max): the smaller id may live in either block
                yield pd.DataFrame(
                    {"a": np.minimum(va, vb), "b": np.maximum(va, vb), "cos": cs}
                )

    return pairs.mapInPandas(score, schema="a long, b long, cos double")
