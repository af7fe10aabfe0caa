"""Skew-aware scatter join + Arrow-vectorized partial aggregation.

Every superstep of every kernel has the same hot loop:

    edges ⋈ vertex_state on (edges.src == state.vid)   -- "scatter"
    groupBy(edges.dst).agg(...)                        -- "gather"

At 100 TB the edge side dominates, so the design rules are:

1. **The edge side never moves twice.** Edges are normalized/split once,
   ``repartition(P, "src")``-ed and persisted; every superstep's join reuses
   that partitioning (Exchange reuse), so only the vertex-sized rank/label
   frame shuffles per superstep. (On a cluster with Iceberg, both sides are
   bucketed by key and even that shuffle disappears.)
2. **Hub keys are salted explicitly.** Zipf-skewed tools/roles concentrate
   edges on a few ``src`` keys; AQE's skew-join only splits *sort-merge*
   partitions after the fact. We split edges into hot/cold by a data-driven
   degree threshold, replicate the (tiny) hot vertex-state rows R times, and
   join hot edges on ``(src, salt)`` with ``salt = pmod(xxhash64(dst), R)``
   — deterministic spread of one hub's edges over R tasks.
3. **Gather pre-reduces in Arrow batches.** The per-partition sparse
   gather-scatter runs as a ``mapInPandas`` over the joined contributions:
   NumPy ``factorize`` + ``bincount`` collapses each Arrow batch to one row
   per distinct ``dst`` before the shuffle — the vectorized analog of
   map-side combine, with zero per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PartitionedEdges",
    "prepare_edges",
    "scatter_gather",
    "csr_gather",
    "csr_remote_gather",
    "local_gather_sums",
    "write_edge_shards",
    "write_edge_shards_local",
    "purge_shard_dir",
    "shard_pid",
]


def compiled_generation(cdir: str):
    """Identity token of one compiled-cache publish: the ``_OK`` marker's
    (inode, mtime). ``os.replace`` of a fresh tmp dir gives every publish a
    new inode, so worker-process caches keyed on the compile dir can detect
    a re-publish (init's rmtree+recompile under the same path) instead of
    serving a stale mmap alignment. ``None`` = not compiled."""
    import os

    try:
        st = os.stat(os.path.join(cdir, "_OK"))
        return (st.st_ino, st.st_mtime_ns)
    except OSError:
        return None


@dataclass
class PartitionedEdges:
    """Edges split hot/cold, persisted, partitioned by src — built once per run."""

    cold: DataFrame  # (src, dst, <payload cols>)
    hot: DataFrame | None  # (src, dst, salt, <payload cols>)
    hot_vids: DataFrame | None  # (vid) — the salted hub keys, broadcast-joined
    num_salts: int
    num_edges: int
    payload: tuple[str, ...]

    def unpersist(self) -> None:
        self.cold.unpersist()
        if self.hot is not None:
            self.hot.unpersist()
        if self.hot_vids is not None:
            self.hot_vids.unpersist()


def prepare_edges(
    edges: DataFrame,
    payload: tuple[str, ...] = (),
    *,
    num_salts: int = 8,
    hot_threshold: int | None = None,
    num_partitions: int | None = None,
) -> PartitionedEdges:
    """Split, partition and persist ``edges(src, dst, *payload)`` for iteration.

    ``hot_threshold=None`` derives the hub cutoff from the degree histogram
    (10× mean out-degree, min 64) instead of a constant. Hub keys stay in a
    DataFrame and split the edges via broadcast semi/anti joins — on a Zipf
    graph at 100× there can be thousands of keys above the cutoff, so a
    collected list (giant ``In`` expression + driver round-trip) would not
    survive; a broadcast hash join does.
    """
    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = ["src", "dst", *payload]
    e = edges.select(*cols)

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    if hot_threshold is None:
        mean_deg = deg.agg(F.avg("deg")).collect()[0][0] or 0.0
        hot_threshold = max(int(10 * mean_deg), 64)
    hot_vids = (
        deg.where(F.col("deg") > hot_threshold).select(F.col("src").alias("vid")).persist()
    )
    n_hot_keys = hot_vids.count()

    if n_hot_keys:
        cold = e.join(F.broadcast(hot_vids), e["src"] == hot_vids["vid"], "left_anti")
        hot = (
            e.join(F.broadcast(hot_vids), e["src"] == hot_vids["vid"], "left_semi")
            .withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(num_salts)).cast("int"))
            .repartition(P, "src", "salt")
            .persist()
        )
    else:
        cold, hot = e, None
        hot_vids.unpersist()
        hot_vids = None

    cold = cold.repartition(P, "src").persist()
    n_cold = cold.count()
    n_hot = hot.count() if hot is not None else 0
    return PartitionedEdges(cold, hot, hot_vids, num_salts, n_cold + n_hot, payload)


def scatter_join(pe: PartitionedEdges, state: DataFrame, select: list[F.Column]) -> DataFrame:
    """Skew-aware ``edges ⋈ state on src == vid``; projects ``select`` columns.

    Cold edges join the state frame directly; hot (hub) edges join the
    replicated state on ``(src, salt)``. ``select`` may reference edge
    payload columns, ``dst``, and state columns. Hub membership is a
    broadcast semi-join against ``pe.hot_vids`` (never a driver-side list).
    """
    cold_part = pe.cold.join(state, pe.cold["src"] == state["vid"], "inner").select(*select)
    if pe.hot is None:
        return cold_part
    hot_state = (
        state.join(F.broadcast(pe.hot_vids.select("vid")), "vid", "left_semi")
        .withColumn("vsalt", F.explode(F.sequence(F.lit(0), F.lit(pe.num_salts - 1))))
        .withColumn("vsalt", F.col("vsalt").cast("int"))
    )
    cond = (pe.hot["src"] == hot_state["vid"]) & (pe.hot["salt"] == hot_state["vsalt"])
    hot_part = pe.hot.join(hot_state, cond, "inner").select(*select)
    return cold_part.unionByName(hot_part)


def _arrow_partial(agg: str):
    """Per-Arrow-batch sparse gather: one output row per distinct dst.

    Pure NumPy on int64/float64 arrays (factorize + bincount / minimum.at) —
    this is the per-partition gather-scatter kernel the engine runs instead
    of per-row Python. A vectorized analog of map-side combine: each Arrow
    batch collapses to ≤ #distinct-dst rows before the shuffle.
    """

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            codes, uniq = pd.factorize(pdf["dst"], sort=False)
            vals = pdf["c"].to_numpy()
            if agg == "sum":
                out = np.bincount(codes, weights=vals.astype(np.float64), minlength=len(uniq))
            else:  # min
                out = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(out, codes, vals.astype(np.int64))
            yield pd.DataFrame({"dst": uniq, "c": out})

    return partial


# -----------------------------------------------------------------------------
# CSR-shard gather: worker-cached adjacency, rank-only Arrow traffic
# -----------------------------------------------------------------------------
#
# The join-based scatter ships edge-sized data through the plan every
# superstep. The CSR-shard path instead writes the normalized adjacency ONCE
# as parquet shards partitioned by pid = pmod(hash(src), P) — the exact
# function Spark's HashPartitioning uses — so a vertex-state frame that is
# hash-partitioned by vid is ALREADY aligned with the shards: physical
# partition i holds exactly the vids of shard i. Each superstep then:
#
#   state (partitioned by vid) ──mapInPandas──▶ per-shard partial (dst, c)
#                                     │  loads+factorizes its shard once,
#                                     │  caches it in the (reused) Python
#                                     │  worker; per superstep: align ranks
#                                     │  to the shard's unique srcs (one
#                                     │  pandas reindex) + one bincount
#   partials ──groupBy(dst).sum──▶ gather result      (the ONLY shuffle)
#
# Python traffic is vertex-sized (vid, rank) in and ≤ unique-dst-per-shard
# out; the edge bytes cross into Python exactly once per run per worker.

_SHARD_CACHE: dict = {}


def shard_pid(col: F.Column, num_partitions: int) -> F.Column:
    """Spark's HashPartitioning function: pmod(murmur3(col), n) — F.hash IS
    murmur3_32(seed=42), the same hash HashPartitioning evaluates."""
    return F.pmod(F.hash(col), F.lit(num_partitions))


def write_edge_shards(enorm: DataFrame, shard_dir: str, num_partitions: int) -> None:
    """One-time materialization of adjacency shards (src, dst, p) by pid."""
    (
        enorm.withColumn("pid", shard_pid(F.col("src"), num_partitions))
        .repartition("pid")
        .write.mode("overwrite")
        .partitionBy("pid")
        .parquet(shard_dir)
    )


def _load_shard(shard_dir: str, pid: int):
    key = (shard_dir, pid)
    if key in _SHARD_CACHE:
        return _SHARD_CACHE[key]
    # single-run working set: long-lived reused Python workers would otherwise
    # accumulate the adjacency of every run ever executed in the session
    for stale in [k for k in _SHARD_CACHE if k[0] != shard_dir]:
        del _SHARD_CACHE[stale]
    import os

    import pyarrow.parquet as pq

    # Workers read shards through pyarrow's FileSystem API, so shard_dir may
    # be any URI pyarrow supports (file://, s3://, gs://, hdfs://) — on a
    # multi-executor cluster the shards live in the object store, not on a
    # local path that silently assumes a shared filesystem.
    if "://" in shard_dir:
        from pyarrow import fs as pafs

        filesystem, base = pafs.FileSystem.from_uri(shard_dir)
        path = f"{base}/pid={pid}"
        if filesystem.get_file_info(path).type == pafs.FileType.NotFound:
            _SHARD_CACHE[key] = None
            return None
        tbl = pq.read_table(path, columns=["src", "dst", "p"], filesystem=filesystem)
        entry = _factorize_shard(tbl)
        _SHARD_CACHE[key] = entry
        return entry

    path = os.path.join(shard_dir, f"pid={pid}")
    if not os.path.isdir(path):
        entry = None  # shard has no edges
    else:
        tbl = pq.read_table(path, columns=["src", "dst", "p"])
        entry = _factorize_shard(tbl)
    _SHARD_CACHE[key] = entry
    return entry


def _factorize_shard(tbl):
    """Arrow table → factorized CSR-ish arrays (src/dst codes + uniques)."""
    src = tbl.column("src").to_numpy()
    dst = tbl.column("dst").to_numpy()
    p = tbl.column("p").to_numpy().astype(np.float64)
    src_codes, src_uniq = pd.factorize(src, sort=False)
    dst_codes, dst_uniq = pd.factorize(dst, sort=False)
    return (src_codes, src_uniq, dst_codes, dst_uniq, p)


def csr_gather(state: DataFrame, shard_dir: str) -> DataFrame:
    """Per-shard sparse gather: ``(dst, c)`` partials, one row per distinct
    dst per shard. ``state`` must be hash-partitioned by ``vid`` with the
    same partition count the shards were written with."""

    def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pid = int(pdfs[0]["pid"].iloc[0])
        shard = _load_shard(shard_dir, pid)
        if shard is None:
            return
        src_codes, src_uniq, dst_codes, dst_uniq, p = shard
        ranks = pd.concat(pdfs, ignore_index=True)
        aligned = (
            pd.Series(ranks["rank"].to_numpy(), index=ranks["vid"].to_numpy())
            .reindex(src_uniq)
            .to_numpy()
        )
        if np.isnan(aligned).any():
            # every shard src must be a vertex routed to this partition —
            # a NaN means state/shard partitionings diverged; fail loudly
            # rather than silently dropping rank mass.
            missing = int(np.isnan(aligned).sum())
            raise RuntimeError(
                f"csr_gather misalignment: {missing} shard srcs missing from "
                f"state partition {pid} — state is not hash-partitioned by vid "
                "with the shard partition count"
            )
        contrib = p * aligned[src_codes]
        sums = np.bincount(dst_codes, weights=contrib, minlength=len(dst_uniq))
        yield pd.DataFrame({"dst": dst_uniq, "c": sums})

    with_pid = state.select(
        F.spark_partition_id().alias("pid"), F.col("vid"), F.col("rank")
    )
    partials = with_pid.mapInPandas(gather, schema="dst long, c double")
    return partials.groupBy("dst").agg(F.sum("c").alias("c"))


# -----------------------------------------------------------------------------
# Locality-split CSR shards: conversation-local edges never shuffle
# -----------------------------------------------------------------------------
#
# Transcript graphs have massive *edge locality*: turn-adjacency edges (the
# overwhelming majority) connect turns of the SAME conversation. When every
# vertex carries a `home` locality key (turns: their conversation's hash;
# tools: themselves) and state is hash-partitioned by `home`, an adjacency
# edge's src and dst land in the same partition BY CONSTRUCTION — so its
# contribution can be gathered AND applied entirely inside one Python worker,
# never crossing an exchange. Only the remote edges (turn → tool hubs, a few
# distinct dsts after per-shard pre-reduction) shuffle, and their aggregate
# is small enough to broadcast back. This is the PowerGraph-style placement
# insight expressed in DataFrame terms: per superstep the engine moves the
# vertex frame through Arrow twice and shuffles ~|tools| rows — instead of
# shuffling and hash-aggregating an edge-sized (75M-row at bench scale)
# partial table.

def write_edge_shards_local(enorm: DataFrame, shard_dir: str, num_partitions: int) -> None:
    """One-time shard write for locality mode.

    ``enorm`` must carry ``(src, dst, p, src_home, dst_home)``; shards are
    keyed by ``pid = pmod(hash(src_home), P)`` with an ``is_local`` flag
    marking edges whose dst lives in the same partition.
    """
    (
        enorm.withColumn("pid", shard_pid(F.col("src_home"), num_partitions))
        .withColumn(
            "is_local",
            shard_pid(F.col("dst_home"), num_partitions) == F.col("pid"),
        )
        .select("src", "dst", "p", "pid", "is_local")
        .repartition("pid")
        .write.mode("overwrite")
        .partitionBy("pid")
        .parquet(shard_dir)
    )


def purge_shard_dir(shard_dir: str) -> None:
    """Delete a shard dir so it can be rewritten with different weight
    semantics (the three locality kernels share one ``_edge_shards_p{P}``
    layout but put different values in the ``p`` slot — PageRank normalized
    probabilities, CC constant 1.0, LPA raw summed weights). Also drops the
    node-local compiled cache when the dir is an object-store URI; on a
    multi-node cluster, rewriting a URI shard dir in place would still leave
    OTHER nodes' caches stale — share run dirs across kernels only when the
    weight semantics match, or use a fresh run_id."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..sources import fsio

    fsio.rmtree(shard_dir)
    if "://" in shard_dir:
        root = os.path.join(
            os.environ.get("TWSPARK_SHARD_CACHE", tempfile.gettempdir()),
            "twspark_shard_cache",
            hashlib.md5(shard_dir.encode()).hexdigest(),
        )
        shutil.rmtree(root, ignore_errors=True)


_SPLIT_ARRAYS = ("src_codes", "src_uniq", "dst_codes", "dst_uniq", "p")


def _load_shard_split(shard_dir: str, pid: int):
    """Factorized (local, remote) halves of one locality shard.

    The factorized arrays are *compiled once* per shard into raw ``.npy``
    files (atomic rename) and loaded with ``np.load(mmap_mode="r")`` — every
    worker on the machine then shares ONE page-cached copy, and a task
    landing on a worker that never saw this pid costs microseconds instead
    of a parquet read + two factorizations (~1 core-second; Spark assigns
    tasks to workers arbitrarily, so per-worker private caches re-paid that
    constantly). The small in-process cache only avoids re-opening files.

    When ``shard_dir`` is an object-store URI the compiled files land in a
    NODE-LOCAL cache directory (keyed by the URI hash) — each machine pulls
    the parquet shard once via pyarrow's FileSystem, compiles into local
    storage, and mmaps from there; exactly the node-local NVMe cache of
    remote shards a real cluster wants.
    """
    key = (shard_dir, pid, "split")
    for stale in [k for k in _SHARD_CACHE if k[0] != shard_dir]:
        del _SHARD_CACHE[stale]
    import hashlib
    import os
    import tempfile

    if "://" in shard_dir:
        from pyarrow import fs as pafs

        filesystem, base = pafs.FileSystem.from_uri(shard_dir)
        remote_path = f"{base}/pid={pid}"
        if filesystem.get_file_info(remote_path).type == pafs.FileType.NotFound:
            _SHARD_CACHE[key] = None
            return None
        cache_root = os.path.join(
            os.environ.get("TWSPARK_SHARD_CACHE", tempfile.gettempdir()),
            "twspark_shard_cache",
            hashlib.md5(shard_dir.encode()).hexdigest(),
        )
        cdir = os.path.join(cache_root, f"pid={pid}", "_compiled_v2")
        read_path, read_fs = remote_path, filesystem
    else:
        path = os.path.join(shard_dir, f"pid={pid}")
        if not os.path.isdir(path):
            _SHARD_CACHE[key] = None
            return None
        cdir = os.path.join(path, "_compiled_v2")
        read_path, read_fs = path, None

    cached = _SHARD_CACHE.get(key)
    if cached is not None and cached[0] == compiled_generation(cdir):
        # generation-checked hit: a rmtree+recompile under the same path
        # (shard rewrite for different weight semantics) republishes _OK
        # with a fresh inode, so a long-lived worker never serves the old
        # mmap arrays for a rewritten shard
        return cached[1]
    if not os.path.exists(os.path.join(cdir, "_OK")):
        _compile_shard_split(read_path, cdir, filesystem=read_fs)
    entry = {}
    for half in ("local", "remote"):
        if not os.path.exists(os.path.join(cdir, f"{half}_p.npy")):
            entry[half] = None
            continue
        arrs = tuple(
            np.load(os.path.join(cdir, f"{half}_{name}.npy"), mmap_mode="r")
            for name in _SPLIT_ARRAYS
        )
        entry[half] = arrs
    _SHARD_CACHE[key] = (compiled_generation(cdir), entry)
    return entry


def _compile_shard_split(path: str, cdir: str, filesystem=None) -> None:
    """One-time factorization of a locality shard into mmap-able npy files.

    ``filesystem`` (pyarrow FileSystem) reads the parquet from a remote
    store; the compiled output is always a LOCAL directory (mmap needs it).
    """
    import os
    import tempfile

    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["src", "dst", "p", "is_local"], filesystem=filesystem)
    mask = tbl.column("is_local").to_numpy()
    os.makedirs(os.path.dirname(cdir), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(cdir), prefix="_compile_")
    for half, sub in (("local", tbl.filter(mask)), ("remote", tbl.filter(~mask))):
        if sub.num_rows == 0:
            continue
        arrs = _factorize_shard(sub)
        for name, arr in zip(_SPLIT_ARRAYS, arrs):
            if name.endswith("_codes"):
                # per-shard code space is far below 2^31 — int32 codes cut
                # the per-superstep shard-scan bytes (the DRAM-bandwidth
                # floor of the gather) by a third
                arr = arr.astype(np.int32)
            np.save(os.path.join(tmp, f"{half}_{name}.npy"), np.ascontiguousarray(arr))
    open(os.path.join(tmp, "_OK"), "w").close()
    try:
        os.replace(tmp, cdir)  # atomic publish; concurrent compilers race benignly
    except OSError:
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)


def csr_remote_gather(state: DataFrame, shard_dir: str) -> DataFrame:
    """Pass A of the locality superstep: contributions along REMOTE edges
    only — ``(dst, c)``, pre-reduced per shard. On a transcript graph this is
    a few rows per shard (the tool hubs), so the downstream groupBy+broadcast
    is negligible."""

    def gather(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pid = int(pdfs[0]["pid"].iloc[0])
        shard = _load_shard_split(shard_dir, pid)
        if shard is None or shard["remote"] is None:
            return
        src_codes, src_uniq, dst_codes, dst_uniq, p = shard["remote"]
        ranks = pd.concat(pdfs, ignore_index=True)
        aligned = (
            pd.Series(ranks["rank"].to_numpy(), index=ranks["vid"].to_numpy())
            .reindex(src_uniq)
            .to_numpy()
        )
        if np.isnan(aligned).any():
            missing = int(np.isnan(aligned).sum())
            raise RuntimeError(
                f"csr_remote_gather misalignment: {missing} shard srcs missing "
                f"from state partition {pid} — state is not partitioned by the "
                "home key the shards were written with"
            )
        contrib = p * aligned[src_codes]
        sums = np.bincount(dst_codes, weights=contrib, minlength=len(dst_uniq))
        yield pd.DataFrame({"dst": dst_uniq, "c": sums})

    with_pid = state.select(F.spark_partition_id().alias("pid"), "vid", "rank")
    partials = with_pid.mapInPandas(gather, schema="dst long, c double")
    return partials.groupBy("dst").agg(F.sum("c").alias("c"))


def local_gather_sums(pdf_vids: np.ndarray, pdf_ranks: np.ndarray, shard, pid: int) -> np.ndarray:
    """Pass-B kernel: local-edge contributions per vid of this partition.

    Pure NumPy; raises loudly on misalignment (a local edge endpoint missing
    from the partition means the home-partitioning contract is broken).
    """
    if shard is None or shard["local"] is None:
        return np.zeros(len(pdf_vids))
    src_codes, src_uniq, dst_codes, dst_uniq, p = shard["local"]
    idx = pd.Series(pdf_ranks, index=pdf_vids)
    aligned_src = idx.reindex(src_uniq).to_numpy()
    if np.isnan(aligned_src).any():
        raise RuntimeError(f"local_gather: srcs missing from partition {pid}")
    per_dst = np.bincount(dst_codes, weights=p * aligned_src[src_codes], minlength=len(dst_uniq))
    pos = pd.Series(np.arange(len(pdf_vids)), index=pdf_vids).reindex(dst_uniq).to_numpy()
    if np.isnan(pos).any():
        raise RuntimeError(f"local_gather: dsts missing from partition {pid}")
    out = np.zeros(len(pdf_vids))
    np.add.at(out, pos.astype(np.int64), per_dst)
    return out


def scatter_gather(
    pe: PartitionedEdges,
    state: DataFrame,
    contrib: F.Column,
    *,
    agg: str = "sum",
    mode: str = "arrow",
) -> DataFrame:
    """One superstep's ``edges ⋈ state → groupBy(dst).agg(contrib)``.

    ``state`` must expose ``vid`` plus the columns ``contrib`` references.
    ``contrib`` is a Column over the joined (edge payload × state) row, e.g.
    ``F.col("p") * F.col("rank")`` for PageRank, ``F.col("label")`` for
    min-label propagation. Returns ``(dst, c)``.

    ``mode="arrow"`` inserts the NumPy partial aggregation (``mapInPandas``)
    before the shuffle; ``mode="sql"`` relies on Catalyst's hash-aggregate
    alone — both produce identical results (float64 addition is
    associative-enough at the 1e-6 bar; the oracle tolerance covers
    reordering, and min is exactly associative).
    """
    if agg not in ("sum", "min"):
        raise ValueError(f"agg must be 'sum' or 'min', got {agg!r}")
    scattered = scatter_join(pe, state, [F.col("dst"), contrib.alias("c")])
    if mode == "arrow":
        ctype = "double" if agg == "sum" else "long"
        scattered = scattered.mapInPandas(_arrow_partial(agg), schema=f"dst long, c {ctype}")
    elif mode != "sql":
        raise ValueError(f"mode must be 'arrow' or 'sql', got {mode!r}")
    agg_col = F.sum("c") if agg == "sum" else F.min("c")
    return scattered.groupBy("dst").agg(agg_col.alias("c"))
