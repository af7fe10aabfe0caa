"""Label propagation in conversation-locality (file-superstep) mode.

Same engine shape as local-mode PageRank/CC (``pagerank.py``,
``cc_local.py``): int64 label segments hash-partitioned by home, one
DataFrame job per superstep, NumPy/pandas kernels against mmap-compiled
per-edge alignments, durable per-superstep checkpoints, driver-merged hub
exchange. What differs is the vote semantics (must match ``lpa.py``
EXACTLY — synchronous, weighted, max-votes-then-min-label):

* every superstep builds ONE vote pool per partition — local symmetric
  edges (labels from the previous segment) concatenated with hub→local
  votes (hub labels of the previous superstep via the params file) — and
  resolves it with a single hash groupby + stable sort, so each vertex's
  winner sees ALL its votes in one summation;
* votes ON a hub aggregate across partitions — and UNLIKE PageRank/CC's
  per-hub scalar exchange, hub votes are ``(hub × label)``-cardinality
  (≈ one triple per remote edge while labels are still distinct), so they
  must NEVER flow through the driver OR through a row-oriented shuffle.
  The exchange is file supersteps all the way down: each task writes its
  raw vote triples into P hub-sliced binary segments (slot = hub-index
  mod P, superstep-stamped, atomic publish), and a second tiny job's task
  j reads slice j of every partition's segment, resolves winners with one
  pandas groupby + stable sort (exactly ``lpa.py``'s total order), and
  returns only the ≤ #hubs winner rows to the driver. Nothing edge-sized
  crosses Arrow, the JVM, or a Spark shuffle. Crucially the partition
  OWNING a hub reports that hub's COMPLETE incident-vote multiset share:
  its local-edge votes AND the gather-direction votes of its own remote
  edges (see ``_votes_on_hubs``) — a missed vote would silently flip a
  winner and diverge from the DataFrame path;
* strict synchrony is preserved: labels_k are computed from labels_{k-1}
  everywhere; hub labels for superstep k were decided by votes reported out
  of superstep k-1. Init is two-phase — the first job writes labels_0 and
  surfaces the hub universe (remote dst ids), the second replays the vote
  report from labels_0 with that universe known — so superstep 1's winners
  include owner-local votes too.

Float caveat: hub vote sums reduce per winner-slot via one pandas groupby
over partition-ordered triples, the DataFrame path reduces through Spark
partial aggregation — both are float64 sums, but the grouping differs, so
a *fractional*-weight graph whose top-two vote sums differ by < 1 ulp
could tie-break differently. Integer-valued weights (this engine's
transcript graphs) are exact.
"""

from __future__ import annotations

import os
import zlib
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources import fsio
from ..sources.catalog import CheckpointStore
from .runner import GraphRun
from .scatter import (
    _load_shard_split,
    compiled_generation,
    purge_shard_dir,
    write_edge_shards_local,
)
from .pagerank import (
    _read_rank_part,
    _read_state_part,
    _state_dir,
    _static_dir,
    _write_rank_part,
    _write_state_part,
)

__all__ = ["lpa_local_files"]

_LPA_SCHEMA = "pid int, n_rows long, checksum long, changed long, h long"

_LPA_OPT = ("l_to", "l_from", "l_w", "r_src_pos", "r_hubcode", "r_w", "r_dst_uniq")

_LPA_CACHE: dict = {}


def _lpa_cdir(static_dir: str, pid: int) -> str:
    if fsio.is_uri(static_dir):
        import hashlib
        import tempfile as _tf

        root = os.path.join(
            os.environ.get("TWSPARK_SHARD_CACHE", _tf.gettempdir()),
            "twspark_shard_cache",
            hashlib.md5(static_dir.encode()).hexdigest(),
        )
        return os.path.join(root, f"lpaalign-{pid:05d}-v1")
    return os.path.join(static_dir, f"lpaalign-{pid:05d}-v1")


def _compile_lpa_aligned(static_dir: str, sd: str, pid: int, cdir: str) -> bool:
    """One-time LPA alignment compile: symmetric local (to, from, w) triples
    and remote (src_pos, hub_code, w) triples, self-loops dropped (matching
    ``lpa.symmetrize``'s ``src != dst`` filter)."""
    import tempfile as _tf

    st = _read_state_part(static_dir, pid, columns=["vid"])
    if st is None:
        return False
    shard = _load_shard_split(sd, pid)
    vids = st.column("vid").to_numpy()
    idx = pd.Series(np.arange(len(vids), dtype=np.int64), index=vids)
    out: dict[str, np.ndarray] = {
        "vids": vids,
        "crc": np.array([zlib.crc32(np.ascontiguousarray(vids).tobytes())], dtype=np.int64),
    }
    if shard is not None and shard["local"] is not None:
        src_codes, src_uniq, dst_codes, dst_uniq, w = shard["local"]
        spos = idx.reindex(np.asarray(src_uniq)).to_numpy()
        dpos = idx.reindex(np.asarray(dst_uniq)).to_numpy()
        if np.isnan(spos).any() or np.isnan(dpos).any():
            raise RuntimeError(f"lpa local misalignment: endpoints missing from partition {pid}")
        e_src = spos.astype(np.int32)[np.asarray(src_codes)]
        e_dst = dpos.astype(np.int32)[np.asarray(dst_codes)]
        w = np.asarray(w, dtype=np.float64)
        keep = e_src != e_dst  # no self-votes
        e_src, e_dst, w = e_src[keep], e_dst[keep], w[keep]
        if len(e_src):
            out["l_to"] = np.concatenate([e_dst, e_src])
            out["l_from"] = np.concatenate([e_src, e_dst])
            out["l_w"] = np.concatenate([w, w])
    if shard is not None and shard["remote"] is not None:
        src_codes, src_uniq, dst_codes, dst_uniq, w = shard["remote"]
        spos = idx.reindex(np.asarray(src_uniq)).to_numpy()
        if np.isnan(spos).any():
            raise RuntimeError(f"lpa remote misalignment: srcs missing from partition {pid}")
        out["r_src_pos"] = spos.astype(np.int32)[np.asarray(src_codes)]
        out["r_hubcode"] = np.asarray(dst_codes, dtype=np.int32)
        out["r_w"] = np.asarray(w, dtype=np.float64)
        out["r_dst_uniq"] = np.asarray(dst_uniq)
    os.makedirs(os.path.dirname(cdir), exist_ok=True)
    tmp = _tf.mkdtemp(dir=os.path.dirname(cdir), prefix="_lpaalign_")
    for name, arr in out.items():
        np.save(os.path.join(tmp, f"{name}.npy"), np.ascontiguousarray(arr))
    open(os.path.join(tmp, "_OK"), "w").close()
    try:
        os.replace(tmp, cdir)
    except OSError:
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
    return True


def _load_lpa_aligned(static_dir: str, sd: str, pid: int):
    key = (static_dir, pid)
    cdir = _lpa_cdir(static_dir, pid)
    cached = _LPA_CACHE.get(key)
    if cached is not None and cached[0] == compiled_generation(cdir):
        # generation-checked hit: init's rmtree+recompile republishes _OK
        # with a fresh inode, so a stale mmap is never served
        return cached[1]
    for stale in [k for k in _LPA_CACHE if k[0] != static_dir]:
        del _LPA_CACHE[stale]
    if not os.path.exists(os.path.join(cdir, "_OK")):
        if not _compile_lpa_aligned(static_dir, sd, pid, cdir):
            return None
    ent = {
        "vids": np.load(os.path.join(cdir, "vids.npy"), mmap_mode="r"),
        "crc": int(np.load(os.path.join(cdir, "crc.npy"))[0]),
    }
    for name in _LPA_OPT:
        path = os.path.join(cdir, f"{name}.npy")
        ent[name] = np.load(path, mmap_mode="r") if os.path.exists(path) else None
    _LPA_CACHE[key] = (compiled_generation(cdir), ent)
    return ent


def _winners(to: np.ndarray, lab: np.ndarray, w: np.ndarray):
    """(positions, labels) of per-vertex vote winners: max Σw, then min label
    — the exact total order of ``lpa.py``'s row_number window."""
    df = pd.DataFrame({"t": to, "l": lab, "w": w})
    g = df.groupby(["t", "l"], sort=False, as_index=False)["w"].sum()
    g = g.sort_values(["t", "w", "l"], ascending=[True, False, True], kind="stable")
    win = g.drop_duplicates("t")
    return win["t"].to_numpy(), win["l"].to_numpy()


def _votes_on_hubs(lab_now, al, rvids, hub_lab_now):
    """This partition's COMPLETE share of the vote multiset on hub vertices,
    as parallel (hub_idx, hub_vid, label, w) array lists:

    1. scatter: every remote edge's src label votes on its dst hub;
    2. owner-local: local (compile-time-symmetrized) edges incident to a
       hub this partition owns vote with their far end's label;
    3. gather-direction: a remote edge whose SRC is itself a hub receives
       the dst hub's label as a vote on that src — the reverse orientation
       of (1). ``lpa.py`` symmetrizes so vote(u, v) sums BOTH directed
       weights of a cross-partition pair; without this case each hub's
       winner saw only the weight of edges pointing AT it, silently
       diverging whenever a pair has directed edges in both orientations
       with unequal weights.

    Every remote edge thus contributes exactly one vote on its dst (1) and,
    iff its src is a hub, exactly one vote on its src (3); the opposite
    directed edge of the same pair lives in the OTHER endpoint's shard and
    contributes the mirror votes there — together they reproduce
    ``lpa.symmetrize``'s summed weights with no double count.
    """
    vids = al["vids"]
    hidx_p, h_p, l_p, w_p = [], [], [], []
    if not len(rvids):
        return hidx_p, h_p, l_p, w_p
    if al["r_src_pos"] is not None:
        r_w = np.asarray(al["r_w"], dtype=np.float64)
        uniq_hidx = np.searchsorted(rvids, al["r_dst_uniq"])
        uniq_hidx = np.minimum(uniq_hidx, len(rvids) - 1)
        if not np.asarray(rvids[uniq_hidx] == al["r_dst_uniq"]).all():
            raise RuntimeError("lpa vote report: remote dst missing from hub universe")
        hidx1 = uniq_hidx[np.asarray(al["r_hubcode"])]
        hidx_p.append(hidx1)
        h_p.append(np.asarray(rvids)[hidx1])
        l_p.append(lab_now[np.asarray(al["r_src_pos"])])
        w_p.append(r_w)
        src_vid = np.asarray(vids)[np.asarray(al["r_src_pos"])]
        sp = np.searchsorted(rvids, src_vid)
        sp = np.minimum(sp, len(rvids) - 1)
        hit = np.asarray(rvids[sp] == src_vid)
        if hit.any():
            hidx_p.append(sp[hit])
            h_p.append(src_vid[hit])
            l_p.append(np.asarray(hub_lab_now)[hidx1[hit]])
            w_p.append(r_w[hit])
    own_pos = np.searchsorted(vids, rvids)
    own_pos = np.minimum(own_pos, len(vids) - 1)
    own_hit = np.asarray(vids[own_pos] == rvids)
    if own_hit.any() and al["l_to"] is not None:
        flag = np.zeros(len(vids), dtype=bool)
        flag[own_pos[own_hit]] = True
        l_to = np.asarray(al["l_to"])
        sel = flag[l_to]
        if sel.any():
            hvid = np.asarray(vids)[l_to[sel]]
            hidx_p.append(np.searchsorted(rvids, hvid))
            h_p.append(hvid)
            l_p.append(lab_now[np.asarray(al["l_from"])[sel]])
            w_p.append(np.asarray(al["l_w"])[sel].astype(np.float64))
    return hidx_p, h_p, l_p, w_p


# -----------------------------------------------------------------------------
# Hub-sliced vote segments: the file-superstep exchange for (hub × label)
# -----------------------------------------------------------------------------
#
# Layout: one binary file per (writer pid i, winner slot j), header
# [superstep, n] int64 then h[n] int64, l[n] int64, w[n] float64. A vote on
# hub rvids[idx] goes to slot idx % P. Every writer publishes ALL P slot
# files (empty included) atomically — existence is the winner job's
# completeness proof, the superstep stamp its freshness proof. On tmpfs the
# whole exchange runs at memcpy speed; on object-store roots each file is
# one PUT/GET. This replaces the previous in-Spark groupBy+window over a
# localCheckpoint-ed ~|remote-edge|-row relation, which was the measured
# 40× throughput floor of the kernel (round-4 verdict): the vote bytes now
# never cross Arrow, the JVM, or a shuffle.


def _vote_path(vdir: str, i: int, j: int) -> str:
    return os.path.join(vdir, f"v-{i:05d}-{j:05d}.bin")


def _write_vote_files(vdir: str, pid: int, P: int, k: int, hidx, h, l, w) -> None:
    if len(h):
        j_all = hidx % P
        order = np.argsort(j_all, kind="stable")
        j_sorted = j_all[order]
        h, l, w = h[order], l[order], np.asarray(w, dtype=np.float64)[order]
        bounds = np.searchsorted(j_sorted, np.arange(P + 1))
    else:
        h = l = np.empty(0, dtype=np.int64)
        w = np.empty(0, dtype=np.float64)
        bounds = np.zeros(P + 1, dtype=np.int64)
    uri = fsio.is_uri(vdir)
    if not uri:
        os.makedirs(vdir, exist_ok=True)
    for j in range(P):
        a, b = int(bounds[j]), int(bounds[j + 1])
        head = np.asarray([k, b - a], dtype=np.int64)
        hj = np.ascontiguousarray(h[a:b], dtype=np.int64)
        lj = np.ascontiguousarray(l[a:b], dtype=np.int64)
        wj = np.ascontiguousarray(w[a:b])
        path = _vote_path(vdir, pid, j)
        if uri:
            fsio.write_bytes(path, head.tobytes() + hj.tobytes() + lj.tobytes() + wj.tobytes())
            continue
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            head.tofile(f)
            hj.tofile(f)
            lj.tofile(f)
            wj.tofile(f)
        os.replace(tmp, path)


def _read_vote_file(vdir: str, i: int, j: int, expect_k: int):
    path = _vote_path(vdir, i, j)
    if fsio.is_uri(vdir):
        data = fsio.read_bytes(path)
        if data is None:
            raise RuntimeError(
                f"lpa vote exchange incomplete: segment ({i},{j}) missing for superstep {expect_k}"
            )
        head = np.frombuffer(data[:16], dtype=np.int64)
        k, n = int(head[0]), int(head[1])
        if k != expect_k:
            raise RuntimeError(
                f"lpa vote segment ({i},{j}) is stale: superstep {k}, expected {expect_k}"
            )
        off = 16
        h = np.frombuffer(data[off : off + 8 * n], dtype=np.int64)
        l = np.frombuffer(data[off + 8 * n : off + 16 * n], dtype=np.int64)
        w = np.frombuffer(data[off + 16 * n : off + 24 * n], dtype=np.float64)
        return h, l, w
    if not os.path.exists(path):
        raise RuntimeError(
            f"lpa vote exchange incomplete: segment ({i},{j}) missing for superstep {expect_k}"
        )
    with open(path, "rb") as f:
        head = np.fromfile(f, dtype=np.int64, count=2)
        k, n = int(head[0]), int(head[1])
        if k != expect_k:
            raise RuntimeError(
                f"lpa vote segment ({i},{j}) is stale: superstep {k}, expected {expect_k}"
            )
        h = np.fromfile(f, dtype=np.int64, count=n)
        l = np.fromfile(f, dtype=np.int64, count=n)
        w = np.fromfile(f, dtype=np.float64, count=n)
    return h, l, w


def _apply_lpa_kernel(labels, al, rvids, hub_prev, hub_new):
    """One synchronous LPA step for one partition: returns ``(out, changed)``."""
    vids = al["vids"]
    out = labels.copy()
    pool_t, pool_l, pool_w = [], [], []
    if al["l_to"] is not None:
        pool_t.append(np.asarray(al["l_to"]))
        pool_l.append(labels[al["l_from"]])
        pool_w.append(np.asarray(al["l_w"]))
    if al["r_src_pos"] is not None and len(rvids):
        hub_idx = np.searchsorted(rvids, al["r_dst_uniq"])
        hub_idx = np.minimum(hub_idx, len(rvids) - 1)
        ok = np.asarray(rvids[hub_idx] == al["r_dst_uniq"])
        if not ok.all():
            raise RuntimeError("lpa hub relay missing labels for some remote dsts")
        uniq_prev = hub_prev[hub_idx]
        pool_t.append(np.asarray(al["r_src_pos"]))
        pool_l.append(uniq_prev[al["r_hubcode"]])
        pool_w.append(np.asarray(al["r_w"]))
    if pool_t:
        tpos, tlab = _winners(
            np.concatenate(pool_t), np.concatenate(pool_l), np.concatenate(pool_w)
        )
        out[tpos] = tlab
    if len(rvids):
        own_pos = np.searchsorted(vids, rvids)
        own_pos = np.minimum(own_pos, len(vids) - 1)
        own_hit = np.asarray(vids[own_pos] == rvids)
        if own_hit.any():
            # the winner-job verdict (complete vote multiset) overrides any
            # partial local argmax on an owned hub
            out[own_pos[own_hit]] = hub_new[own_hit]
    changed = int(np.count_nonzero(out != labels))
    return out, changed


def lpa_local_files(
    edges: DataFrame,
    *,
    max_iter: int,
    store: CheckpointStore,
    run_id: str,
    resume: bool,
    num_partitions: int,
) -> GraphRun:
    """Synchronous LPA over home-keyed weighted edges, file supersteps."""
    spark = edges.sparkSession
    _aqe_key = "spark.sql.adaptive.enabled"
    _old_aqe = spark.conf.get(_aqe_key, "true")
    spark.conf.set(_aqe_key, "false")
    try:
        return _lpa_local_files_inner(
            edges, max_iter=max_iter, store=store, run_id=run_id,
            resume=resume, num_partitions=num_partitions,
        )
    finally:
        spark.conf.set(_aqe_key, _old_aqe)


def _lpa_local_files_inner(
    edges: DataFrame,
    *,
    max_iter: int,
    store: CheckpointStore,
    run_id: str,
    resume: bool,
    num_partitions: int,
) -> GraphRun:
    import time as _time

    spark = edges.sparkSession
    P = num_partitions

    shard_dir = os.path.join(store.root, run_id, f"_edge_shards_p{P}")
    static_dir = _static_dir(store, run_id, P)
    static_meta = os.path.join(static_dir, "_META.json")
    vertices = None
    meta = fsio.read_json(static_meta) if fsio.exists(os.path.join(shard_dir, "_DONE")) else None
    # the warm gate needs RAW summed weights in the shard p slot ("raw",
    # legacy marker raw_w) — a dir previously warmed by PageRank holds
    # normalized probabilities and CC constant 1.0, and silently voting
    # with those would mislabel every community
    _w = (meta or {}).get("weights", "raw" if (meta or {}).get("raw_w") else None)
    if meta is not None and meta.get("sorted") and _w == "raw":
        n, num_edges = int(meta["n"]), int(meta["num_edges"])
    else:
        if fsio.exists(os.path.join(shard_dir, "_DONE")):
            purge_shard_dir(shard_dir)
            purge_shard_dir(static_dir)
        # vote weight of u on v = Σ weight over DIRECTED (u,v) rows; the
        # symmetric doubling happens at alignment-compile time, so one
        # groupBy here matches lpa.symmetrize's sum exactly
        e = edges.groupBy("src", "dst").agg(
            F.sum("weight").alias("p"),  # RAW weight in the shard's p slot
            F.first("src_home").alias("src_home"),
            F.first("dst_home").alias("dst_home"),
        )
        if not fsio.exists(os.path.join(shard_dir, "_DONE")):
            write_edge_shards_local(
                e.select("src", "dst", "p", "src_home", "dst_home"), shard_dir, P
            )
            fsio.touch(os.path.join(shard_dir, "_DONE"))
        num_edges = e.count()
        vertices = (
            e.select(F.col("src").alias("vid"), F.col("src_home").alias("home"))
            .unionByName(e.select(F.col("dst").alias("vid"), F.col("dst_home").alias("home")))
            .groupBy("vid")
            .agg(F.min("home").alias("home"))
        )
        n = vertices.count()
    if n == 0:
        raise ValueError("label_propagation: empty edge set")

    master = spark.sparkContext.master
    if master.startswith("local[") and "*" not in master:
        n_slots = int(master[len("local["):-1])
    else:
        n_slots = spark.sparkContext.defaultParallelism
    n_tasks = min(P, max(1, n_slots))
    pids = spark.range(P, numPartitions=n_tasks).select(F.col("id").cast("int").alias("pid"))
    sd = shard_dir
    vote_dir = os.path.join(store.root, run_id, "_lpa_votes")
    history: list[dict[str, Any]] = []
    carry: dict[str, Any] = {}
    resumed_from: int | None = None
    start = 0

    def _split_rows(rows: list) -> tuple[list[dict], list[dict]]:
        metrics_rows, hub_rows = [], []
        for r in rows:
            d_ = r.asDict()
            (metrics_rows if d_["pid"] is not None else hub_rows).append(d_)
        return metrics_rows, hub_rows

    def _combine(rows: list[dict], k: int) -> tuple[dict, list[dict], bool]:
        if not rows:
            raise RuntimeError(
                f"lpa superstep {k}: no partition emitted metrics — state files "
                "missing or partitioning mismatch in the run directory"
            )
        covered = sum(r["n_rows"] for r in rows)
        if covered != n:
            raise RuntimeError(
                f"lpa superstep {k}: tasks covered {covered} of {n} vertices — "
                "state/shard partitioning mismatch"
            )
        changed = sum(r["changed"] for r in rows)
        metrics = {
            "kernel": "label_propagation",
            "changed": changed,
            "active_vertices": changed,
            "edges_processed": num_edges,
            "n_vertices": n,
        }
        lineage = [
            {"partition_id": r["pid"], "n_rows": r["n_rows"], "checksum": r["checksum"]}
            for r in rows
        ]
        return metrics, lineage, k > 0 and changed == 0

    def _state_df(k: int) -> DataFrame:
        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for pid in pdf["pid"].to_numpy():
                    st = _read_state_part(static_dir, int(pid))
                    lb = _read_rank_part(_state_dir(store, run_id, k), int(pid), dtype=np.int64)
                    if st is None or lb is None:
                        continue
                    yield pd.DataFrame(
                        {
                            "vid": st.column("vid").to_numpy(),
                            "home": st.column("home").to_numpy(),
                            "label": lb,
                        }
                    )

        return pids.mapInPandas(build, schema="vid long, home long, label long")

    if resume:
        latest = store.latest(run_id)
        if latest is not None:
            man = store.manifest(run_id, latest)
            carry = man["carry"]
            man_p = int(carry.get("P", -1))
            if man_p != P:
                raise RuntimeError(
                    f"cannot resume local-mode lpa run {run_id!r}: committed under "
                    f"{man_p} shuffle partitions, session has {P} — restart "
                    "with the original partition count or a fresh run_id"
                )
            history = store.metrics_history(run_id)
            resumed_from = latest
            if carry.get("_converged") or latest >= max_iter:
                return GraphRun(_state_df(latest), run_id, latest,
                                bool(carry.get("_converged")), history, resumed_from)
            start = latest + 1
    if resumed_from is None and not resume:
        store.clear_run(run_id)

    params_path = os.path.join(store.root, run_id, "_lpa_superstep_params.json")
    update_df = pids.mapInPandas(_make_pass(static_dir, sd, store, run_id), schema=_LPA_SCHEMA)
    winner_df = pids.mapInPandas(_make_winner_task(store, run_id), schema="h long, l long")

    def _collect_winners(k: int, hubs: list[int]) -> dict[int, int]:
        if not hubs:
            return {}
        return {int(r["h"]): int(r["l"]) for r in winner_df.collect()}

    if start == 0:
        t0 = _time.monotonic()
        sdir0 = _state_dir(store, run_id, 0)

        def write_init(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow as pa

            pdfs = [b for b in batches if len(b)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            pid = int(pdf["pid"].iloc[0])
            vids = np.sort(pdf["vid"].to_numpy())
            homes = pdf.sort_values("vid")["home"].to_numpy()
            import shutil as _sh

            _sh.rmtree(_lpa_cdir(static_dir, pid), ignore_errors=True)
            _write_state_part(
                static_dir,
                pid,
                pa.table({"vid": pa.array(vids, pa.int64()),
                          "home": pa.array(homes, pa.int64())}),
            )
            labels = vids.copy()
            _write_rank_part(sdir0, pid, labels, None)
            yield pd.DataFrame([{
                "pid": pid, "n_rows": int(len(vids)),
                "checksum": int(zlib.crc32(np.ascontiguousarray(vids).tobytes())
                                ^ zlib.crc32(np.ascontiguousarray(labels).tobytes())),
                "changed": 0, "h": None,
            }])
            # phase 0a surfaces only the hub UNIVERSE (remote dst ids, tiny);
            # the vote replay happens in phase 0b once every partition knows it
            al = _load_lpa_aligned(static_dir, sd, pid)
            if al is not None and al["r_dst_uniq"] is not None:
                hubs = np.asarray(al["r_dst_uniq"])
                yield pd.DataFrame({
                    "h": hubs, "pid": None, "n_rows": None, "checksum": None,
                    "changed": None,
                })[["pid", "n_rows", "checksum", "changed", "h"]]

        def init_warm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            macc: list[dict] = []
            for pdf in batches:
                for pid in pdf["pid"].to_numpy():
                    pid = int(pid)
                    st = _read_state_part(static_dir, pid, columns=["vid"])
                    if st is None:
                        continue
                    vids = st.column("vid").to_numpy()
                    labels = vids.copy()
                    _write_rank_part(sdir0, pid, labels, None)
                    macc.append({
                        "pid": pid, "n_rows": int(len(vids)),
                        "checksum": int(zlib.crc32(np.ascontiguousarray(vids).tobytes())
                                        ^ zlib.crc32(np.ascontiguousarray(labels).tobytes())),
                        "changed": 0, "h": None,
                    })
                    al = _load_lpa_aligned(static_dir, sd, pid)
                    if al is not None and al["r_dst_uniq"] is not None:
                        hubs = np.asarray(al["r_dst_uniq"])
                        yield pd.DataFrame({
                            "h": hubs, "pid": None, "n_rows": None, "checksum": None,
                            "changed": None,
                        })[["pid", "n_rows", "checksum", "changed", "h"]]
            if macc:
                yield pd.DataFrame(macc)

        if vertices is not None:
            init = vertices.repartition(P, "home")
            rows = (
                init.select(F.spark_partition_id().alias("pid"), "vid", "home")
                .mapInPandas(write_init, schema=_LPA_SCHEMA)
                .collect()
            )
            fsio.write_json_atomic(
                static_meta,
                {"n": n, "num_edges": num_edges, "P": P, "sorted": True,
                 "raw_w": True, "weights": "raw"},
            )
        else:
            rows = pids.mapInPandas(init_warm, schema=_LPA_SCHEMA).collect()
        metrics_rows, hub_rows = _split_rows(rows)
        metrics, lineage, _ = _combine(metrics_rows, 0)
        rvids0 = sorted({int(r["h"]) for r in hub_rows})
        # phase 0b: replay the vote report from labels_0 with the hub
        # universe known, winners decided by the slot job — superstep 1's
        # hub labels include owner-local votes too
        fsio.write_json_atomic(
            params_path,
            {"mode": "report0", "prev_dir": sdir0, "rvids": rvids0,
             "vote_dir": vote_dir, "P": P, "superstep": 0},
        )
        if rvids0:
            update_df.collect()  # writes the hub-sliced vote segments
        winners = _collect_winners(0, rvids0)
        carry = {
            # hub_prev at superstep 1 = the hubs' INITIAL labels (their vid)
            "hub_prev": {str(h): h for h in rvids0},
            "hub_new": {str(h): winners.get(h, h) for h in rvids0},
            "P": P,
        }
        metrics.update(superstep=0, wall_ms=round(1000 * (_time.monotonic() - t0), 1))
        store.finalize(run_id, 0, lineage, metrics, carry)
        history.append(metrics)
        start = 1

    converged = bool(carry.get("_converged"))
    last = start - 1

    for k in range(start, max_iter + 1):
        t0 = _time.monotonic()
        hub_prev_d = {int(h): int(v) for h, v in carry.get("hub_prev", {}).items()}
        hub_new_d = {int(h): int(v) for h, v in carry.get("hub_new", {}).items()}
        hubs = sorted(hub_new_d)
        fsio.write_json_atomic(
            params_path,
            {
                "superstep": k,
                "prev_dir": _state_dir(store, run_id, k - 1),
                "next_dir": _state_dir(store, run_id, k),
                "recycle_dir": _state_dir(store, run_id, k - 2) if k >= 2 else None,
                "rvids": hubs,
                "hub_prev": [hub_prev_d.get(h, h) for h in hubs],
                "hub_new": [hub_new_d[h] for h in hubs],
                "vote_dir": vote_dir,
                "P": P,
            },
        )
        # job 1 — the fused pass: apply the kernel, write label segments,
        # publish hub-sliced vote segments; only P metrics rows come back.
        # job 2 — the winner job: per slot, read every partition's slice,
        # one groupby+stable-sort, return ≤ #hubs winner rows.
        metrics_rows = [r.asDict() for r in update_df.collect()]
        metrics, lineage, converged = _combine(metrics_rows, k)
        winners = _collect_winners(k, hubs)
        carry = {
            # next superstep's "previous" hub labels are the ones just written
            "hub_prev": {str(h): v for h, v in hub_new_d.items()},
            "hub_new": {str(h): winners.get(h, hub_new_d.get(h, h)) for h in hubs},
            "_converged": converged,
            "P": P,
        }
        metrics.update(superstep=k, wall_ms=round(1000 * (_time.monotonic() - t0), 1))
        store.finalize(run_id, k, lineage, metrics, carry)
        if k >= 2 and fsio.is_uri(store.root):
            fsio.rmtree(_state_dir(store, run_id, k - 2))
        history.append(metrics)
        last = k
        if converged:
            break

    if fsio.is_uri(store.root):
        fsio.rmtree(vote_dir)  # transient exchange; superstep state is the checkpoint

    return GraphRun(_state_df(last), run_id, last, converged, history, resumed_from)


def _make_pass(static_dir: str, sd: str, store: CheckpointStore, run_id: str):
    """The per-superstep fused task: full update (default) or the phase-0b
    vote replay (mode=report0). Params travel via a tiny JSON file so the
    DataFrame is analyzed once and re-executed every superstep."""
    params_path = os.path.join(store.root, run_id, "_lpa_superstep_params.json")

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prm = fsio.read_json(params_path)
        report_only = prm.get("mode") == "report0"
        prev_dir = prm["prev_dir"]
        rvids = np.asarray(prm["rvids"], dtype=np.int64)
        vdir, P, kk = prm["vote_dir"], int(prm["P"]), int(prm["superstep"])
        if not report_only:
            next_dir, recycle_dir = prm["next_dir"], prm["recycle_dir"]
            hub_prev = np.asarray(prm["hub_prev"], dtype=np.int64)
            hub_new = np.asarray(prm["hub_new"], dtype=np.int64)
        macc: list[dict] = []
        for pdf in batches:
            for pid in pdf["pid"].to_numpy():
                pid = int(pid)
                al = _load_lpa_aligned(static_dir, sd, pid)
                labels = _read_rank_part(prev_dir, pid, dtype=np.int64)
                if al is None or labels is None:
                    if len(rvids):
                        # an empty partition still publishes its (empty)
                        # vote slots — existence is the completeness proof
                        _write_vote_files(vdir, pid, P, kk, None, [], [], [])
                    continue
                if report_only:
                    lab_now, hub_lab = labels, rvids
                else:
                    out, changed = _apply_lpa_kernel(labels, al, rvids, hub_prev, hub_new)
                    _write_rank_part(next_dir, pid, out, recycle_dir)
                    macc.append({
                        "pid": pid, "n_rows": int(len(out)),
                        "checksum": int(al["crc"] ^ zlib.crc32(memoryview(out).cast("B"))),
                        "changed": changed, "h": None,
                    })
                    lab_now, hub_lab = out, hub_new
                if len(rvids):
                    hidx_p, h_p, l_p, w_p = _votes_on_hubs(lab_now, al, rvids, hub_lab)
                    if hidx_p:
                        _write_vote_files(
                            vdir, pid, P, kk,
                            np.concatenate(hidx_p).astype(np.int64),
                            np.concatenate(h_p).astype(np.int64),
                            np.concatenate(l_p).astype(np.int64),
                            np.concatenate(w_p),
                        )
                    else:
                        _write_vote_files(vdir, pid, P, kk, None, [], [], [])
        if macc:
            yield pd.DataFrame(macc)

    return task


def _make_winner_task(store: CheckpointStore, run_id: str):
    """Winner job: task j reads slice j of every partition's vote segment,
    resolves winners with one pandas groupby + the exact total order of
    ``lpa.py``'s window (max Σw, then min label), and returns only winner
    rows — the (hub × label) relation never reaches the driver."""
    params_path = os.path.join(store.root, run_id, "_lpa_superstep_params.json")

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prm = fsio.read_json(params_path)
        kk, P, vdir = int(prm["superstep"]), int(prm["P"]), prm["vote_dir"]
        for pdf in batches:
            for j in pdf["pid"].to_numpy():
                j = int(j)
                hs, ls, ws = [], [], []
                for i in range(P):
                    h, l, w = _read_vote_file(vdir, i, j, kk)
                    if len(h):
                        hs.append(h)
                        ls.append(l)
                        ws.append(w)
                if not hs:
                    continue
                df = pd.DataFrame({
                    "h": np.concatenate(hs),
                    "l": np.concatenate(ls),
                    "w": np.concatenate(ws),
                })
                g = df.groupby(["h", "l"], sort=False, as_index=False)["w"].sum()
                g = g.sort_values(["h", "w", "l"], ascending=[True, False, True], kind="stable")
                win = g.drop_duplicates("h")
                yield pd.DataFrame({"h": win["h"].to_numpy(), "l": win["l"].to_numpy()})

    return task
