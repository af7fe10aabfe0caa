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
  resolves it so each vertex's winner sees ALL its votes in one summation:
  small-degree targets (almost all of a transcript graph) through the
  compile-time padded slot table (fixed-width K² vectorized pass, no sort,
  no hash), big targets through the packed radix-key sort path;
* votes ON a hub aggregate across partitions — and UNLIKE PageRank/CC's
  per-hub scalar exchange, hub votes are ``(hub × label)``-cardinality
  (≈ one triple per remote edge while labels are still distinct), so they
  must NEVER flow through the driver OR through a row-oriented shuffle.
  The exchange is file supersteps all the way down: each task writes its
  raw vote triples into P slot-sliced binary segments — slot = hash of the
  (hub, LABEL) pair mod P, superstep-stamped, atomic publish — so a Zipf
  hub's votes spread across all P slices while every pair's sum stays
  complete within one slice. A second tiny job's task j reads slice j of
  every partition's segment, reduces per-pair sums in NumPy (radix-key
  sort + reduceat), and returns its per-hub BEST (label, Σw) candidates;
  the driver merges the ≤ P×#hubs candidates with the exact total order
  (max Σw, then min label — per-slice bests are sufficient because the
  (hub, label) space is partitioned). Nothing edge-sized crosses Arrow,
  the JVM, or a Spark shuffle. Crucially the partition
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

Float caveat: hub vote sums reduce per winner-slot via NumPy reduceat over
partition-ordered triples, the DataFrame path reduces through Spark
partial aggregation — both are float64 sums, but the association order
differs, so a *fractional*-weight graph whose top-two vote sums differ by
< 1 ulp could tie-break differently. Integer-valued weights (this engine's
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

_LPA_OPT = (
    "l_to", "l_from", "l_w", "r_src_pos", "r_hubcode", "r_w", "r_dst_uniq",
    # padded small-degree vote-slot table (v2 compile): almost every non-hub
    # vertex of a transcript graph receives <= _PAD_K votes (2 adjacency
    # neighbours + a few tool gathers), so its winner is computed with a
    # fixed-width K^2 vectorized pass instead of any sort/hash over the
    # ~|edges|-row vote relation -- the measured superstep floor
    "all_w", "p_targets", "p_slots", "b_to", "b_idx",
)

_PAD_K = 8

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
        return os.path.join(root, f"lpaalign-{pid:05d}-v2")
    return os.path.join(static_dir, f"lpaalign-{pid:05d}-v2")


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

    # ---- padded vote-slot table over the virtual vote array [local|remote]
    # (gather direction: remote edge src receives its dst hub's label). The
    # structure is static, so the per-target slot assignment compiles once;
    # each superstep then only gathers labels through it. Targets with more
    # than _PAD_K votes (rare: hubs with local edges, fan-in turns) keep a
    # target-sorted index list for the sort-path fallback.
    tgt_parts = []
    w_parts = []
    if "l_to" in out:
        tgt_parts.append(out["l_to"].astype(np.int64))
        w_parts.append(out["l_w"])
    if "r_src_pos" in out:
        tgt_parts.append(out["r_src_pos"].astype(np.int64))
        w_parts.append(out["r_w"])
    if tgt_parts:
        tgt = np.concatenate(tgt_parts) if len(tgt_parts) > 1 else tgt_parts[0]
        out["all_w"] = np.concatenate(w_parts) if len(w_parts) > 1 else w_parts[0]
        nv = len(vids)
        cnt = np.bincount(tgt, minlength=nv)
        order = np.argsort(tgt, kind="stable")
        ts = tgt[order]
        seg_start = np.zeros(nv + 1, dtype=np.int64)
        np.cumsum(cnt, out=seg_start[1:])
        rank = np.arange(len(ts), dtype=np.int64) - seg_start[ts]
        small = (cnt > 0) & (cnt <= _PAD_K)
        p_targets = np.flatnonzero(small).astype(np.int32)
        row_of = np.full(nv, -1, dtype=np.int64)
        row_of[p_targets] = np.arange(len(p_targets))
        sel = small[ts]
        slots = np.full((len(p_targets), _PAD_K), -1, dtype=np.int32)
        slots[row_of[ts[sel]], rank[sel]] = order[sel].astype(np.int32)
        out["p_targets"] = p_targets
        out["p_slots"] = slots
        big_sel = ~sel & (cnt[ts] > 0)
        if big_sel.any():
            out["b_to"] = ts[big_sel].astype(np.int32)
            out["b_idx"] = order[big_sel].astype(np.int32)
    os.makedirs(os.path.dirname(cdir), exist_ok=True)
    # drop superseded compile versions for this pid: a version bump would
    # otherwise leave the old arrays resident in the store forever (6.7 GB
    # of orphaned v1 dirs contributed to a tmpfs OOM in round 5)
    import glob as _glob
    import shutil as _sh2

    stem = os.path.basename(cdir).rsplit("-", 1)[0]
    for old_dir in _glob.glob(os.path.join(os.path.dirname(cdir), f"{stem}-v*")):
        if old_dir != cdir:
            _sh2.rmtree(old_dir, ignore_errors=True)
    tmp = _tf.mkdtemp(dir=os.path.dirname(cdir), prefix="_lpaalign_")
    # l_w and r_w are exactly all_w's two halves — reconstructed as views at
    # load time instead of tripling the weight bytes on disk
    skip = {"l_w", "r_w"} if "all_w" in out else set()
    for name, arr in out.items():
        if name in skip:
            continue
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
    if ent["all_w"] is not None and ent["l_w"] is None:
        # weight halves come back as views of the stored all_w
        n_local = len(ent["l_to"]) if ent["l_to"] is not None else 0
        ent["l_w"] = ent["all_w"][:n_local] if n_local else None
        ent["r_w"] = ent["all_w"][n_local:] if len(ent["all_w"]) > n_local else None
    # ---- degree-class split of the padded slot table (derived at load, not
    # stored): slot rows fill left-to-right, so a target with cnt votes keeps
    # all of them in the first cnt columns — truncated K∈{2,4,8} sub-tables
    # compute identical winners while the K² pass costs K²/64 of the full
    # table. A transcript graph averages ~2 votes/target (two adjacency
    # neighbours), so the flat K=8 table was ~16× more memory traffic than
    # the votes needed — measured 1.93 s → ~0.4 s per partition kernel.
    if ent["p_targets"] is not None and len(ent["p_targets"]):
        slots8 = np.asarray(ent["p_slots"])
        tg8 = np.asarray(ent["p_targets"])
        cnt8 = (slots8 >= 0).sum(axis=1)
        classes = []
        lo = 0
        for kk in (2, 4, slots8.shape[1]):
            m = (cnt8 > lo) & (cnt8 <= kk)
            if m.any():
                classes.append(
                    (np.ascontiguousarray(tg8[m]), np.ascontiguousarray(slots8[m, :kk]))
                )
            lo = kk
        ent["p_classes"] = classes
    else:
        ent["p_classes"] = None
    _LPA_CACHE[key] = (compiled_generation(cdir), ent)
    return ent


def _winners(to: np.ndarray, lab: np.ndarray, w: np.ndarray, return_sums: bool = False):
    """(targets, labels) of per-target vote winners: max Σw, then min label
    — the exact total order of ``lpa.py``'s row_number window.

    Pure NumPy (no pandas hash-groupby, no full three-column sort — the
    measured dominant cost of a superstep at 233M edges): dense-code the
    label values (``np.unique`` — order-preserving, so code order == label
    order), pack ``(target, lcode)`` into ONE int64 key, radix-sort it
    (``kind="stable"`` on ints), segment-sum with ``add.reduceat``, then
    pick each target's winner with ``maximum.reduceat`` + a vectorized
    first-hit scan. Ascending keys put label codes ascending within each
    target, so the FIRST max-sum hit IS the min-label tie-break. Float
    caveat unchanged (module docstring): sums are float64 in a different
    association order than Spark's partial aggregation.
    """
    if not len(to):
        return (to, lab, w) if return_sums else (to, lab)
    tmax = int(to.max())
    lmin, lmax = int(lab.min()), int(lab.max())
    span = lmax - lmin + 1
    lab_uniq = None
    if (tmax + 1) * span < 2**62:  # python ints: no overflow in the guard
        # tier 1 (the transcript graphs: vertex-id labels, bounded span):
        # pack raw values, no label coding pass at all
        key = to.astype(np.int64) * np.int64(span) + (lab.astype(np.int64) - lmin)
        nl = np.int64(span)
    else:
        lab_uniq, lcode = np.unique(lab, return_inverse=True)
        nl = np.int64(len(lab_uniq))
        if (tmax + 1) * len(lab_uniq) >= 2**62:
            return _winners_lexsort(to, lab, w, return_sums)  # tier 3
        key = to.astype(np.int64) * nl + lcode
    # quicksort, not stable: equal keys are SUMMED, so their relative order
    # is irrelevant (float association caveat already documented above)
    order = np.argsort(key)
    ks = key[order]
    first = np.empty(len(ks), dtype=bool)
    first[0] = True
    np.not_equal(ks[1:], ks[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(w[order], starts)
    gk = ks[starts]
    gt = gk // nl
    gl = gk % nl
    tfirst = np.empty(len(gt), dtype=bool)
    tfirst[0] = True
    np.not_equal(gt[1:], gt[:-1], out=tfirst[1:])
    tstarts = np.flatnonzero(tfirst)
    smax = np.maximum.reduceat(sums, tstarts)
    seg = np.cumsum(tfirst) - 1
    idx = np.where(sums == smax[seg], np.arange(len(sums)), len(sums))
    win_idx = np.minimum.reduceat(idx, tstarts)
    wl = gl[win_idx]
    labels_out = (wl + lmin) if lab_uniq is None else lab_uniq[wl]
    targets_out = gt[tstarts].astype(to.dtype, copy=False)
    if return_sums:
        return targets_out, labels_out, smax  # winner's sum == segment max
    return targets_out, labels_out


def _winners_lexsort(to: np.ndarray, lab: np.ndarray, w: np.ndarray, return_sums: bool = False):
    """Tier-3 fallback when (target, label) can't pack into one int64."""
    order = np.lexsort((lab, to))
    ts, ls = to[order], lab[order]
    first = np.empty(len(ts), dtype=bool)
    first[0] = True
    first[1:] = (ts[1:] != ts[:-1]) | (ls[1:] != ls[:-1])
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(w[order], starts)
    gt, gl = ts[starts], ls[starts]
    tfirst = np.empty(len(gt), dtype=bool)
    tfirst[0] = True
    np.not_equal(gt[1:], gt[:-1], out=tfirst[1:])
    tstarts = np.flatnonzero(tfirst)
    smax = np.maximum.reduceat(sums, tstarts)
    seg = np.cumsum(tfirst) - 1
    idx = np.where(sums == smax[seg], np.arange(len(sums)), len(sums))
    win_idx = np.minimum.reduceat(idx, tstarts)
    if return_sums:
        return gt[tstarts].astype(to.dtype, copy=False), gl[win_idx], smax
    return gt[tstarts].astype(to.dtype, copy=False), gl[win_idx]


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


_SLOT_A = np.uint64(0x9E3779B97F4A7C15)
_SLOT_B = np.uint64(0xC2B2AE3D27D4EB4F)


def _vote_slot(hidx, l, P: int):
    """Winner-slot of a vote: hash of (hub, LABEL) mod P. Slotting by hub
    alone sent a Zipf hub's ENTIRE vote list to one single-threaded task
    (measured 30 s on the hottest tool hub at 233M edges); keying the slot
    by the (hub, label) pair spreads it across all P slices while keeping
    every pair's sum complete within one slice — per-slice bests are then
    sufficient for the exact global argmax."""
    mixed = np.asarray(hidx, dtype=np.int64).astype(np.uint64) * _SLOT_A
    mixed ^= np.asarray(l, dtype=np.int64).astype(np.uint64) * _SLOT_B
    mixed ^= mixed >> np.uint64(33)
    return (mixed % np.uint64(P)).astype(np.int64)


def _reduce_votes(hidx, h, l, w):
    """Sum this writer's votes per (hub, label) before they hit the files:
    once labels concentrate, a single (hot hub, label) pair can hold tens of
    millions of raw votes — complete-within-slice slotting would hand them
    all to ONE winner task (measured 36 s). Reduced, the pair is one row per
    writer (≤ P rows globally). Partial-then-total float summation matches
    the documented association-order caveat; integer weights exact."""
    hidx = np.asarray(hidx, dtype=np.int64)
    l = np.asarray(l, dtype=np.int64)
    w = np.asarray(w, dtype=np.float64)
    # tier 1 (same tiering as _winners): when (hub, raw-label-span) packs
    # into int64, sort the packed key directly — the previous unconditional
    # np.unique(l) was itself a full sort of the raw vote labels, i.e. the
    # reduce paid TWO O(n log n) passes where one suffices
    lmin = int(l.min())
    span = int(l.max()) - lmin + 1
    if (int(hidx.max()) + 1) * span < 2**62:
        key = hidx * np.int64(span) + (l - lmin)
        order = np.argsort(key, kind="stable")  # radix for ints — O(n), no random access
        ks = key[order]
        first = np.empty(len(ks), dtype=bool)
        first[0] = True
        np.not_equal(ks[1:], ks[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(w[order], starts)
        return (
            hidx[order][starts],
            np.asarray(h)[order][starts],
            l[order][starts],
            sums,
        )
    lu, lc = np.unique(l, return_inverse=True)
    if (int(hidx.max()) + 1) * len(lu) >= 2**62:
        order = np.lexsort((lc, hidx))
        hs_, ls_ = hidx[order], lc[order]
        first = np.empty(len(hs_), dtype=bool)
        first[0] = True
        first[1:] = (hs_[1:] != hs_[:-1]) | (ls_[1:] != ls_[:-1])
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(w[order], starts)
        return hidx[order][starts], h[order][starts], lu[ls_[starts]], sums
    key = hidx * np.int64(len(lu)) + lc
    order = np.argsort(key)
    ks = key[order]
    first = np.empty(len(ks), dtype=bool)
    first[0] = True
    np.not_equal(ks[1:], ks[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(w[order], starts)
    gk = ks[starts]
    return gk // len(lu), np.asarray(h)[order][starts], lu[gk % len(lu)], sums


def _write_vote_files(vdir: str, pid: int, P: int, k: int, hidx, h, l, w) -> None:
    if len(h):
        hidx = np.asarray(hidx, dtype=np.int64)
        l = np.asarray(l, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
        lmin = int(l.min())
        span = int(l.max()) - lmin + 1
        m_span = (int(hidx.max()) + 1) * span
        if m_span < 2**62 // max(P, 1):
            # fused path: ONE radix argsort of slot·M + (hub·span + label)
            # groups by winner slot AND orders (hub, label) within it — the
            # separate reduce-sort + slot-sort each re-sorted ~|raw votes|
            # rows in the diverse-label regime (no reduction to amortize
            # the second pass). Same per-(hub,label) partial sums: stable
            # order keeps duplicate rows in original sequence, as before.
            j_raw = _vote_slot(hidx, l, P)
            key = j_raw * np.int64(m_span) + hidx * np.int64(span) + (l - lmin)
            order = np.argsort(key, kind="stable")
            ks = key[order]
            first = np.empty(len(ks), dtype=bool)
            first[0] = True
            np.not_equal(ks[1:], ks[:-1], out=first[1:])
            starts = np.flatnonzero(first)
            wsum = np.add.reduceat(w[order], starts)
            h = np.asarray(h)[order][starts]
            l = l[order][starts]
            w = wsum
            bounds = np.searchsorted(ks[starts] // np.int64(m_span), np.arange(P + 1))
        else:
            hidx, h, l, w = _reduce_votes(hidx, h, l, w)
            j_all = _vote_slot(hidx, l, P)
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


_LAB_SENTINEL = np.iinfo(np.int64).max


def _padded_winners(votes_lab, w_all, slots, chunk: int = 1 << 16):
    """Winner label per slot-table row: max Σw then min label, computed with
    a fixed-width K² vectorized pass over the padded (label, weight)
    matrices — no sort, no hash table, cache-blocked row chunks. Pad columns
    are masked out of the argmax (their sum is forced to −inf), so they can
    never win even when every real vote sum is negative — relying on the
    pads' weight-0 sum "losing" would break for all-negative vote weights
    and emit the sentinel as a label, diverging from the sort-path fallback.
    Duplicate label columns produce identical sums and the min() tie-break
    still lands on the right value. Summation order per column is m=0..K-1
    (float caveat as in the module docstring; integer weights exact)."""
    n, K = slots.shape
    out = np.empty(n, dtype=np.int64)
    for lo in range(0, n, chunk):
        S = slots[lo : lo + chunk]
        valid = S >= 0
        idx = np.where(valid, S, 0)
        L = np.where(valid, votes_lab[idx], _LAB_SENTINEL)
        W = np.where(valid, w_all[idx], 0.0)
        SS = np.empty(L.shape)
        for j in range(K):
            SS[:, j] = ((L == L[:, j : j + 1]) * W).sum(axis=1)
        SS[~valid] = -np.inf  # pads out of the argmax (all-negative-weight safe)
        smax = SS.max(axis=1, keepdims=True)
        out[lo : lo + chunk] = np.where(SS == smax, L, _LAB_SENTINEL).min(axis=1)
    return out


def _padded_winners_pair(votes_lab, w_all, slots2):
    """Direct winner for the ≤2-vote class (the bulk of a transcript graph):
    no K² loop, no chunking — a handful of vectorized ops. Total order
    matches _padded_winners exactly: same label → that label (sum w0+w1 in
    slot order, only candidate); different labels → larger weight wins,
    equal weights → min label; a single vote wins outright."""
    i0 = slots2[:, 0]
    has1 = slots2[:, 1] >= 0
    i1 = np.where(has1, slots2[:, 1], i0)
    l0, l1 = votes_lab[i0], votes_lab[i1]
    w0, w1 = w_all[i0], w_all[i1]
    same = l0 == l1  # includes the single-vote rows (i1 == i0)
    return np.where(
        same | ~has1,
        l0,
        np.where(w1 > w0, l1, np.where(w0 > w1, l0, np.minimum(l0, l1))),
    )


def _apply_lpa_kernel(labels, al, rvids, hub_prev, hub_new, mk=None):
    """One synchronous LPA step for one partition: returns ``(out, changed)``.

    The vote pool is the compile-time virtual array [local | remote-gather];
    small-degree targets (almost all of a transcript graph) resolve through
    the padded slot table, the rare big targets through the sort path —
    identical total order either way."""
    import time as _t

    _mk = mk or (lambda name, t0: None)
    vids = al["vids"]
    out = labels.copy()
    t0 = _t.perf_counter()
    lab_parts = []
    if al["l_to"] is not None:
        lab_parts.append(labels[al["l_from"]])
    if al["r_src_pos"] is not None and len(rvids):
        hub_idx = np.searchsorted(rvids, al["r_dst_uniq"])
        hub_idx = np.minimum(hub_idx, len(rvids) - 1)
        ok = np.asarray(rvids[hub_idx] == al["r_dst_uniq"])
        if not ok.all():
            raise RuntimeError("lpa hub relay missing labels for some remote dsts")
        uniq_prev = hub_prev[hub_idx]
        lab_parts.append(uniq_prev[al["r_hubcode"]])
    _mk("k_gather", t0)
    if lab_parts:
        votes_lab = np.concatenate(lab_parts) if len(lab_parts) > 1 else lab_parts[0]
        w_all = np.asarray(al["all_w"])
        if al.get("p_classes"):
            # degree-class sub-tables (see _load_lpa_aligned): same winners,
            # K²-pass cost proportional to each class's true vote width
            t0 = _t.perf_counter()
            for ctg, cslots in al["p_classes"]:
                if cslots.shape[1] == 2:
                    out[ctg] = _padded_winners_pair(votes_lab, w_all, cslots)
                else:
                    out[ctg] = _padded_winners(votes_lab, w_all, cslots)
            _mk("k_padded", t0)
        elif al["p_targets"] is not None and len(al["p_targets"]):
            t0 = _t.perf_counter()
            out[np.asarray(al["p_targets"])] = _padded_winners(
                votes_lab, w_all, np.asarray(al["p_slots"])
            )
            _mk("k_padded", t0)
        if al["b_to"] is not None and len(al["b_to"]):
            t0 = _t.perf_counter()
            b_idx = np.asarray(al["b_idx"])
            tpos, tlab = _winners(
                np.asarray(al["b_to"], dtype=np.int64), votes_lab[b_idx], w_all[b_idx]
            )
            out[tpos] = tlab
            _mk("k_sort", t0)
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
    winner_df = pids.mapInPandas(
        _make_winner_task(store, run_id), schema="h long, l long, s double"
    )

    def _collect_winners(k: int, hubs: list[int]) -> dict[int, int]:
        """Exact merge of the per-slice candidates: max Σw then min label.

        ≤ P rows per hub arrive (one best per slice that saw the hub); the
        merge is O(P × #hubs) driver-side NumPy — fine for role/tool hub
        counts (this engine's transcript graphs). A graph with millions of
        hubs would want one more reduce job before the driver; the slot
        function already makes that a drop-in."""
        if not hubs:
            return {}
        rows = winner_df.collect()
        if not rows:
            return {}
        h = np.fromiter((r["h"] for r in rows), dtype=np.int64, count=len(rows))
        l = np.fromiter((r["l"] for r in rows), dtype=np.int64, count=len(rows))
        sm = np.fromiter((r["s"] for r in rows), dtype=np.float64, count=len(rows))
        order = np.lexsort((l, -sm, h))  # by hub, then sum desc, then label asc
        hs_, ls_ = h[order], l[order]
        first = np.empty(len(hs_), dtype=bool)
        first[0] = True
        np.not_equal(hs_[1:], hs_[:-1], out=first[1:])
        return {int(a): int(b) for a, b in zip(hs_[first], ls_[first])}

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
        _ti = _time.monotonic()
        metrics_rows = [r.asDict() for r in update_df.collect()]
        _tu = _time.monotonic()
        metrics, lineage, converged = _combine(metrics_rows, k)
        winners = _collect_winners(k, hubs)
        if os.environ.get("TWSPARK_INSTR"):
            import sys as _sys

            print(
                f"lpa-driver k={k} update {_tu - _ti:.2f}s "
                f"winner {_time.monotonic() - _tu:.2f}s",
                file=_sys.stderr,
            )
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
        import time as _t

        instr = os.environ.get("TWSPARK_INSTR")
        marks: list = []

        def mk(name, t0):
            if instr:
                marks.append((name, _t.perf_counter() - t0))

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
                t0 = _t.perf_counter()
                al = _load_lpa_aligned(static_dir, sd, pid)
                labels = _read_rank_part(prev_dir, pid, dtype=np.int64)
                mk("read", t0)
                if al is None or labels is None:
                    if len(rvids):
                        # an empty partition still publishes its (empty)
                        # vote slots — existence is the completeness proof
                        _write_vote_files(vdir, pid, P, kk, None, [], [], [])
                    continue
                if report_only:
                    lab_now, hub_lab = labels, rvids
                else:
                    t0 = _t.perf_counter()
                    out, changed = _apply_lpa_kernel(
                        labels, al, rvids, hub_prev, hub_new, mk=mk if instr else None
                    )
                    mk("kernel", t0)
                    t0 = _t.perf_counter()
                    _write_rank_part(next_dir, pid, out, recycle_dir)
                    macc.append({
                        "pid": pid, "n_rows": int(len(out)),
                        "checksum": int(al["crc"] ^ zlib.crc32(memoryview(out).cast("B"))),
                        "changed": changed, "h": None,
                    })
                    mk("write", t0)
                    lab_now, hub_lab = out, hub_new
                if len(rvids):
                    t0 = _t.perf_counter()
                    hidx_p, h_p, l_p, w_p = _votes_on_hubs(lab_now, al, rvids, hub_lab)
                    mk("votes_build", t0)
                    t0 = _t.perf_counter()
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
                    mk("votes_write", t0)
        if macc:
            yield pd.DataFrame(macc)
        if instr and marks:
            with open(f"{instr}/lpa-{os.getpid()}.log", "a") as f:
                for name, dt in marks:
                    f.write(f"{name} {dt:.4f}\n")

    return task


def _make_winner_task(store: CheckpointStore, run_id: str):
    """Winner job: task j reads slice j of every partition's vote segment,
    resolves winners with one pandas groupby + the exact total order of
    ``lpa.py``'s window (max Σw, then min label), and returns only winner
    rows — the (hub × label) relation never reaches the driver."""
    params_path = os.path.join(store.root, run_id, "_lpa_superstep_params.json")

    def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _t

        instr = os.environ.get("TWSPARK_INSTR")
        marks: list = []
        prm = fsio.read_json(params_path)
        kk, P, vdir = int(prm["superstep"]), int(prm["P"]), prm["vote_dir"]
        for pdf in batches:
            for j in pdf["pid"].to_numpy():
                j = int(j)
                t0 = _t.perf_counter()
                hs, ls, ws = [], [], []
                for i in range(P):
                    h, l, w = _read_vote_file(vdir, i, j, kk)
                    if len(h):
                        hs.append(h)
                        ls.append(l)
                        ws.append(w)
                if instr:
                    marks.append(("win_read", _t.perf_counter() - t0))
                if not hs:
                    continue
                t0 = _t.perf_counter()
                h = np.concatenate(hs)
                # dense-code the hub ids so _winners can pack (hub, label)
                # into one radix-sortable int64 key; every (hub, label)
                # pair's votes land WHOLLY in this slice (slot = hash of the
                # pair), so the per-pair sums here are complete and this
                # slice's per-hub best is an exact candidate for the global
                # argmax the driver merges
                h_uniq, hcode = np.unique(h, return_inverse=True)
                wt, wl, wsum = _winners(
                    hcode, np.concatenate(ls), np.concatenate(ws), return_sums=True
                )
                if instr:
                    marks.append(("win_solve", _t.perf_counter() - t0))
                yield pd.DataFrame({"h": h_uniq[wt], "l": wl, "s": wsum})
        if instr and marks:
            with open(f"{instr}/lpawin-{os.getpid()}.log", "a") as f:
                for name, dt in marks:
                    f.write(f"{name} {dt:.4f}\n")

    return task
