"""Triangle counting via degree orientation (non-iterative DataFrame job).

Reference motivation: intra-cluster connection edges rendered by the
visualization (``web/static/js/visualization.js:393-419``) and the
near-duplicate similarity graph — triangle density measures how clique-like
duplicate groups / role-tool communities are.

Algorithm (standard, shuffle-minimal):

1. symmetrize + dedup to canonical undirected edges ``a < b``;
2. **orient** every edge from the endpoint with (degree, id)-smaller to the
   larger — each triangle is then counted exactly once, and the 2-path
   (wedge) join is bounded by Σ min-degree², not Σ degree² — the classical
   trick that keeps the self-join feasible on skewed (Zipf-hub) graphs;
3. wedges = oriented ⋈ oriented on ``e1.dst == e2.src``;
4. triangles = wedges semi-joined with the closing oriented edge;
5. **heavy-hitter split** (``hub_split``): wedge centers whose oriented
   out-degree exceeds a data-driven cutoff generate their wedges via a
   broadcast adjacency-list join + ``explode`` instead of the shuffled
   self-join — the escape hatch for residual skew at 10^12 edges, where
   one hot middle vertex would otherwise own an entire shuffle partition.

Everything is plain DataFrame joins — Catalyst picks sort-merge with AQE
skew splitting; no Python crossings at all.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import symmetrize

__all__ = ["triangle_counts", "triangle_counts_local", "TriangleResult"]


@dataclass
class TriangleResult:
    total: int
    per_vertex: DataFrame  # (vid, triangles)


def _oriented(edges: DataFrame, assume_canonical: bool = False) -> DataFrame:
    """Canonical undirected edges oriented by (degree, id) order: lo → hi.

    ``assume_canonical``: rows already satisfy ``src < dst`` (duplicates
    allowed) — skips the symmetrize union, halving the dedup shuffle."""
    if assume_canonical:
        und = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).distinct()
    else:
        und = (
            symmetrize(edges)
            .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
            .distinct()
        )
    deg = (
        und.select(F.col("a").alias("vid"))
        .unionByName(und.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("vid").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("vid").alias("b"), F.col("deg").alias("deg_b"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_counts(
    edges: DataFrame,
    *,
    hub_split: bool = True,
    hub_threshold: int | None = None,
    assume_canonical: bool = False,
) -> TriangleResult:
    """Exact global + per-vertex triangle counts for the undirected graph.

    ``hub_split=True`` (default) is the 100×-scale escape hatch for the one
    remaining skew point: the wedge self-join hash-partitions on the middle
    vertex ``v``, so a hot wedge center (a hub whose oriented out-degree
    survives the degree-orientation bound) concentrates its entire
    ``in(v) × out(v)`` wedge set in one shuffle partition. Hot centers
    (oriented out-degree > ``hub_threshold``, default 10× the mean, min 64
    — the same data-driven cutoff as ``prepare_edges``) are handled
    map-side instead: their out-adjacency lists (each ≤ O(√m) by
    orientation, and only the few keys above the cutoff) broadcast, and a
    broadcast-join + ``explode`` generates their wedges with NO shuffle
    keyed on the hot vertex — the closing semi-join keys on the well-spread
    ``(u, w)`` pair. Cold centers keep the plain wedge join. A wedge center
    is hot or cold exclusively, so the union double-counts nothing.
    """
    o = _oriented(edges, assume_canonical=assume_canonical).persist()
    e1 = o.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2_all = o.select(F.col("lo").alias("v"), F.col("hi").alias("w"))

    # ONE stats job (union + groupBy over the persisted oriented edges)
    # answers everything the orchestration needs before the wedge join:
    # (a) does any wedge center exist — a vertex with an oriented out-edge
    #     (od>0) that also appears as some edge's hi (mn=0); if none (e.g.
    #     any bipartite graph once degree-oriented) the count is 0 and the
    #     wedge machinery is skipped entirely;
    # (b) the mean oriented out-degree for the data-driven hub cutoff;
    # (c) the max out-degree — when max ≤ threshold no hot center exists,
    #     so the hot persist+count job and the split plan are skipped
    #     outright on hubless graphs.
    # Round 5 ran (a) and (b) and the hot count as three separate jobs.
    per_v = (
        o.select(F.col("lo").alias("v"), F.lit(1).alias("r"))
        .unionByName(o.select(F.col("hi").alias("v"), F.lit(0).alias("r")))
        .groupBy("v")
        .agg(F.sum("r").alias("od"), F.min("r").alias("mn"))
    )
    srow = per_v.agg(
        F.count(F.when((F.col("od") > 0) & (F.col("mn") == 0), 1)).alias("centers"),
        F.avg(F.when(F.col("od") > 0, F.col("od"))).alias("m"),
        F.max("od").alias("mx"),
    ).collect()[0]
    if not srow["centers"]:
        spark = edges.sparkSession
        o.unpersist()
        return TriangleResult(
            total=0, per_vertex=spark.createDataFrame([], "vid long, triangles long")
        )

    hot = None
    if hub_split:
        if hub_threshold is None:
            hub_threshold = max(int(10 * (srow["m"] or 0.0)), 64)
        if (srow["mx"] or 0) > hub_threshold:
            hot = (
                per_v.where(F.col("od") > hub_threshold)
                .select(F.col("v").alias("hv"))
                .persist()
            )
            hot.count()

    if hot is None:
        wedges = e1.join(e2_all, "v").select("u", "v", "w")
    else:
        e2_cold = (
            o.join(F.broadcast(hot), o["lo"] == hot["hv"], "left_anti")
            .select(F.col("lo").alias("v"), F.col("hi").alias("w"))
        )
        hot_adj = (
            o.join(F.broadcast(hot), o["lo"] == hot["hv"], "left_semi")
            .groupBy(F.col("lo").alias("v"))
            .agg(F.collect_list("hi").alias("ws"))
        )
        wedges_hot = (
            o.join(F.broadcast(hot_adj), o["hi"] == hot_adj["v"], "inner")
            .select(F.col("lo").alias("u"), "v", F.explode("ws").alias("w"))
        )
        wedges = e1.join(e2_cold, "v").select("u", "v", "w").unionByName(wedges_hot)

    closing = o.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tris = wedges.join(closing, ["u", "w"], "left_semi").persist()

    per_vertex = (
        tris.select(F.col("u").alias("vid"))
        .unionByName(tris.select(F.col("v").alias("vid")))
        .unionByName(tris.select(F.col("w").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    total = tris.count()
    o.unpersist()
    if hot is not None:
        hot.unpersist()
    return TriangleResult(total=total, per_vertex=per_vertex)


def triangle_counts_local(
    edges: DataFrame,
    *,
    num_partitions: int | None = None,
    hub_split: bool = True,
    hub_threshold: int | None = None,
    work_dir: str | None = None,
) -> TriangleResult:
    """Exact triangle counts exploiting home locality — the 10^12-edge path.

    Requires ``src_home``/``dst_home`` columns (vertex→home is a function).
    Triangles partition EXACTLY into three classes by their co-homed pairs:

    * **3-local** — all three vertices share a home: all 3 edges are local,
      counted inside that home's partition (NumPy oriented wedge expansion);
    * **1-local** — exactly one co-homed pair (a, b): the triangle is (a, b,
      w) with w in another home; counted as ``|R(a) ∩ R(b)|`` per local edge,
      where R is the partition's cross-edge adjacency (each cross edge is
      dealt to BOTH endpoint homes, so R sees both directions);
    * **0-local** — all three vertices pairwise cross-homed: triangles of
      the cross-edge-only subgraph, delegated to the degree-oriented wedge
      join, which now early-exits after orientation when no wedge center
      exists (any bipartite cross subgraph, e.g. turn→tool).

    Two-local is impossible (two local edges share a vertex → all three
    co-homed), so the classes are disjoint and exhaustive — the sum is exact.

    Plan shape (all costs measured at 233M edges / 32 cores):

    * ONE wide shuffle: the home-keyed repartition of the dealt edge set,
      written straight to parquet. No global ``distinct`` — duplicate
      directed rows of a pair land in the same home partition by
      construction, so dedup is a per-partition ``np.unique`` instead of a
      233M-row shuffle (saved ~30 s);
    * cross halves are dealt to an endpoint's home only if that home hosts
      ≥1 local edge — a HOME-level broadcast semi-join (≤ #convs keys), so
      a Zipf hub's home (which hosts none) never receives the hub's entire
      cross adjacency in one partition (the skew that made the first cut of
      this kernel as slow as the wedge join);
    * the count job reads the parquet files directly with pyarrow
      (one file = one home partition) instead of streaming 233M rows
      through the JVM→Python Arrow socket (~5 µs/row — the same cost the
      file-superstep kernels dodge);
    * inside a partition everything is vectorized NumPy: oriented CSR wedge
      expansion for 3-local, packed-key ``intersect1d`` for 1-local; the
      output is per-vertex (vid, count) rows whose global sum is 3× the
      class-A+B triangle total.
    """
    import glob
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    spark = edges.sparkSession
    P = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    raw = edges.where(F.col("src") != F.col("dst")).select(
        F.least("src", "dst").alias("a"),
        F.greatest("src", "dst").alias("b"),
        F.when(F.col("src") < F.col("dst"), F.col("src_home"))
        .otherwise(F.col("dst_home"))
        .alias("a_home"),
        F.when(F.col("src") < F.col("dst"), F.col("dst_home"))
        .otherwise(F.col("src_home"))
        .alias("b_home"),
    )
    loc = raw.where(F.col("a_home") == F.col("b_home")).select(
        F.col("a_home").alias("home"), F.lit(True).alias("is_local"),
        F.col("a").alias("x"), F.col("b").alias("y"),
    )
    cross = raw.where(F.col("a_home") != F.col("b_home"))
    homes_with_local = loc.select("home").distinct()
    a_half = cross.join(
        F.broadcast(homes_with_local),
        cross["a_home"] == homes_with_local["home"],
        "left_semi",
    ).select(
        F.col("a_home").alias("home"), F.lit(False).alias("is_local"),
        F.col("a").alias("x"), F.col("b").alias("y"),
    )
    b_half = cross.join(
        F.broadcast(homes_with_local),
        cross["b_home"] == homes_with_local["home"],
        "left_semi",
    ).select(
        F.col("b_home").alias("home"), F.lit(False).alias("is_local"),
        F.col("b").alias("x"), F.col("a").alias("y"),
    )
    dealt = loc.unionByName(a_half).unionByName(b_half)

    wdir = work_dir or tempfile.mkdtemp(prefix="twspark_tri_")
    (
        dealt.repartition(P, "home")
        .select("is_local", "x", "y")
        .write.mode("overwrite")
        .parquet(wdir)
    )
    files = sorted(glob.glob(os.path.join(wdir, "part-*")))
    n_slots = spark.sparkContext.defaultParallelism
    fdf = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), max(1, n_slots)))

    def count_files(batches):
        for pdf_paths in batches:
            for path in pdf_paths["path"]:
                tb = pq.read_table(path, columns=["is_local", "x", "y"])
                is_loc = tb.column("is_local").to_numpy()
                xs = tb.column("x").to_numpy()
                ys = tb.column("y").to_numpy()
                out = _count_homed_partition(
                    xs[is_loc], ys[is_loc], xs[~is_loc], ys[~is_loc]
                )
                if out is not None:
                    yield pd.DataFrame({"vid": out[0], "cnt": out[1]})

    ab = fdf.mapInPandas(count_files, schema="vid long, cnt long")
    per_vertex_ab = ab.groupBy("vid").agg(F.sum("cnt").alias("triangles")).persist()
    total_ab3 = per_vertex_ab.agg(F.sum("triangles")).collect()[0][0] or 0
    if total_ab3 % 3:  # exactness invariant; must survive python -O (no assert)
        raise RuntimeError(
            "triangle_counts_local: per-vertex increments must be 3 per "
            f"triangle (got Σ={total_ab3})"
        )
    total = total_ab3 // 3

    # ---- 0-local residual: triangles of the cross-only subgraph
    per_vertex = per_vertex_ab
    if cross.limit(1).count():
        res_c = triangle_counts(
            cross.select(F.col("a").alias("src"), F.col("b").alias("dst")).withColumn(
                "weight", F.lit(1.0)
            ),
            hub_split=hub_split,
            hub_threshold=hub_threshold,
            assume_canonical=True,  # cross is already a<b (dups fine)
        )
        total += res_c.total
        if res_c.total:
            per_vertex = (
                per_vertex_ab.unionByName(res_c.per_vertex)
                .groupBy("vid")
                .agg(F.sum("triangles").alias("triangles"))
            )
    per_vertex = per_vertex.localCheckpoint(eager=True)
    per_vertex_ab.unpersist()
    if work_dir is None:
        shutil.rmtree(wdir, ignore_errors=True)
    return TriangleResult(total=int(total), per_vertex=per_vertex)


def _count_homed_partition(la, lb, rv, rf):
    """Class A (3-local) + class B (1-local) triangle increments for one
    home partition, as parallel (vid, count) arrays (3 increments per
    triangle). Raw rows may repeat (duplicate directed edges) — dedup is
    per-partition ``np.unique`` over packed pair codes."""
    import numpy as np

    if not len(la):
        return None
    vids = np.unique(np.concatenate([la, lb]))
    nv = len(vids)
    a0 = np.searchsorted(vids, la)
    b0 = np.searchsorted(vids, lb)
    pair = np.unique(a0.astype(np.int64) * nv + b0)  # dedup (a < b canonical)
    a = pair // nv
    b = pair % nv
    out_v: list = []
    out_c: list = []
    # ---- 3-local: orient lo→hi by (degree, code), expand wedges
    deg = np.bincount(a, minlength=nv) + np.bincount(b, minlength=nv)
    swap = (deg[b] < deg[a]) | ((deg[b] == deg[a]) & (b < a))
    u = np.where(swap, b, a)
    w_ = np.where(swap, a, b)
    ordr = np.lexsort((w_, u))
    u_s, w_s = u[ordr], w_[ordr]
    starts = np.searchsorted(u_s, np.arange(nv))
    counts = np.bincount(u_s, minlength=nv)
    ext = counts[w_s]
    if ext.sum():
        off = np.concatenate([[0], np.cumsum(ext)])
        ridx = np.repeat(np.arange(len(u_s)), ext)
        pos_in = np.arange(off[-1]) - np.repeat(off[:-1], ext)
        w2 = w_s[np.repeat(starts[w_s], ext) + pos_in]
        u1 = u_s[ridx]
        key_set = u_s * np.int64(nv) + w_s  # sorted by construction
        k2 = u1 * np.int64(nv) + w2
        pos = np.minimum(np.searchsorted(key_set, k2), len(key_set) - 1)
        hit = key_set[pos] == k2
        if hit.any():
            pv = (
                np.bincount(u1[hit], minlength=nv)
                + np.bincount(w_s[ridx[hit]], minlength=nv)
                + np.bincount(w2[hit], minlength=nv)
            )
            nz = np.flatnonzero(pv)
            out_v.append(vids[nz])
            out_c.append(pv[nz])
    # ---- 1-local: |R(a) ∩ R(b)| per deduped local edge
    if len(rv):
        # drop cross rows whose local endpoint has no local edge here
        vpos = np.minimum(np.searchsorted(vids, rv), nv - 1)
        keep = vids[vpos] == rv
        rv_code, rfk = vpos[keep], rf[keep]
        if len(rv_code):
            fvids = np.unique(rfk)
            nf = len(fvids)
            fc = np.searchsorted(fvids, rfk)
            pairr = np.unique(rv_code.astype(np.int64) * nf + fc)
            rv_u = pairr // nf
            rf_u = pairr % nf
            rstarts = np.searchsorted(rv_u, np.arange(nv))
            rcounts = np.bincount(rv_u, minlength=nv)
            ne = len(a)
            if ne * nf >= 2**62:  # pragma: no cover
                raise RuntimeError(
                    "triangle_counts_local: edge×far domain exceeds int64 "
                    "packing — use triangle_counts()"
                )

            def expand(side):
                cnts = rcounts[side]
                if not cnts.sum():
                    return np.empty(0, dtype=np.int64)
                offs = np.concatenate([[0], np.cumsum(cnts)])
                pos2 = np.arange(offs[-1]) - np.repeat(offs[:-1], cnts)
                fars = rf_u[np.repeat(rstarts[side], cnts) + pos2]
                eid = np.repeat(np.arange(ne, dtype=np.int64), cnts)
                return eid * nf + fars

            common = np.intersect1d(expand(a), expand(b), assume_unique=True)
            if len(common):
                ce = np.bincount(common // nf, minlength=ne)
                pv = np.bincount(a, weights=ce, minlength=nv) + np.bincount(
                    b, weights=ce, minlength=nv
                )
                nz = np.flatnonzero(pv)
                out_v.append(vids[nz])
                out_c.append(pv[nz].astype(np.int64))
                fcnt = np.bincount(common % nf, minlength=nf)
                nzf = np.flatnonzero(fcnt)
                out_v.append(fvids[nzf])
                out_c.append(fcnt[nzf])
    if not out_v:
        return None
    return np.concatenate(out_v), np.concatenate(out_c)
