"""Plan-shape regression tests: pushdown, pruning, broadcast, exchange count.

These encode the scale-readiness properties (SURVEY §4): a change that
silently blocks predicate pushdown or re-shuffles the persisted edge side
every superstep must fail here, not at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiktok_whisper_spark.graph.scatter import prepare_edges, scatter_gather
from tiktok_whisper_spark.plans import explain


def test_filter_pushdown_and_pruning(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_totalprice")
    )
    assert "o_orderstatus" in explain.pushed_filters(df)
    cols = explain.read_schema_columns(df)[0]
    # only the 3 referenced columns are read, not all 6
    assert set(cols) == {"o_orderkey", "o_totalprice", "o_orderstatus"}


def test_small_dim_broadcasts(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = li.join(F.broadcast(cust), li["l_orderkey"] == cust["c_custkey"])
    assert explain.has_broadcast_join(j)


def test_superstep_pays_single_exchange(spark):
    """The iterative hot loop: edges persisted by src, state localCheckpoint-ed
    by vid → the only paid shuffle is the gather groupBy(dst)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.createDataFrame(
            [(i, (i * 7) % 500, 1.0) for i in range(2000)], "src long, dst long, weight double"
        )
        e = edges.groupBy("src", "dst").agg(F.sum("weight").alias("w"))
        outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
        enorm = e.join(outw, "src").select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        pe = prepare_edges(enorm, payload=("p",))
        state = (
            e.select(F.col("src").alias("vid")).distinct()
            .select("vid", F.lit(1e-3).alias("rank"))
            .repartition(8, "vid")
            .localCheckpoint(eager=True)
        )
        sums = scatter_gather(pe, state, F.col("p") * F.col("rank"), mode="arrow")
        new = state.join(sums, state["vid"] == sums["dst"], "left_outer").select(
            state["vid"], F.coalesce(sums["c"], F.lit(0.0)).alias("rank")
        )
        assert explain.runtime_exchange_count(new) == 1
        pe.unpersist()
        state.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_q1_wholestage_codegen(spark, sf_dir):
    from tiktok_whisper_spark.queries import agg_tpch_q1

    df = agg_tpch_q1(spark, sf_dir)
    assert explain.wholestage_codegen_spans(df) >= 1
    # the shipdate filter reaches the scan
    assert "l_shipdate" in explain.pushed_filters(df)
