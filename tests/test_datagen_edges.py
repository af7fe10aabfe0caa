"""Datagen determinism, the per-turn text-equality invariant, edge derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiktok_whisper_spark import datagen
from tiktok_whisper_spark.operators import edges as E


def test_transcripts_schema_and_determinism(spark):
    t1 = datagen.transcripts(spark, n_convs=30, seed=42).orderBy("conv_id", "turn_idx")
    t2 = datagen.transcripts(spark, n_convs=30, seed=42, num_partitions=3).orderBy(
        "conv_id", "turn_idx"
    )
    assert [f.name for f in t1.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t1.collect() == t2.collect()  # identical regardless of partitioning


def test_per_turn_text_equality_roundtrip(spark, tmp_path):
    """BASELINE invariant: per-turn text equality under stable turn ordering
    after a round-trip through the engine's storage."""
    t = datagen.transcripts(spark, n_convs=20, seed=42)
    path = str(tmp_path / "transcripts")
    t.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    orig = t.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    rt = back.select("conv_id", "turn_idx", "text").orderBy("conv_id", "turn_idx").collect()
    assert orig == rt


def test_ts_strictly_increasing_within_conv(spark):
    t = datagen.transcripts(spark, n_convs=20, seed=42)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    bad = (
        t.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("prev_ts").isNotNull() & (F.col("ts") <= F.col("prev_ts")))
        .count()
    )
    assert bad == 0


def test_adjacency_edges_line_graph(spark):
    """FIXTURES §6: a 5-turn single-conversation line → 4 transitions."""
    rows = [("c1", i, f"r{i}", f"t{i}", None, None) for i in range(5)]
    t = spark.createDataFrame(rows, datagen.TRANSCRIPTS_SCHEMA)
    adj = E.adjacency_edges(t)
    assert adj.count() == 4
    assert adj.agg(F.sum("weight")).collect()[0][0] == 4.0


def test_role_tool_edges_weights(spark):
    rows = [
        ("c1", 0, "user", "x", "toolA", None),
        ("c1", 1, "user", "y", "toolA", None),
        ("c1", 2, "user", "z", "toolB", None),
        ("c2", 0, "bot", "w", None, None),  # null tool → no edge
    ]
    t = spark.createDataFrame(rows, datagen.TRANSCRIPTS_SCHEMA)
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in E.role_tool_edges(t).collect()
    }
    vids = spark.createDataFrame(
        [("role", "user"), ("tool", "toolA"), ("tool", "toolB")], "kind string, name string"
    ).select(E.vertex_id(F.col("kind"), F.col("name")).alias("vid")).collect()
    user, toolA, toolB = (r["vid"] for r in vids)
    assert got[(user, toolA)] == 2.0 and got[(user, toolB)] == 1.0 and len(got) == 2


def test_vertices_distinct_and_namespaced(spark):
    t = datagen.transcripts(spark, n_convs=10, seed=42)
    v = E.derive_vertices(t)
    assert v.count() == v.select("vid").distinct().count()
    kinds = {r["kind"] for r in v.select("kind").distinct().collect()}
    assert kinds == {"role", "tool"}


def test_degrees_and_hot_keys(spark):
    e = spark.createDataFrame(
        [(1, 100, 1.0, "t")] * 1 + [(i, 999, 1.0, "t") for i in range(2, 300)],
        "src long, dst long, weight double, etype string",
    )
    deg = {r["vid"]: (r["out_deg"], r["in_deg"]) for r in E.degrees(e).collect()}
    assert deg[999] == (0, 298)
    hot = {r["vid"] for r in E.hot_keys(e, key="dst", threshold=100).collect()}
    assert hot == {999}
