"""Job-state table ops, streaming ingest, multimodal plumbing, export sinks."""

from __future__ import annotations

import datetime
import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiktok_whisper_spark.operators import multimodal as mm
from tiktok_whisper_spark.sources import exports
from tiktok_whisper_spark.streaming import ingest, jobs

TS = datetime.datetime(2026, 1, 1)


def _jobs(spark, rows):
    return spark.createDataFrame(rows, jobs.JOBS_SCHEMA)


def test_job_lifecycle(spark):
    t = _jobs(spark, [("j1", "u1", 10, "pending", "a.mp3", 0, {}, TS, TS)])
    t = jobs.upsert_jobs(t, _jobs(spark, [
        ("j1", "u1", 10, "processing", "a.mp3", 0, {}, TS, TS),  # update
        ("j2", "u2", 11, "pending", "b.mp3", 0, {"k": "v"}, TS, TS),  # insert
    ]))
    assert {(r["id"], r["status"]) for r in t.collect()} == {("j1", "processing"), ("j2", "pending")}

    done = spark.createDataFrame([("j1",)], "id string")
    t = jobs.transition_status(t, done, "completed")
    got = {r["id"]: r["status"] for r in t.collect()}
    assert got == {"j1": "completed", "j2": "pending"}

    stats = {r["status"]: r["cnt"] for r in jobs.queue_stats(t).collect()}
    assert stats == {"completed": 1, "pending": 1}

    with pytest.raises(ValueError):
        jobs.transition_status(t, done, "bogus")


def test_ttl_and_retry(spark):
    old = datetime.datetime(2020, 1, 1)
    t = _jobs(spark, [
        ("a", "u", 1, "completed", "x", 0, {}, old, old),   # expired
        ("b", "u", 2, "failed", "y", 1, {}, TS, TS),        # retryable
        ("c", "u", 3, "failed", "z", 2, {}, TS, TS),        # at cap
        ("d", "u", 4, "pending", "w", 0, {}, old, old),     # pending never expires
    ])
    t2 = jobs.ttl_cleanup(t, "2025-01-01 00:00:00")
    assert {r["id"] for r in t2.collect()} == {"b", "c", "d"}
    t3 = jobs.retry_failed_subset(t2, max_retries=2)
    got = {r["id"]: (r["status"], r["retry_count"]) for r in t3.collect()}
    assert got["b"] == ("pending", 2) and got["c"] == ("failed", 2)


def test_streaming_windowed_counts(spark, sf_dir, tmp_path):
    # the file-stream source wants a directory of files
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    import shutil

    shutil.copy(f"{sf_dir}/events.parquet", stream_dir / "part-0.parquet")
    events = ingest.read_event_stream(spark, str(stream_dir))
    agg = ingest.windowed_event_counts(events, window="1 hour", watermark="2 hours")
    out = ingest.run_to_memory_sink(agg, "stream_smoke")
    rows = out.collect()
    assert len(rows) > 0
    # streaming totals == batch totals (bounded source ⇒ exact)
    batch_total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r["cnt"] for r in rows) == batch_total


def test_multimodal_plumbing(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"clip_{i}.bin").write_bytes(bytes([i]) * (10_000 + i))
    media = mm.read_media_dir(spark, str(tmp_path), glob="*.bin")
    meta = mm.media_metadata(media)
    rows = meta.collect()
    assert {r["ext"] for r in rows} == {"bin"}
    assert all(r["size_bytes"] >= 10_000 for r in rows)

    feats = mm.extract_features(meta, decoder=mm.deterministic_fake_decoder, dim=16)
    got = {r["id"]: r["features"] for r in feats.collect()}
    assert all(len(v) == 16 for v in got.values())
    # deterministic: same bytes → same features
    again = {r["id"]: r["features"] for r in
             mm.extract_features(meta, decoder=mm.deterministic_fake_decoder, dim=16).collect()}
    assert got == again

    frames = mm.sample_frames(meta, every_n_bytes=4096, max_frames=8).collect()
    per_file = {}
    for r in frames:
        per_file.setdefault(r["id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in per_file.values())
    assert all(len(v) == 2 for v in per_file.values())  # 10k bytes // 4096 = 2

    # default decoder is an explicit stub
    with pytest.raises(Exception, match="NotImplementedError|no media codec"):
        mm.extract_features(meta).collect()


def test_export_sinks(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alice", [0.1, 0.2], None), (2, "bob", None, [0.3])],
        "id long, user string, embedding_openai array<double>, embedding_gemini array<double>",
    )
    csv_path = str(tmp_path / "csv")
    exports.to_csv(df, csv_path)
    back = spark.read.option("header", True).csv(csv_path)
    assert set(back.columns) == {"id", "user", "has_openai_embedding", "has_gemini_embedding"}
    assert back.count() == 2

    json_path = str(tmp_path / "json")
    exports.to_json(df, json_path)
    jback = spark.read.json(json_path)
    assert "embedding_openai" not in jback.columns and jback.count() == 2

    assert exports.to_excel(df, str(tmp_path / "x.xlsx")) is False  # openpyxl absent → graceful

    md_path = str(tmp_path / "md")
    exports.to_markdown(df, md_path, "user", "id")
    text = "".join(open(p).read() for p in glob.glob(os.path.join(md_path, "part-*")))
    assert "## alice" in text and "## bob" in text
