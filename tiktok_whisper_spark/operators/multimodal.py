"""Multimodal (audio/image/video) columns: real Spark plumbing, stubbed codecs.

The reference's whole purpose is audio→text (whisper.cpp subprocess at
``internal/app/api/whisper_cpp/whisper_cpp.go:51-72``; duration probe via
ffprobe at ``internal/app/audio/Audio.go:17-29``). At 100 TB the engine
treats media as opaque ``binary`` columns with typed metadata and runs
decode/feature-extraction as Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signatures and batch shapes here are real and tested; the
codec call itself is stubbed (no ffmpeg/PIL in this image) behind
``decoder=`` with a deterministic fake for tests and a NotImplementedError
default, exactly where a whisper/ffmpeg worker plugs in.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "read_media_dir",
    "media_metadata",
    "extract_features",
    "sample_frames",
    "deterministic_fake_decoder",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modification_time", T.TimestampType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def read_media_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S3's directory scan as a binary-file source: list + filter + stable
    mod-time order (``internal/app/util/files/FileUtils.go:52-79``)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .orderBy("modificationTime", "path")
    )


def media_metadata(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Typed metadata columns: basename, extension (lower-cased match like
    FileUtils.go:65), content sha256 (hash.go:12-25), size."""
    name = F.element_at(F.split(F.col(path_col), "/"), -1)
    return df.withColumns(
        {
            "file_name": name,
            "ext": F.lower(F.element_at(F.split(name, r"\."), -1)),
            "content_sha256": F.sha2(F.col("content"), 256),
            "size_bytes": F.length(F.col("content")).cast("long"),
        }
    )


def deterministic_fake_decoder(content: bytes, dim: int = 16) -> np.ndarray:
    """Test decoder: feature vector as a pure function of the bytes (the
    reference's deterministic-mock pattern, ``web/handlers/api.go:341-373``)."""
    h = np.frombuffer(content[: dim * 8].ljust(dim * 8, b"\0"), dtype=np.uint64)
    return (h % 1000).astype(np.float64) / 1000.0 - 0.5


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    dim: int = 16,
    decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Decode + feature-extract as Arrow-batched ``mapInPandas``.

    ``decoder(bytes) -> ndarray[dim]`` is the pluggable codec boundary
    (whisper embedding, CLIP, mel spectrogram pooling, …). Default raises —
    media codecs are not installed in this sandbox.
    """
    if decoder is None:
        def decoder(content: bytes) -> np.ndarray:  # pragma: no cover - stub
            raise NotImplementedError(
                "no media codec in this image; pass decoder= (e.g. a whisper/"
                "ffmpeg worker) — plumbing is real, codec is the stub"
            )

    dec = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(bytes(c))[:dim].tolist() for c in pdf[content_col]]
            yield pd.DataFrame({"id": pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(
        run, schema=f"id string, features array<double>"
    )


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    byte-offset (a real video decoder replaces the offset slicing; the
    explode shape, batch sizing and schema are what's under test)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_idx, offsets, checksums = [], [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row[content_col])
                for i in range(min(max_frames, max(1, len(content) // every_n_bytes))):
                    chunk = content[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(row[id_col])
                    frame_idx.append(i)
                    offsets.append(i * every_n_bytes)
                    checksums.append(int(np.frombuffer(
                        chunk[:8].ljust(8, b"\0"), dtype=np.uint64)[0] % (2**63)))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": frame_idx, "byte_offset": offsets,
                 "frame_checksum": checksums}
            )

    return df.select(id_col, content_col).mapInPandas(
        run, schema="id string, frame_idx int, byte_offset long, frame_checksum long"
    )
