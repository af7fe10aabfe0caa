"""Deterministic synthetic ``transcripts`` generator.

Input-table contract (BASELINE.json ``input_hint``)::

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp)

Mirrors the reference's deterministic-mock pattern (the reference seeds
mock embeddings from row ids — ``web/handlers/api.go:341-373``): every value
here is a pure function of ``(seed, conv index, turn index)``, so the table
is identical regardless of partitioning, executor count, or run order.
That property is what lets the NumPy oracles and kill-resume tests assert
exact equality.

Generation is **distributed**: ``spark.range(n_convs)`` fans conversation
ids across executors and each partition synthesizes its own turns inside an
Arrow-batched ``mapInPandas`` — no driver-side materialization, so the same
code generates 10^3 or 10^12 turns (the target scale) by changing one
argument.

Shape knobs (defaults follow FIXTURES.md §1):

* conversation sizes 2-50 turns, seeded distribution;
* ``role`` from a small set of user/assistant/system/named agents;
* ``tool`` Zipf-skewed over ~20 tools (hub vertices exist on purpose —
  skew handling is under test); ~30% of turns have NULL tool;
* ``text`` from a seeded vocabulary with duplicates injected at a known
  rate (duplicate-detection / connected-component tests);
* ``ts`` strictly increasing inside a conversation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["transcripts", "TRANSCRIPTS_SCHEMA", "ROLES", "TOOLS"]

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

ROLES = ["user", "assistant", "system", "agent_planner", "agent_coder", "agent_critic"]
TOOLS = [f"tool_{i:02d}" for i in range(20)]
_VOCAB = [
    "spark", "table", "scan", "join", "filter", "agg", "window", "shuffle",
    "parquet", "vector", "rank", "graph", "edge", "vertex", "batch", "stream",
    "merge", "sort", "hash", "salt", "skew", "checkpoint", "resume", "turn",
]
_BASE_TS = np.datetime64("2026-01-01T00:00:00")


def _conv_arrays(seed: int, conv: int, dup_rate: float) -> dict:
    """All turns of one conversation as raw arrays — pure fn of (seed, conv)."""
    rng = np.random.default_rng(np.uint64(seed * 1_000_003 + conv))
    n_turns = int(rng.integers(2, 51))
    turn_idx = np.arange(n_turns, dtype=np.int32)

    roles = np.array(ROLES)[rng.integers(0, len(ROLES), n_turns)]
    # Zipf-skewed tool choice: tool_00 is the hub (like the reference's
    # dominant default provider "whisper_cpp",
    # internal/app/repository/sqlite/transcription_v2.go:158).
    zipf_w = 1.0 / np.arange(1, len(TOOLS) + 1) ** 1.5
    zipf_w /= zipf_w.sum()
    tools = np.array(TOOLS)[rng.choice(len(TOOLS), n_turns, p=zipf_w)]
    tools = np.where(rng.random(n_turns) < 0.30, None, tools)

    # Seeded-vocabulary text; with prob dup_rate a turn reuses a canonical
    # duplicate string (known duplicate groups for dedup/CC tests).
    words = np.array(_VOCAB)[rng.integers(0, len(_VOCAB), (n_turns, 8))]
    text = np.array([" ".join(w) for w in words], dtype=object)
    dup_mask = rng.random(n_turns) < dup_rate
    dup_group = rng.integers(0, 10, n_turns)
    text[dup_mask] = np.array([f"canonical duplicate text {g}" for g in dup_group[dup_mask]])

    # Strictly increasing timestamps within the conversation.
    gaps = rng.integers(1, 120, n_turns).cumsum()
    ts = _BASE_TS + (np.int64(conv) * 86_400 + gaps).astype("timedelta64[s]")

    return {
        "conv_id": np.full(n_turns, f"conv_{conv:08d}", dtype=object),
        "turn_idx": turn_idx,
        "role": roles,
        "text": text,
        "tool": tools,
        "ts": ts.astype("datetime64[us]"),
    }


def _conv_rows(seed: int, conv: int, dup_rate: float) -> pd.DataFrame:
    """All turns of one conversation — pure function of (seed, conv)."""
    return pd.DataFrame(_conv_arrays(seed, conv, dup_rate))


def transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    dup_rate: float = 0.05,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table with ``n_convs`` conversations."""
    if num_partitions is None:
        num_partitions = max(1, min(n_convs, spark.sparkContext.defaultParallelism))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one DataFrame per Arrow batch, assembled from per-conv numpy arrays
        # (identical values — the per-conv rng streams are unchanged — but
        # without a pandas constructor per conversation, ~10x faster at
        # bench graph sizes)
        for pdf in batches:
            parts = [_conv_arrays(seed, int(conv), dup_rate) for conv in pdf["id"].to_numpy()]
            if parts:
                yield pd.DataFrame(
                    {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
                )

    return (
        spark.range(0, n_convs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )
