"""T1/A1: conversation summary — the TransformLedger analog
(``internal/transform/ledger.go:17-166``).

The reference folds one ledger's transactions into count aggregates
(``extractCounts``, ledger.go:133-166): tx count, successful/failed counts,
operation counts. Ours is the same shape as a ``groupBy(conv_id)`` — Catalyst
plans it as partial (map-side) + final aggregation, so the shuffle carries
only one row per (conv, partition), not the raw turns. A windowed variant
keys by (conv_id, tumbling window) for the streaming path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful


def _aggs() -> list[Column]:
    successful = is_successful(F.col("text"))
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("role") == "user").alias("n_user"),
        F.count_if(F.col("role") == "assistant").alias("n_assistant"),
        F.count_if(F.col("role") == "tool").alias("n_tool"),
        F.count_if(F.col("role") == "system").alias("n_system"),
        F.count_if(successful).alias("n_successful"),
        F.count_if(~successful).alias("n_failed"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).cast("long").alias("total_chars"),
        F.sum(textfn.token_count(F.col("text"))).cast("long").alias("total_tokens"),
        F.min("ts").alias("opened_at"),
        F.max("ts").alias("closed_at"),
    ]


def extract_conversations(df: DataFrame, conv_seq: Column | None = None) -> DataFrame:
    """Batch conversation summaries, one row per conv_id.

    ``conv_seq`` is functionally dependent on ``conv_id``, so grouping by both
    is free (no extra shuffle width) and lets callers pass any per-conversation
    sequence column."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    out = (
        df.withColumn("_conv_seq", seq)
        .groupBy("conv_id", "_conv_seq")
        .agg(*_aggs())
    )
    return out.select(
        "conv_id",
        F.col("_conv_seq").alias("conv_seq"),
        "n_turns",
        "n_user",
        "n_assistant",
        "n_tool",
        "n_system",
        "n_successful",
        "n_failed",
        "total_chars",
        "total_tokens",
        "opened_at",
        "closed_at",
        (F.unix_timestamp("closed_at") - F.unix_timestamp("opened_at"))
        .cast("double")
        .alias("duration_sec"),
    )


def extract_conversations_windowed(
    df: DataFrame, window: str = "5 minutes", watermark: str | None = None
) -> DataFrame:
    """Tumbling-window conversation aggregates — the streaming shape
    (reference batches 64 ledgers ≈ 5 minutes per output file,
    ``internal/utils/main.go:265``, README.md:293). Works on both batch and
    streaming DataFrames; streaming callers set ``watermark`` to bound state.
    """
    if watermark:
        df = df.withWatermark("ts", watermark)
    out = df.groupBy(F.window("ts", window).alias("win"), F.col("conv_id")).agg(*_aggs())
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "conv_id",
        "n_turns",
        "n_user",
        "n_assistant",
        "n_tool",
        "n_system",
        "n_successful",
        "n_failed",
        "total_chars",
        "total_tokens",
        "opened_at",
        "closed_at",
    )
