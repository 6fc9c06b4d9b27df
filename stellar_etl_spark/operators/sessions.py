"""Sessionization — conversation-close detection.

The reference's "ledger close" is definitional (an LCM exists ⇔ the ledger
closed); ours is inferred from event-time gaps (SURVEY §2.9). Batch shape: the
classic gap-and-island pass — flag gaps > ``gap_sec`` with ``lag``, running
``sum`` to number islands, aggregate. Two window passes + one aggregation, all
partitioned by ``conv_id`` (a single shuffle; the two windows share the sort).

Streaming shape: ``F.session_window(ts, gap)`` + watermark — see
:mod:`stellar_etl_spark.streaming.pipeline`. Both produce identical rows for
in-order-enough input; the golden tests pin that equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def extract_sessions(df: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Split each conversation into event-time sessions (gap > gap_sec)."""
    by_ts = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(by_ts))
    flagged = df.withColumn(
        "new_session", F.when(gap.isNull() | (gap > gap_sec), F.lit(1)).otherwise(F.lit(0))
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(
            Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = numbered.groupBy("conv_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_turns"),
        F.count_if(F.col("role") == "user").alias("n_user"),
    )
    return out.select(
        "conv_id",
        "session_start",
        "session_end",
        "n_turns",
        "n_user",
        (F.unix_timestamp("session_end") - F.unix_timestamp("session_start"))
        .cast("double")
        .alias("duration_sec"),
    )


def extract_sessions_streaming(df: DataFrame, gap: str = "30 minutes", watermark: str = "2 minutes") -> DataFrame:
    """Native session windows for the streaming path: state is bounded by the
    watermark; a session emits when the watermark passes its end + gap."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count_if(F.col("role") == "user").alias("n_user"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "conv_id",
            "session_start",
            "session_end",
            "n_turns",
            "n_user",
            (F.unix_timestamp("session_end") - F.unix_timestamp("session_start"))
            .cast("double")
            .alias("duration_sec"),
        )
    )
