"""Fixed output-table schemas — the analog of the reference's single
schema registry (``internal/transform/schema.go:13-701``, one Go struct per
BigQuery table).

Like the reference, schemas are fixed and compile-time (no inference); the one
dynamic escape hatch — ``--extra-fields k=v`` constant columns appended at
export time (``internal/utils/main.go:237``, ``cmd/command_utils.go:69-71``) —
is :func:`with_extra_fields`.

Type-mapping policy follows the reference's own Parquet converter
(``internal/transform/parquet_converter.go:27-60``): unsigned ints widen to
long, event times are timestamps, semi-structured details become a typed map /
JSON string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input table (BASELINE.json input_hint): the engine's one source table.
# Analog of the reference's ledger/tx stream (input/ledger_batches.go:13-17).
# ---------------------------------------------------------------------------
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Output tables, one per extractor. Names mirror SURVEY.md §2.3 mappings.
# ---------------------------------------------------------------------------

# T2 TransformTransaction analog (transform/transaction.go:20-304):
# one row per turn, TOID id, event time, derived scalar columns.
TURNS = StructType(
    [
        StructField("turn_id", LongType(), False),          # TOID (toid/main.go:60-84)
        StructField("conv_id", StringType(), False),
        StructField("conv_seq", LongType(), False),         # stable hash of conv_id
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("role_code", IntegerType(), False),     # op-type int analog
        StructField("tool", StringType(), True),
        StructField("text", StringType(), True),
        StructField("text_sha256", StringType(), False),    # C16 ledger-key hash analog
        StructField("text_b64", StringType(), True),        # C3 base64 XDR analog
        StructField("n_chars", LongType(), False),
        StructField("n_tokens", LongType(), False),
        StructField("successful", BooleanType(), False),    # schema.go:58 analog
        StructField("ts", TimestampType(), False),
        StructField("ts_interval", StringType(), False),    # C9 "[min,max)" bounds
    ]
)

# T1/A1 TransformLedger analog (transform/ledger.go:17-166): one row per
# conversation with count aggregates by role/success.
CONVERSATIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("conv_seq", LongType(), False),
        StructField("n_turns", LongType(), False),
        StructField("n_user", LongType(), False),
        StructField("n_assistant", LongType(), False),
        StructField("n_tool", LongType(), False),
        StructField("n_system", LongType(), False),
        StructField("n_successful", LongType(), False),
        StructField("n_failed", LongType(), False),
        StructField("total_chars", LongType(), False),
        StructField("total_tokens", LongType(), False),
        StructField("opened_at", TimestampType(), False),
        StructField("closed_at", TimestampType(), False),
        StructField("duration_sec", DoubleType(), False),
    ]
)

# T4 TransformOperation analog (transform/operation.go:30-101 + 27-way details
# switch :584-1184): one row per sub-turn unit with a details map keyed by type.
UNITS = StructType(
    [
        StructField("unit_id", LongType(), False),          # TOID with unit_idx
        StructField("turn_id", LongType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("unit_idx", IntegerType(), False),
        StructField("unit_type", StringType(), False),      # sentence | tool_call
        StructField("unit_type_code", IntegerType(), False),
        StructField("payload", StringType(), True),
        StructField("details", MapType(StringType(), StringType()), False),
        StructField("ts", TimestampType(), False),
    ]
)

# T5 TransformEffect analog (transform/effects.go:23-169): N rows per unit,
# dense per-parent index, "{parent}-{idx}" string id (effects.go:161-166).
EFFECTS = StructType(
    [
        StructField("effect_id", StringType(), False),
        StructField("turn_id", LongType(), False),
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("effect_index", IntegerType(), False),
        StructField("effect_type", IntegerType(), False),
        StructField("effect_type_string", StringType(), False),
        StructField("details", MapType(StringType(), StringType()), False),
        StructField("ts", TimestampType(), False),
    ]
)

# J2 as-of join output (trade.go:281-304 findLatestOperationChange analog):
# each user turn paired with the first following assistant/tool response.
PAIRS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("user_turn_idx", IntegerType(), False),
        StructField("user_ts", TimestampType(), False),
        StructField("user_text", StringType(), True),
        StructField("resp_turn_idx", IntegerType(), True),
        StructField("resp_role", StringType(), True),
        StructField("resp_ts", TimestampType(), True),
        StructField("resp_text", StringType(), True),
        StructField("latency_sec", DoubleType(), True),
    ]
)

# Session-window close records (reference ledger-close analog; SURVEY §2.9).
SESSIONS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_turns", LongType(), False),
        StructField("n_user", LongType(), False),
        StructField("duration_sec", DoubleType(), False),
    ]
)

# T12 star schema (transform/offer_normalized.go:16-57): dims + fact.
DIM_CONVERSATION = StructType(
    [
        StructField("conv_dim_id", LongType(), False),
        StructField("conv_id", StringType(), False),
    ]
)
DIM_TOOL = StructType(
    [
        StructField("tool_dim_id", LongType(), False),
        StructField("tool", StringType(), False),
    ]
)
DIM_ROLE = StructType(
    [
        StructField("role_dim_id", LongType(), False),
        StructField("role", StringType(), False),
    ]
)
FACT_TURN_EVENT = StructType(
    [
        StructField("turn_id", LongType(), False),
        StructField("conv_dim_id", LongType(), False),
        StructField("role_dim_id", LongType(), False),
        StructField("tool_dim_id", LongType(), True),
        StructField("n_chars", LongType(), False),
        StructField("ts", TimestampType(), False),
    ]
)

# K4 transform stats (cmd/command_utils.go:90-103 PrintTransformStats).
TRANSFORM_STATS = StructType(
    [
        StructField("extractor", StringType(), False),
        StructField("attempted", LongType(), False),
        StructField("successful", LongType(), False),
        StructField("failed", LongType(), False),
    ]
)


def with_extra_fields(df: DataFrame, extra: dict[str, str] | None) -> DataFrame:
    """``--extra-fields k=v`` analog: append constant metadata columns
    (``cmd/command_utils.go:69-71``)."""
    for k, v in (extra or {}).items():
        df = df.withColumn(k, F.lit(v))
    return df


ROLE_CODES = {"user": 0, "assistant": 1, "tool": 2, "system": 3}
