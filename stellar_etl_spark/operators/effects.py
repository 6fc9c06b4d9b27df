"""T5: effect fan-out — the TransformEffect analog
(``internal/transform/effects.go:23-169`` + ~40 emitters).

The reference flatMaps each *successful* transaction into 0..N typed effect
rows (failed txs emit nothing, ``effects.go:55-57``), assigns a dense per-op
effect index and an ``"{opID}-{idx}"`` string id (``effects.go:161-166``).

Spark-first shape: build a per-turn array of conditional effect structs,
``filter`` out the null (non-firing) slots, ``posexplode`` — the dense index
falls out of the post-filter position, and the whole emitter chain stays in
whole-stage codegen (no UDTF, no Python).

Effect rules (the emitter-table analog, deterministic on the row):

| code | type            | fires when                          |
|------|-----------------|-------------------------------------|
| 0    | turn_added      | every successful turn               |
| 1    | tool_invoked    | successful tool turn                |
| 2    | empty_text      | successful turn with empty text     |
| 3    | long_turn       | successful turn with > 30 tokens    |
| 4    | conversation_opened | successful turn with turn_idx == 0 |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful

EFFECT_TYPES = {
    0: "turn_added",
    1: "tool_invoked",
    2: "empty_text",
    3: "long_turn",
    4: "conversation_opened",
}


def _effect(code: int, cond: Column, details: Column) -> Column:
    return F.when(
        cond,
        F.struct(
            F.lit(code).alias("effect_type"),
            F.lit(EFFECT_TYPES[code]).alias("effect_type_string"),
            details.alias("details"),
        ),
    )


def extract_effects(
    df: DataFrame, long_turn_tokens: int = 30, conv_seq: Column | None = None
) -> DataFrame:
    """Fan transcripts out into the EFFECTS output schema."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    successful = is_successful(F.col("text"))
    n_tokens = textfn.token_count(F.col("text"))
    empty = F.coalesce(F.col("text"), F.lit("")) == ""

    emitters = F.array(
        _effect(
            0,
            F.lit(True),
            F.create_map(F.lit("role"), F.col("role"), F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(
            1,
            F.col("role") == "tool",
            F.create_map(F.lit("tool"), F.coalesce(F.col("tool"), F.lit(""))),
        ),
        _effect(2, empty, F.create_map(F.lit("role"), F.col("role"))),
        _effect(
            3,
            n_tokens > long_turn_tokens,
            F.create_map(F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(4, F.col("turn_idx") == 0, F.create_map(F.lit("role"), F.col("role"))),
    )

    fired = F.filter(emitters, lambda x: x.isNotNull())

    # Failed turns emit nothing (effects.go:55-57) — filter BEFORE the explode
    # so the excluded rows never materialize.
    base = df.where(successful).select(
        "conv_id",
        "turn_idx",
        "ts",
        seq.alias("conv_seq"),
        F.posexplode(fired).alias("effect_index", "eff"),
    )

    turn_id = toid_mod.toid(F.col("conv_seq"), "turn_idx")
    return base.select(
        F.format_string("%d-%d", turn_id, F.col("effect_index")).alias("effect_id"),
        turn_id.alias("turn_id"),
        "conv_id",
        "turn_idx",
        F.col("effect_index").cast("int").alias("effect_index"),
        F.col("eff.effect_type").cast("int").alias("effect_type"),
        F.col("eff.effect_type_string").alias("effect_type_string"),
        F.col("eff.details").alias("details"),
        "ts",
    )
