"""T12: star-schema normalization — the TransformOfferNormalized analog
(``internal/transform/offer_normalized.go:16-57``): each event row becomes one
fact row plus first-seen dim rows keyed by stable content hashes
(FNV-1a there, ``offer_normalized.go:102-183``; stable ``xxhash64`` here).

Scale notes: dims are tiny relative to the fact stream, so
- dim extraction is ``dropDuplicates`` on the natural key (map-side partial
  dedup shrinks the shuffle to |distinct| rows);
- re-denormalization broadcasts the dims (J7) — no shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions.scalars import stable_id


def extract_star_schema(df: DataFrame) -> dict[str, DataFrame]:
    """Normalize transcripts into {dim_conversation, dim_role, dim_tool,
    fact_turn_event} (schemas.DIM_* / FACT_TURN_EVENT)."""
    dim_conv = (
        df.select("conv_id")
        .dropDuplicates(["conv_id"])
        .select(stable_id(F.lit("conv"), F.col("conv_id")).alias("conv_dim_id"), "conv_id")
    )
    dim_role = (
        df.select("role")
        .dropDuplicates(["role"])
        .select(stable_id(F.lit("role"), F.col("role")).alias("role_dim_id"), "role")
    )
    dim_tool = (
        df.where(F.col("tool").isNotNull())
        .select("tool")
        .dropDuplicates(["tool"])
        .select(stable_id(F.lit("tool"), F.col("tool")).alias("tool_dim_id"), "tool")
    )
    fact = df.select(
        toid_mod.toid(toid_mod.conv_seq("conv_id"), "turn_idx").alias("turn_id"),
        stable_id(F.lit("conv"), F.col("conv_id")).alias("conv_dim_id"),
        stable_id(F.lit("role"), F.col("role")).alias("role_dim_id"),
        F.when(F.col("tool").isNotNull(), stable_id(F.lit("tool"), F.col("tool"))).alias(
            "tool_dim_id"
        ),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("n_chars"),
        "ts",
    )
    return {
        "dim_conversation": dim_conv,
        "dim_role": dim_role,
        "dim_tool": dim_tool,
        "fact_turn_event": fact,
    }


def denormalize(star: dict[str, DataFrame]) -> DataFrame:
    """J7: fact ⋈ dims with explicit broadcast of the small sides."""
    fact = star["fact_turn_event"]
    return (
        fact.join(F.broadcast(star["dim_conversation"]), "conv_dim_id", "left")
        .join(F.broadcast(star["dim_role"]), "role_dim_id", "left")
        .join(F.broadcast(star["dim_tool"]), "tool_dim_id", "left")
        .select("turn_id", "conv_id", "role", "tool", "n_chars", "ts")
    )
