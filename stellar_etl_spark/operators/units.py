"""T4: sub-turn unit extraction — the TransformOperation analog
(``internal/transform/operation.go:30-101`` + the 27-way details switch at
``operation.go:584-1184``).

A turn explodes into ordered sub-turn units (the reference's tx → operations):

- ``tool`` turns produce one ``tool_call`` unit carrying the tool name and an
  args fingerprint in its details map;
- all other roles produce one ``span`` unit per ``span_tokens`` whitespace
  tokens (an empty text still yields one empty unit, matching the reference's
  ≥1-op-per-tx shape).

The explode is pure Column work: ``sequence`` + ``posexplode`` + ``slice`` —
no Python, no shuffle (narrow transform), codegen throughout. The details map
is the per-type ``create_map`` switch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import sha256_hex

UNIT_TYPE_CODES = {"span": 0, "tool_call": 1}


def extract_units(
    df: DataFrame, span_tokens: int = 8, conv_seq: Column | None = None
) -> DataFrame:
    """Explode transcripts into the UNITS output schema."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    toks = textfn.tokens(F.col("text"))
    is_tool = F.col("role") == "tool"

    n_units = F.when(is_tool, F.lit(1)).otherwise(
        F.greatest(F.ceil(F.size(toks) / F.lit(span_tokens)), F.lit(1)).cast("int")
    )

    base = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        seq.alias("conv_seq"),
        toks.alias("toks"),
        is_tool.alias("is_tool"),
        F.posexplode(F.sequence(F.lit(0), n_units - 1)).alias("unit_idx", "_unit_n"),
    )

    payload = F.when(
        F.col("is_tool"), F.array_join(F.col("toks"), " ")
    ).otherwise(
        F.array_join(
            F.slice(F.col("toks"), F.col("unit_idx") * span_tokens + 1, span_tokens), " "
        )
    )

    unit_type = F.when(F.col("is_tool"), F.lit("tool_call")).otherwise(F.lit("span"))

    # The per-type details switch (operation.go:584-1184): map keys depend on
    # the unit type AND the tool kind AND (for spans) the emitting role,
    # exactly like the reference's op-type-specific details maps (27-way
    # switch there; 7 tool-kind arms + 3 role-span arms + the base span/tool
    # maps here). Every value is engine-portable (the `units_details` oracle
    # recomputes each one in SQL).
    has_unicode = (F.octet_length(payload) != F.length(payload)).cast("string")
    n_digits = F.length(F.regexp_replace(payload, "[^0-9]", "")).cast("string")
    tool_extra = (
        F.when(
            F.col("tool") == "search",
            F.create_map(F.lit("n_terms"), textfn.token_count(payload).cast("string")),
        )
        .when(
            F.col("tool") == "code",
            F.create_map(F.lit("n_lines"), F.size(F.split(payload, "\n")).cast("string")),
        )
        .when(
            F.col("tool") == "calc",
            F.create_map(F.lit("n_digits"), n_digits),
        )
        .when(
            F.col("tool") == "fetch",
            # byte size is the fetch-payload signal (differs from n_chars on
            # multibyte text)
            F.create_map(F.lit("payload_bytes"), F.octet_length(payload).cast("string")),
        )
        .when(
            F.col("tool") == "browse",
            F.create_map(
                F.lit("n_unique_tokens"),
                F.size(F.array_distinct(textfn.tokens(payload))).cast("string"),
            ),
        )
        .when(
            # transaction-ish tool kinds (the driver tables' vocabulary):
            # purchase args carry a numeric payload — extract it
            F.col("tool") == "purchase",
            F.create_map(F.lit("k_value"), F.regexp_extract(payload, "[0-9]+", 0)),
        )
        .when(
            # error-channel tool: message length after the failure prefix
            F.col("tool") == "error",
            F.create_map(
                F.lit("error_chars"),
                F.length(F.regexp_replace(payload, "^error: ", "")).cast("string"),
            ),
        )
        .otherwise(F.create_map().cast("map<string,string>"))
    )
    # role-specific span arms (the reference's op-switch has per-source-kind
    # arms; spans get one per emitting role)
    span_extra = (
        F.when(
            F.col("role") == "user",
            F.create_map(F.lit("is_question"), payload.contains("?").cast("string")),
        )
        .when(
            F.col("role") == "assistant",
            F.create_map(
                F.lit("n_sentences"), F.size(F.split(payload, "\\.")).cast("string")
            ),
        )
        .when(
            F.col("role") == "system",
            F.create_map(F.lit("has_directive"), payload.contains(":").cast("string")),
        )
        .otherwise(F.create_map().cast("map<string,string>"))
    )
    # payload-shape span arms (the reference's asset/value-type switches):
    # structured JSON, pure-numeric, and URL-bearing spans each add a key.
    # replace(), not regexp_replace: replace-all semantics match DuckDB's
    # replace() without the 'g'-flag dialect difference.
    shape_extra = (
        F.when(
            F.startswith(payload, F.lit("{")),
            F.create_map(
                F.lit("json_keys"),
                ((F.length(payload) - F.length(F.replace(payload, F.lit('":'), F.lit("")))) / 2)
                .cast("int")
                .cast("string"),
            ),
        )
        .when(
            payload.rlike("^[0-9 ]+$"),
            F.create_map(F.lit("digits_only"), F.lit("true")),
        )
        .when(
            payload.contains("http"),
            F.create_map(
                F.lit("n_urls"),
                ((F.length(payload) - F.length(F.replace(payload, F.lit("http"), F.lit("")))) / 4)
                .cast("int")
                .cast("string"),
            ),
        )
        .otherwise(F.create_map().cast("map<string,string>"))
    )
    details = F.when(
        F.col("is_tool"),
        F.map_concat(
            F.create_map(
                F.lit("tool"), F.coalesce(F.col("tool"), F.lit("")),
                F.lit("args_sha256"), sha256_hex(payload),
                F.lit("failed"), F.coalesce(F.startswith(payload, F.lit("error:")), F.lit(False)).cast("string"),
            ),
            tool_extra,
        ),
    ).otherwise(
        F.map_concat(
            F.create_map(
                # token_count, not raw split: F.split('') returns [''] (size 1)
                F.lit("span_tokens"), textfn.token_count(payload).cast("string"),
                F.lit("span_chars"), F.length(payload).cast("string"),
                F.lit("has_unicode"), has_unicode,
                F.lit("n_digits"), n_digits,
            ),
            F.map_concat(span_extra, shape_extra),
        )
    )

    turn_id = toid_mod.toid(F.col("conv_seq"), "turn_idx")
    return base.select(
        toid_mod.toid(F.col("conv_seq"), "turn_idx", F.col("unit_idx")).alias("unit_id"),
        turn_id.alias("turn_id"),
        "conv_id",
        "turn_idx",
        F.col("unit_idx").cast("int").alias("unit_idx"),
        unit_type.alias("unit_type"),
        F.when(F.col("is_tool"), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("unit_type_code"),
        payload.alias("payload"),
        details.alias("details"),
        "ts",
    )
