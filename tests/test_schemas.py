"""Schema-registry conformance — extractor outputs must match the fixed
StructTypes in schemas.py (the reference's single-schema-registry property,
``internal/transform/schema.go``: adding/renaming a column is a deliberate
schema change, never an accident)."""

from pyspark.sql import types as T

from stellar_etl_spark import schemas
from stellar_etl_spark.operators import (
    extract_conversations,
    extract_effects,
    extract_pairs,
    extract_sessions,
    extract_turns,
    extract_units,
)


def _shape(schema: T.StructType) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_output_schemas_match_registry(micro):
    cases = [
        (extract_turns(micro), schemas.TURNS),
        (extract_conversations(micro), schemas.CONVERSATIONS),
        (extract_units(micro), schemas.UNITS),
        (extract_effects(micro), schemas.EFFECTS),
        (extract_pairs(micro), schemas.PAIRS),
        (extract_sessions(micro), schemas.SESSIONS),
    ]
    for df, want in cases:
        assert _shape(df.schema) == _shape(want), want


def test_star_schemas_match_registry(micro):
    from stellar_etl_spark.operators import extract_star_schema

    star = extract_star_schema(micro)
    assert _shape(star["dim_conversation"].schema) == _shape(schemas.DIM_CONVERSATION)
    assert _shape(star["dim_role"].schema) == _shape(schemas.DIM_ROLE)
    assert _shape(star["dim_tool"].schema) == _shape(schemas.DIM_TOOL)
    assert _shape(star["fact_turn_event"].schema) == _shape(schemas.FACT_TURN_EVENT)
