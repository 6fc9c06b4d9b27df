"""The extractors — analogs of the reference's transform package
(``internal/transform/*.go``), each a pure DataFrame → DataFrame function."""

from stellar_etl_spark.operators.turns import extract_turns  # noqa: F401
from stellar_etl_spark.operators.conversations import extract_conversations  # noqa: F401
from stellar_etl_spark.operators.units import extract_units  # noqa: F401
from stellar_etl_spark.operators.effects import extract_effects  # noqa: F401
from stellar_etl_spark.operators.pairs import extract_pairs  # noqa: F401
from stellar_etl_spark.operators.sessions import extract_sessions  # noqa: F401
from stellar_etl_spark.operators.dedup import first_seen_dedup, compact_last_state  # noqa: F401
from stellar_etl_spark.operators.dims import extract_star_schema  # noqa: F401
from stellar_etl_spark.operators.ranges import time_range  # noqa: F401
from stellar_etl_spark.operators.diffs import extract_tool_diffs  # noqa: F401
from stellar_etl_spark.operators.timeline import extract_timeline  # noqa: F401
from stellar_etl_spark.operators.payload import extract_structured_payload  # noqa: F401
