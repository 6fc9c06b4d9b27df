"""Committed golden-file tests — the reference's `.golden` corpus pattern
(``cmd/test_utils.go:39-126``: run, concatenate sorted output, diff against a
committed golden; update mode via ``-args -update=true``, ours via
``GOLDEN_UPDATE=1 pytest``).

The goldens pin the engine's *exact* output bytes for a fixed generator seed:
per-turn text equality under stable (conv_id, turn_idx) ordering — the north
rule's golden invariant. Any change to generator, TOID, or extractor
semantics shows up as a diff here.
"""

import json
import os
import pathlib

import pyspark.sql.functions as F
import pytest

from stellar_etl_spark.generator import transcripts_df
from stellar_etl_spark.operators import (
    extract_conversations,
    extract_effects,
    extract_turns,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
UPDATE = os.environ.get("GOLDEN_UPDATE") == "1"


def _rows_to_jsonl(df, cols, order):
    rows = [r.asDict() for r in df.select(*cols).orderBy(*order).collect()]

    def enc(v):
        return v.isoformat() if hasattr(v, "isoformat") else v

    return "\n".join(json.dumps({k: enc(v) for k, v in r.items()}, sort_keys=True) for r in rows)


def _check(name: str, content: str):
    path = GOLDEN_DIR / f"{name}.golden.jsonl"
    if UPDATE or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_text(content + "\n")
        if not UPDATE:
            pytest.fail(f"golden {name} was missing — created; commit it and re-run")
    assert content + "\n" == path.read_text(), f"golden mismatch: {name}"


@pytest.fixture(scope="module")
def fixed(spark):
    return transcripts_df(spark, n_convs=12, seed=12345, hot_convs=1, hot_turns=24).cache()


def test_turns_golden(fixed):
    df = extract_turns(fixed)
    cols = ["turn_id", "conv_id", "turn_idx", "role", "tool", "text", "text_sha256",
            "n_chars", "n_tokens", "successful", "ts"]
    _check("turns", _rows_to_jsonl(df, cols, ["conv_id", "turn_idx"]))


def test_conversations_golden(fixed):
    df = extract_conversations(fixed)
    cols = ["conv_id", "conv_seq", "n_turns", "n_user", "n_assistant", "n_tool",
            "n_system", "n_successful", "n_failed", "total_chars", "total_tokens",
            "opened_at", "closed_at", "duration_sec"]
    _check("conversations", _rows_to_jsonl(df, cols, ["conv_id"]))


def test_effects_golden(fixed):
    df = extract_effects(fixed)
    cols = ["effect_id", "conv_id", "turn_idx", "effect_index", "effect_type",
            "effect_type_string", "ts"]
    _check("effects", _rows_to_jsonl(df, cols, ["conv_id", "turn_idx", "effect_index"]))


def test_goldens_stable_across_partitioning(spark, fixed):
    """The batch-independence property: repartitioned input produces the
    identical golden bytes (reference cmd/export_ledgers_test.go:44-50)."""
    shuffled = fixed.repartition(17, "turn_idx")
    df = extract_turns(shuffled)
    cols = ["turn_id", "conv_id", "turn_idx", "role", "tool", "text", "text_sha256",
            "n_chars", "n_tokens", "successful", "ts"]
    content = _rows_to_jsonl(df, cols, ["conv_id", "turn_idx"])
    path = GOLDEN_DIR / "turns.golden.jsonl"
    assert content + "\n" == path.read_text()
