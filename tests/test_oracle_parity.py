"""Driver-contract parity: every registry query vs its DuckDB oracle at
sf0.001 (the driver itself runs sf0.01 — covered manually; this keeps the
suite fast)."""

import os

import pytest

from stellar_etl_spark.plans.registry import REGISTRY
from tests.oracle_harness import duck_connection, compare

SF = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, (_, sql) in REGISTRY.items() if sql])
def test_oracle_parity(spark, duck, name):
    fn, sql = REGISTRY[name]
    r = compare(fn(spark, SF), duck, sql)
    assert r["rows_match"], f"{name}: rows {r['spark_rows']} vs {r['duck_rows']}"
    assert r["values_match"], f"{name}: {r['first_diff']}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 19


def test_registry_inside_driver_window():
    # The per-round correctness driver verifies only the FIRST ~50 registry
    # entries (CORRECTNESS_r04 contained exactly the first 50 of 52, silently
    # dropping the two ANN queries appended at the end). Every entry must sit
    # inside that window or its oracle never runs — see the invariant comment
    # above REGISTRY in plans/registry.py.
    assert len(REGISTRY) <= 50, (
        f"REGISTRY has {len(REGISTRY)} entries; the driver checks only the "
        "first ~50 — fold or drop an entry instead of appending past the cap"
    )
