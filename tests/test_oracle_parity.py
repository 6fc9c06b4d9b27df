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
