"""time_range edge battery — the reference's 10-case range golden corpus
(/root/reference/testdata/ranges/*.golden: normal_range, early_start,
early_end, late_start, late_end, same_date, checkpoint variants) plus the
maxFutureTolerance rejection (internal/input/ledger_range.go:96-113)."""

import pyspark.sql.functions as F
import pytest

from stellar_etl_spark.operators import time_range

T = "2026-01-01 10:00:{s:02d}"


@pytest.fixture(scope="module")
def rdf(spark):
    rows = [("c", i, "user", "w", None, T.format(s=i * 10)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp")).cache()


CASES = [
    # (name, start_s, end_s, want_start_s, want_end_s, want_n)
    ("normal_range", 10, 40, 10, 40, 4),
    ("early_start", -3600, 40, 0, 40, 5),
    ("early_end", -7200, -3600, 0, 0, 1),
    ("late_start_within_tolerance", 55, 59, 50, 50, 1),
    ("late_end_within_tolerance", 30, 55, 30, 50, 3),
    ("same_instant", 20, 20, 20, 20, 1),
    ("exact_bounds", 0, 50, 0, 50, 6),
]


@pytest.mark.parametrize("name,start_s,end_s,ws,we,wn", CASES, ids=[c[0] for c in CASES])
def test_range_edges(rdf, name, start_s, end_s, ws, we, wn):
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    start = base + dt.timedelta(seconds=start_s)
    end = base + dt.timedelta(seconds=end_s)
    row = time_range(rdf, start, end).collect()[0]
    assert row["start_ts"] == base + dt.timedelta(seconds=ws), name
    assert row["end_ts"] == base + dt.timedelta(seconds=we), name
    assert row["n_turns"] == wn, name


def test_range_whole_table_no_tolerance(rdf):
    row = time_range(rdf, "2000-01-01 00:00:00", "2100-01-01 00:00:00",
                     future_tolerance_sec=None).collect()[0]
    assert row["n_turns"] == 6


def test_range_rejects_far_future(rdf):
    from py4j.protocol import Py4JJavaError

    df = time_range(rdf, "2026-01-01 10:00:30", "2026-01-01 10:30:00")
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "exceeds latest event" in str(exc.value)
    # start in the future fails too
    with pytest.raises(Exception):
        time_range(rdf, "2026-01-01 11:00:00", "2026-01-01 11:00:01").collect()


def test_range_rejects_inverted(rdf):
    with pytest.raises(ValueError):
        time_range(rdf, "2026-01-01 10:00:40", "2026-01-01 10:00:10")
