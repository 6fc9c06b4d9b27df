import pyspark.sql.functions as F

from stellar_etl_spark import toid


def test_pack_unpack_roundtrip(spark):
    df = spark.createDataFrame(
        [(c, t, u) for c in [0, 1, 12345, toid.LEDGER_MASK] for t in [0, 1, 99, toid.TRANSACTION_MASK] for u in [0, 5, toid.OPERATION_MASK]],
        "c long, t int, u int",
    )
    packed = df.select(
        "c", "t", "u", toid.toid(F.col("c"), F.col("t"), F.col("u")).alias("id")
    )
    s, t, u = toid.unpack(F.col("id"))
    bad = packed.select(
        (s != F.col("c")).alias("a"), (t != F.col("t")).alias("b"), (u != F.col("u")).alias("d")
    ).where("a or b or d")
    assert bad.count() == 0


def test_order_preserved(spark):
    # TOID must sort identically to (conv_seq, turn_idx, unit_idx) — the O1
    # total-order invariant (reference toid/main.go:60-84).
    rows = [(1, 5, 0), (1, 5, 1), (1, 6, 0), (2, 0, 0), (2, 0, 4095), (2, 1, 0)]
    df = spark.createDataFrame(rows, "c long, t int, u int")
    got = [
        r["id"]
        for r in df.select(toid.toid(F.col("c"), F.col("t"), F.col("u")).alias("id"))
        .orderBy("id")
        .collect()
    ]
    assert got == sorted(got)
    by_tuple = (
        df.select("c", "t", "u", toid.toid(F.col("c"), F.col("t"), F.col("u")).alias("id"))
        .orderBy("c", "t", "u")
        .collect()
    )
    assert [r["id"] for r in by_tuple] == got


def test_synthetic_bit(spark):
    df = spark.createDataFrame([(7, 3, 1)], "c long, t int, u int")
    base = toid.toid(F.col("c"), F.col("t"), F.col("u"))
    row = df.select(
        base.alias("base"), toid.synthetic_toid(base).alias("synth")
    ).collect()[0]
    assert row["synth"] == row["base"] | toid.SYNTHETIC_BIT
    assert row["synth"] > 0  # bit 63 untouched — stays a valid positive long


def test_range_bounds():
    assert toid.toid_range_start(5) == 5 << 32
    assert toid.toid_range_end(5) == 6 << 32
    assert toid.toid_range_end(5) - 1 >= toid.toid_range_start(5)
