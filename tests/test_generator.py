import pyspark.sql.functions as F

from stellar_etl_spark.generator import transcripts_df, write_transcripts, read_transcripts


def test_deterministic(spark):
    a = transcripts_df(spark, n_convs=25, seed=9).orderBy("conv_id", "turn_idx").collect()
    b = transcripts_df(spark, n_convs=25, seed=9).orderBy("conv_id", "turn_idx").collect()
    assert a == b


def test_seed_changes_content(spark):
    a = transcripts_df(spark, n_convs=10, seed=1).orderBy("conv_id", "turn_idx").collect()
    b = transcripts_df(spark, n_convs=10, seed=2).orderBy("conv_id", "turn_idx").collect()
    assert a != b


def test_schema_and_keys(spark):
    df = transcripts_df(spark, n_convs=30)
    assert [f.name for f in df.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # (conv_id, turn_idx) unique, turn_idx dense from 0
    n = df.count()
    assert df.select("conv_id", "turn_idx").distinct().count() == n
    mins = df.groupBy("conv_id").agg(F.min("turn_idx").alias("lo"), F.max("turn_idx").alias("hi"), F.count("*").alias("c"))
    bad = mins.where((F.col("lo") != 0) | (F.col("hi") != F.col("c") - 1))
    assert bad.count() == 0


def test_skew_and_roles(spark):
    df = transcripts_df(spark, n_convs=50, hot_convs=2, hot_turns=200)
    sizes = dict(df.groupBy("conv_id").count().collect())
    assert sizes["conv_00000000"] == 200 and sizes["conv_00000001"] == 200
    roles = {r["role"] for r in df.select("role").distinct().collect()}
    assert roles <= {"user", "assistant", "tool", "system"}
    # tool turns always carry a tool name; others never do
    assert df.where((F.col("role") == "tool") & F.col("tool").isNull()).count() == 0
    assert df.where((F.col("role") != "tool") & F.col("tool").isNotNull()).count() == 0


def test_bounded_disorder(spark):
    disorder = 15
    df = transcripts_df(spark, n_convs=40, disorder_sec=disorder, session_break_gap_sec=3600)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = df.withColumn("prev_ts", F.lag("ts").over(w))
    regress = lagged.select(
        (F.unix_timestamp("prev_ts") - F.unix_timestamp("ts")).alias("back")
    ).where(F.col("back") > 0)
    # disorder exists but is bounded by 2*disorder (jitter range)
    assert regress.count() > 0
    assert regress.agg(F.max("back")).collect()[0][0] <= 2 * disorder


def test_duplicates_flag(spark):
    base = transcripts_df(spark, n_convs=30).count()
    dup = transcripts_df(spark, n_convs=30, with_duplicates=True)
    assert dup.count() > base
    assert dup.dropDuplicates(["conv_id", "turn_idx"]).count() == base


def test_write_read_roundtrip(spark, tmp_path):
    df = transcripts_df(spark, n_convs=20)
    write_transcripts(df, str(tmp_path / "t"))
    back = read_transcripts(spark, str(tmp_path / "t"))
    assert back.count() == df.count()
    assert back.exceptAll(df).count() == 0
