"""spark-submit entrypoint tests — the CLI surface mirroring the reference's
cobra commands (invoked in-process; the session is shared with the suite)."""

import json

from stellar_etl_spark import jobs


def test_generate_export_turns_and_range(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    jobs.main(["generate", "--out", src, "--n-convs", "25"])
    gen = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gen["written"] > 0

    jobs.main([
        "export_turns", "--source", src,
        "--sink", str(tmp_path / "turns"),
        "--checkpoint", str(tmp_path / "ck1"),
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs"] >= 1

    turns = spark.read.option("basePath", str(tmp_path / "turns")).parquet(
        str(tmp_path / "turns") + "/epoch=*"
    )
    assert turns.count() == gen["written"]

    jobs.main(["get_time_range", "--source", src, "--start", "2026-01-01", "--end", "2027-01-01"])
    rng = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert int(rng["n_turns"]) == gen["written"]


def test_export_changes_compacts(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    jobs.main(["generate", "--out", src, "--n-convs", "15"])
    capsys.readouterr()
    jobs.main([
        "export_changes", "--source", src,
        "--sink", str(tmp_path / "changes"),
        "--checkpoint", str(tmp_path / "ck"),
    ])
    capsys.readouterr()
    changes = spark.read.option("basePath", str(tmp_path / "changes")).parquet(
        str(tmp_path / "changes") + "/epoch=*"
    )
    # per-batch ChangeCompactor: one row per conversation per epoch
    assert changes.select("conv_id").distinct().count() == 15
