"""spark-submit entrypoints — the analog of the reference's 11 cobra CLI
commands (``cmd/export_*.go``), launched as::

    spark-submit --py-files stellar_etl_spark.zip -m ... \
        jobs.py <command> --source ... --sink ... --checkpoint ...

Commands mirror the reference (README.md command table):

  export_turns           ≈ export_transactions   (T2)
  export_raw             ≈ export_ledger_transaction (T3 raw envelope)
  export_conversations   ≈ export_ledgers        (T1/A1)
  export_units           ≈ export_operations     (T4)
  export_effects         ≈ export_effects        (T5)
  export_pairs           ≈ export_trades         (J2, stateful)
  export_sessions        ≈ ledger-close stream   (session windows)
  export_timeline        ≈ export_contract_events(T20/J6)
  export_all             ≈ export_all_history    (S12 fan-out)
  export_changes         ≈ export_ledger_entry_changes (A4 compaction)
  export_dedup           ≈ export_assets         (A2 first-seen dedup)
  get_time_range         ≈ get_ledger_range_from_times (§3.3)
  generate               — synthetic input generator (test fixture)

Each runs either bounded (``--available-now``, default: process the current
table snapshot then exit, resumable) or unbounded (``--follow``).
"""

from __future__ import annotations

import argparse
import json
import sys

from stellar_etl_spark.session import get_spark


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--source", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--watermark", default="2 minutes")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--follow", action="store_true", help="unbounded mode")
    p.add_argument(
        "--timeout-sec",
        type=int,
        default=None,
        help="deadline for the run; default: no deadline for --follow, "
        "600s for bounded runs (which ERROR if still active at the deadline)",
    )
    p.add_argument("--cores", type=int, default=None)
    p.add_argument(
        "--output-partitions",
        type=int,
        default=None,
        help="files per committed epoch (default: cluster default parallelism; "
        "0 keeps the input partitioning — one file per source split)",
    )
    p.add_argument(
        "--format",
        choices=["parquet", "json"],
        default="parquet",
        help="epoch file format: parquet (read-back/merge product) or json "
        "(the reference's line-delimited final export artifact)",
    )
    p.add_argument(
        "--no-text-b64",
        action="store_true",
        help="drop the raw-envelope text_b64 column from the turns export "
        "(deployments that also run export_changes/turns_raw already have it)",
    )
    p.add_argument("--strict-export", action="store_true", default=True)
    p.add_argument("--lenient", dest="strict_export", action="store_false")
    p.add_argument("--extra-fields", nargs="*", default=[], metavar="K=V")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="stellar-etl-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    batch_cmds = [
        "export_turns",
        "export_raw",
        "export_dedup",
        "export_conversations",
        "export_units",
        "export_effects",
        "export_pairs",
        "export_sessions",
        "export_timeline",
        "export_changes",
        "export_all",
    ]
    for c in batch_cmds:
        _common(sub.add_parser(c))

    g = sub.add_parser("generate")
    g.add_argument("--out", required=True)
    g.add_argument("--n-convs", type=int, default=1000)
    g.add_argument("--seed", type=int, default=42)

    cp = sub.add_parser("compact")
    cp.add_argument("--sink", required=True)
    cp.add_argument(
        "--keys",
        nargs="*",
        default=None,
        help="override the business key (default: the sink's persisted "
        "_sink_meta.json — compacting with the wrong keys collapses rows)",
    )
    cp.add_argument("--cores", type=int, default=None)

    tr = sub.add_parser("get_time_range")
    tr.add_argument("--source", required=True)
    tr.add_argument("--start", required=True)
    tr.add_argument("--end", required=True)
    tr.add_argument(
        "--allow-future",
        action="store_true",
        help="archive mode: clamp far-future requests instead of rejecting "
        "them (default mirrors the reference's 10s future tolerance)",
    )

    args = ap.parse_args(argv)
    spark = get_spark(f"etl-{args.cmd}", cores=getattr(args, "cores", None), streaming=True)

    if args.cmd == "generate":
        from stellar_etl_spark.generator import transcripts_df, write_transcripts

        df = transcripts_df(spark, n_convs=args.n_convs, seed=args.seed)
        write_transcripts(df, args.out)
        print(json.dumps({"written": df.count(), "path": args.out}))
        return 0

    if args.cmd == "compact":
        # maintenance: fold the accumulated per-window epochs into one
        # (rewrite_data_files analog). Run only while the exporter is stopped.
        from stellar_etl_spark.streaming.sink import IdempotentSink

        overrides = {"keys": tuple(args.keys)} if args.keys else {}
        sink = IdempotentSink.from_meta(args.sink, **overrides)
        epoch = sink.compact(spark)
        print(json.dumps({
            "compacted_into_epoch": epoch,
            "rows": sink.lineage()[-1]["rows"],
        }))
        return 0

    if args.cmd == "get_time_range":
        from stellar_etl_spark.operators import time_range
        from stellar_etl_spark.sources.transcripts import read_batch

        row = time_range(
            read_batch(spark, args.source),
            args.start,
            args.end,
            future_tolerance_sec=None if args.allow_future else 10,
        ).collect()[0]
        print(json.dumps({k: str(v) for k, v in row.asDict().items()}))
        return 0

    from stellar_etl_spark.operators import (
        compact_last_state,
        extract_effects,
        extract_timeline,
        extract_turns,
        extract_units,
    )
    from stellar_etl_spark.operators.conversations import extract_conversations_windowed
    from stellar_etl_spark.operators.sessions import extract_sessions_streaming
    from stellar_etl_spark.schemas import with_extra_fields
    from stellar_etl_spark.streaming.pipeline import (
        run_export,
        run_fanout_export,
        run_validated_export,
        validate_rows,
    )
    from stellar_etl_spark.streaming.sink import IdempotentSink
    from stellar_etl_spark.streaming.state import streaming_pairs

    extra = dict(kv.split("=", 1) for kv in args.extra_fields)
    # one resolved deadline for every run mode (fanout + lenient included):
    # --follow defaults to no deadline, bounded runs to 600s + error-on-overrun
    timeout = args.timeout_sec if args.timeout_sec is not None else (
        None if args.follow else 600
    )
    out_parts = args.output_partitions
    if out_parts is None:
        out_parts = spark.sparkContext.defaultParallelism
    elif out_parts == 0:
        out_parts = None

    def wrap(ex):
        # strict path: fatal-on-invalid guard inline (lenient routing happens
        # in run_validated_export below, which needs the unvalidated form)
        def inner(df):
            valid, _ = validate_rows(df, strict=True)
            return with_extra_fields(ex(valid), extra)

        return inner

    def plain(ex):
        def inner(df):
            return with_extra_fields(ex(df), extra)

        return inner

    def turns_ex(df):
        return extract_turns(df, include_b64=not args.no_text_b64)

    def raw_ex(df):
        # T3 raw passthrough (export_ledger_transaction.go analog): the
        # undecoded envelope, base64-encoded — no projection logic to drift
        import pyspark.sql.functions as F

        return df.select(
            "conv_id",
            "turn_idx",
            F.base64(F.col("text").cast("binary")).alias("raw_b64"),
            "ts",
        )

    def dedup_ex(df):
        # A2 first-seen dedup (export_assets.go analog): the first turn of
        # each conversation, watermark-bounded streaming state. The state
        # evicts once the watermark passes first-seen ts + delay, so a
        # conversation resuming AFTER eviction re-emits into a later epoch —
        # the sink must therefore merge EARLIEST-ts-wins, not
        # latest-epoch-wins; first_seen_neg_us gives that under the sink's
        # descending order_cols precedence.
        import pyspark.sql.functions as F

        from stellar_etl_spark.operators.dedup import streaming_first_seen_dedup

        out = streaming_first_seen_dedup(df, ["conv_id"], args.watermark)
        # microsecond precision: this column is sink-internal (not bound by
        # the epoch-second oracle-parity convention), and whole-second
        # flooring would tie a post-eviction re-emission with the true
        # first-seen row inside the same second, letting epoch-desc pick the
        # later one (ADVICE r4). Named *_neg_us (not the earlier *_neg_ts,
        # which held NEGATED SECONDS): a sink written at the seconds scale
        # must not silently merge with micros-scale rows — every old row
        # would out-rank every new one — so the rename makes a pre-upgrade
        # sink resume fail loudly on the order_cols meta mismatch instead.
        return out.withColumn("first_seen_neg_us", -F.unix_micros(F.col("ts")))

    raw_extractors = {
        "export_turns": turns_ex,
        "export_raw": raw_ex,
        "export_units": extract_units,
        "export_effects": extract_effects,
        "export_timeline": extract_timeline,
        "export_changes": lambda df: df,
    }

    extractors = {
        "export_turns": (wrap(turns_ex), ("conv_id", "turn_idx")),
        "export_raw": (wrap(raw_ex), ("conv_id", "turn_idx")),
        "export_dedup": (wrap(dedup_ex), ("conv_id",)),
        # streaming conversation summaries must be windowed (a global
        # non-windowed agg cannot emit in append mode)
        "export_conversations": (
            wrap(lambda df: extract_conversations_windowed(df, "5 minutes", args.watermark)),
            ("conv_id", "window_start"),
        ),
        "export_units": (wrap(extract_units), ("conv_id", "turn_idx", "unit_idx")),
        "export_effects": (wrap(extract_effects), ("conv_id", "turn_idx", "effect_index")),
        "export_pairs": (
            wrap(lambda df: streaming_pairs(df, args.watermark, 300)),
            ("conv_id", "user_turn_idx"),
        ),
        "export_sessions": (
            wrap(lambda df: extract_sessions_streaming(df, "30 minutes", args.watermark)),
            ("conv_id", "session_start"),
        ),
        "export_timeline": (wrap(extract_timeline), ("conv_id", "turn_idx", "event_kind")),
        # A4 ChangeCompactor: compaction needs a batch plan (window function),
        # so it runs inside foreachBatch; merge-on-read orders by event time
        "export_changes": (wrap(lambda df: df), ("conv_id",)),
    }

    if args.cmd == "export_all":
        fan = {
            name.removeprefix("export_"): (ex, keys)
            for name, (ex, keys) in extractors.items()
            if name in ("export_turns", "export_units", "export_effects")
        }
        sinks = run_fanout_export(
            spark,
            args.source,
            {n: ex for n, (ex, _) in fan.items()},
            args.sink,
            args.checkpoint,
            keys={n: k for n, (ex, k) in fan.items()},
            timeout_sec=timeout,
            max_files_per_trigger=args.max_files_per_trigger,
            output_partitions=out_parts,
            fmt=args.format,
        )
        print(json.dumps({
            n: (s.read_sink(spark).count() if s.has_epochs() else 0)
            for n, s in sinks.items()
        }))
        return 0

    ex, keys = extractors[args.cmd]
    if not args.strict_export:
        # K5 lenient: rejected rows routed to a side sink with reasons.
        # Only stateless extractors can run inside the per-batch validation
        # wrapper; stateful/windowed commands need pre-cleaned input.
        if args.cmd not in raw_extractors:
            raise SystemExit(
                f"--lenient is unsupported for {args.cmd} (stateful/windowed); "
                "pre-clean the input with a lenient export_turns first"
            )
        sink = IdempotentSink(args.sink, keys, output_partitions=out_parts, fmt=args.format)
        rejected = IdempotentSink(args.sink + "_rejected", ("conv_id", "turn_idx"))
        run_validated_export(
            spark, args.source, plain(raw_extractors[args.cmd]), sink, rejected,
            args.checkpoint, strict=False, timeout_sec=timeout,
        )
        print(json.dumps({
            "cmd": args.cmd,
            "epochs": len(sink.lineage()),
            "rejected_rows": sum(e["rows"] for e in rejected.lineage()),
        }))
        return 0

    if args.cmd == "export_changes":
        sink = IdempotentSink(
            args.sink,
            keys,
            batch_transform=lambda df: compact_last_state(df, ["conv_id"]),
            order_cols=("ts", "turn_idx"),
            output_partitions=out_parts,
            fmt=args.format,
        )
    elif args.cmd == "export_dedup":
        # first-seen semantics: the EARLIEST row per conversation must win
        # the merge even when watermark eviction re-emits the key later
        sink = IdempotentSink(
            args.sink,
            keys,
            order_cols=("first_seen_neg_us",),
            output_partitions=out_parts,
            fmt=args.format,
        )
    else:
        sink = IdempotentSink(args.sink, keys, output_partitions=out_parts, fmt=args.format)
    metrics = run_export(
        spark,
        args.source,
        ex,
        sink,
        args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        timeout_sec=timeout,
        with_listener=True,
    )
    print(json.dumps({"cmd": args.cmd, "metrics": metrics, "epochs": len(sink.lineage())}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
