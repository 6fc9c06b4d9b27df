"""Per-extractor unit tests on the micro fixture — the analog of the
reference's table-driven transform tests (``internal/transform/*_test.go``)."""

import pyspark.sql.functions as F

from stellar_etl_spark.operators import (
    compact_last_state,
    extract_conversations,
    extract_effects,
    extract_pairs,
    extract_sessions,
    extract_star_schema,
    extract_turns,
    extract_units,
    first_seen_dedup,
    time_range,
)
from stellar_etl_spark.operators.dims import denormalize


def test_turns_projection(micro):
    t = {(r["conv_id"], r["turn_idx"]): r for r in extract_turns(micro).collect()}
    a3 = t[("conv_a", 3)]
    assert a3["successful"] is False  # error: prefix
    assert a3["role_code"] == 2 and a3["tool"] == "search"
    a0 = t[("conv_a", 0)]
    assert a0["successful"] is True
    assert a0["n_chars"] == len("hello there") and a0["n_tokens"] == 2
    # sha256 of the exact text (golden per-turn text equality invariant)
    import hashlib

    assert a0["text_sha256"] == hashlib.sha256(b"hello there").hexdigest()
    import base64

    assert a0["text_b64"] == base64.b64encode(b"hello there").decode()
    c0 = t[("conv_c", 0)]
    assert c0["n_chars"] == 0 and c0["n_tokens"] == 0
    # TOID ordering within conversation
    ids = [t[("conv_a", i)]["turn_id"] for i in range(5)]
    assert ids == sorted(ids)


def test_conversations_counts(micro):
    c = {r["conv_id"]: r for r in extract_conversations(micro).collect()}
    a = c["conv_a"]
    assert (a["n_turns"], a["n_user"], a["n_assistant"], a["n_tool"], a["n_system"]) == (5, 2, 1, 2, 0)
    assert (a["n_successful"], a["n_failed"]) == (4, 1)
    assert a["duration_sec"] == 40.0
    b = c["conv_b"]
    assert b["n_turns"] == 1 and b["n_system"] == 1 and b["duration_sec"] == 0.0


def test_units_explode(micro):
    u = extract_units(micro, span_tokens=4)
    rows = u.where((F.col("conv_id") == "conv_c") & (F.col("turn_idx") == 1)).orderBy("unit_idx").collect()
    # 9 tokens / 4 per span = 3 units
    assert [r["unit_idx"] for r in rows] == [0, 1, 2]
    assert rows[0]["payload"] == "one two three four"
    assert rows[2]["payload"] == "nine"
    assert all(r["unit_type"] == "span" for r in rows)
    # tool turn -> single tool_call unit with details
    tc = u.where((F.col("conv_id") == "conv_a") & (F.col("turn_idx") == 4)).collect()
    assert len(tc) == 1 and tc[0]["unit_type"] == "tool_call"
    assert tc[0]["details"]["tool"] == "search"
    # per-tool-type extra keys (the 27-way details switch analog)
    assert tc[0]["details"]["n_terms"] == "3"
    # empty text still yields exactly one unit
    empty = u.where((F.col("conv_id") == "conv_c") & (F.col("turn_idx") == 0)).collect()
    assert len(empty) == 1 and empty[0]["payload"] == ""
    assert empty[0]["details"]["span_tokens"] == "0"


def test_units_details_all_tool_arms(spark):
    """Every arm of the per-tool details switch produces its typed key."""
    rows = [
        ("c", 0, "tool", "alpha beta gamma", "search", "2026-01-01 00:00:00"),
        ("c", 1, "tool", "print(1)", "code", "2026-01-01 00:00:10"),
        ("c", 2, "tool", "result 42 and 7", "calc", "2026-01-01 00:00:20"),
        ("c", 3, "tool", "données 東京", "fetch", "2026-01-01 00:00:30"),
        ("c", 4, "tool", "a b a c b", "browse", "2026-01-01 00:00:40"),
        ("c", 5, "assistant", "naïve reply 12", None, "2026-01-01 00:00:50"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = {r["turn_idx"]: r["details"] for r in extract_units(df).collect()}
    assert d[0]["n_terms"] == "3"
    assert d[1]["n_lines"] == "1"
    assert d[2]["n_digits"] == "3"
    # fetch: byte length > char length on multibyte text
    assert int(d[3]["payload_bytes"]) > len("données 東京")
    assert d[4]["n_unique_tokens"] == "3"
    # span signals
    assert d[5]["has_unicode"] == "true" and d[5]["n_digits"] == "2"


def test_units_details_driver_vocab_and_role_arms(spark):
    """The driver-table tool kinds (purchase/error) and the role-specific
    span arms each produce their typed key."""
    rows = [
        ("c", 0, "tool", '{"k": 96}', "purchase", "2026-01-01 00:00:00"),
        ("c", 1, "tool", "error: boom", "error", "2026-01-01 00:00:10"),
        ("c", 2, "user", "what is it?", None, "2026-01-01 00:00:20"),
        ("c", 3, "assistant", "It works. Trust me.", None, "2026-01-01 00:00:30"),
        ("c", 4, "system", "rule: be helpful", None, "2026-01-01 00:00:40"),
        ("c", 5, "user", '{"k": 1, "v": 2}', None, "2026-01-01 00:00:50"),
        ("c", 6, "assistant", "12 34", None, "2026-01-01 00:01:00"),
        ("c", 7, "system", "see http://a or http://b", None, "2026-01-01 00:01:10"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = {r["turn_idx"]: r["details"] for r in extract_units(df).collect()}
    assert d[0]["k_value"] == "96"
    assert d[1]["error_chars"] == str(len("boom")) and d[1]["failed"] == "true"
    assert d[2]["is_question"] == "true"
    assert d[3]["n_sentences"] == "3"  # "It works", " Trust me", ""
    assert d[4]["has_directive"] == "true"
    # arms stay exclusive: a user span has no assistant/system keys
    assert "n_sentences" not in d[2] and "has_directive" not in d[2]
    # payload-shape arms compose with the role arms
    assert d[5]["json_keys"] == "2" and d[5]["is_question"] == "false"
    assert d[6]["digits_only"] == "true"
    assert d[7]["n_urls"] == "2" and d[7]["has_directive"] == "true"
    # failed-call kind + leading-capital flag arms
    assert d[1]["error_kind"] == "boom"
    assert d[3]["starts_upper"] == "true" and "starts_upper" not in d[6]
    # result-dependent arm (path-payment success-override shape): failed
    # calls report the placeholder, successes the payload value
    assert d[0]["amount_final"] == "96" and d[1]["amount_final"] == "0"
    # value-shape sub-switch (asset-type analog)
    assert d[0]["value_type"] == "long" and d[1]["value_type"] == "none"
    # price rational n/d over (value, byte size): payload is 9 ASCII bytes
    assert d[0]["price_r"] == "96/9"
    # manage-data key-name arm fires only on JSON-shaped tool args
    assert d[0]["data_name"] == "k" and "data_name" not in d[1]
    # claimable-balance id derivation: B + 8 hex of the args hash
    assert len(d[0]["balance_id"]) == 9 and d[0]["balance_id"].startswith("B")
    # path-list span arm: every number in order
    assert d[5]["num_path"] == "1,2" and d[6]["num_path"] == "12,34"


def test_kmv_sketch_estimates_distinct_tokens(spark):
    """KMV estimator quality: for conversations past the sketch threshold the
    estimate tracks the exact distinct count (median relative error well
    under the ~1/sqrt(K-1) ≈ 26%% theory bound for K=16)."""
    from stellar_etl_spark.plans.registry import q_conv_token_kmv

    rows = q_conv_token_kmv(spark, "/root/testdata/sf0.001").collect()
    sketched = [r for r in rows if r["n_tokens_exact"] >= 16]
    assert sketched, "fixture too small to exercise the sketch"
    errs = sorted(
        abs(r["kmv_estimate"] - r["n_tokens_exact"]) / r["n_tokens_exact"] for r in sketched
    )
    assert errs[len(errs) // 2] < 0.30  # median
    # below the threshold the sketch is exact by construction
    for r in rows:
        if r["n_tokens_exact"] < 16:
            assert r["kmv_estimate"] == float(r["n_tokens_exact"])


def test_contextual_effects_rules(micro):
    from stellar_etl_spark.operators.effects import extract_effects_contextual

    e = extract_effects_contextual(micro)
    by: dict = {}
    for r in e.collect():
        by.setdefault((r["conv_id"], r["turn_idx"]), set()).add(r["effect_type_string"])
    assert "first_assistant" in by[("conv_a", 1)]
    # failed tool turn 3 is excluded, so turn 4 is the first tool use
    assert "first_tool_use" in by[("conv_a", 4)]
    assert "conversation_closed" in by[("conv_a", 4)]
    assert "conversation_closed" in by[("conv_b", 0)]
    # conv_c turn 2 arrives out of order 5s BEFORE turn 1 -> gap <= 5 (burst)
    assert "turn_burst" in by[("conv_c", 2)]
    assert "first_assistant" not in by.get(("conv_a", 4), set())
    # positional rules: conv_a successful turns are 0,1,2,4 (max 4)
    assert "first_user" in by[("conv_a", 0)]
    assert "speaker_changed" in by[("conv_a", 1)]
    assert "conv_midpoint" in by[("conv_a", 2)]  # 2*2 == max_turn_idx 4
    assert "second_half" in by[("conv_a", 4)]
    assert "second_half" not in by[("conv_a", 2)]
    # state-diff rules (25-33)
    assert "turn_grew" in by[("conv_a", 1)]      # 5 tokens > 2*2
    assert "turn_shrank" in by[("conv_c", 2)]    # 2 tokens, prev 9
    assert "text_resumed" in by[("conv_c", 1)]   # empty turn 0 -> 9 tokens
    assert "role_cycle" in by[("conv_a", 2)]     # user-assistant-user
    assert "last_user_turn" in by[("conv_a", 2)]
    assert "last_assistant_turn" in by[("conv_c", 1)]
    # per-(conv, tool) rules (34-37): failed turn 3 excluded, so the single
    # successful search call is both first and last of its kind
    assert "tool_first_of_kind" in by[("conv_a", 4)]
    # sponsorship-chain rules (40-45): the first search call is sponsored by
    # the prior user turn; it is also the conversation's last turn, so the
    # revoked rule (which needs the conversation to continue) must NOT fire
    assert "tool_sponsor_established" in by[("conv_a", 4)]
    assert "tool_sponsor_revoked" not in by[("conv_a", 4)]
    # conv_b's single system turn establishes the conversation sponsor; with
    # no later non-system turn nothing revokes it
    assert "conv_sponsor_established" in by[("conv_b", 0)]
    assert all("conv_sponsor_revoked" not in s for s in by.values())
    assert "tool_last_of_kind" in by[("conv_a", 4)]
    details = {
        (r["conv_id"], r["turn_idx"], r["effect_type_string"]): r["details"]
        for r in e.collect()
    }
    assert details[("conv_a", 4, "tool_last_of_kind")]["n_uses"] == "1"
    assert details[("conv_a", 1, "turn_grew")] == {"from": "2", "to": "5"}


def test_tool_args_diff_rules(spark):
    """36/37: args changed/repeated vs the prior call of the SAME tool (the
    J3 within-group prior-op lookback), across an interleaved other tool."""
    from stellar_etl_spark.operators.effects import extract_effects_contextual

    rows = [
        ("d", 0, "tool", "x = 1", "calc", "2026-01-01 00:00:00"),
        ("d", 1, "tool", "fetch it", "fetch", "2026-01-01 00:00:10"),
        ("d", 2, "tool", "x = 1", "calc", "2026-01-01 00:00:20"),
        ("d", 3, "tool", "x = 2", "calc", "2026-01-01 00:00:30"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    e = extract_effects_contextual(df)
    by: dict = {}
    for r in e.collect():
        by.setdefault(r["turn_idx"], set()).add(r["effect_type_string"])
    # turn 2 repeats turn 0's args (the interleaved fetch is ignored)
    assert "tool_args_repeated" in by[2] and "tool_args_changed" not in by[2]
    assert "tool_args_changed" in by[3] and "tool_args_repeated" not in by[3]
    assert "tool_first_of_kind" in by[0] and "tool_first_of_kind" in by[1]
    assert "tool_first_of_kind" not in by[2]
    assert "tool_last_of_kind" in by[3] and "tool_last_of_kind" in by[1]


def test_effects_rules(micro):
    e = extract_effects(micro, long_turn_tokens=8)
    by_turn = {}
    for r in e.collect():
        by_turn.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    # failed tool turn emits nothing
    assert ("conv_a", 3) not in by_turn
    # conv_a turn 0 "hello there" (2 tokens): opened + short, dense indexes
    a0 = sorted(by_turn[("conv_a", 0)], key=lambda r: r["effect_index"])
    assert [r["effect_type_string"] for r in a0] == [
        "turn_added", "conversation_opened", "short_turn"
    ]
    assert [r["effect_index"] for r in a0] == [0, 1, 2]
    assert a0[1]["effect_id"] == f"{a0[1]['turn_id']}-1"
    # successful tool turn (3 tokens): turn_added + tool_invoked + short_turn
    a4 = sorted(by_turn[("conv_a", 4)], key=lambda r: r["effect_index"])
    assert [r["effect_type_string"] for r in a4] == ["turn_added", "tool_invoked", "short_turn"]
    # empty text turn fires empty_text + conversation_opened (0 tokens: no short)
    c0 = sorted(by_turn[("conv_c", 0)], key=lambda r: r["effect_index"])
    assert [r["effect_type_string"] for r in c0] == ["turn_added", "empty_text", "conversation_opened"]
    # unicode + mixed-script rules: conv_a turn 2 "run the query 東京"
    a2 = [r["effect_type_string"] for r in by_turn[("conv_a", 2)]]
    assert "unicode_text" in a2 and "mixed_script" in a2
    # pure-unicode (no ascii letters) fires unicode but not mixed: conv_c 2
    c2 = [r["effect_type_string"] for r in by_turn[("conv_c", 2)]]
    assert "unicode_text" in c2 and "mixed_script" in c2  # 'naïve' has ascii letters
    # long turn (9 tokens > 8)
    c1 = [r["effect_type_string"] for r in by_turn[("conv_c", 1)]]
    assert "long_turn" in c1


def test_pairs_unbounded(micro):
    p = {(r["conv_id"], r["user_turn_idx"]): r for r in extract_pairs(micro).collect()}
    assert p[("conv_a", 0)]["resp_turn_idx"] == 1 and p[("conv_a", 0)]["latency_sec"] == 10.0
    # user turn 2 pairs with the failed tool turn 3 (unbounded form doesn't filter)
    assert p[("conv_a", 2)]["resp_turn_idx"] == 3
    # conv_c turn 2 has no following response
    assert p[("conv_c", 2)]["resp_turn_idx"] is None
    assert ("conv_b", 0) not in p  # system turn is not a user turn


def test_pairs_bounded_range_semantics(micro):
    p = {(r["conv_id"], r["user_turn_idx"]): r for r in extract_pairs(micro, max_lag_sec=15).collect()}
    assert p[("conv_a", 0)]["resp_turn_idx"] == 1
    # conv_c user 0 at 02:00:00: assistant at +30s is beyond 15s lag -> null
    assert p[("conv_c", 0)]["resp_turn_idx"] is None


def test_sessions_gap_split(micro, spark):
    rows = [
        ("s", 0, "user", "a", None, "2026-01-01 00:00:00"),
        ("s", 1, "assistant", "b", None, "2026-01-01 00:00:30"),
        ("s", 2, "user", "c", None, "2026-01-01 02:00:00"),  # > 30 min gap
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string").withColumn("ts", F.col("ts").cast("timestamp"))
    out = extract_sessions(df, gap_sec=1800).orderBy("session_start").collect()
    assert len(out) == 2
    assert out[0]["n_turns"] == 2 and out[1]["n_turns"] == 1
    assert out[0]["duration_sec"] == 30.0


def test_dedup_and_compaction(micro):
    first = first_seen_dedup(micro, ["conv_id"])
    assert first.count() == 3
    got = {r["conv_id"]: r["turn_idx"] for r in first.collect()}
    assert got["conv_a"] == 0
    # conv_c: ts order differs from turn order — first by ts is turn 0
    assert got["conv_c"] == 0
    last = compact_last_state(micro, ["conv_id"])
    got = {r["conv_id"]: r["turn_idx"] for r in last.collect()}
    assert got["conv_a"] == 4
    # conv_c: latest ts is turn 1 (02:00:30), not turn 2 (02:00:25)
    assert got["conv_c"] == 1


def test_star_schema_roundtrip(micro):
    star = extract_star_schema(micro)
    assert star["dim_role"].count() == 4
    assert star["dim_tool"].count() == 1
    denorm = denormalize(star)
    orig = micro.select(
        "conv_id", "role", "tool", F.length(F.coalesce("text", F.lit(""))).cast("long").alias("n_chars"), "ts"
    )
    assert denorm.select(*orig.columns).exceptAll(orig).count() == 0
    assert denorm.count() == micro.count()


def test_time_range_clamps(micro):
    # requested range wider than data -> clamps to data bounds (archive
    # mode: far-future end allowed only with the tolerance disabled)
    r = time_range(micro, "2020-01-01", "2030-01-01", future_tolerance_sec=None).collect()[0]
    assert r["n_turns"] == 9
    r2 = time_range(micro, "2026-01-01 00:00:15", "2026-01-01 00:00:35").collect()[0]
    assert r2["n_turns"] == 2  # turns at 00:00:20 and 00:00:30
    # requested range entirely before the data: clamps to the earliest
    # boundary instant (closest-boundary semantics), never an all-null row
    r3 = time_range(micro, "2020-01-01", "2020-02-01").collect()[0]
    assert r3["start_ts"] is not None and r3["n_turns"] >= 1


def test_salted_conversations_equivalent(micro, spark):
    from stellar_etl_spark.operators.conversations import extract_conversations
    from stellar_etl_spark.operators.salt import extract_conversations_salted

    a = extract_conversations(micro)
    b = extract_conversations_salted(micro, buckets=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_with_extra_fields(micro):
    from stellar_etl_spark.schemas import with_extra_fields

    out = with_extra_fields(extract_turns(micro), {"network": "mainnet", "source": "etl"})
    row = out.limit(1).collect()[0]
    assert row["network"] == "mainnet" and row["source"] == "etl"
    assert out.count() == micro.count()
