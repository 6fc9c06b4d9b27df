"""Property-based tests (hypothesis) — the invariants that must hold for ANY
input, not just the fixtures: generator determinism, dense effect indexing,
TOID order isomorphism, merge-on-read idempotence under arbitrary replay
histories. Mirrors the reference's table-driven exhaustive tests but samples
the input space instead of enumerating it."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stellar_etl_spark import toid
from stellar_etl_spark.operators import extract_effects, extract_units

# one shared moderate profile: each example spins Spark jobs, so keep counts
# small and deadlines off
_PROFILE = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
    max_size=60,
)
_ROLE = st.sampled_from(["user", "assistant", "tool", "system"])
_TOOL = st.sampled_from([None, "search", "code", "calc", "purchase", "error"])


@st.composite
def _turn_rows(draw, max_convs=3, max_turns=6):
    rows = []
    for c in range(draw(st.integers(1, max_convs))):
        for i in range(draw(st.integers(1, max_turns))):
            role = draw(_ROLE)
            rows.append(
                (
                    f"conv_{c}",
                    i,
                    role,
                    draw(_TEXT),
                    draw(_TOOL) if role == "tool" else None,
                    f"2026-01-01 00:{c:02d}:{i:02d}",
                )
            )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


@given(rows=_turn_rows())
@settings(**_PROFILE)
def test_effect_index_dense_per_turn(spark, rows):
    """For ANY input: effect_index is exactly 0..k-1 per (conv, turn) — the
    reference's dense per-op index contract (effects.go:161-166) — and
    effect_id embeds it."""
    eff = extract_effects(_df(spark, rows)).collect()
    by_turn: dict = {}
    for r in eff:
        by_turn.setdefault((r["conv_id"], r["turn_idx"]), []).append(r)
    for rows_ in by_turn.values():
        idxs = sorted(r["effect_index"] for r in rows_)
        assert idxs == list(range(len(idxs)))
        for r in rows_:
            assert r["effect_id"] == f"{r['turn_id']}-{r['effect_index']}"


@given(rows=_turn_rows())
@settings(**_PROFILE)
def test_units_cover_every_turn_exactly(spark, rows):
    """For ANY input: every turn yields >= 1 unit (the >=1-op-per-tx shape),
    unit_idx is dense, and concatenating the payloads in unit order exactly
    reconstructs the engine's own tokenization of the turn (no token lost,
    duplicated, or reordered across the span slices — the unit-level text
    preservation invariant). The tokenizer itself is oracle-checked
    separately; hypothesis found that Spark/DuckDB treat '\\r'-only text
    differently from Python's str.split, so the reference here is the
    engine's tokens, not a Python re-derivation."""
    from stellar_etl_spark.functions import text as textfn

    df = _df(spark, rows)
    units = extract_units(df).collect()
    by_turn: dict = {}
    for u in units:
        by_turn.setdefault((u["conv_id"], u["turn_idx"]), []).append(u)
    expected = {
        (r["conv_id"], r["turn_idx"]): r["joined"]
        for r in df.select(
            "conv_id", "turn_idx",
            F.array_join(textfn.tokens(F.col("text")), " ").alias("joined"),
        ).collect()
    }
    assert set(by_turn) == set(expected)
    for key, us in by_turn.items():
        us.sort(key=lambda u: u["unit_idx"])
        assert [u["unit_idx"] for u in us] == list(range(len(us)))
        assert " ".join(u["payload"] for u in us) == expected[key]


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, (1 << 30) - 1), st.integers(0, (1 << 20) - 1),
                  st.integers(0, (1 << 12) - 1)),
        min_size=2, max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_toid_is_order_isomorphic(spark, pairs):
    """Packing preserves lexicographic (conv_seq, turn_idx, unit_idx) order
    and stays non-negative (bit 62 reserved) — for any ids in range."""
    df = spark.createDataFrame(pairs, "c long, t int, u int")
    packed = df.select(
        "c", "t", "u", toid.toid(F.col("c"), F.col("t"), F.col("u")).alias("id")
    ).collect()
    as_tuple = sorted((r["c"], r["t"], r["u"]) for r in packed)
    by_id = [
        (r["c"], r["t"], r["u"])
        for r in sorted(packed, key=lambda r: (r["id"], r["c"], r["t"], r["u"]))
    ]
    assert by_id == as_tuple
    assert all(0 <= r["id"] < (1 << 62) for r in packed)


@given(
    epochs=st.lists(
        st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 99)),
                 min_size=1, max_size=6),
        min_size=1, max_size=4,
    ),
    replay=st.integers(0, 3),
)
@settings(**_PROFILE)
def test_merge_on_read_idempotent_under_replay(spark, tmp_path_factory, epochs, replay):
    """For ANY epoch history — including duplicate keys WITHIN an epoch
    (at-least-once delivery): the merged view is a deterministic pure
    function of the data (highest epoch wins per key, intra-epoch ties
    resolved by the data columns), so an idempotent epoch replay is exactly
    a no-op. Hypothesis originally falsified this with two same-key rows in
    one epoch — read_sink now carries an explicit data-column tiebreak."""
    from stellar_etl_spark.streaming.sink import IdempotentSink

    root = str(tmp_path_factory.mktemp("sink"))
    sink = IdempotentSink(root, ("k1", "k2"))
    for i, rows in enumerate(epochs):
        sink.foreach_batch(spark.createDataFrame(rows, "k1 int, k2 int, v int"), i)
    before = sorted(map(tuple, sink.read_sink(spark).collect()))
    # replay one epoch (same deterministic content) — must be a no-op
    ep = replay % len(epochs)
    sink.foreach_batch(spark.createDataFrame(epochs[ep], "k1 int, k2 int, v int"), ep)
    after = sorted(map(tuple, sink.read_sink(spark).collect()))
    assert after == before
    # exact expected relation: per key, the max-v row of the highest epoch
    # that contains the key
    want = {}
    for i, rows in enumerate(epochs):
        for k1, k2, v in rows:
            cur = want.get((k1, k2))
            if cur is None or (i, v) > cur:
                want[(k1, k2)] = (i, v)
    assert before == sorted((k1, k2, iv[1]) for (k1, k2), iv in want.items())


@given(payload=st.binary(min_size=0, max_size=256))
@settings(max_examples=300, deadline=None)
def test_image_header_parser_total(payload):
    """The header parser is TOTAL over arbitrary bytes: returns None or a
    (format, w, h) triple, never raises — and the decode wrapper always
    yields a full feature dict (a parser that throws on a truncated upload
    would kill a whole Arrow batch in production)."""
    from stellar_etl_spark.functions.multimodal import header_decode, parse_image_header

    out = parse_image_header(payload)
    assert out is None or (
        out[0] in ("png", "jpeg") and isinstance(out[1], int) and isinstance(out[2], int)
    )
    d = header_decode("image", payload)
    assert set(d) == {"width", "height", "duration_sec", "feat_hash", "codec"}


@given(payload=st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_image_header_parser_prefix_totality(payload):
    """Valid magic + arbitrary tail (the truncated/corrupt-upload shape)."""
    from stellar_etl_spark.functions.multimodal import parse_image_header

    for magic in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8"):
        out = parse_image_header(magic + payload)
        assert out is None or out[0] in ("png", "jpeg")


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**_PROFILE)
def test_connected_components_matches_union_find(spark, edges):
    """The distributed min-label propagation must equal a sequential
    union-find on ANY graph — including multi-edges, both orientations of
    the same edge, cycles, and long paths."""
    from stellar_etl_spark.functions.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for node in parent:
        want[node] = find(node)

    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, max_iters=40).collect()
    }
    assert got == want
