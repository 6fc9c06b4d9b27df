"""T2: turn projection — the TransformTransaction analog
(``internal/transform/transaction.go:20-304``).

One output row per turn; every column is a pure Column expression (fully
whole-stage-codegen). The reference's per-tx derived fields map to:

- TOID id (``transaction.go:27``)                → ``turn_id`` bit-packed long
- closed_at propagation (``transaction.go:220``) → ``ts`` carried through
- memo switch (``transaction.go:74-89``)         → role/tool-derived scalars
- tx hash                                        → ``text_sha256``
- base64 XDR envelope (``transaction.go:49-67``) → ``text_b64``
- successful flag (``schema.go:58``)             → error-payload detection
- time-bounds interval (``transaction.go:90-111``) → ``ts_interval``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import b64, interval_str, is_successful, map_lookup, sha256_hex
from stellar_etl_spark.schemas import ROLE_CODES


def extract_turns(
    df: DataFrame, conv_seq: Column | None = None, include_b64: bool = True
) -> DataFrame:
    """Project the transcripts table into the TURNS output schema.

    ``conv_seq`` overrides the conversation sequence derivation (default:
    stable 30-bit hash of ``conv_id``). Oracle-checked jobs pass a
    SQL-reproducible sequence instead of the hash.

    ``include_b64`` gates the raw-envelope column: the reference splits the
    raw vs parsed products across export *types* (``TransactionOutput`` with
    envelope vs the parsed-field exports), so a deployment that also runs the
    raw passthrough export (T3, ``turns_raw``) can drop the duplicate
    ``text_b64`` here — it is the third full-text scan per row and the
    encoding half of the export stage's measured CPU ceiling.
    """
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    txt = F.col("text")
    successful = is_successful(txt)
    ts_sec = F.unix_timestamp("ts")

    cols = [
        toid_mod.toid(seq, "turn_idx").alias("turn_id"),
        F.col("conv_id"),
        seq.alias("conv_seq"),
        F.col("turn_idx"),
        F.col("role"),
        map_lookup(F.col("role"), ROLE_CODES, default=-1).cast("int").alias("role_code"),
        F.col("tool"),
        txt.alias("text"),
        sha256_hex(F.coalesce(txt, F.lit(""))).alias("text_sha256"),
        *([b64(txt).alias("text_b64")] if include_b64 else []),
        F.length(F.coalesce(txt, F.lit(""))).cast("long").alias("n_chars"),
        textfn.token_count(txt).alias("n_tokens"),
        successful.alias("successful"),
        F.col("ts"),
        interval_str(ts_sec, ts_sec + 1).alias("ts_interval"),
    ]
    return df.select(*cols)
