"""Multimodal column plumbing: opaque ``binary`` payloads (image/audio/video)
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side architecture is fully real — schema, partition-preserving
iterator transform, bounded batch memory (rows stream through
``mapInPandas`` an Arrow batch at a time; a 100 TB blob column never
materializes per-task beyond ``spark.sql.execution.arrow.maxRecordsPerBatch``
rows). Only the codec innards are stubbed: this container has no image/audio
libraries, so decode is a deterministic fake (content-hash-derived features)
behind ``decoder=`` injection — swap in PIL/torchaudio by passing a real
decoder; everything else is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),    # opaque bytes
        StructField("n_bytes", LongType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_sec", DoubleType(), True),
        StructField("feat_hash", StringType(), True),
    ]
)


def _fake_decode(kind: str, payload: bytes | None) -> dict:
    """Deterministic stand-in for the real codec: derives plausible metadata
    from a content hash. Replace via ``decoder=`` with e.g. PIL.Image.open."""
    if payload is None:
        return {"width": None, "height": None, "duration_sec": None, "feat_hash": None}
    h = hashlib.sha256(payload).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "duration_sec": None,
            "feat_hash": h.hex()[:16],
        }
    return {
        "width": None,
        "height": None,
        # exact integer division by 100.0 (no round()) so any engine
        # recomputes the identical double — the DuckDB oracle for the
        # media_features registry query mirrors this formula bit-for-bit
        "duration_sec": (50 + int.from_bytes(h[2:4], "big") % 6000) / 100.0,
        "feat_hash": h.hex()[:16],
    }


def extract_media_features(
    df: DataFrame,
    decoder: Callable[[str, bytes | None], dict] = _fake_decode,
) -> DataFrame:
    """Decode/feature-extract the binary column via ``mapInPandas``.

    Narrow (partition-preserving) — no shuffle; Arrow streams bounded
    batches, so executor memory is independent of blob sizes × row count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            out.insert(2, "n_bytes", pdf["n_bytes"].values)
            yield out[[f.name for f in FEATURES_SCHEMA.fields]]

    return df.mapInPandas(run, FEATURES_SCHEMA)


def synth_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    import pyspark.sql.functions as F

    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(F.lit(seed), "id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
    )
    payload = F.sha2(F.concat(F.lit(str(seed)), F.col("media_id").cast("string")), 512).cast("binary")
    return base.select(
        "media_id",
        "kind",
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
