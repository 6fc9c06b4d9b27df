"""C7/C19: strkey-style address encoding — the one transform family the
reference implements with real bit-twiddling that has no Column-function
equivalent (``transform/ledger.go:229-242 getAddress``,
``transaction.go:349-361``; Stellar strkey = version byte + payload + CRC16,
base32).

This is the engine's canonical **vectorized pandas UDF** example: pure-Python
base32+CRC16 applied per Arrow batch (Series → Series), never per row via
``udf()``. Used for opaque speaker/conversation handles that survive export
round-trips.
"""

from __future__ import annotations

import base64

import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

_VERSION_BYTE = 0x30  # 'G'-class handle, mirroring strkey account version


def _crc16_xmodem(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


def _encode_one(raw: bytes) -> str:
    payload = bytes([_VERSION_BYTE]) + raw
    crc = _crc16_xmodem(payload)
    full = payload + crc.to_bytes(2, "little")
    return base64.b32encode(full).decode().rstrip("=")


def _decode_one(s: str) -> bytes | None:
    try:
        pad = "=" * (-len(s) % 8)
        full = base64.b32decode(s + pad)
        payload, crc = full[:-2], int.from_bytes(full[-2:], "little")
        if payload[0] != _VERSION_BYTE or _crc16_xmodem(payload) != crc:
            return None
        return payload[1:]
    except Exception:
        return None


@pandas_udf(StringType())
def strkey_encode(s: pd.Series) -> pd.Series:
    """Encode utf-8 strings to checksummed base32 handles (vectorized)."""
    return s.map(lambda v: None if v is None else _encode_one(str(v).encode()))


@pandas_udf(StringType())
def strkey_decode(s: pd.Series) -> pd.Series:
    """Decode handles back to utf-8; None for checksum/format failures (the
    reference errors on bad strkeys — lenient export maps those to null)."""

    def dec(v):
        if v is None:
            return None
        raw = _decode_one(str(v))
        return None if raw is None else raw.decode("utf-8", "replace")

    return s.map(dec)


@pandas_udf(BooleanType())
def strkey_valid(s: pd.Series) -> pd.Series:
    return s.map(lambda v: v is not None and _decode_one(str(v)) is not None)
