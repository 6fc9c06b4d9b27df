"""Total-order id (TOID) bit packing — pure column arithmetic.

The reference packs (ledger int32) << 32 | (tx order, 20 bits) << 12 |
(op index, 12 bits) into one int64 (``internal/toid/main.go:60-84,130-157``),
derives inclusive range predicates from it (``toid/main.go:96-115``), and
reserves bit 62 as a type tag for synthetic ids
(``toid/synt_offer_id.go:28-42``).

Here the ledger sequence becomes a stable 30-bit conversation sequence derived
from ``xxhash64(conv_id)`` (the reference likewise derives surrogate ids from
stable content hashes, ``transform/asset.go:72-77``), the tx order becomes
``turn_idx`` (20 bits) and the op index becomes ``unit_idx`` (12 bits). All of
it is JVM-side column arithmetic — no Python in the path, fully codegen-able.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# conv_seq is 30 bits (not the reference's 31): bit 62 must stay free for the
# synthetic tag, and a hash-derived seq — unlike real ledger sequences — would
# otherwise collide with it.
LEDGER_MASK = (1 << 30) - 1
TRANSACTION_MASK = (1 << 20) - 1
OPERATION_MASK = (1 << 12) - 1
SYNTHETIC_BIT = 1 << 62       # toid/synt_offer_id.go:28-42 type-tag bit


def conv_seq(conv_id: Column | str) -> Column:
    """Stable non-negative 30-bit sequence for a conversation id."""
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    return F.pmod(F.xxhash64(c), F.lit(LEDGER_MASK + 1)).cast("long")


def toid(conv_seq_col: Column, turn_idx: Column | str, unit_idx: Column | int = 0) -> Column:
    """Pack (conv_seq, turn_idx, unit_idx) into one int64, preserving
    (conv, turn, unit) sort order within a conversation (toid/main.go:60-84)."""
    t = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    u = F.lit(unit_idx) if isinstance(unit_idx, int) else unit_idx
    return (
        F.shiftleft(conv_seq_col.cast("long"), 32)
        .bitwiseOR(F.shiftleft(t.cast("long").bitwiseAND(F.lit(TRANSACTION_MASK)), 12))
        .bitwiseOR(u.cast("long").bitwiseAND(F.lit(OPERATION_MASK)))
    )


def synthetic_toid(base: Column) -> Column:
    """Tag an id as synthetic by setting bit 62 (toid/synt_offer_id.go:28-42)."""
    return base.bitwiseOR(F.lit(SYNTHETIC_BIT))


def toid_range_start(conv_seq_value: int) -> int:
    """First TOID of a conversation sequence (toid/main.go:96-115
    ``LedgerRangeInclusive`` lower bound)."""
    return conv_seq_value << 32


def toid_range_end(conv_seq_value: int) -> int:
    """Exclusive upper TOID bound for a conversation sequence."""
    return (conv_seq_value + 1) << 32


def unpack(toid_col: Column) -> tuple[Column, Column, Column]:
    """Inverse of :func:`toid` (toid/main.go:130-157 Parse)."""
    seq = F.shiftrightunsigned(toid_col.bitwiseAND(F.lit(~SYNTHETIC_BIT)), 32)
    turn = F.shiftrightunsigned(toid_col, 12).bitwiseAND(F.lit(TRANSACTION_MASK))
    unit = toid_col.bitwiseAND(F.lit(OPERATION_MASK))
    return seq, turn.cast("int"), unit.cast("int")
