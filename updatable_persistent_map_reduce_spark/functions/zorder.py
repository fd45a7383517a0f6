"""Z-order (Morton) curve value as a pure-codegen column expression.

Interleaves the low ``bits`` bits of k non-negative integer columns:
bit ``b`` of column ``i`` lands at position ``b * k + i``. Sorting by
the result clusters rows so that a CONTIGUOUS run of the sort order is
a compact hyper-rectangle-ish region of the k-dim key space — every
dimension's per-file min/max stays tight, so parquet min/max stats
(and manifest-level span stats) prune files for predicates on ANY of
the k dimensions, not just the leading sort key. This is the layout
trick Delta OPTIMIZE ZORDER / Iceberg sort orders use; here it is ~20
shift/and/add expressions inside whole-stage codegen, no UDF.

The reference stores one JSON file per document (Executer.cs:165-183)
and has no layout story at all; this is the piece a 100 TB corpus
needs so multi-dimension scans don't read everything.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``cols`` (non-negative ints < 2**bits each).

    Values outside [0, 2**bits) are clamped expression-side so a bad
    row degrades locality instead of corrupting the curve.
    """
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    k = len(cols)
    if bits * k > 63:
        # position bits*k - 1 would be the long's sign bit: rows with
        # it set would sort NEGATIVE, globally corrupting the curve
        # (not merely degrading locality) — refuse loudly
        raise ValueError(
            f"zorder_value: {k} columns x {bits} bits = {bits * k} "
            "interleaved bits does not fit a signed 64-bit long; "
            "lower bits or split the key set"
        )
    lo, hi = F.lit(0).cast("long"), F.lit((1 << bits) - 1).cast("long")
    clamped = [F.greatest(lo, F.least(hi, c.cast("long"))) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(clamped):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * k + i)
    return z
