"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB, a parquet lake's min/max footer statistics prune files only
along the column the data is SORTED by: a linear sort on ``l_partkey``
leaves every file spanning the full ``l_suppkey`` range, so a
two-dimensional box predicate still touches every file on the second
dimension. Interleaving the bits of both keys (the Morton curve) makes
``repartitionByRange`` on ONE derived column cluster the data in BOTH:
each output file covers a small rectangle of (a, b) space, so each
file's (min_a, max_a, min_b, max_b) footer rectangle is tight and a box
query prunes on every dimension at once — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as a plain derived column any
writer can range-partition on (tests/test_zorder.py measures the pruning
win over a linear sort on the same files).

The key is pure Catalyst bit arithmetic (an unrolled sum of masked
shifts — whole-stage-codegen-friendly, no UDF) and deterministic, so the
DuckDB oracle reproduces it term for term (``zorder_sql``).

Reference analog: the reference has no storage layout at all (single-node
lists, post_OCR_correction/main.py); this is engine-added scale surface,
like the dedup/ANN families.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (non-negative
    integral values; values ≥ 2^bits fold into the top slice, which only
    loosens — never breaks — the clustering). Bit j of column i lands at
    position ``j·n + (n−1−i)``, so column 0 owns the most-significant
    bit of each group: ties sort by the leading column, like a
    multi-column sort would."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key needs at least two columns")
    if bits * n > 63:
        raise ValueError(f"{bits} bits × {n} cols exceeds a signed 64-bit key")
    terms = []
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, j * n + (n - 1 - i)))
    return reduce(lambda a, b: a + b, terms)


def zorder_sql(col_names: list[str], bits: int = 16) -> str:
    """The identical key as an ANSI-SQL expression (DuckDB oracle):
    same unrolled terms, shifts spelled as multiplies/divides by powers
    of two so no engine-specific shift syntax is needed."""
    n = len(col_names)
    terms = []
    for j in range(bits):
        for i, name in enumerate(col_names):
            pos = j * n + (n - 1 - i)
            terms.append(f"(({name} // {1 << j}) % 2) * {1 << pos}")
    return " + ".join(terms)
