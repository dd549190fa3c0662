"""Native Spark SQL expressions for H3 bit manipulation.

The reference computes the res-3 parent with a row-at-a-time Python UDF
(spark_udfs.py:12-21). The parent operation is pure bit arithmetic on
the 64-bit cell id, so here it stays entirely inside Tungsten codegen —
no Python worker round-trip, which matters enormously at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_RES = 15


def h3_string_to_long(col: Column | str) -> Column:
    """Hex cell-id string → 64-bit long (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(c, 16, 10).cast("long")


def h3_long_to_string(col: Column | str) -> Column:
    """64-bit long → canonical lowercase 15-char hex string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.hex(c))


def parent_long_expr(h3_long: Column, parent_res: int) -> Column:
    """Ancestor cell id at ``parent_res`` from a long cell id:
    overwrite the resolution nibble and set all finer digits to 7."""
    digit_mask = (1 << (3 * (_MAX_RES - parent_res))) - 1
    res_cleared = h3_long.bitwiseAND(F.lit(~(0xF << 52)))
    with_res = res_cleared.bitwiseOR(F.lit(parent_res << 52))
    return with_res.bitwiseOR(F.lit(digit_mask))


def parent_expr(h3_index_col: Column | str, parent_res: int) -> Column:
    """String-in/string-out parent (U2 parity, null-safe like the
    reference's get_parent_h3_res3)."""
    c = F.col(h3_index_col) if isinstance(h3_index_col, str) else h3_index_col
    out = h3_long_to_string(parent_long_expr(h3_string_to_long(c), parent_res))
    return F.when(c.isNull(), F.lit(None)).otherwise(out)


def resolution_expr(h3_index_col: Column | str) -> Column:
    """Extract the resolution nibble from the hex string, JVM-side."""
    c = F.col(h3_index_col) if isinstance(h3_index_col, str) else h3_index_col
    return (
        F.shiftright(h3_string_to_long(c), 52).bitwiseAND(F.lit(0xF)).cast("int")
    )
