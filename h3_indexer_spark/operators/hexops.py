"""Hex-grid analytics over indexed tables: multi-resolution compaction
and spatial (k-ring) smoothing — the "window functions" of the H3 grid.

These operate on the OUTPUT of the index/resolve pipeline (tables keyed
by an ``h3_index`` cell column), extending the reference's surface: the
reference stops at per-cell aggregates (h3_resolver.py:45-98); these
add the cross-cell operations a cell-keyed 100 TB table needs —
shrinking storage by collapsing uniform regions to coarser cells, and
neighborhood statistics without a geometry join.

Both are pure DataFrame compositions over the repo's own H3 kernels:
compaction is Catalyst bit-ops + iterative shrinking aggregates (no
Python in the loop), smoothing is one Arrow neighbor-expansion hop +
one aggregation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h3_indexer_spark.functions.h3.sql import (
    h3_long_to_string,
    h3_string_to_long,
    parent_long_expr,
    resolution_expr,
)
from h3_indexer_spark.functions.h3.tables import PENTAGON_BASE_CELLS

_PENT_BASES = sorted(PENTAGON_BASE_CELLS)


def _is_pentagon_expr(h_long: F.Column, res: int) -> F.Column:
    """Pentagon test in native Catalyst bit ops for a cell of KNOWN
    resolution ``res``: pentagonal base cell AND every resolution
    digit is 0 (the center-child chain). Digits sit in 3-bit fields
    below bit 45; unused fine digits read 7, so a res-r pentagon's
    whole digit field equals the low-bits 7-padding with zeros in the
    leading r digits — one equality against a Python-computed
    literal."""
    base = F.shiftright(h_long, 45).bitwiseAND(F.lit(0x7F))
    digits = h_long.bitwiseAND(F.lit((1 << 45) - 1))
    pad = ((1 << 45) - 1) >> (3 * res)
    return base.isin(_PENT_BASES) & (digits == F.lit(pad))


def compact_cells_df(
    df: DataFrame,
    cell_col: str = "h3_index",
) -> DataFrame:
    """H3 cell-set compaction: wherever ALL children of a parent cell
    are present (7 for hexagon parents, 6 for pentagon parents),
    replace them with the parent, repeatedly — a uniform region
    collapses to the coarsest cells that exactly cover it. Returns the
    distinct compacted set as (h3_index). The inverse of polyfill's
    uniform-resolution covering; coverage is EXACTLY preserved
    (uncompacting the result reproduces the input set — locked in
    tests against the scalar kernel).

    Scale shape: one round per resolution level, coarsest-bound (≤15);
    each round is a groupBy on the parent id (partial-aggregated
    count) over a set that only SHRINKS — compactable regions vanish
    into their parents before the next round. All cell math is native
    Catalyst bit ops (parent_long_expr, the pentagon test) — no
    Python, no UDF, nothing but integer expressions between shuffles.
    At 100 TB the first round dominates (full distinct of the input);
    every later round touches only what remains."""
    cells = df.select(
        h3_string_to_long(F.col(cell_col)).alias("_c"),
        resolution_expr(F.col(cell_col)).alias("_r"),
    ).distinct()
    # bounded driver pull: ONE scalar (the max resolution) sizes the
    # round count. Each round's plan references the previous frontier
    # in three places, so lineage fans out ~3^rounds — a static
    # 15-round sweep builds an astronomically deep plan (observed
    # hanging Catalyst at test scale), while the data-bounded count
    # keeps it to a handful of rounds. At cluster scale, persist the
    # frontier between rounds to cut the lineage entirely (the
    # plans/indexer.py cache-at-stage-boundary posture).
    max_res = cells.agg(F.max("_r")).collect()[0][0]
    if max_res is None:
        return df.select(F.col(cell_col)).limit(0)
    out_parts = []
    cur = cells
    for r in range(int(max_res), 0, -1):
        at_res = cur.where(F.col("_r") == r)
        coarser = cur.where(F.col("_r") != r)
        parent = parent_long_expr(F.col("_c"), r - 1)
        fam = at_res.groupBy(parent.alias("_p")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        expected = F.when(
            _is_pentagon_expr(F.col("_p"), r - 1), F.lit(6)
        ).otherwise(F.lit(7))
        full = fam.where(F.col("_n") == expected).select("_p")
        # children of full parents collapse; the rest are final output
        survivors = at_res.join(
            full.select(F.col("_p").alias("_fp")),
            parent == F.col("_fp"),
            "left_anti",
        ).select("_c")
        out_parts.append(survivors)
        promoted = full.select(
            F.col("_p").alias("_c"), F.lit(r - 1).alias("_r")
        )
        cur = coarser.unionByName(promoted)
    out_parts.append(cur.select("_c"))  # res-0 leftovers
    result = out_parts[0]
    for p in out_parts[1:]:
        result = result.unionByName(p)
    return result.select(h3_long_to_string(F.col("_c")).alias(cell_col))


def uncompact_cells_df(
    df: DataFrame,
    res: int,
    cell_col: str = "h3_index",
) -> DataFrame:
    """Expand a (possibly mixed-resolution) cell set to a uniform
    covering at ``res`` — the inverse of :func:`compact_cells_df`.
    One Arrow hop: children enumeration per cell via the scalar
    kernel, batch-amortized; output size is bounded by 7^(res−r) per
    input cell, so expansion work is proportional to the OUTPUT —
    exactly the explode-shaped growth Spark parallelizes by split."""
    from h3_indexer_spark.functions.h3 import core

    def expand(batches):
        for pdf in batches:
            rows = []
            for s in pdf[cell_col]:
                h = core.string_to_h3(s)
                for c in core.cell_to_children(h, res):
                    rows.append(core.h3_to_string(c))
            yield pd.DataFrame({cell_col: rows})

    return df.select(cell_col).mapInPandas(
        expand, schema=f"{cell_col} string"
    )


def hex_smooth(
    df: DataFrame,
    value_col: str,
    cell_col: str = "h3_index",
    include_self: bool = True,
) -> DataFrame:
    """K-ring spatial smoothing: each cell's value replaced by the mean
    over its immediate hex neighborhood (the 6 grid neighbors, plus
    itself by default) — the hex-grid convolution behind hotspot
    de-noising and spatial gradient features. Cells on the data's edge
    average over their PRESENT neighbors only (no zero-padding bias).
    Output: (cell, n_contributors, smoothed value).

    One Arrow hop expands each cell to its neighbor list (the same
    exact-IJK batched neighbor kernel the coverage engine uses), then
    one aggregation keyed on the receiving cell — contributions
    partial-sum map-side, so the shuffle carries at most 7 rows per
    input cell collapsing to one row per distinct cell. DECIMAL-exact
    sums keep the mean bit-deterministic."""
    from h3_indexer_spark.functions.h3.coverage import cell_neighbors_batch

    import numpy as np

    def fan_out(batches):
        for pdf in batches:
            cells = np.asarray(
                [int(s, 16) for s in pdf[cell_col]], dtype=np.int64
            )
            neigh = cell_neighbors_batch(cells)  # (n, 6), 0-padded
            src_vals = pdf[value_col].to_numpy()
            dst: list[str] = []
            vals: list[float] = []
            for i in range(len(cells)):
                if include_self:
                    dst.append(pdf[cell_col].iloc[i])
                    vals.append(float(src_vals[i]))
                for nb in neigh[i]:
                    if nb:
                        dst.append(format(int(nb), "x"))
                        vals.append(float(src_vals[i]))
            yield pd.DataFrame({cell_col: dst, "_v": vals})

    contributions = df.select(cell_col, value_col).mapInPandas(
        fan_out, schema=f"{cell_col} string, _v double"
    )
    # only cells present in the input receive a smoothed value
    present = df.select(cell_col).distinct()
    return (
        contributions.join(present, cell_col, "semi")
        .groupBy(cell_col)
        .agg(
            F.count(F.lit(1)).alias("n_contributors"),
            (
                F.sum(F.col("_v").cast("decimal(19,4)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias(f"{value_col}_smooth"),
        )
    )
