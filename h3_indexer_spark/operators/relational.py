"""Relational operator library.

Each function is a pure ``DataFrame -> DataFrame`` transform (usable
with ``DataFrame.transform``) covering the reference's operator
inventory (SURVEY.md §2.2-2.5). They exist as named, documented,
individually-tested primitives; Catalyst still owns physical planning.

Scale notes (100 TB posture):
- ``group_and_sum`` relies on partial (map-side) aggregation, which
  Spark applies automatically to ``sum`` — one shuffle of the partially
  aggregated keys, not of raw rows.
- ``join_left_small`` takes an explicit broadcast hint: the build side
  in every reference call site (distinct hex table, attribute
  projection) is orders of magnitude smaller than the probe side.
- ``full_outer_align`` keys every pairwise join on the same column, so
  Catalyst reuses one hash-partitioning across the whole join chain
  instead of reshuffling per join.
"""

from __future__ import annotations

from collections.abc import Iterable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, columns: Iterable[str]) -> DataFrame:
    """Column-subset projection (reference h3_indexer.py:76).

    Catalyst's ColumnPruning pushes this into the scan (``ReadSchema``
    shows only these columns), so a 2-column projection of a 100-column
    100 TB table reads only 2 column chunks.
    """
    return df.select(*columns)


def with_literals(df: DataFrame, **values: object) -> DataFrame:
    """Attach constant-valued columns (reference h3_indexer.py:73,134-140)."""
    return df.withColumns({name: F.lit(v) for name, v in values.items()})


def scale_columns(
    df: DataFrame, columns: Iterable[str], factor: Column | str
) -> DataFrame:
    """attribute × ratio arithmetic (reference h3_resolver.py:125-127).

    Pure Catalyst expressions — stays inside whole-stage codegen.
    """
    f = F.col(factor) if isinstance(factor, str) else factor
    return df.withColumns({c: F.col(c) * f for c in columns})


def filter_not_null(df: DataFrame, column: str) -> DataFrame:
    """Null filter (reference utils/geospatial.py:150); pushed to scan."""
    return df.filter(F.col(column).isNotNull())


def where_sql(df: DataFrame, predicate: str) -> DataFrame:
    """User-supplied SQL predicate (reference validator.py:76-79).

    The reference pushes this into the Athena JDBC query; expressed
    declaratively here, Catalyst pushes supported conjuncts into the
    Parquet scan (visible as PushedFilters).
    """
    return df.where(predicate)


def join_left_small(
    probe: DataFrame, build: DataFrame, on: str | list[str]
) -> DataFrame:
    """Left equi-join against a small build side (reference
    h3_indexer.py:124-127). Explicit broadcast: the reference relied on
    auto-broadcast; at 100 TB the probe side must never shuffle for
    these dimension-sized builds."""
    return probe.join(F.broadcast(build), on=on, how="left")


def join_left(probe: DataFrame, build: DataFrame, on: str | list[str]) -> DataFrame:
    """Left equi-join, strategy left to Catalyst/AQE (skew-join aware)."""
    return probe.join(build, on=on, how="left")


def join_semi(probe: DataFrame, filt: DataFrame, on: str | list[str]) -> DataFrame:
    """Left semi-join: keep probe rows with a match; never widens the
    row and never duplicates on multi-matches (unlike an inner join +
    distinct, which shuffles the full probe payload)."""
    return probe.join(filt, on=on, how="left_semi")


def join_anti(probe: DataFrame, filt: DataFrame, on: str | list[str]) -> DataFrame:
    """Left anti-join: keep probe rows WITHOUT a match (NOT EXISTS)."""
    return probe.join(filt, on=on, how="left_anti")


def full_outer_align(
    dfs: list[DataFrame], key: str | list[str]
) -> DataFrame:
    """N-way full-outer equi-join on a shared key (reference
    h3_resolver.py:71-82): aligns per-input aggregated tables into one
    wide row per key. All joins share one key ⇒ one exchange per input,
    reused down the chain."""
    if not dfs:
        raise ValueError("full_outer_align requires at least one DataFrame")
    keys = [key] if isinstance(key, str) else list(key)
    return reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), dfs)


def group_and_sum(
    df: DataFrame,
    group_cols: str | list[str],
    sum_cols: Iterable[str] | None = None,
    prefix: str = "sum_",
) -> DataFrame:
    """Group-by SUM over value columns — the resolver kernel (reference
    h3_resolver.py:22-42). Output columns are ``{prefix}{col}``."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if sum_cols is None:
        sum_cols = [c for c in df.columns if c not in keys]
    aggs = [F.sum(c).alias(f"{prefix}{c}") for c in sum_cols]
    return df.groupBy(*keys).agg(*aggs)


def distinct_keys(df: DataFrame, columns: str | list[str]) -> DataFrame:
    """``select(cols).distinct()`` — dedup before expensive per-key work
    (reference h3_indexer.py:116-121). The reference's key plan-level
    trick: synthesize hex geometry once per unique cell, then join back.
    """
    cols = [columns] if isinstance(columns, str) else list(columns)
    return df.select(*cols).distinct()


def explode_array(
    df: DataFrame, array_col: Column | str, alias: str, keep: Iterable[str]
) -> DataFrame:
    """UNNEST an array column to one row per element (reference
    h3_indexer.py:111-113, the feature→cells expansion)."""
    arr = F.col(array_col) if isinstance(array_col, str) else array_col
    return df.select(*keep, F.explode(arr).alias(alias))


def repartition_by(df: DataFrame, columns: str | list[str]) -> DataFrame:
    """Co-locate rows by column(s) ahead of the partitioned write
    (reference h3_indexer.py:78-79) so each task writes few files.

    Uses the AQE ``REBALANCE`` hint rather than ``repartition()``:
    plain user repartition is exempt from AQE coalescing (tiny inputs
    would still run the full shuffle width) and from skew splitting
    (one hot h3_r3_parent would pin the write on one task at 100 TB).
    Rebalance gives both: small partitions coalesce, oversized ones
    split while keeping partition-column clustering."""
    cols = [columns] if isinstance(columns, str) else list(columns)
    return df.hint("rebalance", *cols)


def top_k(
    df: DataFrame, order_by: list[Column], k: int
) -> DataFrame:
    """Global top-k. Spark plans orderBy+limit as TakeOrderedAndProject
    — per-partition heaps then a driver merge of k·P rows; no full sort
    shuffle even at 100 TB."""
    return df.orderBy(*order_by).limit(k)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: result-identical to ``big.join(small,
    on, how)`` but a hot join key spreads over ``n_salts`` reducers
    instead of pinning one.

    Mechanics: every big-side row gets a deterministic salt in
    [0, n_salts) derived from ``salt_src`` (a high-cardinality column,
    e.g. the big side's PK) — NOT from the join key, whose skew is the
    problem; the small side is replicated once per salt value (explode
    of a ``sequence``, a narrow n_salts× fanout — no shuffle), and the
    join runs on (key..., salt). Each big row carries exactly one salt
    and every (key, salt) combination exists on the small side, so
    inner and left matches are exactly those of the unsalted join.

    When to use: both sides too big to broadcast AND the key histogram
    is skewed beyond what AQE's skew-join splitting handles (AQE splits
    oversized *partitions* of the sorted side; a single mega-key still
    lands in one partition — salting is the only thing that splits
    *within* a key). Cost: small side shuffles n_salts× its size; pick
    n_salts ≈ hot-key rows / target partition rows.

    ``how`` must be "inner" or "left" (probe side preserved). Right and
    full outer are rejected: an unmatched small-side row would surface
    once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: outer "
            "semantics on the replicated side would duplicate "
            "unmatched rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt = (
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
        if salt_src is not None
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")


def sketch_stats(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    quantile_col: str,
    quantiles: list[float] = (0.5, 0.9),
    rsd: float = 0.02,
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based per-group statistics — the 100 TB substitute for
    exact NDV/percentiles when the exact plans' costs bite: HLL++
    ``approx_count_distinct`` (fixed ~kB state per group vs the exact
    COUNT(DISTINCT) Expand that multiplies the shuffle by the column
    count) and the ``percentile_approx`` quantile sketch (bounded
    state vs a full sort). Both are algebraic aggregates — partial
    sketches merge map-side, one shuffle of sketch state only.

    Error contracts (locked in tests/test_relational_extra.py):
    HLL++ relative standard deviation ``rsd``; quantile sketch rank
    error ≤ 1/``accuracy``. Sketch internals are engine-specific, so
    results are self-verified against the exact operators rather than
    an external oracle.

    Each requested quantile comes back as its own SCALAR double column
    (``approx_q50``, ``approx_q90``, …) — never an array column: scalar
    columns survive any downstream canonicalizer/sorter, and the
    single internal sketch is still built once and shared.
    """
    qcol = F.percentile_approx(
        F.col(quantile_col), list(quantiles), accuracy
    )
    out = df.groupBy(group_col).agg(
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(
            f"approx_ndv_{distinct_col}"
        ),
        qcol.alias("_qs"),
    )
    return out.select(
        group_col,
        f"approx_ndv_{distinct_col}",
        *[
            F.element_at(F.col("_qs"), i + 1).alias(
                f"approx_q{round(q * 100):d}"
            )
            for i, q in enumerate(quantiles)
        ],
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column profiling in ONE pass: per column — row count, nulls,
    exact distinct count, min/max, and mean for numerics — the
    data-quality summary a curation pipeline runs before and after
    every stage.

    Output rows: (column, n_rows, n_nulls, n_distinct, min_num,
    max_num, avg_num, min_str, max_str); the num/str halves are null
    for non-applicable types.

    Plan shape — two branches, all HashAggregate, no Expand:
    (1) one global aggregate for counts/nulls/min/max/sums (no
    grouping keys, so even the string min/max buffers need no sort),
    pivoted to one row per column via array+explode;
    (2) the exact NDVs via melt: each row explodes to (column,
    value-as-string) pairs, a two-stage distinct — groupBy(column,
    value) then count per column — that partial-aggregates map-side
    and shuffles only the distinct pairs. (The naive
    multi-COUNT(DISTINCT) formulation plans as an Expand ×(n_cols+1)
    into a SortAggregate — measured 12× slower.)
    The branches broadcast-join on the tiny per-column result. Both
    branches prune the scan to the profiled columns; the source is
    read twice — at scale prefer sketch_stats (one pass, bounded
    state) when exact NDVs aren't required. Mean is exact-decimal
    sum / count in double so it is bit-deterministic regardless of
    row order (see the DECIMAL(18,6) rule in .claude/skills/verify).
    """
    from pyspark.sql.types import NumericType, StringType

    cols = columns if columns is not None else df.columns
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}")
        )
        if isinstance(dt, NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_max_{c}"))
            aggs.append(
                F.sum(F.col(c).cast("decimal(18,6)")).alias(f"_sum_{c}")
            )
        elif isinstance(dt, StringType):
            aggs.append(F.min(F.col(c)).alias(f"_mins_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"_maxs_{c}"))
    row = df.agg(*aggs)

    # exact NDV branch: melt to (column, value) — the string cast is
    # injective per column, so distinct pair counts equal distinct
    # value counts; nulls drop to match COUNT(DISTINCT) semantics.
    # Float/double values fold -0.0 into 0.0 first: COUNT(DISTINCT)
    # treats them as one value in both engines, but their string
    # renderings differ ("-0.0" vs "0.0") and would double-count.
    from pyspark.sql.types import DoubleType, FloatType

    def _ndv_key(c: str) -> Column:
        v = F.col(c)
        if isinstance(df.schema[c].dataType, (FloatType, DoubleType)):
            v = F.when(v == 0, F.lit(0.0)).otherwise(v)
        return v.cast("string")

    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        _ndv_key(c).alias("_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.*")
    ndv = (
        melted.where(F.col("_v").isNotNull())
        .groupBy("column", "_v")
        .agg(F.lit(1).alias("_one"))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )

    def _field(c: str) -> Column:
        dt = df.schema[c].dataType
        is_num = isinstance(dt, NumericType)
        is_str = isinstance(dt, StringType)
        null_d = F.lit(None).cast("double")
        null_s = F.lit(None).cast("string")
        n_valid = F.col("_n") - F.col(f"_nulls_{c}")
        return F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nulls_{c}").alias("n_nulls"),
            (F.col(f"_min_{c}") if is_num else null_d).alias("min_num"),
            (F.col(f"_max_{c}") if is_num else null_d).alias("max_num"),
            (
                F.when(
                    n_valid > 0,
                    F.col(f"_sum_{c}").cast("double") / n_valid,
                )
                if is_num
                else null_d
            ).alias("avg_num"),
            (F.col(f"_mins_{c}") if is_str else null_s).alias("min_str"),
            (F.col(f"_maxs_{c}") if is_str else null_s).alias("max_str"),
        )

    stats = row.select(
        F.explode(F.array(*[_field(c) for c in cols])).alias("p")
    ).select("p.*")
    return stats.join(F.broadcast(ndv), "column", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        "min_num",
        "max_num",
        "avg_num",
        "min_str",
        "max_str",
    )
