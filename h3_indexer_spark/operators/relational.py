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
