"""Declarative data-quality expectations over any table — the generic
descendant of the geo pipeline's Validate stage (plans/validator.py
enforces the reference's fixed schema/uniqueness/type rules,
/root/reference/src/h3_indexer/validator.py:64-115; this module lets
users declare their OWN rules over arbitrary tables and get a
violations report instead of a hard failure).

Rule kinds:

- ``{"rule": "not_null", "column": c}``
- ``{"rule": "unique", "columns": [c, ...]}`` — duplicate-key rows
- ``{"rule": "range", "column": c, "min": x, "max": y}`` (either bound
  optional; nulls don't violate range — pair with not_null)
- ``{"rule": "in_set", "column": c, "allowed": [...]}``
- ``{"rule": "foreign_key", "column": c, "ref": DataFrame,
  "ref_column": r}`` — orphaned references

Scale posture: every row-level rule (not_null/range/in_set) is ONE
conditional-sum aggregate — they all fuse into a single scan with
map-side partial aggregation, no shuffle of data rows. ``unique`` is
one groupBy on the key columns (partial counts). ``foreign_key`` is a
broadcast anti-join when the reference side is dimension-sized (the
common case — pass a pre-distinct projection for big refs). The report
is a tiny DataFrame: one row per rule."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(
    df: DataFrame, rules: list[dict]
) -> DataFrame:
    """Evaluate ``rules`` against ``df`` and return one report row per
    rule: (rule_id, rule, target, n_violations, n_rows, passed).
    Row-level rules share one scan; unknown rule kinds fail fast (the
    validate-early posture of the geo Job config)."""
    spark = df.sparkSession
    if not rules:
        return spark.createDataFrame(
            [],
            "rule_id int, rule string, target string, "
            "n_violations long, n_rows long, passed boolean",
        )
    n_rows_col = F.count(F.lit(1)).alias("n_rows")
    row_level_aggs: list = []
    row_level_meta: list[tuple[int, str, str]] = []
    reports: list[DataFrame] = []

    for i, spec in enumerate(rules):
        kind = spec.get("rule")
        if kind == "not_null":
            c = spec["column"]
            row_level_aggs.append(
                F.sum(
                    F.col(c).isNull().cast("long")
                ).alias(f"_v{i}")
            )
            row_level_meta.append((i, kind, c))
        elif kind == "range":
            c = spec["column"]
            cond = F.lit(False)
            if "min" in spec:
                cond = cond | (F.col(c) < F.lit(spec["min"]))
            if "max" in spec:
                cond = cond | (F.col(c) > F.lit(spec["max"]))
            row_level_aggs.append(
                F.sum(cond.cast("long")).alias(f"_v{i}")
            )
            row_level_meta.append((i, kind, c))
        elif kind == "in_set":
            c = spec["column"]
            viol = (
                F.col(c).isNotNull()
                & ~F.col(c).isin(list(spec["allowed"]))
            )
            row_level_aggs.append(
                F.sum(viol.cast("long")).alias(f"_v{i}")
            )
            row_level_meta.append((i, kind, c))
        elif kind == "unique":
            cols = list(spec["columns"])
            dup_rows = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .agg(
                    F.coalesce(F.sum("_n"), F.lit(0)).alias(
                        "n_violations"
                    )
                )
            )
            reports.append(
                dup_rows.select(
                    F.lit(i).alias("rule_id"),
                    F.lit(kind).alias("rule"),
                    F.lit(",".join(cols)).alias("target"),
                    F.col("n_violations").cast("long"),
                )
            )
        elif kind == "foreign_key":
            c = spec["column"]
            ref = spec["ref"].select(
                F.col(spec["ref_column"]).alias("_ref")
            ).distinct()
            orphans = (
                df.select(F.col(c).alias("_ref"))
                .where(F.col("_ref").isNotNull())
                .join(F.broadcast(ref), "_ref", "anti")
                .agg(F.count(F.lit(1)).alias("n_violations"))
            )
            reports.append(
                orphans.select(
                    F.lit(i).alias("rule_id"),
                    F.lit(kind).alias("rule"),
                    F.lit(c).alias("target"),
                    F.col("n_violations").cast("long"),
                )
            )
        else:
            raise ValueError(
                f"rule {i}: unknown kind {kind!r}; valid: not_null, "
                "unique, range, in_set, foreign_key"
            )

    if row_level_aggs:
        agg_row = df.agg(n_rows_col, *row_level_aggs)
        for i, kind, target in row_level_meta:
            reports.append(
                agg_row.select(
                    F.lit(i).alias("rule_id"),
                    F.lit(kind).alias("rule"),
                    F.lit(target).alias("target"),
                    F.col(f"_v{i}").cast("long").alias("n_violations"),
                )
            )

    # 1-row total crossJoined back: keeps the checker action-free.
    # Reuse agg_row's n_rows when the fused row-level scan exists —
    # a separate count would re-scan the table for nothing.
    if row_level_aggs:
        totals = agg_row.select(F.col("n_rows").cast("long").alias("n_rows"))
    else:
        totals = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    out = reduce(lambda a, b: a.unionByName(b), reports)
    return out.crossJoin(F.broadcast(totals)).select(
        "rule_id",
        "rule",
        "target",
        "n_violations",
        "n_rows",
        (F.col("n_violations") == 0).alias("passed"),
    )


def key_skew_census(
    df: DataFrame,
    key_col: str,
    key_name: str | None = None,
) -> DataFrame:
    """Join-key skew census — the pre-join advisor every 100 TB
    pipeline should run before shuffling on a key: group-size
    distribution statistics (max, p99, mean, top-key share, and the
    max/mean skew ratio) that tell you whether this key needs
    salting, AQE skew handling, or a broadcast instead. High
    top_share ⇒ one reducer owns the key space; skew_ratio near 1 ⇒
    uniform, shuffle freely.

    Two-level collapse, never a sort of the data: groupBy(key) →
    per-key sizes (map-side partials), then groupBy(size) → the SIZE
    HISTOGRAM, which is tiny (distinct group sizes, not distinct
    keys), so the p99 order statistic is a cumulative window over a
    report-sized table even when the key space has billions of
    entries. p99 is the smallest size with cumulative key count ≥
    ceil(0.99·n_keys), computed in exact integer arithmetic
    (cum·100 ≥ 99·n_keys — no float index); the three ratio readouts
    are fixed IEEE op order, ROUND 9.

    Output: one row (key_name, n_rows, n_keys, max_size, p99_size,
    avg_size, top_share, skew_ratio).
    """
    from pyspark.sql import Window

    name = key_name if key_name is not None else key_col
    sizes = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("_k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_sz"))
    )
    hist = sizes.groupBy("_sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("_nk")
    )
    tot = hist.agg(
        F.sum("_nk").cast("bigint").alias("n_keys"),
        F.sum(F.col("_sz") * F.col("_nk")).cast("bigint").alias("n_rows"),
        F.max("_sz").cast("bigint").alias("max_size"),
    )
    w = Window.orderBy(F.col("_sz").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = hist.select("_sz", F.sum("_nk").over(w).alias("_cum"))
    fold = (
        cdf.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("_cum") * F.lit(100)
                    >= F.lit(99) * F.col("n_keys"),
                    F.col("_sz"),
                )
            )
            .cast("bigint")
            .alias("p99_size"),
            F.max("n_keys").alias("n_keys"),
            F.max("n_rows").alias("n_rows"),
            F.max("max_size").alias("max_size"),
        )
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    return fold.select(
        F.lit(name).alias("key_name"),
        "n_rows",
        "n_keys",
        "max_size",
        "p99_size",
        F.round(avg, 9).alias("avg_size"),
        F.round(
            F.col("max_size").cast("double") / F.col("n_rows").cast("double"),
            9,
        ).alias("top_share"),
        F.round(F.col("max_size").cast("double") / avg, 9).alias(
            "skew_ratio"
        ),
    )
