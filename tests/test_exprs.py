"""Tests for the expression helpers (functions/exprs.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from h3_indexer_spark.functions.exprs import let


def test_let_value_equivalence(spark):
    """let(binding, body) must be observationally identical to
    body(binding) for scalar, array, and null results."""
    df = spark.range(50).select(
        F.col("id"), F.split(F.format_string("a%s b c", "id"), " ").alias("arr")
    )
    out = df.select(
        "id",
        let(F.col("id") * 2, lambda x: x + 1).alias("scalar"),
        let(F.col("arr"), lambda a: F.size(a) + F.size(a)).alias("reused"),
        let(F.lit(None).cast("long"), lambda x: x + 1).alias("null_prop"),
        let(
            F.col("arr"),
            lambda a: F.transform(a, lambda e: F.concat(e, F.lit("!"))),
        ).alias("arr_out"),
    ).collect()
    for r in out:
        assert r.scalar == r.id * 2 + 1
        assert r.reused == 6
        assert r.null_prop is None
        assert r.arr_out[-1] == "c!"


def test_let_evaluates_binding_once_per_row(spark):
    """The binding must not be re-evaluated per consuming lambda
    element: an expensive binding used inside a transform over a
    1000-element sequence must not cost 1000x. Correctness proxy: a
    non-trivially-sized plan still returns exact results (timing-based
    asserts are flaky; the plan-shape regression is covered by the
    dedup/minhash oracle tests which collapse without this property)."""
    df = spark.range(10).select(
        F.sequence(F.lit(0), F.lit(999)).alias("seq")
    )
    # binding: an aggregate over the 1000-long array; body consumes it
    # inside another 1000-element transform
    out = df.select(
        let(
            F.aggregate(F.col("seq"), F.lit(0).cast("long"), lambda a, x: a + x),
            lambda total: F.size(
                F.filter(
                    F.sequence(F.lit(0), F.lit(999)),
                    lambda i: i <= total,
                )
            ),
        ).alias("n")
    ).collect()
    # sum(0..999) = 499500 > 999, so every element passes the filter
    assert all(r.n == 1000 for r in out)
