"""DuckDB-oracle equivalence for every §2 oracle key — a local mirror
of the driver's t2 correctness gate (row count + schema + order-
insensitive values), run at sf0.01."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def _numeric_kind(dtype) -> str | None:
    """Collapse a pandas dtype to 'int' / 'float' (None for non-numeric).

    The driver's correctness gate hashes STRINGIFIED values, so an int64
    column on one engine vs float64 on the other (e.g. DuckDB SUM(BIGINT)
    -> HUGEINT -> float64) prints 57 vs 57.0 and fails hash_match even
    when every value compares equal.  Round 5 shipped exactly that drift
    because _values_equal(57, 57.0) is True; this kind check makes the
    local mirror representation-faithful.
    """
    kind = getattr(dtype, "kind", None)
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    return None


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"column mismatch: {sorted(spark_pdf.columns)} vs "
        f"{sorted(duck_pdf.columns)}"
    )
    for col in spark_pdf.columns:
        ks = _numeric_kind(spark_pdf[col].dtype)
        kd = _numeric_kind(duck_pdf[col].dtype)
        if ks is not None and kd is not None:
            assert ks == kd, (
                f"dtype kind mismatch in {col!r}: spark="
                f"{spark_pdf[col].dtype} vs duck={duck_pdf[col].dtype} — "
                "the driver stringifies these differently (57 vs 57.0); "
                "cast the oracle (or the Spark query) so both engines "
                "agree on int-vs-float"
            )
    assert len(spark_pdf) == len(duck_pdf), (
        f"row count mismatch: {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (x, y) in enumerate(zip(sv, dv)):
            assert _values_equal(x, y), (
                f"value mismatch in {col!r} row {i}: spark={x!r} duck={y!r}"
            )


def test_compare_frames_rejects_int_float_drift():
    """Regression lock for the round-5 HUGEINT incident: equal VALUES in
    different numeric representations must fail locally, because the
    driver's stringified hash will fail them."""
    a = pd.DataFrame({"n": pd.Series([57], dtype="int64")})
    b = pd.DataFrame({"n": pd.Series([57.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype kind mismatch"):
        compare_frames(a, b)
    compare_frames(a.copy(), a.copy())


def _oracle_keys():
    from h3_indexer_spark.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return sorted(ORACLES)


@pytest.mark.parametrize("key", _oracle_keys())
def test_oracle_equivalence(spark, duck, key):
    from h3_indexer_spark.queries import ORACLES, QUERIES

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark_pdf = QUERIES[key](spark, SF_ORACLE).toPandas()
    duck_pdf = duck.execute(ORACLES[key]).df()
    compare_frames(spark_pdf, duck_pdf)


def _rows_only_keys():
    from h3_indexer_spark.queries import ORACLES, QUERIES

    return sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("key", _rows_only_keys())
def test_rows_only_executes(spark, key):
    """Keys without a DuckDB oracle (hash/seed-dependent plans) must
    still run and produce a stable schema + deterministic row count
    across two invocations."""
    from h3_indexer_spark.queries import QUERIES

    df1 = QUERIES[key](spark, SF_ORACLE)
    df2 = QUERIES[key](spark, SF_ORACLE)
    assert df1.schema == df2.schema
    assert df1.count() == df2.count()


def test_knn_ivf_oracle_margins(spark):
    """The q_knn_ivf oracle pins the GEMM argmax cell assignment and
    the np.dot probe ranking in SQL; both are safe only because the
    decision margins dwarf the ~1-ulp summation-order divergence
    between numpy's pairwise sums and the SQL left-assoc fold. Lock
    that: best-vs-second cell score gap per vector and the probe
    cutoff gap (4th vs 5th centroid) must exceed 1e-9 — ~7 orders of
    magnitude above 1 ulp of these O(1) scores."""
    import numpy as np

    from h3_indexer_spark.operators.similarity import sampled_centroids
    from h3_indexer_spark.queries import _query_vector, load

    emb = load(spark, SF_ORACLE, "embeddings")
    cents = np.asarray(sampled_centroids(emb, n_cells=16), dtype=np.float64)
    m = np.asarray(
        emb.orderBy("vec_id").toPandas()["embedding"].tolist(),
        dtype=np.float64,
    )
    scores = m @ cents.T  # (n, 16)
    top2 = np.sort(scores, axis=1)[:, -2:]
    assert float(np.min(top2[:, 1] - top2[:, 0])) > 1e-9

    qv = np.asarray(_query_vector(), dtype=np.float64)
    cs = np.sort(cents @ qv)[::-1]
    assert float(cs[3] - cs[4]) > 1e-9
