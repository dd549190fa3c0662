"""Round-9 operator tests: lazy-construction guarantees for the
census-guarded operators, the locality-keyed CC contraction, and the
round-9 breadth additions."""

import pytest
from pyspark.sql import functions as F


def _jobs_during(spark, fn):
    """Run ``fn`` under a dedicated job group and return the job ids
    Spark launched inside it — the zero-jobs-at-construction lock."""
    import uuid

    group = f"construction_probe_{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "plan construction must stay lazy")
    try:
        result = fn()
    finally:
        sc.setJobGroup(None, None)
    return result, list(sc.statusTracker().getJobIdsForGroup(group))


class TestLazyConstruction:
    def test_adamic_adar_lazy_fast_path(self, spark):
        from h3_indexer_spark.operators.graph import adamic_adar

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5)],
            "src long, dst long",
        )
        plan, jobs = _jobs_during(
            spark,
            lambda: adamic_adar(edges, log_exclusions=False),
        )
        assert jobs == [], f"construction launched jobs: {jobs}"
        lazy = {
            (r["u"], r["v"]): (r["common_neighbors"], r["aa_q"])
            for r in plan.collect()
        }
        eager = {
            (r["u"], r["v"]): (r["common_neighbors"], r["aa_q"])
            for r in adamic_adar(edges).collect()
        }
        assert lazy == eager and lazy

    def test_adamic_adar_eager_census_still_runs(self, spark):
        from h3_indexer_spark.operators.graph import adamic_adar

        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "src long, dst long"
        )
        _, jobs = _jobs_during(spark, lambda: adamic_adar(edges))
        assert jobs, "default path should pin + census at construction"

    def test_association_rules_lazy_fast_path(self, spark):
        from h3_indexer_spark.operators.mining import association_rules

        df = spark.createDataFrame(
            [(b, i) for b in range(6) for i in ("x", "y", "z")[: b % 3 + 1]],
            "b long, i string",
        )
        plan, jobs = _jobs_during(
            spark,
            lambda: association_rules(
                df, "b", "i", min_support=1, log_exclusions=False
            ),
        )
        assert jobs == [], f"construction launched jobs: {jobs}"
        lazy = [tuple(r) for r in plan.collect()]
        eager = [
            tuple(r)
            for r in association_rules(df, "b", "i", min_support=1).collect()
        ]
        assert lazy == eager and lazy

    def test_association_rules_cap_semantics_identical_lazy(self, spark):
        """The mega-basket cap must EXCLUDE the same baskets on both
        paths — the lazy path changes execution, never semantics."""
        from h3_indexer_spark.operators.mining import association_rules

        rows = [(0, f"i{k}") for k in range(5)]  # mega-basket: 5 items
        rows += [(b, i) for b in (1, 2, 3) for i in ("x", "y")]
        df = spark.createDataFrame(rows, "b long, i string")
        kw = dict(min_support=1, max_basket_size=4)
        eager = {
            (r["antecedent"], r["consequent"]): r["n_joint"]
            for r in association_rules(df, "b", "i", **kw).collect()
        }
        lazy = {
            (r["antecedent"], r["consequent"]): r["n_joint"]
            for r in association_rules(
                df, "b", "i", log_exclusions=False, **kw
            ).collect()
        }
        assert lazy == eager
        assert ("i0", "i1") not in lazy  # mega-basket pairs excluded

    def test_tfidf_lazy_n_docs(self, spark):
        from h3_indexer_spark.operators.textops import tfidf_topk

        df = spark.createDataFrame(
            [(0, "a b a"), (1, "a c"), (2, "b b c")],
            "doc_id long, text string",
        )
        plan, jobs = _jobs_during(spark, lambda: tfidf_topk(df, k=2))
        assert jobs == [], f"tfidf construction launched jobs: {jobs}"
        got = {
            (r["doc_id"], r["term"]): r["score"] for r in plan.collect()
        }
        # tf * N / df with N=3 docs: doc 0 term 'a' -> 2*3/2 = 3.0
        assert got[(0, "a")] == pytest.approx(3.0)


class TestContractEdges:
    def test_connectivity_preserved(self, spark):
        """CC over contracted stars == CC over the raw edges, for a
        key that SPLITS components (locality key groups must never
        merge what the graph keeps apart)."""
        from h3_indexer_spark.operators.graph import (
            connected_components,
            contract_edges,
        )

        # two chains: 1-2-3-4 (key groups {1,2},{3,4}) and 10-11
        edges = spark.createDataFrame(
            [(1, 2, 0), (2, 3, 0), (3, 4, 1), (10, 11, 2)],
            "src long, dst long, k int",
        )
        verts = spark.createDataFrame(
            [(v,) for v in (1, 2, 3, 4, 10, 11)], "id long"
        )
        star = contract_edges(edges, "k")
        got = {
            (r["id"], r["component"])
            for r in connected_components(star, verts).collect()
        }
        want = {
            (r["id"], r["component"])
            for r in connected_components(
                edges.select("src", "dst"), verts
            ).collect()
        }
        assert got == want
        assert (4, 1) in got and (11, 10) in got

    def test_emit_key_roundtrip(self, spark):
        from h3_indexer_spark.operators.graph import contract_edges

        edges = spark.createDataFrame(
            [(1, 2, 7), (2, 3, 7), (5, 6, 9)], "src long, dst long, k int"
        )
        rows = contract_edges(edges, "k", emit_key=True).collect()
        assert {(r["src"], r["dst"], r["key"]) for r in rows} == {
            (2, 1, 7),
            (3, 1, 7),
            (6, 5, 9),
        }

    def test_star_root_is_group_min(self, spark):
        from h3_indexer_spark.operators.graph import contract_edges

        edges = spark.createDataFrame(
            [(9, 4, 0), (4, 7, 0)], "src long, dst long, k int"
        )
        rows = contract_edges(edges, "k").collect()
        assert {(r["src"], r["dst"]) for r in rows} == {(7, 4), (9, 4)}
