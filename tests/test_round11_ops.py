"""Round-11 operator tests: the q_triangles pins_out release path
(VERDICT r10 #6), Fisher's exact test, the k-anonymity generalization
ladder, the macro/micro classification summary, and the
q_seq_patterns_full contract plumbing."""

from __future__ import annotations

import pytest


class TestTrianglesPinsOut:
    def test_pins_out_releases_executor_storage(self, spark):
        """VERDICT r10 #6: the pinned near-dup pair table is released
        through the miner's pins_out idiom — callers iterating over
        many datasets unpersist exactly this pin, never clearCache."""
        from h3_indexer_spark.queries import triangles_over_neardup_graph

        from tests.conftest import SF_SMALL

        pins = []
        out = triangles_over_neardup_graph(spark, SF_SMALL, pins_out=pins)
        out.count()  # materialize: the pin is lazy until an action
        assert len(pins) == 1
        assert pins[0].storageLevel.useMemory
        for p in pins:
            p.unpersist()
        assert not pins[0].storageLevel.useMemory

    def test_default_path_unchanged(self, spark):
        """q_triangles (the contract key) still routes through the
        same plan with no pins_out plumbing visible to the driver."""
        from h3_indexer_spark.queries import QUERIES

        from tests.conftest import SF_SMALL

        df = QUERIES["q_triangles"](spark, SF_SMALL)
        assert set(df.columns) == {"vertex", "n_triangles"}
