"""Unit semantics for the round-2 text operators (ngram census and
TF-IDF); corpus-level behavior is oracle-checked via q_ngram_bigrams
and q_tfidf."""

from __future__ import annotations


def test_ngram_counts_bigrams(spark):
    from h3_indexer_spark.operators.textops import ngram_counts

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "b c d")], "doc_id long, text string"
    )
    got = {r.ngram: r.n for r in ngram_counts(df, "text", n=2, k=10).collect()}
    assert got == {"a b": 2, "b c": 2, "c d": 1}


def test_ngram_counts_trigrams_and_topk_determinism(spark):
    from h3_indexer_spark.operators.textops import ngram_counts

    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z")], "doc_id long, text string"
    )
    rows = ngram_counts(df, "text", n=3, k=2).collect()
    assert [(r.ngram, r.n) for r in rows] == [("x y z", 2), ("y z w", 1)]


def test_tfidf_scores_exact(spark):
    from h3_indexer_spark.operators.textops import tfidf_topk

    # 2 docs: "a" appears in both (df=2), "b" only in doc 1 (df=1)
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.term): (r.score, r.rank)
        for r in tfidf_topk(df, "text", "doc_id", k=2).collect()
    }
    # N=2: doc1: b -> 1*2/1=2.0, a -> 2*2/2=2.0 (tie: term asc => a first)
    assert got[(1, "a")] == (2.0, 1)
    assert got[(1, "b")] == (2.0, 2)
    assert got[(2, "c")] == (2.0, 1)
    assert got[(2, "a")] == (1.0, 2)


class TestFuzzyPairs:
    def test_planted_typos_found_and_verified(self, spark):
        from h3_indexer_spark.operators.textops import fuzzy_pairs

        df = spark.createDataFrame(
            [
                (1, "Acme Corporation"),
                (2, "Acme Corporatien"),   # 1 substitution
                (3, "Acme Corp"),          # distance 7 from #1
                (4, "Bcme Corporation"),   # differs in char 1: other block
                (5, "Zenith Industries"),
            ],
            ["id", "name"],
        )
        pairs = {
            (r.id_a, r.id_b): r.edit_dist
            for r in fuzzy_pairs(
                df, "id", "name", max_dist=2, prefix_len=4
            ).collect()
        }
        assert pairs == {(1, 2): 1}  # typo caught, verified at dist 1

    def test_blocking_bounds_candidates(self, spark):
        """A pair differing inside the block prefix is unseen — the
        documented recall trade of blocked matching."""
        from h3_indexer_spark.operators.textops import fuzzy_pairs

        df = spark.createDataFrame(
            [(1, "Acme Corporation"), (4, "Bcme Corporation")],
            ["id", "name"],
        )
        assert (
            fuzzy_pairs(df, "id", "name", max_dist=2, prefix_len=4).count()
            == 0
        )


class TestRareWords:
    def test_constructed_corpus(self, spark):
        from h3_indexer_spark.operators.textops import rare_word_stats

        df = spark.createDataFrame(
            [
                (1, "common common zebra"),
                (2, "common word"),
                (3, "common word qux"),
            ],
            "doc_id long, text string",
        )
        # min_df=2 over DOCUMENT frequency: 'common' in 3 docs,
        # 'word' in 2 -> common; 'zebra'/'qux' rare
        out = {r.doc_id: r for r in rare_word_stats(df, min_df=2).collect()}
        assert out[1].n_tokens == 3 and out[1].n_rare == 1
        assert out[1].rare_ratio == 1.0 / 3.0
        assert out[2].n_rare == 0 and out[2].rare_ratio == 0.0
        assert out[3].n_rare == 1
