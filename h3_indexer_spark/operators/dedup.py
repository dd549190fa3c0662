"""Deduplication operators for large-scale text corpora.

All are expressed as DataFrame plans that scale to 100 TB:
- exact:      hash-groupBy (one shuffle of (hash, id) pairs only)
- minhash-LSH: shingle → minhash signature (vectorized, JVM-side
  hashing) → band buckets → self-join within buckets → connected
  pairs. The band self-join shuffles only (band_hash, id), never the
  documents.
- simhash:    64-bit weighted-bit fingerprint; near-dups share bands of
  the fingerprint.
- n-gram Jaccard: verification metric for candidate pairs.

Every operator keys the heavy join on a hash, so AQE's skew handling
covers pathological buckets (e.g. boilerplate-heavy corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Prime modulus close to 2^31 for permutation hashing
_MERSENNE = (1 << 61) - 1


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by content hash; keeps the minimum id as
    the canonical representative. Output: (text_hash, keep_id, dup_cnt).
    """
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_hash"), id_col)
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """Word k-gram shingle set per document: (id, shingle_hash). Stays
    JVM-side: split → sliding windows via transform/slice → xxhash64."""
    words = F.split(F.col(text_col), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, k), " "),
    )
    return (
        df.select(id_col, F.explode(grams).alias("shingle"))
        .select(id_col, F.xxhash64("shingle").alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document: num_hashes hash-family minima
    computed as one groupBy over JVM-side hash expressions (a single
    shuffle of partial minima, thanks to partial aggregation).

    The hash family is seeded xxhash64 — re-hashing the shingle hash
    with a distinct literal per function. Stays in whole-stage codegen;
    the naive (a*h+b) mod p permutation needs decimal(38) arithmetic to
    avoid overflow, which is ~50× slower per row."""
    aggs = [
        F.min(F.xxhash64(F.lit(seed), F.lit(h), F.col("shingle_hash"))).alias(
            f"mh_{h}"
        )
        for h in range(num_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Banded LSH: documents sharing any band bucket become candidate
    pairs (a < b). Only (band_hash, id) rows shuffle."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.xxhash64(F.lit(b), *[F.col(c) for c in cols]).alias(f"band_{b}")
        )
    banded = signatures.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(F.array(*[F.col(f"band_{b}") for b in range(bands)])).alias(
            "bucket"
        ),
    )
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(right, on="bucket")
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame,
    shingle_df: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard similarity of shingle sets for candidate pairs —
    the verification step after LSH. Shuffles only (id, shingle_hash)
    keyed by id."""
    a = shingle_df.select(
        F.col(id_col).alias("id_a"), F.col("shingle_hash").alias("sh")
    )
    b = shingle_df.select(
        F.col(id_col).alias("id_b"), F.col("shingle_hash").alias("sh")
    )
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    sizes = shingle_df.groupBy(id_col).agg(F.count("*").alias("n"))
    return (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup plan: shingle → minhash → LSH candidates → exact
    Jaccard filter. Output: (id_a, id_b, jaccard) with jaccard ≥
    threshold."""
    sh = shingles(df, text_col, id_col, k)
    sig = minhash_signatures(sh, id_col, num_hashes)
    pairs = lsh_candidate_pairs(sig, id_col, num_hashes, bands)
    return ngram_jaccard(pairs, sh, id_col).where(
        F.col("jaccard") >= threshold
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash fingerprint per document, fully JVM-side: token
    xxhash64 → per-bit ±1 votes → sign. Output: (id, simhash) as long.
    """
    tokens = df.select(
        id_col, F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")
    ).select(id_col, F.xxhash64("tok").alias("th"))
    bit_votes = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("th"), b).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    votes = tokens.groupBy(id_col).agg(*bit_votes)
    fingerprint = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return votes.select(id_col, fingerprint.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: split the 64-bit fingerprint into
    ``bands`` blocks; by pigeonhole, any pair within ``max_hamming``
    (< bands) shares at least one exact block. Verify with popcount.
    Output: (id_a, id_b, hamming)."""
    fps = simhash(df, text_col, id_col)
    width = 64 // bands
    block_cols = [
        F.shiftrightunsigned(F.col("simhash"), b * width)
        .bitwiseAND((1 << width) - 1)
        .alias(f"blk_{b}")
        for b in range(bands)
    ]
    blocked = fps.select(id_col, "simhash", *block_cols)
    stacked = blocked.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"blk_{b}").alias("v"))
                    for b in range(bands)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "simhash", "blk.band", "blk.v")
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(r, ["band", "v"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.select("id_a", "id_b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )
