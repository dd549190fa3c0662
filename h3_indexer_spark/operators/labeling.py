"""Annotation / weak-supervision operators: label aggregation and
inter-annotator agreement.

Training-data pipelines rarely get one clean label per item: they get
MANY noisy ones (crowd workers, labeling functions, model ensembles,
LLM judges) and need (a) a deterministic aggregation into a single
training label and (b) a quality readout on how much the annotators
actually agree. Both are pure conditional-aggregation plans — one
item-keyed shuffle for the vote, one label-keyed fold for agreement —
nothing leaves the JVM.

Beyond-reference surface (the reference engine has no labeling layer);
part of the LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_label(
    df: DataFrame,
    item_col: str,
    label_col: str,
) -> DataFrame:
    """Majority-vote label aggregation: one row per item with the
    winning label, its vote count, the total votes, and the agreement
    ratio (top_count / n_votes — the per-item confidence most
    weak-supervision pipelines threshold on before training).

    Ties break deterministically to the SMALLEST label (count desc,
    label asc) — aggregation must not inherit the annotator arrival
    order. NULL labels are abstentions and are dropped before voting
    (items where everyone abstained disappear — by design: no vote,
    no label).

    Scale shape: one (item, label) count shuffle, then a per-item
    WindowGroupLimit rank (k=1 pushed into the shuffle read); the
    agreement ratio is one division of exact BIGINT counts.
    """
    votes = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(item_col, label_col)
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(item_col).orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    totals = F.sum("votes").over(Window.partitionBy(item_col))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_votes", totals.cast("bigint"))
        .where(F.col("_rn") == 1)
        .select(
            item_col,
            F.col(label_col).alias("top_label"),
            F.col("votes").cast("bigint").alias("top_count"),
            "n_votes",
            (
                F.col("votes").cast("double")
                / F.col("n_votes").cast("double")
            ).alias("agreement"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa between two raters over co-labeled items — the
    standard chance-corrected inter-annotator agreement (Cohen 1960):
    kappa = (p_o − p_e) / (1 − p_e), with p_o the observed agreement
    rate and p_e the expected-by-chance rate from the raters'
    marginal label distributions.

    Exactness shape: rows where either label is NULL are dropped;
    n_items and n_agree are exact BIGINTs; p_o is ONE division;
    p_e = Σ_k n_a(k)·n_b(k) / n², where the numerator is an exact
    BIGINT sum (products of counts — no per-label float division, so
    no engine-owned float accumulation order) and the division
    happens ONCE. kappa is then three IEEE ops on two deterministic
    doubles. Returns a single readout row:
    (n_items, n_agree, po, pe, kappa); kappa is NULL when p_e = 1
    (both raters constant — chance correction undefined).

    Scale shape: one conditional-sum scan for n/agree, one
    label-keyed count per rater (full-outer aligned), and a 1-row
    fold — nothing wider than the label key shuffles.
    """
    labeled = df.where(
        F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
    ).select(
        F.col(rater_a_col).alias("_a"), F.col(rater_b_col).alias("_b")
    )
    # ONE (a, b) cell census feeds all three readouts: n/agree fold,
    # rater-A marginals, rater-B marginals. The former three direct
    # aggregations over `labeled` each re-scanned the input (three
    # scan stages measured); deriving them from the shared cell
    # exchange scans it once — every downstream count is an exact sum
    # of cell counts, so the values are unchanged.
    cells = labeled.groupBy("_a", "_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    base = cells.agg(
        F.sum("_n").alias("n_items"),
        F.sum(
            F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(
                F.lit(0)
            )
        ).cast("bigint").alias("n_agree"),
    )
    ca = cells.groupBy(F.col("_a").alias("_k")).agg(
        F.sum("_n").alias("n_a")
    )
    cb = cells.groupBy(F.col("_b").alias("_k")).agg(
        F.sum("_n").alias("n_b")
    )
    cross = (
        ca.join(cb, "_k", "full_outer")
        .select(
            (
                F.coalesce(F.col("n_a"), F.lit(0))
                * F.coalesce(F.col("n_b"), F.lit(0))
            ).alias("_prod")
        )
        .agg(F.sum("_prod").cast("bigint").alias("sum_prod"))
    )
    n = F.col("n_items").cast("double")
    po = F.col("n_agree").cast("double") / n
    pe = F.col("sum_prod").cast("double") / (n * n)
    return base.crossJoin(F.broadcast(cross)).select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
        F.when(pe < F.lit(1.0), (po - pe) / (F.lit(1.0) - pe)).alias(
            "kappa"
        ),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    quant: int = 10**9,
) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for MANY raters per
    item (Fleiss 1971), the multi-annotator generalization of
    cohens_kappa and the standard QA readout for crowd-labeled
    training data (each item judged by an arbitrary subset of the
    annotator pool). Items with fewer than two non-NULL ratings carry
    no agreement signal and are dropped; variable ratings-per-item
    uses the natural per-item weighting
    P_i = Σ_j n_ij(n_ij−1) / (n_i(n_i−1)).

    Exactness shape: every count is an exact BIGINT. P_i is one
    division of exact integers per item, FLOOR(·quant)-quantized and
    integer-summed so P̄ is free of float accumulation order (the
    established order-free-sum recipe; exact rationals land exactly
    ON quantization boundaries, where both engines floor identically,
    and irrational ratios sit far from them). p_e = Σ_j t_j² / N²
    has an exact BIGINT numerator (DECIMAL(38,0) products — the n²
    overflow rule) and divides ONCE. Returns one readout row:
    (n_items, n_ratings, p_bar, p_e, kappa); kappa is NULL when
    p_e = 1 (all ratings one label).

    Scale shape: one (item, label) count, one item-keyed P_i
    aggregation, one label-keyed marginal count, three 1-row folds —
    nothing wider than (item, label) shuffles.
    """
    rated = df.where(
        F.col(item_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(F.col(item_col).alias("_i"), F.col(label_col).alias("_j"))
    cell = rated.groupBy("_i", "_j").agg(
        F.count(F.lit(1)).alias("_nij")
    )
    # the per-item total rides a window over the cell census instead
    # of a separate aggregate + semi-join back: the former shape
    # referenced the census from two canonically different branches
    # (the semi-join side re-keyed and re-pruned it), so the census —
    # and the scan under it — built twice (measured). With the
    # window, every readout hangs off ONE cell lineage, and the
    # item-keyed aggregate below reuses the window's partitioning.
    wi = Window.partitionBy("_i")
    kept = cell.withColumn(
        "_ni", F.sum("_nij").over(wi).cast("bigint")
    ).where(F.col("_ni") >= 2)
    per_item = kept.groupBy("_i").agg(
        F.max("_ni").cast("bigint").alias("_ni"),
        F.sum(
            F.col("_nij").cast("decimal(38,0)")
            * (F.col("_nij") - F.lit(1)).cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("_sp"),
    )
    pi_q = F.floor(
        F.col("_sp").cast("double")
        / (
            F.col("_ni").cast("double")
            * (F.col("_ni") - F.lit(1)).cast("double")
        )
        * F.lit(float(quant))
    )
    item_agg = per_item.select(
        "_i", "_ni", pi_q.alias("_piq")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("_ni").cast("bigint").alias("n_ratings"),
        F.sum("_piq").cast("bigint").alias("_sum_piq"),
    )
    # label marginals over the SAME (>=2 ratings) item universe
    marg = kept.groupBy("_j").agg(
        F.sum("_nij").cast("bigint").alias("_tj")
    )
    marg_agg = marg.agg(
        F.sum(
            F.col("_tj").cast("decimal(38,0)")
            * F.col("_tj").cast("decimal(38,0)")
        ).cast("decimal(38,0)").alias("_sum_tj2")
    )
    j = item_agg.crossJoin(F.broadcast(marg_agg))  # 1-row folds
    p_bar = (
        F.col("_sum_piq").cast("double")
        / F.lit(float(quant))
        / F.col("n_items").cast("double")
    )
    p_e = F.col("_sum_tj2").cast("double") / (
        F.col("n_ratings").cast("double")
        * F.col("n_ratings").cast("double")
    )
    return j.select(
        "n_items",
        "n_ratings",
        p_bar.alias("p_bar"),
        p_e.alias("p_e"),
        F.when(
            p_e < 1.0, (p_bar - p_e) / (F.lit(1.0) - p_e)
        ).alias("kappa"),
    )
