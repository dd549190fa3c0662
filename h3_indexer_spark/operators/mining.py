"""Pattern-mining operators: market-basket association rules and
Pareto-frontier (skyline) extraction.

Beyond-reference surface (the reference engine has no mining ops):
these are the classic retail/feature-discovery primitives a
training-data pipeline runs over transaction-shaped tables —
re-expressed as pure DataFrame plans (one equi-self-join bounded by
basket size for pairs; an aggregated-levels window for the skyline),
never the naive all-pairs/all-rows quadratic formulations.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

# Rendered-pattern separator shared by both sequence miners. Patterns
# are array<string> INTERNALLY (support is aggregated on the array, so
# an event type containing this separator cannot merge two distinct
# sequences' supports — ADVICE r10); the arrow string is rendered only
# at the output edge. Two distinct arrays can still RENDER to the same
# string when a type embeds the separator — they surface as two output
# rows with honest separate supports, never a silently-merged count.
_PATTERN_SEP = " -> "


def _capped_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None,
    log_exclusions: bool,
    op_name: str,
) -> DataFrame:
    """Shared pair-miner front end (association_rules,
    item_cf_similarity): collapse each basket to its DISTINCT item
    set as ONE array row — (_b, _items) — then apply the mega-basket
    guard as a plain size filter. Capped baskets are EXCLUDED, not
    sampled, so results stay deterministic.

    This replaces the former (basket, item)-row shape, which cost a
    distinct exchange PLUS a per-basket size aggregation PLUS a
    semi-join back just to express the cap: collect_set dedups inside
    ONE map-side-combined groupBy(basket) shuffle, the cap is
    ``size(_items) <= max_basket_size`` with no join, and — the real
    point — downstream pair generation explodes basket-locally
    instead of self-joining the table on the basket key. Basket width
    bounds the array (the same contract that bounded the join's
    per-basket pair volume). With ``log_exclusions`` the guard
    eagerly counts exclusions (one small job, the table pinned by
    localCheckpoint so the count and the returned plan share one
    computation); without it the identical cap folds into the lazy
    plan (zero jobs at construction, persist()-pinned)."""
    baskets = df.groupBy(F.col(basket_col).alias("_b")).agg(
        F.collect_set(F.col(item_col)).alias("_items")
    )
    if max_basket_size is None:
        return baskets
    if log_exclusions:
        baskets = baskets.localCheckpoint()
        n_excluded = baskets.where(
            F.size("_items") > max_basket_size
        ).count()
        if n_excluded:
            _LOG.warning(
                "%s: excluded %d mega-basket(s) with more than %d "
                "items (pass max_basket_size=None to opt out of the "
                "quadratic-pair guard)",
                op_name,
                n_excluded,
                max_basket_size,
            )
    else:
        baskets = baskets.persist()
    return baskets.where(F.size("_items") <= max_basket_size)


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    k: int = 30,
    max_basket_size: int | None = 10_000,
    log_exclusions: bool = True,
) -> DataFrame:
    """Pairwise association rules (Agrawal & Srikant's Apriori at the
    2-itemset level): for every ordered item pair (a → b) with joint
    support ≥ ``min_support`` baskets, the support / confidence /
    lift readout — the co-purchase / co-occurrence miner.

    Output: (antecedent, consequent, n_joint, n_antecedent,
    confidence, lift), top ``k`` by (lift desc, antecedent asc,
    consequent asc). confidence = n_joint/n_antecedent and
    lift = n_joint·N/(n_a·n_b) are single divisions of exact BIGINT
    counts — bit-equal in any engine.

    Scale shape: baskets collapse to their distinct item-set ARRAYS
    first (one map-side-combined shuffle — see ``_capped_baskets``);
    pair generation is a basket-local double explode (each item
    against the rest of its own basket), so work is Σ_b s_b²
    (bounded by basket size, never corpus²) with NO self-join — the
    former basket-keyed equi-self-join paid a second exchange over
    the item rows to emit the identical pair multiset.
    ``max_basket_size`` (default 10⁴ — ``None`` is an EXPLICIT
    opt-out) drops pathological mega-baskets (a basket with 10⁵
    items contributes 10¹⁰ pairs — cap-and-log is the standard
    guard; capped baskets are EXCLUDED, not sampled, so results stay
    deterministic). With ``log_exclusions`` (default) the guard
    eagerly counts the excluded baskets (one small aggregation job)
    and logs the exclusion so a silent cap can never masquerade as
    full coverage; ``log_exclusions=False`` keeps the IDENTICAL cap
    semantics but folds it into the lazy plan (zero jobs at
    construction — the composition-friendly fast path; the basket
    table is persist()-pinned instead of checkpointed so the
    branches still share one computation at action time). Item
    supports ride a narrow explode + aggregation of the same basket
    table; N is a 1-row broadcast fold."""
    baskets = _capped_baskets(
        df, basket_col, item_col, max_basket_size, log_exclusions,
        "association_rules",
    )
    # N over the SAME (post-cap) basket universe as the supports —
    # mixing a pre-cap N into lift would skew every ratio
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    item_support = baskets.select(
        F.explode("_items").alias("_i")
    ).groupBy("_i").agg(F.count(F.lit(1)).alias("_n_item"))
    pairs = (
        baskets.select(F.explode("_items").alias("antecedent"), "_items")
        .select(
            "antecedent",
            F.explode(
                F.filter("_items", lambda e: e != F.col("antecedent"))
            ).alias("consequent"),
        )
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_joint"))
        .where(F.col("n_joint") >= min_support)
    )
    sup_a = item_support.select(
        F.col("_i").alias("antecedent"),
        F.col("_n_item").alias("n_antecedent"),
    )
    sup_b = item_support.select(
        F.col("_i").alias("consequent"),
        F.col("_n_item").alias("_n_consequent"),
    )
    # Support tables are item-vocabulary-sized — unbounded at 100 TB,
    # so no forced broadcast (same ADVICE-r9 fix as item_cf_similarity:
    # let Catalyst/AQE broadcast from stats when small, shuffle-join
    # when not). n_baskets stays hinted: it is a 1-row fold by
    # construction, broadcastable at any scale.
    joined = (
        pairs.join(sup_a, "antecedent")
        .join(sup_b, "consequent")
        .crossJoin(F.broadcast(n_baskets))
    )
    nj = F.col("n_joint").cast("double")
    na = F.col("n_antecedent").cast("double")
    nb = F.col("_n_consequent").cast("double")
    nn = F.col("n_baskets").cast("double")
    return (
        joined.select(
            "antecedent",
            "consequent",
            F.col("n_joint").cast("bigint").alias("n_joint"),
            F.col("n_antecedent").cast("bigint").alias("n_antecedent"),
            (nj / na).alias("confidence"),
            (nj * nn / (na * nb)).alias("lift"),
        )
        .orderBy(
            F.col("lift").desc(),
            F.col("antecedent").asc(),
            F.col("consequent").asc(),
        )
        .limit(k)
    )


def skyline_2d(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """The 2-D Pareto frontier (Börzsönyi et al., "The Skyline
    Operator", ICDE 2001): rows not dominated by any other row, where
    A dominates B iff A.minimize ≤ B.minimize ∧ A.maximize ≥
    B.maximize with at least one strict. Classic price-vs-quality
    shortlisting. Returns the full surviving rows.

    Plan: collapse to one row per ``minimize_col`` level (keeping the
    level's max of ``maximize_col``), ONE ordered window over that
    aggregated level table for the strictly-cheaper running max, then
    a broadcast join back. A row survives iff it carries its level's
    max AND beats every cheaper level's max. Equal (min,max)
    duplicates all survive (neither dominates). The window runs over
    |distinct levels| rows, not the corpus; beyond memory, skyline is
    decomposable — skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))
    — so a per-partition local pass can pre-shrink the input with the
    same operator before this global step."""
    levels = df.groupBy(F.col(minimize_col).alias("_lvl")).agg(
        F.max(maximize_col).alias("_lvl_max")
    )
    w = Window.orderBy(F.col("_lvl").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = levels.select(
        "_lvl",
        "_lvl_max",
        F.max("_lvl_max").over(w).alias("_prev_max"),
    )
    # no broadcast hint: with near-unique values the level table is
    # corpus-sized (Catalyst picks SMJ); with few levels its stats
    # auto-broadcast it
    out = df.join(levels, df[minimize_col] == levels["_lvl"])
    keep = (F.col(maximize_col) == F.col("_lvl_max")) & (
        F.col("_prev_max").isNull()
        | (F.col("_prev_max") < F.col(maximize_col))
    )
    return out.where(keep).drop("_lvl", "_lvl_max", "_prev_max")


def sequential_patterns(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
    max_gap: int = 2,
    k: int = 20,
) -> DataFrame:
    """Sequential pattern mining, PrefixSpan-lite (Pei et al. 2001,
    bounded to length ≤ 3): the top-``k`` event-type sequences by
    entity support, where a pattern <t1, t2, t3> matches an entity's
    time-ordered stream when consecutive pattern elements occur at
    most ``max_gap`` events apart (gap tolerance — ``max_gap=1`` is
    strict adjacency, the q_top_paths n-gram census; larger gaps
    tolerate interleaved noise events, the point of sequence mining
    over plain n-grams). Support counts DISTINCT entities exhibiting
    the pattern at least once, the standard sequence-support
    definition.

    Scale shape: ONE window shuffle on the entity id computes
    ``2·max_gap`` lead expressions over the same frame (no extra
    exchange); each event emits its ≤ 1 + g + g² candidate
    (pattern, length) pairs through one explode (a bounded fan-out,
    never a self-join), a per-entity DISTINCT collapses repeats
    map-side, and support is a key-partitioned count. The final
    rank is a TakeOrderedAndProject over the tiny pattern table —
    no global sort materializes. Full PrefixSpan recursion is
    deliberately out of scope: length ≤ 3 with bounded gaps covers
    the funnel/journey questions the rest of this family
    (q_transitions, q_top_paths, q_eventually_follows) answers, and
    keeps the candidate space linear in events.

    Output: (pattern, length, support, rnk), pattern arrow-joined,
    ranked by (support desc, pattern asc) — a total order, so the
    top-k cut is deterministic."""
    if max_gap < 1:
        raise ValueError(f"max_gap must be >= 1, got {max_gap}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(id_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    # window expressions cannot sit inside the explode's projection —
    # materialize the lead columns in their own select first
    led = events.select(
        F.col(id_col).alias("_e"),
        F.col(type_col).alias("_t0"),
        *[
            F.lead(type_col, i).over(w).alias(f"_l{i}")
            for i in range(1, 2 * max_gap + 1)
        ],
    )
    t0 = F.col("_t0")
    leads = {i: F.col(f"_l{i}") for i in range(1, 2 * max_gap + 1)}
    # candidates carry the pattern as array<string> internally — an
    # event type that itself contains the arrow separator can no
    # longer collide two distinct sequences into one support bucket;
    # the arrow string is rendered only at the output edge, AFTER the
    # support aggregation (ADVICE r10). Every referenced element gets
    # an explicit NOT-NULL guard (an array is non-null even when its
    # elements are, unlike the old concat).
    cands = [
        F.struct(
            F.when(t0.isNotNull(), F.array(t0)).alias("pattern"),
            F.lit(1).alias("length"),
        )
    ]
    for a in range(1, max_gap + 1):
        cands.append(
            F.struct(
                F.when(
                    t0.isNotNull() & leads[a].isNotNull(),
                    F.array(t0, leads[a]),
                ).alias("pattern"),
                F.lit(2).alias("length"),
            )
        )
        for b in range(1, max_gap + 1):
            cands.append(
                F.struct(
                    F.when(
                        t0.isNotNull()
                        & leads[a].isNotNull()
                        & leads[a + b].isNotNull(),
                        F.array(t0, leads[a], leads[a + b]),
                    ).alias("pattern"),
                    F.lit(3).alias("length"),
                )
            )
    per_entity = (
        led.select(
            "_e",
            F.explode(F.array(*cands)).alias("_c"),
        )
        .select(
            "_e",
            F.col("_c.pattern").alias("pattern"),
            F.col("_c.length").alias("length"),
        )
        .where(F.col("pattern").isNotNull())
        .distinct()
    )
    support = per_entity.groupBy("pattern", "length").agg(
        F.count(F.lit(1)).cast("bigint").alias("support")
    )
    # render the arrow string on the (tiny) support census, then rank
    # on the RENDERED string so the contract's (support desc, pattern
    # asc) total order is over exactly the emitted column. The
    # INTERNAL array is kept as the final tiebreaker (ADVICE r11):
    # two distinct arrays whose rendering collides (an event type
    # embedding the arrow separator) can tie exactly on
    # (support, pattern), and without the array the limit boundary
    # and row_number would be nondeterministic. Such a collision also
    # diverges from the string-concatenating oracle, which would
    # merge the two sequences' supports — documented OUT OF CONTRACT:
    # the contract assumes event types do not embed ' -> '.
    rendered = support.select(
        F.array_join("pattern", _PATTERN_SEP).alias("pattern"),
        F.col("length").cast("bigint").alias("length"),
        "support",
        F.col("pattern").alias("_arr"),
    )
    order_cols = [
        F.col("support").desc(),
        F.col("pattern").asc(),
        F.col("_arr").asc(),
    ]
    top = rendered.orderBy(*order_cols).limit(k)
    rk = Window.orderBy(*order_cols)
    return top.select(
        "pattern",
        "length",
        "support",
        F.row_number().over(rk).cast("bigint").alias("rnk"),
    )


def item_cf_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_joint: int = 2,
    k: int = 30,
    max_basket_size: int | None = 10_000,
    log_exclusions: bool = True,
) -> DataFrame:
    """Item-item collaborative filtering by co-occurrence cosine
    (Sarwar et al. 2001, the "users who bought X also bought Y"
    primitive): for every UNORDERED item pair co-occurring in
    ≥ ``min_joint`` baskets, cosine = c_ij / √(c_i·c_j) over binary
    basket-incidence vectors — association_rules' directional
    confidence/lift readout replaced by the symmetric normalized
    similarity a recommender's neighbor table wants.

    Output: (item_a, item_b, n_joint, n_a, n_b, cos_sim) with
    item_a < item_b, top ``k`` by (cos_sim desc, item_a asc,
    item_b asc) — cosine is ONE double expression over exact BIGINT
    counts (÷, √ in fixed order), ROUND 9, so the cut is a total
    order.

    Scale shape: identical to association_rules — per-basket distinct
    item-set arrays first (``_capped_baskets``: one map-side-combined
    shuffle, mega-basket guard as a size filter, eager census under
    ``log_exclusions`` else folded lazily), pair generation as a
    basket-local double explode bounded by Σ_b s_b² with no
    self-join, item supports broadcast back, and the final rank is a
    TakeOrderedAndProject — no global sort. The i<j filter halves
    the pair volume relative to the rules miner."""
    baskets = _capped_baskets(
        df, basket_col, item_col, max_basket_size, log_exclusions,
        "item_cf_similarity",
    )
    support = baskets.select(
        F.explode("_items").alias("_i")
    ).groupBy("_i").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_item")
    )
    pairs = (
        baskets.select(F.explode("_items").alias("item_a"), "_items")
        .select(
            "item_a",
            F.explode(
                F.filter("_items", lambda e: e > F.col("item_a"))
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_joint"))
        .where(F.col("n_joint") >= min_joint)
    )
    sup_a = support.select(
        F.col("_i").alias("item_a"), F.col("_n_item").alias("n_a")
    )
    sup_b = support.select(
        F.col("_i").alias("item_b"), F.col("_n_item").alias("n_b")
    )
    # No broadcast hint: the support table's size is the ITEM
    # VOCABULARY, unbounded at 100 TB (a web-scale item universe can
    # exceed executor memory). Let Catalyst/AQE pick — at survey-scale
    # vocabularies it still broadcasts from stats; at huge ones it
    # falls back to a shuffle join keyed by item, which is correct
    # and bounded (ADVICE r9: the forced hint risked driver OOM).
    joined = pairs.join(sup_a, "item_a").join(sup_b, "item_b")
    cos = F.col("n_joint").cast("double") / F.sqrt(
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return (
        joined.select(
            "item_a",
            "item_b",
            "n_joint",
            "n_a",
            "n_b",
            F.round(cos, 9).alias("cos_sim"),
        )
        .orderBy(
            F.col("cos_sim").desc(),
            F.col("item_a").asc(),
            F.col("item_b").asc(),
        )
        .limit(k)
    )


def sequential_patterns_full(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_tiebreak: str = "event_id",
    min_support: int = 2,
    max_len: int = 5,
    pins_out: list[DataFrame] | None = None,
) -> DataFrame:
    """FULL sequential pattern mining (PrefixSpan semantics, Pei et
    al. 2001): every event-type sequence of length ≤ ``max_len``
    occurring as a SUBSEQUENCE (arbitrary gaps — the classic
    definition, vs sequential_patterns' bounded-gap variant) of at
    least ``min_support`` entities' time-ordered streams. This is the
    length-k completion the bounded miner documents away: use the
    bounded variant for funnel/journey questions (linear candidate
    space), this one when patterns longer than 3 or unbounded gaps
    matter.

    Algorithm — level-wise GREEDY EXTENSION instead of per-entity
    projected-database recursion (the driver-side recursion of
    classic PrefixSpan does not distribute; this does): a pattern p
    is a subsequence of a stream iff greedy earliest matching
    succeeds, so per (entity, pattern) it suffices to track ONLY the
    earliest match end position. Level k→k+1 joins the survivor
    table (entity, pattern, end_pos) to the position-indexed event
    table on entity AND pos > end_pos, keeps min(pos) per extended
    pattern, and support-prunes (≥ min_support DISTINCT entities)
    before the next level — the Apriori property (every prefix of a
    frequent sequence is frequent) makes the prune lossless. Events
    of globally-infrequent types are dropped up front (their 1-type
    pattern is already infrequent).

    Scale: each level is ONE entity-keyed equi-join (range predicate
    on position applied post-match) + two aggregations, all on the
    same entity hash partitioning; live state per entity is (frequent
    patterns alive in that entity) rows, shrunk every level by the
    global support prune — never an all-subsequence materialization.
    ``max_len`` bounds the number of rounds (jobs), not correctness:
    the miner also stops early at the first empty level. The
    frequent-pattern table is the join's build side; no broadcast
    hint (its size is data-dependent — AQE decides).

    Output: (pattern, length, support) for every frequent pattern,
    ordered by (length asc, support desc, pattern asc) — a total
    order. Deterministic: exact integer supports, arrow-joined
    pattern strings.

    There is deliberately NO early-stop probe: a driver-side take(1)
    per level would materialize the dominant per-level join twice
    (measured ~2x on the deepest level), and levels past the data's
    longest frequent pattern are EMPTY lazy joins AQE skips at action
    time — keep ``max_len`` sane, but an over-large value costs plan
    nodes and cache slots, not jobs.

    Cache lifecycle: the position-indexed event table and each
    level's join output are persist()-pinned (each feeds multiple
    consumers; pinning the PRUNED view instead re-derives the
    dominant join 2-3x — measured). Pins are plan-keyed, so repeat
    invocations on the same input reuse one cache slot. A long-lived
    session mining MANY distinct corpora should release them after
    materializing the result: pass ``pins_out=[]`` and unpersist the
    collected DataFrames once the caller's action completes —
    narrower than spark.catalog.clearCache(), which would also evict
    every unrelated pinned table in the session (ADVICE r9, the
    q_triangles precedent)."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    w = Window.partitionBy(id_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    ev = events.select(
        F.col(id_col).alias("_e"),
        F.col(type_col).alias("_t"),
        F.row_number().over(w).cast("bigint").alias("_pos"),
    )
    # global type prune: a type below min_support can appear in no
    # frequent pattern at any length (Apriori, length-1 case)
    freq_types = (
        ev.groupBy("_t")
        .agg(F.count_distinct("_e").alias("_sup"))
        .where(F.col("_sup") >= min_support)
        .select("_t")
    )
    ev = ev.join(freq_types, "_t", "left_semi")
    # the event table feeds every level — pin it once (lazy; the
    # first level's action materializes it). Every pin is also
    # reported through pins_out so callers can release executor
    # storage after their action completes.
    def _pin(df: DataFrame) -> DataFrame:
        df = df.persist()
        if pins_out is not None:
            pins_out.append(df)
        return df

    ev = _pin(ev)
    # Persistence discipline (measured, not theoretical): the PINNED
    # table must be each level's JOIN OUTPUT, not the support-pruned
    # view of it. Level k's table feeds both consumers — the output
    # support rows and (through the prune) level k+1's join. Pinning
    # only the pruned view leaves the dominant join outside every
    # cache boundary, and the final action re-derives it 2-3x per
    # level (measured 33s -> 95s on the x20 curve). Pinning the join
    # output itself runs every level's join exactly once. No
    # driver-side early-stop probe either: a take(1) per level
    # materializes the dominant join a second time; levels past the
    # longest frequent pattern are EMPTY lazy joins that AQE skips at
    # action time.
    # Support is carried ON the level rows by a pattern-partitioned
    # window count rather than a separate aggregate + semi-join
    # prune. Same counts (one level row per (entity, pattern)), but
    # ONE reference to the previous level per round instead of two —
    # the agg+semi-join shape nested level k-1's plan twice into
    # level k, so the static tree grew 2^k and Catalyst alone spent
    # ~5.5 s of the cold pass before the first job (profiled: a
    # 5.5 s zero-job gap at the head of the cold timeline). The
    # window also replaces the prune's exchange outright.
    # level 1: earliest occurrence of each surviving type per entity.
    # _pat is array<string> end-to-end (support counts key on the
    # ARRAY, so a type containing the arrow separator cannot merge two
    # distinct sequences — ADVICE r10); the string renders at the edge.
    w_pat = Window.partitionBy("_pat")
    level = _pin(
        ev.groupBy("_e", F.array(F.col("_t")).alias("_pat"))
        .agg(F.min("_pos").alias("_end"))
        .withColumn(
            "_sup", F.count(F.lit(1)).over(w_pat).cast("bigint")
        )
    )
    out_levels: list[DataFrame] = []
    for length in range(1, max_len + 1):
        # survivor prune: only frequent patterns are reported and
        # only they grow (lossless by the Apriori property)
        surv = level.where(F.col("_sup") >= F.lit(min_support))
        out_levels.append(
            surv.select("_pat", F.col("_sup").alias("support"))
            .distinct()
            .select(
                F.array_join("_pat", _PATTERN_SEP).alias("pattern"),
                F.lit(length).cast("bigint").alias("length"),
                "support",
            )
        )
        if length == max_len:
            break
        level = _pin(
            surv.join(ev, "_e")
            .where(F.col("_pos") > F.col("_end"))
            .groupBy(
                "_e",
                F.concat(
                    F.col("_pat"), F.array(F.col("_t"))
                ).alias("_pat"),
            )
            .agg(F.min("_pos").alias("_end"))
            .withColumn(
                "_sup", F.count(F.lit(1)).over(w_pat).cast("bigint")
            )
        )
    result = out_levels[0]
    for nxt in out_levels[1:]:
        result = result.unionByName(nxt)
    return result.orderBy(
        F.col("length").asc(), F.col("support").desc(),
        F.col("pattern").asc(),
    )
