"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.5: no readStream anywhere);
these close that capability gap for the engine. Each builder takes any
streaming (or batch — the plans are identical) DataFrame with an
event-time column and returns the transformed stream:

- tumbling/sliding/session windowed aggregation with watermarks
- streaming exact dedup keyed by id within the watermark
- custom stateful session tracking via applyInPandasWithState

Tests drive them with the file/memory sources over the driver's events
table (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time windowed aggregation with late-data handling: sums and
    counts per (window, event_type). Watermark bounds state so the
    query runs forever on an unbounded stream."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "sum_value",
            "n_events",
            "approx_users",
        )
    )


def sessionized_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user: activity separated by < gap merges
    into one session (native session_window — state store managed)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    id_cols: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Effectively-once event stream: drop duplicate event ids with
    dropDuplicatesWithinWatermark — dedup keys on the IDs ALONE, so a
    redelivered event whose timestamp was re-stamped by the source
    (the common at-least-once replay shape) still collapses, while
    per-key state expires once the watermark passes it. (The older
    dropDuplicates(keys + [ts]) formulation bounded state the same way
    but silently kept re-stamped replays — ids-only is the semantics
    the name promises.)"""
    return events.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(id_cols or ["event_id"])


def stateful_running_value(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Custom stateful operator: running per-user event count + value
    total maintained in applyInPandasWithState (the escape hatch for
    semantics window functions can't express on streams)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes
    (user profile, domain metadata) to each event as it arrives. The
    static side broadcasts into every micro-batch: no streaming state,
    no watermark, and the static table is re-read per batch so slowly-
    changing dimensions pick up updates between batches."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_s: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join with an event-time proximity bound:
    rows pair when they share ``key`` and their event times differ by
    at most ``tolerance_s`` seconds (click↔impression attribution,
    request↔response correlation). BOTH sides carry a watermark and
    the join condition carries the time range — together they bound
    the buffered state: each side retains only watermark+tolerance of
    history, so the query runs forever on unbounded streams. The two
    inputs must not share column names besides ``key``."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {tolerance_s} SECONDS"))
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {tolerance_s} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])


def streaming_funnel(
    events: DataFrame,
    stages: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Stateful streaming twin of operators/analytics.funnel: per-key
    state machine tracking the first completion time of each ordered
    stage (stage k strictly after the key's stage k-1 completion).
    State per key is exactly ``len(stages)`` epoch-nano longs (-1 =
    not reached) — flat in stream length, the applyInPandasWithState
    bounded-state contract.

    Within a micro-batch, rows are sorted by event time and the chain
    is recomputed stage-by-stage with vectorized masks, so a single
    batch reproduces the batch operator exactly. ACROSS batches the
    update is monotone (each stage time only moves earlier, and later
    stages only fill after earlier ones), which equals the batch
    semantics whenever each key's events arrive in event-time order —
    the usual per-key-ordered ingestion. Under cross-batch disorder a
    stage-k event processed before stage k-1 was known is not
    retroactively applied; buffer by watermark upstream if that
    guarantee is needed. Emits one updated row per key per batch with
    the current (t_0..t_{S-1}, stages_reached); keys yet to complete
    stage 0 emit nothing (mirroring the batch funnel's inner frontier).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    S = len(stages)
    if S < 2:
        raise ValueError("funnel needs at least 2 stages")
    t_cols = [f"t_{k}" for k in range(S)]
    id_type = events.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, "
        + ", ".join(f"{c} long" for c in t_cols)
        + ", stages_reached long"
    )
    state_schema = ", ".join(f"{c} long" for c in t_cols)

    def fn(key, pdfs, state: GroupState):
        cur = list(state.get) if state.exists else [-1] * S
        rows = [pdf for pdf in pdfs if len(pdf)]
        if rows:
            pdf = pd.concat(rows, ignore_index=True)
            tsv = pdf[ts_col]
            if str(tsv.dtype).startswith("datetime64"):
                tsv = tsv.astype("int64")  # epoch nanos
            order = np.argsort(tsv.to_numpy(), kind="stable")
            tv = tsv.to_numpy()[order]
            types = pdf[type_col].to_numpy()[order]
            for k, stage in enumerate(stages):
                mask = types == stage
                if k > 0:
                    if cur[k - 1] < 0:
                        break
                    mask &= tv > cur[k - 1]
                if mask.any():
                    cand = int(tv[mask].min())
                    cur[k] = cand if cur[k] < 0 else min(cur[k], cand)
            state.update(tuple(cur))
        if cur[0] < 0:
            return
        out = {id_col: [key[0]]}
        for k, c in enumerate(t_cols):
            out[c] = pd.array(
                [cur[k] if cur[k] >= 0 else None], dtype="Int64"
            )
        out["stages_reached"] = [sum(1 for t in cur if t >= 0)]
        yield pd.DataFrame(out)

    return (
        events.groupBy(id_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """Stateful streaming twin of operators/analytics.
    attribute_conversions: per-key state is ONE (touch_ts, touch_type)
    pair — the latest touch seen — and each conversion emits
    immediately with that attribution attached. Bounded state at any
    stream length, the cheapest possible stateful operator.

    Within a micro-batch rows process in event-time order (stable
    sort), so single-batch output equals the batch operator wherever
    (ts) is unambiguous; the batch twin breaks exact-timestamp ties by
    event id, which a stream cannot reproduce across batches — ties
    are documented engine-order. Cross-batch, the same per-key
    event-time-ordered-arrival contract as streaming_funnel applies.
    Emits (id, conv_ts, touch_ts, touch_type, lag_ns) per conversion,
    append-style (one output row per conversion event, per batch)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    id_type = events.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, conv_ts long, touch_ts long, "
        "touch_type string, lag_ns long"
    )
    state_schema = "touch_ts long, touch_type string"

    def fn(key, pdfs, state: GroupState):
        touch_ts, touch_type = (
            state.get if state.exists else (None, None)
        )
        convs: list[tuple] = []
        rows = [pdf for pdf in pdfs if len(pdf)]
        if rows:
            pdf = pd.concat(rows, ignore_index=True)
            tsv = pdf[ts_col]
            if str(tsv.dtype).startswith("datetime64"):
                tsv = tsv.astype("int64")
            order = np.argsort(tsv.to_numpy(), kind="stable")
            tv = tsv.to_numpy()[order]
            types = pdf[type_col].to_numpy()[order]
            for t, ty in zip(tv, types):
                if ty == conversion_type:
                    convs.append(
                        (
                            key[0],
                            int(t),
                            touch_ts,
                            touch_type,
                            None
                            if touch_ts is None
                            else int(t) - touch_ts,
                        )
                    )
                if ty in touch_types:
                    touch_ts, touch_type = int(t), ty
            state.update((touch_ts, touch_type))
        if convs:
            # build nullable-int columns via pd.array: an astype from
            # an object column routes through float64 and rounds
            # epoch-nanos (observed: ...604000 -> ...604096)
            yield pd.DataFrame(
                {
                    id_col: [c[0] for c in convs],
                    "conv_ts": pd.array(
                        [c[1] for c in convs], dtype="int64"
                    ),
                    "touch_ts": pd.array(
                        [c[2] for c in convs], dtype="Int64"
                    ),
                    "touch_type": [c[3] for c in convs],
                    "lag_ns": pd.array(
                        [c[4] for c in convs], dtype="Int64"
                    ),
                }
            )

    return (
        events.groupBy(id_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_distinct_users(
    events: DataFrame,
    window: str = "1 hour",
    id_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Distinct actives per event-time window on an unbounded stream.
    Structured Streaming rejects COUNT(DISTINCT) in streaming
    aggregations outright, so the standard two-stage rewrite applies:
    watermark-bounded dropDuplicates on (entity, window-start) shrinks
    the stream to one row per entity-window, then a plain windowed
    count — both stages keep bounded state (dedup state expires with
    the watermark, the count state with window finalization). The
    batch twin is a groupBy window countDistinct; parity is locked in
    tests."""
    deduped = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.window(ts_col, window).alias("_w"),
        )
        .dropDuplicates([id_col, "_w"])
    )
    return (
        deduped.groupBy("_w")
        .agg(F.count(F.lit(1)).alias("n_distinct_users"))
        .select(
            F.date_format("_w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n_distinct_users",
        )
    )


def streaming_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    z_threshold: float = 3.0,
    min_n: int = 30,
):
    """Streaming twin of the batch anomaly query (standardize + |z|
    gate): per-key RUNNING mean/variance maintained with Welford's
    online update in applyInPandasWithState, each row scored against
    the statistics as of its arrival. State per key is exactly three
    numbers (n, mean, M2) — flat in stream length, no window buffer.

    Semantics differ from batch BY DESIGN and the difference is the
    point: batch standardize scores against the final global moments;
    a stream can only know the past, so each row is scored against the
    prefix statistics — the true online-detection contract (no
    lookahead leakage). Scores are emitted only once a key has seen
    ``min_n`` values (cold-start suppression); the batched Welford
    merge (Chan's parallel update per micro-batch, vectorized) makes
    one numpy pass per key per batch, no per-row Python.

    Emits (key, event_id, value, z) per flagged row, append-style."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, event_id long, value double, z double"
    )
    state_schema = "n long, mean double, m2 double"

    def fn(key, pdfs, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        flagged = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = pdf[value_col].to_numpy(dtype=np.float64)
            ids = pdf["event_id"].to_numpy()
            # score THIS batch against the prefix stats (pre-update):
            # online semantics, no lookahead inside the batch either
            # beyond its own boundary
            if n >= min_n and m2 > 0:
                sd = (m2 / (n - 1)) ** 0.5
                z = (x - mean) / sd
                hit = np.abs(z) >= z_threshold
                for i in np.flatnonzero(hit):
                    flagged.append((key[0], int(ids[i]), float(x[i]), float(z[i])))
            # Chan's parallel merge of the batch into the running state
            bn = len(x)
            bmean = float(x.mean())
            bm2 = float(((x - bmean) ** 2).sum())
            delta = bmean - mean
            tot = n + bn
            mean = mean + delta * bn / tot
            m2 = m2 + bm2 + delta * delta * n * bn / tot
            n = tot
        state.update((n, mean, m2))
        if flagged:
            yield pd.DataFrame(
                flagged, columns=[key_col, "event_id", "value", "z"]
            )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    capacity: int = 64,
):
    """Streaming SpaceSaving heavy hitters per key: bounded-state
    approximate top items over an unbounded stream — the online twin
    of analytics.frequent_items_scalable, with the same certification
    honesty. State per key is at most ``capacity`` (item, count,
    overestimate) triples; when full, the minimum-count item is
    evicted and its count seeds the newcomer (the SpaceSaving
    guarantee: true_count ≤ count, count − err ≤ true_count).

    Emits the CURRENT top table per key per batch (update-style):
    (key, item, est_count, err, guaranteed) where ``guaranteed`` marks
    items whose lower bound clears the next candidate's upper bound —
    provably in the true top set, never silently approximate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, item string, est_count long, "
        "err long, guaranteed boolean"
    )
    state_schema = "items array<string>, counts array<long>, errs array<long>"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            items, counts, errs = state.get
            table = {
                it: [c, e] for it, c, e in zip(items, counts, errs)
            }
        else:
            table = {}
        for pdf in pdfs:
            # vectorized per-batch tally, then ONE merge per distinct
            # item (batched SpaceSaving: an absent item arriving with
            # c occurrences seeds at evicted_min + c, err evicted_min)
            for it, c in pdf[item_col].astype(str).value_counts().items():
                c = int(c)
                if it in table:
                    table[it][0] += c
                elif len(table) < capacity:
                    table[it] = [c, 0]
                else:
                    victim = min(table, key=lambda k: table[k][0])
                    vcount = table.pop(victim)[0]
                    table[it] = [vcount + c, vcount]
        state.update(
            (
                list(table.keys()),
                [v[0] for v in table.values()],
                [v[1] for v in table.values()],
            )
        )
        rows = sorted(
            ((it, c, e) for it, (c, e) in table.items()),
            key=lambda t: (-t[1], t[0]),
        )
        if rows:
            # an item is guaranteed top-i if its lower bound (count-err)
            # beats the (i+1)-th item's upper bound (count)
            out = []
            for i, (it, c, e) in enumerate(rows):
                nxt = rows[i + 1][1] if i + 1 < len(rows) else 0
                out.append((key[0], it, c, e, (c - e) >= nxt))
            yield pd.DataFrame(
                out,
                columns=[key_col, "item", "est_count", "err", "guaranteed"],
            )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_to_partitioned_parquet(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint: str,
    trigger_available_now: bool = False,
):
    """Stream→lake sink: write a streaming DataFrame to partitioned
    Parquet through foreachBatch + partition-level dynamic overwrite
    (sources/writers.upsert_partitions). Each micro-batch rewrites
    ONLY the partitions it touches, so a re-delivered batch (failure
    replay) converges to the same files instead of duplicating rows —
    idempotent at partition granularity without a table format, the
    same exactly-once-per-partition contract a Delta MERGE gives at
    row granularity.

    The checkpoint directory carries the source offsets: on restart,
    processing resumes after the last COMMITTED batch, and a batch
    that wrote files but died before committing is replayed —
    harmless, because the rewrite is idempotent. Use a batch id/date
    column in ``partition_cols`` so concurrent-epoch output lands in
    disjoint partitions. Returns the started StreamingQuery."""
    from h3_indexer_spark.sources.writers import upsert_partitions

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_partitions(batch_df, path, partition_cols)

    writer = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_merge_upsert(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint: str,
    seq_col: str,
    delete_col: str | None = None,
    trigger_available_now: bool = False,
):
    """Streaming row-level upsert sink: maintain a keyed Parquet table
    from a change stream via foreachBatch + merge_by_key — the
    streaming face of the batch MERGE (operators/relational.py). Each
    micro-batch (a) collapses to latest-per-key by ``seq_col``
    (deterministically: ties on seq break over the remaining columns,
    so equal-(key,seq) duplicates resolve the same way every replay),
    (b) merges into the current table with the SEQ-CONDITIONAL merge —
    a stored row is only overwritten (or deleted) by a strictly
    greater ``seq_col``, so a late micro-batch carrying stale versions
    can never regress the table — and (c) publishes the post-merge
    state by a rename swap.

    The swap is two renames (HDFS renames are atomic individually, the
    pair is not), so the batch START runs crash recovery: a leftover
    ``__old_<id>`` directory with no live table means a crash landed
    between the renames — the newest backup is renamed back before
    merging; leftover ``__swap_*`` scratch is discarded. With that,
    replaying the interrupted batch always sees either the pre-swap or
    the post-swap state, and the seq-conditional merge makes both
    replays converge — exactly-once table maintenance without a table
    format. At 100 TB, keep the maintained table bucketed on the key
    (write_bucketed_table) so each merge joins without an Exchange;
    the swap step is metadata-only either way.

    Production boundary (documented, deliberate): the rename swap
    serializes WRITERS and gives readers a consistent directory only
    between batches — a reader that starts mid-swap can see the old
    path vanish. With CONCURRENT readers at warehouse scale the
    production answer is a manifest-based table format (Delta /
    Iceberg): swap this sink's publish step for a MERGE INTO and the
    rest of the pipeline (latest-per-key collapse, seq-conditional
    merge semantics) carries over unchanged — the merge plan here IS
    the MERGE INTO plan. Those packages aren't available offline in
    this environment, so the rename swap is the self-contained
    equivalent with the same exactly-once contract for single-writer
    / between-batch readers.
    Returns the started StreamingQuery."""
    from pyspark.sql import Window

    from h3_indexer_spark.operators.relational import merge_by_key

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        target = jvm.org.apache.hadoop.fs.Path(path)
        fs = target.getFileSystem(hconf)

        # crash recovery: restore the newest backup if a previous run
        # died between the two swap renames; drop stale scratch dirs
        parent = target.getParent()
        base = target.getName()
        leftovers = []
        if parent is not None and fs.exists(parent):
            it = fs.listStatus(parent)
            for st in it:
                name = st.getPath().getName()
                if name.startswith(f"{base}__old_"):
                    suffix = name.rsplit("_", 1)[1]
                    # only OUR numeric batch-id backups participate in
                    # recovery; a user's manual "__old_backup" copy is
                    # ignored, never a crash loop
                    if suffix.isdigit():
                        leftovers.append(
                            (int(suffix), st.getPath())
                        )
                elif name.startswith(f"{base}__swap_"):
                    fs.delete(st.getPath(), True)
        # Hadoop FileSystem.rename signals most failures by RETURNING
        # FALSE (not raising) — an unchecked rename followed by the
        # backup delete below would destroy the only surviving copy
        # of the table. Every rename in this sink goes through this
        # guard; on failure we abort the batch with the __old_ backup
        # intact so the documented crash-recovery path can restore it
        # on the next start.
        def rename_or_raise(src_p, dst_p, what: str) -> None:
            if not fs.rename(src_p, dst_p):
                raise IOError(
                    f"stream_merge_upsert: rename failed during "
                    f"{what}: {src_p} -> {dst_p}; aborting batch "
                    "with backups left in place for crash recovery"
                )

        leftovers.sort()
        if leftovers:
            if not fs.exists(target):
                rename_or_raise(
                    leftovers[-1][1], target, "crash recovery"
                )
                leftovers.pop()
            for _, p in leftovers:
                fs.delete(p, True)

        # only ORDERABLE column types may tiebreak (a map-typed
        # attrs column would fail analysis); non-orderable columns
        # are skipped — determinism then rests on (key, seq) plus
        # the orderable columns, documented best-effort
        from pyspark.sql.types import MapType

        tiebreaks = [
            F.col(f.name).desc()
            for f in batch_df.schema.fields
            if f.name not in key_cols
            and f.name != seq_col
            and not isinstance(f.dataType, MapType)
        ]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), *tiebreaks
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        if fs.exists(target):
            current = spark.read.parquet(path)
            merged = merge_by_key(
                current,
                latest,
                key_cols,
                delete_col=delete_col,
                seq_col=seq_col,
            )
        else:
            merged = latest
            if delete_col:
                merged = merged.where(
                    ~F.coalesce(
                        F.col(delete_col).cast("boolean"), F.lit(False)
                    )
                ).drop(delete_col)
        tmp = f"{path}__swap_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
        old_p = jvm.org.apache.hadoop.fs.Path(f"{path}__old_{batch_id}")
        if fs.exists(target):
            rename_or_raise(target, old_p, "swap (backup step)")
        rename_or_raise(tmp_p, target, "swap (publish step)")
        # the backup is deleted ONLY after the publish rename
        # verifiably succeeded — until then __old_<id> is the sole
        # durable copy and crash recovery knows how to restore it
        fs.delete(old_p, True)

    writer = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_content_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch exact content dedup
    (operators/dedup.py): first document per exact content wins,
    later re-deliveries and byte-identical copies are dropped. Keys
    on the md5 digest of the content (not the raw text) so the
    per-key state is 32 bytes however large the document, and the
    watermark expires digests once no duplicate can still arrive —
    the standard bounded-state shape.
    """
    return (
        docs.withColumn(
            "_content_digest", F.md5(F.col(text_col).cast("binary"))
        )
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_digest"])
        .drop("_content_digest")
    )


def streaming_minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    delay_ns: int = 3_600 * 10**9,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
):
    """Streaming twin of the batch MinHash near-dup
    (operators/dedup.py::minhash_near_dups): every document's LSH
    band buckets are computed with the SAME signature kernel as the
    batch path, and per-bucket state remembers the first document
    that claimed the bucket. A document whose bucket was already
    claimed by an EARLIER document emits a (doc, dup_of, bucket) row
    — the streaming candidate-suppression verdict (batch semantics:
    "shares any band bucket with an EARLIER-event-time doc"; the
    union of emitted doc ids converges to exactly that set, which
    the parity test checks against the batch signatures).

    Out-of-order arrival keeps event-time semantics: the per-bucket
    claimant is the earliest-(ts, id) document SEEN SO FAR, not the
    first processed — when a later micro-batch delivers a doc with
    an earlier event time than the current claimant (still inside
    the watermark), the claim SWAPS and the deposed claimant is
    emitted as the dup instead. Already-emitted rows naming the old
    claimant as ``dup_of`` stand — they reference a doc that is now
    itself a dup, which is exactly the transitive-cluster shape the
    batch resolver (dedup_resolve) collapses, so the suppressed SET
    still matches the batch reference.

    State expiry: EventTimeTimeout — a bucket's claim expires
    ``delay_ns`` after its claimant's event time passes the
    watermark, so state is bounded by the arrival rate × window, the
    same contract as the other stateful ops here. ``ts_col`` must be
    a TIMESTAMP column (streaming watermarks require one).

    Note the per-bucket state keeps ONE claimant (the earliest), not
    the member list — candidate-pair fan-out against every historic
    member would make state corpus-sized; single-claimant
    suppression is the deliberate streaming trade and matches
    first-wins batch resolution. ``id_col`` may be any orderable
    type (string doc ids included) — the output/state schemas are
    derived from the input schema, mirroring the batch kernel's
    id-type preservation.
    """
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from h3_indexer_spark.operators.dedup import (
        _shingle_hash_array,
        minhash_signatures,
    )

    # every stage up to the stateful op is a NARROW transform of the
    # one input stream (a join back to docs would be a stream-stream
    # self-join): shingle hash array + event time in one select, the
    # batch signature kernel with ts as a passthrough column, then
    # the band explode
    sh = docs.select(
        id_col,
        F.col(ts_col),
        _shingle_hash_array(text_col, k).alias("sh_arr"),
    )
    sig = minhash_signatures(
        sh, id_col, num_hashes, bands=bands, carry_cols=(ts_col,)
    )
    stacked = (
        sig.select(
            id_col, ts_col, F.explode(F.col("bands")).alias("bucket")
        )
        .withWatermark(ts_col, f"{delay_ns // 10**9} seconds")
    )

    # id type follows the INPUT schema (string doc ids are first-class
    # in the batch twin; hardcoding long here would crash on them)
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = (
        f"bucket long, {id_col} {id_type}, dup_of {id_type}"
    )
    state_schema = f"first_id {id_type}, first_ts_ns long"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        rows = rows.sort_values(
            [ts_col, id_col], ignore_index=True
        )
        first_id, first_ts = (
            state.get if state.exists else (None, None)
        )
        out_ids, out_dups = [], []
        for _, r in rows.iterrows():
            ts_ns = int(r[ts_col].value)
            rid = r[id_col]
            if first_id is None:
                first_id, first_ts = rid, ts_ns
            elif rid == first_id:
                continue
            elif (ts_ns, rid) < (first_ts, first_id):
                # earlier-event-time doc arrived late: it takes the
                # claim and the DEPOSED claimant is the dup — keeps
                # the claimant first-by-EVENT-TIME, not
                # first-processed, so the suppressed set converges
                # to the batch (sort by ts, id) reference under
                # cross-batch disorder
                out_ids.append(first_id)
                out_dups.append(rid)
                first_id, first_ts = rid, ts_ns
            else:
                out_ids.append(rid)
                out_dups.append(first_id)
        state.update((first_id, first_ts))
        # clamp the expiry to strictly-after the current watermark:
        # when the watermark jumps past first_ts+delay AND a near-dup
        # for the bucket lands in the same micro-batch, an unclamped
        # setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP — and
        # checkpoint replay re-hits the same batch/watermark, turning
        # one late dup into a deterministic crash loop
        timeout_ms = first_ts // 1_000_000 + delay_ns // 1_000_000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        if out_ids:
            yield pd.DataFrame(
                {
                    "bucket": [int(key[0])] * len(out_ids),
                    id_col: out_ids,
                    "dup_of": out_dups,
                }
            )

    return stacked.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_majority_label(
    events: DataFrame,
    item_col: str = "user_id",
    label_col: str = "event_type",
):
    """Streaming twin of operators/labeling.py::majority_label: the
    running majority vote per item over an unbounded annotation
    stream — the online label-merge a continuously-annotated corpus
    maintains (each new judgment immediately refreshes the item's
    training label).

    State per item is its per-label vote counts (bounded by the label
    vocabulary, which is small by construction for annotation
    streams); each micro-batch tallies vectorized (one value_counts
    per item group) and merges ONCE per distinct label. Emits the
    CURRENT readout per item per batch (update-style) with exactly
    the batch operator's columns and tie semantics (count desc, label
    asc), so a full availableNow replay equals the batch result row
    for row — asserted in tests/test_streaming.py. NULL labels are
    abstentions, dropped before tallying (batch contract).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    item_type = events.schema[item_col].dataType.simpleString()
    out_schema = (
        f"{item_col} {item_type}, top_label string, top_count long, "
        "n_votes long, agreement double"
    )
    state_schema = "labels array<string>, counts array<long>"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            labels, counts = state.get
            table = dict(zip(labels, [int(c) for c in counts]))
        else:
            table = {}
        for pdf in pdfs:
            col = pdf[label_col].dropna()
            if not len(col):
                continue
            for lab, c in col.astype(str).value_counts().items():
                table[lab] = table.get(lab, 0) + int(c)
        if not table:
            return
        state.update((list(table.keys()), list(table.values())))
        top_label, top_count = min(
            table.items(), key=lambda kv: (-kv[1], kv[0])
        )
        n_votes = sum(table.values())
        yield pd.DataFrame(
            [(
                key[0],
                top_label,
                top_count,
                n_votes,
                float(top_count) / float(n_votes),
            )],
            columns=[
                item_col, "top_label", "top_count", "n_votes", "agreement",
            ],
        )

    return (
        events.groupBy(item_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_active_users_hll(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    p: int = 8,
):
    """Streaming twin of operators/sketches.py::
    rolling_active_users_hll — the live DAU/WAU sketch: each event's
    HLL (bucket, rho) contribution is computed JVM-side with the
    EXACT batch expressions (md5-60-bit hash, same rho rule), fanned
    to the ``window_days`` window positions it is visible from (the
    batch operator's explode trick, applied to the stream), and the
    per-window-day register set lives in ``applyInPandasWithState``
    as a 2^p int array merged by numpy maximum — state per day is a
    fixed ≤2^p vector regardless of cardinality, the whole point of
    the sketch.

    Emits the batch operator's exact readout columns per updated day
    per micro-batch (update-style): (day, n_zero, s_int,
    est_distinct), with the same integer-exact harmonic sum and the
    same FLOOR-quantized linear-counting branch, so an availableNow
    full replay matches the batch operator row for row
    (test-locked). Days are only reported once they have their OWN
    data (batch contract: window positions past the last active day
    are phantom) — tracked with a per-state flag fed by a
    JVM-computed ``is_own_day`` column. State never expires here;
    a production deployment bounds it by dropping days older than
    the reporting horizon (the streaming_minhash_dedup timeout
    pattern applies directly).
    """
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1: {window_days}")
    m = 1 << p
    k_max = (60 - p) + 1
    from h3_indexer_spark.operators.sketches import hll_alpha

    alpha_num = (
        hll_alpha(m) * float(m) * float(m) * float(2**k_max)
    )
    from h3_indexer_spark.operators.curation import md5_band60

    h = md5_band60("", F.col(id_col).cast("string"))
    rem_bits = 60 - p
    bucket = (h % F.lit(1 << p)).cast("int")
    rem = F.shiftright(h, p)
    rho = F.when(rem == 0, F.lit(rem_bits + 1)).otherwise(
        F.lit(rem_bits) - F.length(F.bin(rem)) + F.lit(1)
    )
    contrib = (
        events.where(F.col(id_col).isNotNull())
        .withColumn(
            "_day", F.expr(f"unix_timestamp({ts_col}) div 86400")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("_day"), F.col("_day") + F.lit(window_days - 1)
                )
            ).alias("_wday"),
            F.col("_day"),
            bucket.alias("_bucket"),
            rho.cast("int").alias("_rho"),
        )
        .withColumn("_is_own_day", (F.col("_wday") == F.col("_day")))
        .drop("_day")
    )

    out_schema = "day long, n_zero long, s_int long, est_distinct long"
    state_schema = "rhos array<int>, has_data boolean"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            rhos_list, has_data = state.get
            rhos = np.asarray(rhos_list, dtype=np.int64)
        else:
            rhos = np.zeros(m, dtype=np.int64)
            has_data = False
        saw = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw = True
            np.maximum.at(
                rhos,
                pdf["_bucket"].to_numpy(dtype=np.int64),
                pdf["_rho"].to_numpy(dtype=np.int64),
            )
            has_data = has_data or bool(pdf["_is_own_day"].any())
        if not saw:
            return
        state.update(([int(r) for r in rhos], bool(has_data)))
        if not has_data:
            return
        n_zero = int((rhos == 0).sum())
        s_int = int(
            (np.int64(1) << (k_max - rhos[rhos > 0])).sum()
        ) + n_zero * (1 << k_max)
        raw = alpha_num / float(s_int)
        if raw <= 2.5 * m and n_zero > 0:
            est = math.floor(m * math.log(m / float(n_zero)))
        else:
            est = math.floor(raw)
        yield pd.DataFrame(
            [(int(key[0]), n_zero, s_int, int(est))],
            columns=["day", "n_zero", "s_int", "est_distinct"],
        )

    return contrib.groupBy("_wday").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_scd2(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
):
    """Streaming twin of operators/relational.py::scd2_build — the
    CDC current-state tracker behind a live Type-2 dimension: per
    key, ``applyInPandasWithState`` holds exactly ONE open run
    (attr, effective_from, n_observations); an observation with a
    different attribute CLOSES the run — emitting the finished
    interval with effective_to = the new observation's timestamp —
    and opens the next one, and every touched key re-emits its open
    row (effective_to NULL, is_current true). Update-mode semantics:
    the latest emission per (key, effective_from) is current truth,
    so a downstream merge-upsert keyed on (key, effective_from)
    maintains the dimension table incrementally.

    Contract: the stream must be per-key ordered by event time (the
    CDC log guarantee — a change log that delivers a key's updates
    out of order cannot define intervals at all); rows WITHIN a
    micro-batch are sorted by (ts, attr), the batch operator's
    equal-timestamp tiebreak, so an availableNow replay over an
    in-order log matches scd2_build row for row (test-locked).
    ``ts_col`` must be an integral epoch timestamp (the engine's
    epoch-nano convention) — intervals ride exact integers, never
    float-coerced. State per key is ONE open run regardless of
    history length; no timeout is set because a dimension key's
    current row never expires (bound retention by dropping keys
    cold past the reporting horizon — the minhash-dedup timeout
    pattern applies directly)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    in_fields = {f.name: f for f in events.schema.fields}
    for c in (key_col, attr_col, ts_col):
        if c not in in_fields:
            raise ValueError(f"column {c!r} not in stream schema")
    ts_t = in_fields[ts_col].dataType.simpleString()
    if ts_t not in ("bigint", "int", "long"):
        raise ValueError(
            f"{ts_col} must be an integral epoch timestamp, got {ts_t}"
        )
    key_f = in_fields[key_col]
    attr_f = in_fields[attr_col]
    out_schema = StructType(
        [
            StructField(key_col, key_f.dataType),
            StructField(attr_col, attr_f.dataType),
            StructField("effective_from", LongType()),
            StructField("effective_to", LongType()),
            StructField("is_current", BooleanType()),
            StructField("n_observations", LongType()),
        ]
    )
    state_schema = (
        f"attr {attr_f.dataType.simpleString()},"
        " eff_from long, n_obs long"
    )
    cols = [
        key_col, attr_col, "effective_from", "effective_to",
        "is_current", "n_observations",
    ]

    def fn(key, pdfs, state: GroupState):
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = (
            pd.concat(frames)
            .sort_values([ts_col, attr_col], kind="mergesort")
        )
        if state.exists:
            cur_attr, cur_from, cur_n = state.get
        else:
            cur_attr, cur_from, cur_n = None, None, 0
        closed = []
        for ts_v, attr_v in zip(
            pdf[ts_col].tolist(), pdf[attr_col].tolist()
        ):
            if cur_from is None:
                cur_attr, cur_from, cur_n = attr_v, int(ts_v), 1
            elif attr_v == cur_attr:
                cur_n += 1
            else:
                closed.append(
                    (key[0], cur_attr, cur_from, int(ts_v), False,
                     cur_n)
                )
                cur_attr, cur_from, cur_n = attr_v, int(ts_v), 1
        state.update((cur_attr, cur_from, cur_n))
        rows = closed + [
            (key[0], cur_attr, cur_from, None, True, cur_n)
        ]
        out = pd.DataFrame(rows, columns=cols)
        # exact integers for the interval bounds — None must not
        # float-coerce epoch nanos
        out["effective_from"] = pd.array(
            out["effective_from"], dtype="Int64"
        )
        out["effective_to"] = pd.array(
            out["effective_to"], dtype="Int64"
        )
        yield out

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ohlc_bars(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming twin of operators/analytics.py::ohlc_bars — live
    price/sensor bars as a plain watermarked windowed aggregation
    (no custom state): open/close ride the SAME lexicographic struct
    min/max over (event-time, value) as the batch operator, so
    equal-timestamp ties resolve identically and a full availableNow
    replay matches the batch bars row for row on the shared columns
    (test-locked). min/max/sum/count are all order-insensitive, which
    is exactly why OHLC streams safely: late rows inside the
    watermark fold into the bar with no reprocessing."""
    gcols = list(group_cols or [])
    pair = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    return (
        events.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *gcols)
        .agg(
            F.min(pair).getField("v").alias("open"),
            F.max(F.col(value_col).cast("double")).alias("high"),
            F.min(F.col(value_col).cast("double")).alias("low"),
            F.max(pair).getField("v").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.sum(F.col(value_col).cast("decimal(19,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *gcols,
            "open",
            "high",
            "low",
            "close",
            "volume",
            "value_sum",
        )
    )


def streaming_cms_registers(
    events: DataFrame,
    col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Streaming twin of operators/sketches.py::count_min_registers —
    per-event-time-window CMS register tables as a plain watermarked
    windowed aggregation: each event expands to its ``depth`` salted
    (row, bucket) coordinates JVM-side with the exact batch hash
    expressions, and registers are plain SUMs, so the stream inherits
    the sketch's linearity twice over — late rows inside the
    watermark fold in with no reprocessing, and downstream rollups
    merge window tables by groupBy-SUM (cms_merge). A full
    availableNow replay matches the batch registers per window
    (test-locked). State per window is ≤ depth·width rows whatever
    the traffic — the live heavy-hitter feed at any scale.

    Output: (window_start, depth, bucket, cnt)."""
    if depth < 1 or depth > 16:
        raise ValueError(f"depth must be in [1,16], got {depth}")
    if width < 8:
        raise ValueError(f"width must be >= 8, got {width}")
    from h3_indexer_spark.operators.curation import md5_band60

    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("depth"),
                (md5_band60(f"cms{j}|", F.col(col).cast("string"))
                 % F.lit(width)).cast("int").alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        events.where(F.col(col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(ts_col, F.explode(rows).alias("_r"))
        .groupBy(
            F.window(ts_col, window).alias("w"),
            F.col("_r.depth").alias("depth"),
            F.col("_r.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            "depth",
            "bucket",
            "cnt",
        )
    )


def streaming_quantile_sketch(
    events: DataFrame,
    value_col: str,
    key_cols: list[str],
    window: str = "1 hour",
    ts_col: str = "ts",
    k: int = 64,
):
    """Streaming twin of operators/sketches.py::quantile_sketch — a
    live per-event-time-window quantile register table: each event's
    60-bit md5 priority is computed JVM-side with the EXACT batch
    hash over ``key_cols`` (the row identity), and every window's k
    hash-smallest (hash, value) rows live in
    ``applyInPandasWithState`` — state per window is ≤ k pairs
    whatever the traffic, the same structural bound as the CMS/HLL
    twins (locked in tests/test_streaming.py's state-bound suite).

    Emits the window's FULL register table per updating micro-batch
    (update-style: latest emission per (window_start, rank) is
    current truth): (window_start, rank, hash_val, value) — exactly
    the batch operator's columns keyed by window, so an availableNow
    replay matches per-window batch sketches row for row
    (test-locked). Late rows inside the retained state simply merge;
    bottom-k is insensitive to arrival order (the KMV law is the
    idempotence proof). State never expires here; a production
    deployment drops windows older than the reporting horizon (the
    streaming_minhash_dedup timeout pattern applies directly)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if k < 8:
        raise ValueError(f"k must be >= 8, got {k}")
    if not key_cols:
        raise ValueError("need at least one row-identity column")
    from h3_indexer_spark.operators.sketches import _md5_60bit

    row_key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in key_cols]
    )
    win_s = F.window(F.col(ts_col), window).getField("start")
    contrib = events.where(F.col(value_col).isNotNull()).select(
        win_s.cast("long").alias("_w"),
        _md5_60bit(row_key).alias("_h"),
        F.col(value_col).cast("double").alias("_v"),
    )

    out_schema = (
        "window_start long, rank long, hash_val long, value double"
    )
    state_schema = "hashes array<long>, vals array<double>"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            hs, vs = state.get
            pairs = list(zip(hs, vs))
        else:
            pairs = []
        saw = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw = True
            pairs.extend(
                zip(
                    (int(x) for x in pdf["_h"].to_numpy()),
                    (float(x) for x in pdf["_v"].to_numpy()),
                )
            )
        if not saw:
            return
        # dedup identical (hash, value) rows — re-delivered rows and
        # the state's own prior contents merge idempotently
        pairs = sorted(set(pairs))[:k]
        state.update(
            ([int(h) for h, _ in pairs], [float(v) for _, v in pairs])
        )
        w = int(key[0])
        yield pd.DataFrame(
            {
                "window_start": [w] * len(pairs),
                "rank": list(range(1, len(pairs) + 1)),
                "hash_val": [h for h, _ in pairs],
                "value": [v for _, v in pairs],
            }
        )

    return contrib.groupBy("_w").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_drawdown(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    decimal_scale: int = 4,
):
    """Streaming twin of operators/analytics.py::max_drawdown — the
    live worst-peak-to-trough readout over the cumulative net-flow
    curve, per event-time window period. A drawdown is inherently a
    SEQUENTIAL fold (equity → running peak → gap), which streams
    cannot re-order — so the state splits the curve at the
    watermark: periods whose window has CLOSED (end ≤ watermark)
    fold permanently into four finalized accumulators (cum / peak /
    max-dd quanta + frac-max), while still-open periods keep only
    their per-window flow SUM. Every micro-batch emits the
    provisional readout with the open tail folded on top — exactly
    what a live risk dashboard wants — and after a full availableNow
    replay the emission matches the batch operator row for row
    (test-locked).

    State is ONE row (single global fold group) holding four scalars
    plus the pending (window, sum) pairs — structurally bounded by
    the watermark/window ratio (a 2-hour watermark over 1-hour bars
    retains ≲ a handful of open windows), the CMS/HLL bounded-state
    rule. Rows later than the watermark are dropped by the engine
    before the operator; a pending window at or before the finalized
    boundary (possible only on a watermark regression, which Spark
    does not produce) is ignored rather than corrupting the fold
    order. Flow quanta use the batch operator's exact
    ``decimal_scale`` rounding, so finalized integers are
    bit-identical to batch; the fraction is the same one double
    division per period.

    Output per micro-batch (update mode): (n_periods, n_finalized,
    peak_equity, max_drawdown, max_drawdown_frac)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _round_half_up9(x: float) -> float:
        # Python round() is banker's; the batch twin uses F.round,
        # which is BigDecimal(shortest-repr).setScale(9, HALF_UP) —
        # mirror it exactly or 9th-decimal ties break batch parity
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(x)).quantize(
                Decimal("1e-9"), rounding=ROUND_HALF_UP
            )
        )

    mult = 10 ** decimal_scale
    q = F.round(
        F.col(value_col).cast("double") * F.lit(float(mult)), 0
    ).cast("long")
    win = F.window(F.col(ts_col), window)
    # null event times must drop HERE: the watermark's late-row
    # filter keeps them (NULL compares to nothing), F.window(NULL)
    # yields a null start, and int(NaN) in the state fn would kill
    # the query — where the batch twin just ignores the row
    contrib = (
        events.where(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .withWatermark(ts_col, watermark)
        .select(
            F.lit(0).alias("_bucket"),
            F.col(ts_col).alias(ts_col),
            win.getField("start").cast("long").alias("_w"),
            # window length rides along so the closed-window check
            # needs no duration parser (end − start is constant)
            (win.getField("end").cast("long")
             - win.getField("start").cast("long")).alias("_wsec"),
            q.alias("_fq"),
        )
    )
    out_schema = (
        "n_periods long, n_finalized long, peak_equity double, "
        "max_drawdown double, max_drawdown_frac double"
    )
    state_schema = (
        "fin_cum long, fin_peak long, fin_maxdd long, "
        "fin_fracmax double, n_fin long, fin_last_w long, "
        "wins array<long>, sums array<long>"
    )
    _NO_PEAK = -(1 << 62)

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            (cum, peak, maxdd, fracmax, n_fin, last_w,
             wins, sums) = state.get
            pending = dict(zip(wins, sums))
        else:
            cum, peak, maxdd, fracmax = 0, _NO_PEAK, 0, None
            n_fin, last_w = 0, _NO_PEAK
            pending = {}
        saw = False
        window_sec = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw = True
            window_sec = int(pdf["_wsec"].iloc[0])
            for w, fq in zip(
                pdf["_w"].to_numpy(), pdf["_fq"].to_numpy()
            ):
                w, fq = int(w), int(fq)
                if w <= last_w:
                    continue  # watermark-regression guard (see doc)
                pending[w] = pending.get(w, 0) + fq
        if not saw:
            return

        def fold(c, p, dd, fm, flows):
            for _, fq in flows:
                c += fq
                if c > p:
                    p = c
                if p - c > dd:
                    dd = p - c
                if p > 0:
                    fr = float(p - c) / float(p)
                    if fm is None or fr > fm:
                        fm = fr
            return c, p, dd, fm

        wm_ms = state.getCurrentWatermarkMs()
        closed = sorted(
            (w, s) for w, s in pending.items()
            if (w + window_sec) * 1000 <= wm_ms
        )
        if closed:
            cum, peak, maxdd, fracmax = fold(
                cum, peak, maxdd, fracmax, closed
            )
            n_fin += len(closed)
            last_w = closed[-1][0]
            for w, _ in closed:
                del pending[w]
        state.update((
            int(cum), int(peak), int(maxdd),
            None if fracmax is None else float(fracmax),
            int(n_fin), int(last_w),
            [int(w) for w in sorted(pending)],
            [int(pending[w]) for w in sorted(pending)],
        ))
        open_tail = sorted(pending.items())
        pc, pp, pdd, pfm = fold(cum, peak, maxdd, fracmax, open_tail)
        n_tot = n_fin + len(open_tail)
        yield pd.DataFrame(
            {
                "n_periods": [n_tot],
                "n_finalized": [n_fin],
                "peak_equity": [
                    None if pp == _NO_PEAK else pp / float(mult)
                ],
                "max_drawdown": [pdd / float(mult)],
                "max_drawdown_frac": [
                    None if pfm is None else _round_half_up9(pfm)
                ],
            }
        )

    return contrib.groupBy("_bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ).select(
        "n_periods",
        "n_finalized",
        "peak_equity",
        "max_drawdown",
        "max_drawdown_frac",
    )


def streaming_bar_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    bar_window: str = "1 hour",
    rollup_window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """CHAINED stateful aggregation — per-``bar_window`` OHLC bars
    rolled up into per-``rollup_window`` summary bars (daily
    high/low/open/close over the hourly bars), both levels streaming
    in ONE query. This exercises Spark's multiple-stateful-operator
    support (3.5+): the first windowed aggregation emits a bar when
    the watermark passes its end, and the watermark PROPAGATES so the
    second aggregation can window over the first's ``window_start``
    event-time column — the hierarchical-rollup shape every metrics
    pipeline wants (1m → 1h → 1d) without re-reading the source or
    running N queries.

    Semantics per rollup bar: open = first bar's open, close = last
    bar's close (lexicographic struct min/max over (bar_start, v) —
    the batch ohlc_bars tie rule applied at the bar level), high/low
    = extrema over bars, volume/value_sum = exact sums (counts
    BIGINT; values DECIMAL-cast before the double readout, the
    order-free rule). An availableNow replay matches the batch
    two-level composition row for row (test-locked).

    State: level 1 holds one row per open bar (the streaming_ohlc
    bound), level 2 one row per open rollup window — both
    watermark-expired, never traffic-proportional. Append output
    mode end to end (chained aggregations require it: a bar must be
    FINAL before it can fold upward). The mechanics that make the
    chain legal: level 1 KEEPS its window struct (flattening w.start
    into a plain column strips the event-time attribute and Spark
    rejects the second aggregation), and level 2 windows over
    ``window_time(w)`` — the struct's event-time marker (w.end − 1µs,
    so an hourly bar lands in the day it belongs to)."""
    vpair = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    # null event times drop here: F.window(NULL) would otherwise form
    # a null-window group the watermark can never evict (its end is
    # NULL) — permanent state accumulating every bad record
    bars = (
        events.where(
            F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, bar_window).alias("w"))
        .agg(
            F.min(vpair).getField("v").alias("open"),
            F.max(F.col(value_col).cast("double")).alias("high"),
            F.min(F.col(value_col).cast("double")).alias("low"),
            F.max(vpair).getField("v").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.sum(F.col(value_col).cast("decimal(19,4)"))
            .alias("_vsum"),
        )
    )
    opair = F.struct(
        F.col("w.start").alias("ts"), F.col("open").alias("v")
    )
    cpair = F.struct(
        F.col("w.start").alias("ts"), F.col("close").alias("v")
    )
    return (
        bars.groupBy(
            F.window(F.window_time("w"), rollup_window).alias("rw")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bars"),
            F.min(opair).getField("v").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max(cpair).getField("v").alias("close"),
            F.sum("volume").cast("bigint").alias("volume"),
            # _vsum is decimal(29,4) (sum over decimal(19,4)); cast UP
            # to decimal(38,4) so the level-2 fold can never narrow-
            # overflow to NULL (ADVICE r9: a 28,4 cast silently lost
            # hourly bars whose value sum needs 25+ integer digits)
            F.sum(F.col("_vsum").cast("decimal(38,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("rw.start").alias("rollup_start"),
            "n_bars",
            "open",
            "high",
            "low",
            "close",
            "volume",
            "value_sum",
        )
    )


def streaming_class_report(
    events: DataFrame,
    ts_col: str = "ts",
    label_col: str = "label",
    pred_col: str = "pred",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators/analytics.py::classification_report:
    the per-window, per-class confusion-matrix readout
    (tp/fp/fn/precision/recall/F1) over a live prediction log — the
    online model-quality monitor (per-window F1 dropping is the drift
    alarm a deployed classifier wants).

    Same ONE-shuffle shape as the batch operator: each event explodes
    into its label-role and pred-role contributions (a NARROW map —
    the event-time column rides along, so the watermark set upstream
    still governs), and the built-in windowed aggregation collapses
    them map-side. No custom state: state is one row per (window,
    class) — bounded by the class vocabulary per open window,
    watermark-expired, never traffic-proportional. Append mode: a
    window's report emits once, final, when the watermark passes.
    Ratios are the batch formulas exactly (F1 = 2tp/(2tp+fp+fn), one
    IEEE division of exact longs, ROUND 9), so an availableNow replay
    equals the batch operator applied per window row for row
    (test-locked). NULL label/pred rows drop (batch contract); NULL
    event times drop (a null window's state is watermark-immortal —
    the streaming_bar_rollup rule)."""
    from h3_indexer_spark.operators.analytics import (
        class_report_aggs,
        class_report_columns,
        class_report_contributions,
    )

    # the shared contributions builder keeps the streaming twin in
    # LOCKSTEP with the batch operator (one place for the role
    # explode and every ratio expression); the event-time column
    # rides through the narrow map, so the watermark set here governs
    contrib = class_report_contributions(
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(ts_col, label_col, pred_col),
        label_col,
        pred_col,
    )
    agg = contrib.groupBy(
        F.window(ts_col, window).alias("w"), "class"
    ).agg(*class_report_aggs())
    return agg.select(
        F.col("w.start").alias("window_start"),
        "class",
        *class_report_columns(),
    )


def streaming_k_anonymity(
    events: DataFrame,
    quasi_cols: list[str],
    ts_col: str = "ts",
    k: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators/curation.py::k_anonymity_report:
    the per-window quasi-identifier violation histogram over a live
    event stream — the release gate as a continuous monitor (a window
    whose histogram is non-empty is NOT k-anonymous and must not ship
    to the downstream extract).

    CHAINED stateful aggregation (the streaming_bar_rollup mechanics):
    level 1 counts each (window, quasi-identifier tuple) equivalence
    class — keeping the window STRUCT so its event-time attribute
    survives — a narrow filter keeps classes below ``k``, and level 2
    windows over ``window_time(w)`` with the SAME span to collapse
    them into the per-size histogram (group_size, n_groups, n_rows).
    Both levels watermark-expire; append mode end to end (a class
    count must be FINAL before it can be judged under-k — mid-window
    a class is still filling, so only a closed window's histogram is
    meaningful, which is exactly what append gives).

    State: level 1 holds one row per OPEN window per quasi-class seen
    in it — bounded by the quasi-key cardinality per window, which is
    the operator's honest cost at 100 TB (a near-unique quasi-key
    makes level-1 state ~traffic-sized until the watermark closes the
    window; choose windows/watermarks accordingly — same caveat as
    any streaming COUNT DISTINCT). Level 2 holds ≤ k−1 rows per open
    window. NULL event times drop (immortal-state rule); NULL quasi
    values form their own class (batch contract — a NULL zip is a
    linkable signature).

    availableNow replay equals the batch k_anonymity_report applied
    per window (test-locked)."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    sizes = (
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_sz"))
    )
    return (
        sizes.where(F.col("_sz") < k)
        .groupBy(
            F.window(F.window_time("w"), window).alias("rw"),
            F.col("_sz").alias("group_size"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("_sz").cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("rw.start").alias("window_start"),
            "group_size",
            "n_groups",
            "n_rows",
        )
    )


def streaming_suppress_small_groups(
    events: DataFrame,
    quasi_cols: list[str],
    staged_events_path: str,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    k: int = 10,
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = False,
    staging_query=None,
):
    """Streaming ENFORCEMENT half of the privacy gate (completing the
    report → monitor → enforce triad with k_anonymity_report /
    streaming_k_anonymity / this): per closed event-time window,
    publish ONLY the rows whose quasi-identifier equivalence class
    reached ``k`` members in that window — the streaming face of
    operators/curation.py::suppress_small_groups.

    Mechanics (foreachBatch sink, the stream_merge_upsert shape):
    the driving stream is the per-(window, quasi-class) count in
    APPEND mode — a class size is only meaningful once its window is
    CLOSED (mid-window every class is still filling), and append's
    watermark semantics give exactly that finality. Each closed
    window's keep-list (classes with size ≥ k) arrives as one
    micro-batch slice; foreachBatch then reads the window's raw rows
    back from ``staged_events_path`` (a parquet staging area the
    caller maintains with stream_to_partitioned_parquet from the SAME
    source — rows cannot be held in aggregation state) and publishes
    the null-safe LEFT SEMI join of raw rows against the keep-list,
    partitioned by window. Suppression therefore happens strictly
    within closed windows, never across them.

    Ordering contract (ADVICE r11 — the publish is only correct if
    the staging area already holds every row of a window BEFORE that
    window's keep-list micro-batch publishes it; a window is never
    revisited on success, so a partial staging read would publish a
    partial partition permanently): pass the staging
    ``StreamingQuery`` as ``staging_query`` and each publish first
    drains it with ``processAllAvailable()`` — both streams consume
    the SAME source, and everything the counting stream aggregated
    was by definition available at the source, so the drain makes
    staging a superset of every counted row. Without
    ``staging_query`` the CALLER owns the ordering (e.g. an
    availableNow staging drain completed before this query starts —
    the test harness pattern); a missing staging path then raises
    with this contract spelled out rather than publishing nothing
    (the foreachBatch retry-on-restart makes the loud failure
    recoverable, a silent empty publish is not).

    Exactly-once: append mode emits each closed window exactly once,
    and the publish uses DYNAMIC partition overwrite keyed by the
    window. A retried micro-batch rewrites its own window partitions
    deterministically GIVEN the staging content (counts and join are
    deterministic); under the ordering contract a closed window's
    staging slice is complete before its first publish attempt, so
    replays converge to the same bytes. Without the contract a
    replay may see a grown staging slice and republish the window
    with MORE rows — still converging (each attempt fully overwrites
    the window's partitions), but not byte-identical across attempts
    (the stream_merge_upsert boundary note applies to concurrent
    readers).

    State: ONE stateful operator, one row per (open window,
    quasi-class) — the same level-1 census cost streaming_k_anonymity
    documents (near-unique quasi-keys make it traffic-sized until the
    watermark closes the window). The keep-list OUTPUT is
    class-census-sized per window — that is the enforcement join's
    honest input, identical to the batch operator's build side. The
    driver-side collect() is of closed WINDOW STARTS per micro-batch
    (time-bounded, a handful), used to partition-prune the staging
    read.

    Honest caveat (documented, deliberate): rows that arrive LATER
    than the watermark are dropped from the COUNTS (standard
    streaming-aggregate semantics) but may exist in the staging area;
    a kept class's published rows include them (conservative in the
    privacy direction for suppression decisions — a late row can
    never resurrect an under-k class, but a kept class may publish
    k+late rows). Replay on a time-ordered source equals the batch
    suppress_small_groups per window (test-locked).

    Returns the started StreamingQuery."""
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    keep = (
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *quasi_cols)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_sz"))
        .where(F.col("_sz") >= k)
        .select(
            F.col("w.start").alias("window_start"),
            *[F.col(c).alias(f"_q_{c}") for c in quasi_cols],
        )
    )

    events_schema = events.schema

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if staging_query is not None:
            # drain the staging stream: both streams consume the same
            # source, so after this the staging area holds (at least)
            # every row the counting stream aggregated — the ordering
            # contract that makes the closed-window publish complete
            staging_query.processAllAvailable()
        spark = batch_df.sparkSession
        closed = [
            r["window_start"]
            for r in batch_df.select("window_start").distinct().collect()
        ]
        try:
            # explicit schema: an empty-but-existing staging dir must
            # not fail inference; .parquet() itself raises
            # PATH_NOT_FOUND eagerly when the dir is absent
            staged = spark.read.schema(events_schema).parquet(
                staged_events_path
            )
        except Exception as exc:  # PATH_NOT_FOUND / AnalysisException
            if "PATH_NOT_FOUND" not in str(exc):
                raise
            if staging_query is not None:
                # drained and still absent: the staging stream has
                # genuinely written nothing — nothing to publish
                return
            raise RuntimeError(
                "streaming_suppress_small_groups: staging area "
                f"{staged_events_path!r} does not exist when a closed "
                "window tried to publish. The staging writer must "
                "flush a window's rows BEFORE its keep-list "
                "micro-batch fires — pass the staging StreamingQuery "
                "as staging_query= to have each publish drain it, or "
                "complete an availableNow staging run before starting "
                "this query."
            ) from exc
        raw = (
            staged
            .withColumn(
                "window_start",
                F.window(ts_col, window).getField("start"),
            )
            .where(F.col("window_start").isin(closed))
        )
        cond = F.col("raw.window_start").eqNullSafe(
            F.col("keep.window_start")
        )
        for c in quasi_cols:
            cond = cond & F.col(f"raw.{c}").eqNullSafe(
                F.col(f"keep._q_{c}")
            )
        kept = raw.alias("raw").join(
            batch_df.alias("keep"), cond, "left_semi"
        )
        (
            kept.withColumn(
                "wpart",
                F.date_format("window_start", "yyyy-MM-dd-HH-mm-ss"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("wpart")
            .parquet(out_path)
        )

    writer = (
        keep.writeStream.foreachBatch(_publish)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_l_diversity(
    events: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    ts_col: str = "ts",
    l_min: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators/curation.py::l_diversity_report:
    the per-window distinct l-diversity violation histogram — the
    homogeneity-attack monitor running beside streaming_k_anonymity
    (k-anonymity bounds class SIZE; this bounds how concentrated the
    SENSITIVE attribute is within each class).

    TRIPLE-chained stateful aggregation (extending the
    streaming_k_anonymity mechanics by one level, since streaming has
    no COUNT DISTINCT): level 1 counts each (window, quasi-class,
    sensitive-value) triple — existence of a triple IS one distinct
    sensitive value, and its count carries the class-size partial;
    level 2 re-windows over ``window_time`` and collapses per
    (window, quasi-class) to d = number of NON-NULL sensitive triples
    (batch's count_distinct skips NULLs; keeping the NULL triple in
    level 1 but not counting it toward d preserves the batch
    convention that an all-NULL class reports d = 0, maximally
    homogeneous) and sz = class size; level 3 keeps classes with
    d < ``l_min`` and rolls them into the histogram
    (n_distinct_sensitive, n_groups, n_rows). Append mode end to end
    — a class's diversity is only judgeable once its window CLOSES.

    State: level 1 holds one row per (open window, quasi-class,
    sensitive value) — the honest distinct-count cost, bounded by the
    per-window quasi×sensitive cardinality (same caveat as any
    streaming COUNT DISTINCT; a near-unique sensitive column makes it
    traffic-sized until the watermark closes the window); level 2 one
    row per (open window, class); level 3 ≤ l_min−1 rows per open
    window. NULL event times drop (immortal-state rule); NULL quasi
    values form their own class (batch contract).

    availableNow replay equals the batch l_diversity_report applied
    per window (test-locked)."""
    if l_min < 2:
        raise ValueError(f"l_min must be >= 2: {l_min}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    triples = (
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            *quasi_cols,
            F.col(sensitive_col).alias("_s"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    classes = (
        triples.groupBy(
            F.window(F.window_time("w"), window).alias("w2"),
            *quasi_cols,
        )
        .agg(
            F.sum(
                F.when(F.col("_s").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("_d"),
            F.sum("_n").cast("bigint").alias("_sz"),
        )
    )
    return (
        classes.where(F.col("_d") < l_min)
        .groupBy(
            F.window(F.window_time("w2"), window).alias("w3"),
            F.col("_d").alias("n_distinct_sensitive"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("_sz").cast("bigint").alias("n_rows"),
        )
        .select(
            F.col("w3.start").alias("window_start"),
            "n_distinct_sensitive",
            "n_groups",
            "n_rows",
        )
    )


def streaming_fisher_exact(
    events: DataFrame,
    group_cols: list[str],
    a_col: str,
    b_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators/analytics.py::fisher_exact: per
    closed event-time window and group, the two-sided exact
    independence test of the booleans ``a_col`` x ``b_col`` — live
    small-sample A/B monitoring (is the treatment flag independent of
    the outcome flag in THIS hour's cohort?) with the batch
    operator's exactness guarantees intact, because the split is the
    class_report pattern: the ONE stateful aggregation accumulates
    only the four exact-BIGINT partials (shared front end
    fisher_contingency_counts), and the entire test readout — the
    integer-preserving binomial folds, the exact ≤-observed rule, the
    single-division p-value — is STATELESS projection over the closed
    window's row (shared back end fisher_readout), so batch and
    streaming cannot drift.

    Append mode (a 2x2 table is only testable once its window
    closes); state = one row of four BIGINTs per (open window,
    group). Groups exceeding FISHER_MAX_N (=60) rows in a window
    report NULL p — at streaming rates most windows will, so this
    monitor is for SMALL cohorts by design (rare-event flags, sampled
    traffic, per-tenant slices); bigger cohorts belong to a
    chi-square monitor. NULL event times drop (immortal-state rule);
    NULL booleans are excluded row-wise (batch contract).

    availableNow replay equals batch fisher_exact per window
    (test-locked)."""
    from h3_indexer_spark.operators.analytics import (
        fisher_contingency_counts,
        fisher_readout,
    )

    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    src = events.where(F.col(ts_col).isNotNull()).withWatermark(
        ts_col, watermark
    )
    counts = fisher_contingency_counts(
        src,
        [F.window(ts_col, window).alias("w"), *group_cols],
        a_col,
        b_col,
    )
    out = fisher_readout(
        counts.withColumn("window_start", F.col("w.start")),
        ["window_start", *group_cols],
    )
    return out


def streaming_class_report_summary(
    events: DataFrame,
    ts_col: str = "ts",
    label_col: str = "label",
    pred_col: str = "pred",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of operators/analytics.py::
    classification_summary: per closed window, the macro / micro /
    weighted averaging block over the per-class report — the
    one-number-per-window drift alarm (page when macro-F1 drops) on
    top of streaming_class_report's per-class detail.

    CHAINED stateful aggregation built entirely from the shared
    cores, so neither level can drift from batch: level 1 is the
    class_report_contributions role-explode collapsed per (window,
    class) — keeping the window STRUCT so its event-time attribute
    survives — with the per-class ROUND-9 metrics derived stateless
    (class_report_columns); level 2 re-windows over ``window_time``
    and folds the shared class_summary_aggs (sorted folds over the
    quantized per-class metrics — collect_list bounded by the class
    vocabulary per open window); the 3-row unpivot is the shared
    stateless class_summary_rows. Append mode end to end (an average
    over classes is only meaningful once the window's per-class
    cells are FINAL).

    State: level 1 one row per (open window, class); level 2 one row
    per open window carrying the fold partials — both
    vocabulary-bounded, watermark-expired. NULL label/pred rows drop
    (batch contract); NULL event times drop (immortal-state rule).

    availableNow replay equals the batch classification_summary
    applied per window, exactly — identical quantized inputs,
    identical pinned fold order (test-locked)."""
    from h3_indexer_spark.operators.analytics import (
        class_report_aggs,
        class_report_columns,
        class_report_contributions,
        class_summary_aggs,
        class_summary_rows,
    )

    contrib = class_report_contributions(
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .select(ts_col, label_col, pred_col),
        label_col,
        pred_col,
    )
    per_class = contrib.groupBy(
        F.window(ts_col, window).alias("w"), "class"
    ).agg(*class_report_aggs())
    per_class = per_class.select("w", "class", *class_report_columns())
    summary = per_class.groupBy(
        F.window(F.window_time("w"), window).alias("w2")
    ).agg(*class_summary_aggs())
    return class_summary_rows(
        summary.withColumn("window_start", F.col("w2.start")),
        ["window_start"],
    )


def streaming_t_closeness(
    events: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    out_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    t_max: float = 0.2,
    n_buckets: int = 20,
    window: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = False,
):
    """Streaming twin of operators/curation.py::t_closeness_report —
    the per-window skew monitor completing the streaming privacy
    family (streaming_k_anonymity sizes classes, streaming_l_diversity
    counts their distinct sensitive values, this bounds how far each
    class's sensitive DISTRIBUTION drifts from the window's global
    one).

    Mechanics (the shared-core pattern streaming_fisher_exact
    established, on the streaming_suppress_small_groups sink shape):
    the driving stream is the level-1 (window, quasi-class,
    sensitive-value) census — curation.t_closeness_pairs' exact
    aggregation with the window key prepended — in APPEND mode, so a
    window's census rows arrive in ONE micro-batch exactly when the
    watermark closes it. foreachBatch then runs the SAME batch back
    end (curation.t_closeness_readout, carry = window start) over
    that closed slice: each window's classes are compared against
    THAT window's global distribution (a per-window monitor must not
    mix traffic regimes across windows), and the <= n_buckets-row
    histogram is published per window with DYNAMIC partition
    overwrite — the readout is a deterministic function of the closed
    census slice, so a replayed micro-batch rewrites its window
    partitions byte-identically (no staging area to race, unlike the
    suppression sink: the census itself IS the publish input).

    State: ONE stateful operator, one row per (open window, class,
    sensitive value) — the streaming_l_diversity level-1 bound
    (vocabulary-bounded per class). The foreachBatch work is
    census-sized, never row-sized. Late rows beyond the watermark are
    dropped from the census (standard append semantics) — the
    monitor alarms on what the stream saw in time.

    Returns the started StreamingQuery."""
    from h3_indexer_spark.operators.curation import t_closeness_readout

    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if not (0.0 <= t_max < 1.0):
        raise ValueError(f"t_max must be in [0, 1): {t_max}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    census = (
        events.where(F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("w"),
            *quasi_cols,
            F.col(sensitive_col).alias("_v"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .select(
            F.col("w.start").alias("window_start"),
            *quasi_cols,
            "_v",
            "_c",
        )
    )

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hist = t_closeness_readout(
            batch_df,
            quasi_cols,
            t_max=t_max,
            n_buckets=n_buckets,
            carry_cols=["window_start"],
        )
        (
            hist.withColumn(
                "wpart",
                F.date_format("window_start", "yyyy-MM-dd-HH-mm-ss"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("wpart")
            .parquet(out_path)
        )

    writer = (
        census.writeStream.foreachBatch(_publish)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
