"""Structured Streaming operators driven end-to-end: file source →
availableNow trigger → memory sink, checked against the identical batch
plan (streams and batches share the logical plan, so batch is the
oracle)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from h3_indexer_spark.streaming.events import (
    sessionized_agg,
    stateful_running_value,
    streaming_dedup,
    windowed_event_agg,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark):
    """events table re-materialized with a proper micros timestamp (the
    driver parquet historically stored TIMESTAMP(NANOS), which the
    streaming reader also rejects; newer testdata uses timestamp[us],
    read as TIMESTAMP_NTZ), split across several files so availableNow
    processes multiple batches."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    d = tempfile.mkdtemp(prefix="h3idx_stream_")
    src = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    if src.schema["ts"].dataType.typeName() == "long":  # nanos-as-long
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    src.repartition(4).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, stream_df, output_mode="complete"):
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _read_stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def _run_stream_with_drop_count(spark, stream_df, output_mode="append"):
    """Run to completion and also return the total rows the stateful
    operators dropped for violating the watermark (the explicit
    late-data accounting surfaced in StreamingQueryProgress)."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    return spark.table(name), dropped


def _write_event_batches(spark, d, batches):
    """Append each batch as one parquet file with strictly increasing
    mtimes, so maxFilesPerTrigger=1 replays them in order — the
    controlled-lateness harness (a later batch can carry an event time
    the watermark has already passed)."""
    import time as _time

    for rows in batches:
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_s string, event_type string, "
            "value double, user_id long",
        ).select(
            "event_id",
            F.to_timestamp("ts_s").alias("ts"),
            "event_type",
            "value",
            "user_id",
        )
        df.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


class TestWindowedAgg:
    def test_matches_batch(self, spark, events_dir):
        stream = windowed_event_agg(_read_stream(spark, events_dir))
        got = _run_stream(spark, stream).orderBy("window_start", "event_type")
        batch = spark.read.parquet(events_dir)
        want = (
            windowed_event_agg(batch)
            .orderBy("window_start", "event_type")
        )
        g = [
            (r.window_start, r.event_type, r.n_events)
            for r in got.collect()
        ]
        w = [
            (r.window_start, r.event_type, r.n_events)
            for r in want.collect()
        ]
        assert g == w
        assert len(g) > 0

    def test_sliding(self, spark, events_dir):
        stream = windowed_event_agg(
            _read_stream(spark, events_dir), window="2 hours", slide="1 hour"
        )
        got = _run_stream(spark, stream)
        # every event lands in exactly 2 sliding windows
        n_events = spark.read.parquet(events_dir).count()
        assert got.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events


class TestLateData:
    def test_event_older_than_watermark_dropped(self, spark, events_dir):
        """Watermark semantics end-to-end: a row arriving in a later
        micro-batch with event time older than the watermark must be
        excluded from its (already finalized) window."""
        import time as _time

        d = tempfile.mkdtemp(prefix="h3idx_late_")
        try:
            base = "2024-06-01 "
            batch_a = spark.createDataFrame(
                [
                    (1, base + "10:15:00", "click", 1.0, 7),
                    (2, base + "13:00:00", "click", 1.0, 7),
                ],
                "event_id long, ts_s string, event_type string, "
                "value double, user_id long",
            ).select(
                "event_id", F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value", "user_id",
            )
            # the window's state is evicted during the FIRST batch after
            # the watermark passes its end (the watermark is a may-drop
            # bound: a late row arriving in that same batch still
            # merges). batch_b forces the eviction; the late row in
            # batch_c then hits evicted state and must drop.
            batch_b = spark.createDataFrame(
                [(5, base + "13:30:00", "click", 1.0, 7)],
                "event_id long, ts_s string, event_type string, "
                "value double, user_id long",
            ).select(
                "event_id", F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value", "user_id",
            )
            batch_c = spark.createDataFrame(
                [
                    # late: window [10:00,11:00) evicted at watermark
                    # 12:00 during batch_b → must be dropped
                    (3, base + "10:30:00", "click", 1.0, 7),
                    (4, base + "14:00:00", "click", 1.0, 7),
                ],
                "event_id long, ts_s string, event_type string, "
                "value double, user_id long",
            ).select(
                "event_id", F.to_timestamp("ts_s").alias("ts"),
                "event_type", "value", "user_id",
            )
            batch_a.coalesce(1).write.mode("append").parquet(d)
            _time.sleep(1.1)  # distinct mtimes → deterministic file order
            batch_b.coalesce(1).write.mode("append").parquet(d)
            _time.sleep(1.1)
            batch_c.coalesce(1).write.mode("append").parquet(d)

            schema = spark.read.parquet(d).schema
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            agg = windowed_event_agg(stream, window="1 hour", watermark="1 hour")
            got = _run_stream(spark, agg, output_mode="append")
            finalized = {
                r.window_start.strftime("%H:%M"): r.n_events
                for r in got.collect()
            }
            # the 10:00 window finalized with ONLY event 1 — the late
            # event 3 arrived after the watermark passed the window end
            assert finalized.get("10:00") == 1, finalized
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestLateDataAccounting:
    """Watermark-violating events injected into each stateful stream,
    with the drop made EXPLICIT via numRowsDroppedByWatermark and
    reconciled against the batch plan (which, having no watermark,
    always counts the late rows)."""

    B = "2024-06-01 "

    def test_windowed_drop_count_reconciles_with_batch(self, spark):
        d = tempfile.mkdtemp(prefix="h3idx_latewin_")
        try:
            stream_src = _write_event_batches(
                spark,
                d,
                [
                    [
                        (1, self.B + "10:15:00", "click", 1.0, 7),
                        (2, self.B + "13:00:00", "click", 1.0, 7),
                    ],
                    # advances the watermark to 12:00 and evicts the
                    # finalized [10:00,11:00) window
                    [(5, self.B + "13:30:00", "click", 1.0, 7)],
                    # late: 10:30 is behind the 12:00 watermark
                    [
                        (3, self.B + "10:30:00", "click", 1.0, 7),
                        (4, self.B + "14:00:00", "click", 1.0, 7),
                    ],
                ],
            )
            agg = windowed_event_agg(
                stream_src, window="1 hour", watermark="1 hour"
            )
            got, dropped = _run_stream_with_drop_count(spark, agg)
            assert dropped == 1, f"expected exactly the one late row: {dropped}"
            finalized = {
                r.window_start.strftime("%H:%M"): r.n_events
                for r in got.collect()
            }
            # batch (no watermark) counts BOTH rows in the 10:00 window;
            # the stream finalized it with one — the difference IS the
            # dropped count
            batch = windowed_event_agg(
                spark.read.parquet(d), window="1 hour", watermark="1 hour"
            )
            batch_1000 = {
                r.window_start.strftime("%H:%M"): r.n_events
                for r in batch.collect()
            }["10:00"]
            assert batch_1000 - finalized["10:00"] == dropped
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_session_late_event_dropped_not_merged(self, spark):
        """A late event that WOULD have merged into an already-finalized
        session must be dropped (and counted), not spawn a phantom
        session or mutate emitted output."""
        d = tempfile.mkdtemp(prefix="h3idx_latesess_")
        try:
            stream_src = _write_event_batches(
                spark,
                d,
                [
                    [
                        (1, self.B + "10:00:00", "click", 1.0, 7),
                        (2, self.B + "13:00:00", "click", 1.0, 7),
                    ],
                    # watermark 12:00 > session end 10:30 → finalize+evict
                    [(5, self.B + "13:30:00", "click", 1.0, 7)],
                    # 10:10 would have extended the 10:00 session
                    [
                        (3, self.B + "10:10:00", "click", 1.0, 7),
                        (4, self.B + "14:00:00", "click", 1.0, 7),
                    ],
                ],
            )
            agg = sessionized_agg(
                stream_src, gap="30 minutes", watermark="1 hour"
            )
            got, dropped = _run_stream_with_drop_count(spark, agg)
            assert dropped == 1, dropped
            sessions = {
                r.session_start.strftime("%H:%M"): r.n_events
                for r in got.collect()
            }
            assert sessions.get("10:00") == 1, sessions
            assert "10:10" not in sessions
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_dedup_state_expires_with_watermark(self, spark):
        """dropDuplicatesWithinWatermark keeps per-id state only within
        the watermark: a replay inside it collapses; a replay after the
        id's state expired passes through again. This is the documented
        bounded-state trade — at 100 TB/day the state store cannot hold
        every id forever, so effectively-once holds only within the
        lateness bound."""
        d = tempfile.mkdtemp(prefix="h3idx_latededup_")
        try:
            stream_src = _write_event_batches(
                spark,
                d,
                [
                    [(1, self.B + "10:00:00", "click", 1.0, 7)],
                    # same id replayed within the watermark → collapses
                    [(1, self.B + "10:00:00", "click", 1.0, 7)],
                    # advance watermark to 12:00, expiring id 1's state
                    # (kept only until watermark > 10:00 + 1h delay)
                    [(99, self.B + "13:00:00", "click", 1.0, 8)],
                    # eviction commits at END of the batch that runs
                    # with the advanced watermark — burn one batch
                    [(98, self.B + "13:10:00", "click", 1.0, 8)],
                    # re-stamped replay AFTER expiry → passes through
                    [(1, self.B + "12:30:00", "click", 1.0, 7)],
                ],
            )
            stream = streaming_dedup(stream_src, watermark="1 hour")
            got, _ = _run_stream_with_drop_count(spark, stream)
            counts = {
                r.event_id: r["count"]
                for r in got.groupBy("event_id").count().collect()
            }
            assert counts == {1: 2, 98: 1, 99: 1}, counts
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_funnel_cross_batch_disorder_is_not_retroactive(self, spark):
        """streaming_funnel's documented contract: a stage-k event
        processed before the key's stage k-1 completion is known is NOT
        retroactively applied (buffer upstream by watermark if that
        guarantee is needed). The batch funnel on the same data DOES
        count the chain — the difference is the disorder cost."""
        from h3_indexer_spark.operators.analytics import funnel
        from h3_indexer_spark.streaming.events import streaming_funnel

        d = tempfile.mkdtemp(prefix="h3idx_latefun_")
        try:
            stream_src = _write_event_batches(
                spark,
                d,
                [
                    # click arrives in an earlier batch...
                    [(1, self.B + "10:30:00", "click", 1.0, 7)],
                    # ...than the view that precedes it in event time
                    [(2, self.B + "10:00:00", "view", 1.0, 7)],
                ],
            )
            stream = streaming_funnel(stream_src, ["view", "click"])
            got, _ = _run_stream_with_drop_count(
                spark, stream, output_mode="update"
            )
            rows = {r.user_id: r for r in got.collect()}
            assert rows[7].stages_reached == 1, rows
            assert rows[7].t_1 is None
            batch = funnel(
                spark.read.parquet(d).withColumn(
                    "ts", F.unix_micros("ts") * 1000
                ),
                ["view", "click"],
            )
            assert batch.collect()[0].stages_reached == 2
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestSessionized:
    def test_matches_batch(self, spark, events_dir):
        stream = sessionized_agg(_read_stream(spark, events_dir))
        got = _run_stream(spark, stream)
        batch_total = spark.read.parquet(events_dir).count()
        # every event belongs to exactly one session
        assert got.agg(F.sum("n_events")).collect()[0][0] == batch_total


class TestStreamingDedup:
    def test_drops_dupes(self, spark, events_dir):
        # duplicate the whole input: every event appears twice
        dup = spark.read.parquet(events_dir)
        d = tempfile.mkdtemp(prefix="h3idx_dupes_")
        try:
            dup.union(dup).repartition(4).write.mode("overwrite").parquet(d)
            stream = streaming_dedup(_read_stream(spark, d))
            got = _run_stream(spark, stream, output_mode="append")
            assert got.count() == dup.count()
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStatefulRunning:
    def test_totals_match_batch(self, spark, events_dir):
        stream = stateful_running_value(_read_stream(spark, events_dir))
        got = _run_stream(spark, stream, output_mode="update")
        # the LAST update per user carries the final running totals
        batch = (
            spark.read.parquet(events_dir)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        )
        final = {r.user_id: (r.n_events, r.total_value) for r in got.collect()}
        for r in batch.collect():
            n, tv = final[r.user_id]
            assert n == r.n
            assert abs(tv - r.tv) < 1e-6


class TestEnrichStream:
    def test_matches_batch_join(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import enrich_stream

        dim = spark.createDataFrame(
            [(u, f"tier_{u % 3}") for u in range(50)],
            ["user_id", "tier"],
        )
        stream = enrich_stream(_read_stream(spark, events_dir), dim, "user_id")
        got = _run_stream(spark, stream, output_mode="append")
        batch = spark.read.parquet(events_dir).join(dim, "user_id", "left")
        assert got.count() == batch.count()
        assert (
            got.groupBy("tier").count().orderBy("tier").collect()
            == batch.groupBy("tier").count().orderBy("tier").collect()
        )


class TestStreamStreamJoin:
    def test_interval_attribution(self, spark, events_dir):
        """clicks ⋈ errors per user within ±30 min, both sides
        streaming — result must equal the equivalent batch range
        join."""
        from h3_indexer_spark.streaming.events import (
            stream_stream_interval_join,
        )

        src = _read_stream(spark, events_dir)
        clicks = src.where("event_type = 'click'").select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        errors = src.where("event_type = 'error'").select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("err_ts"),
            F.col("event_id").alias("err_id"),
        )
        joined = stream_stream_interval_join(
            clicks, errors, "user_id", "click_ts", "err_ts",
            tolerance_s=1800,
        )
        got = _run_stream(spark, joined, output_mode="append")

        b = spark.read.parquet(events_dir)
        bc = b.where("event_type = 'click'")
        be = b.where("event_type = 'error'")
        want = bc.alias("c").join(
            be.alias("e"),
            (F.col("c.user_id") == F.col("e.user_id"))
            & (
                F.col("e.ts")
                >= F.col("c.ts") - F.expr("INTERVAL 1800 SECONDS")
            )
            & (
                F.col("e.ts")
                <= F.col("c.ts") + F.expr("INTERVAL 1800 SECONDS")
            ),
        )
        assert got.count() == want.count()
        assert got.count() > 0


class TestStreamingCuration:
    def test_narrow_curation_stages_run_on_stream(self, spark):
        """The narrow curation stack (quality -> lang-id -> token
        counts) is pure expressions, so the SAME config-driven
        pipeline runs unchanged on a stream and matches the batch
        result — the batch/stream parity the operator design buys."""
        import shutil
        import tempfile

        from h3_indexer_spark.plans.curation_pipeline import run_curation
        from tests.conftest import SF_SMALL

        d = tempfile.mkdtemp(prefix="h3idx_scur_")
        try:
            (
                spark.read.parquet(f"{SF_SMALL}/documents.parquet")
                .repartition(3)
                .write.mode("overwrite")
                .parquet(d)
            )
            schema = spark.read.parquet(d).schema
            cfg = [
                {"stage": "quality_score"},
                {"stage": "language_id"},
                {"stage": "token_counts"},
            ]
            stream = run_curation(
                spark, spark.readStream.schema(schema).parquet(d), cfg
            )
            got = _run_stream(spark, stream, output_mode="append")
            want = run_curation(spark, spark.read.parquet(d), cfg)
            g = sorted(
                (r.doc_id, r.lang_pred, r.n_tokens_re)
                for r in got.collect()
            )
            w = sorted(
                (r.doc_id, r.lang_pred, r.n_tokens_re)
                for r in want.collect()
            )
            assert g == w and len(g) > 0
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingFunnel:
    def test_matches_batch_funnel(self, spark, events_dir):
        """The stateful streaming funnel must equal the batch operator
        on the same data (availableNow; per-batch sort makes the
        single-pass exact)."""
        from h3_indexer_spark.operators.analytics import funnel
        from h3_indexer_spark.streaming.events import streaming_funnel

        stages = ["view", "click", "purchase"]
        stream = streaming_funnel(
            _read_stream(spark, events_dir), stages
        )
        got = _run_stream(spark, stream, output_mode="update")
        # update mode can emit a row per batch per key; keep the last
        from pyspark.sql import Window

        batch_events = spark.read.parquet(events_dir).withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
        want = {
            r.user_id: (r.t_0, r.t_1, r.t_2, r.stages_reached)
            for r in funnel(batch_events, stages).collect()
        }
        # take each user's final emitted state (max stages_reached,
        # then earliest chain — monotone updates make the last row the
        # most complete; dedupe via pandas)
        gp = got.toPandas().sort_values("stages_reached").groupby("user_id").tail(1)
        g = {
            int(r.user_id): (
                None if pd_isna(r.t_0) else int(r.t_0),
                None if pd_isna(r.t_1) else int(r.t_1),
                None if pd_isna(r.t_2) else int(r.t_2),
                int(r.stages_reached),
            )
            for r in gp.itertuples()
        }
        assert g == want
        assert len(g) > 0


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


class TestStreamingAttribution:
    def test_matches_batch_attribution(self, spark, events_dir):
        from h3_indexer_spark.operators.analytics import (
            attribute_conversions,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_attribution,
        )

        stream = streaming_attribution(
            _read_stream(spark, events_dir), "purchase", ["click", "view"]
        )
        got = _run_stream(spark, stream, output_mode="append")
        batch_events = spark.read.parquet(events_dir).withColumn(
            "ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)
        )
        want = sorted(
            (r.user_id, r.conv_ts,
             r.touch_ts, r.touch_type, r.lag_ns)
            for r in attribute_conversions(
                batch_events, "purchase", ["click", "view"]
            ).collect()
        )
        g = sorted(
            (r.user_id, r.conv_ts, r.touch_ts, r.touch_type, r.lag_ns)
            for r in got.collect()
        )
        assert g == want
        assert len(g) > 0


class TestStreamingDistinctUsers:
    def test_matches_batch_count_distinct(self, spark, events_dir):
        """Streaming rejects COUNT(DISTINCT); the dedup-then-count
        rewrite must equal the batch countDistinct per window."""
        from h3_indexer_spark.streaming.events import (
            streaming_distinct_users,
        )

        stream = streaming_distinct_users(_read_stream(spark, events_dir))
        got = {
            (r.window_start): r.n_distinct_users
            for r in _run_stream(spark, stream).collect()
        }
        batch = spark.read.parquet(events_dir)
        want = {
            r.window_start: r.n
            for r in (
                batch.groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.countDistinct("user_id").alias("n"))
                .select(
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                        "window_start"
                    ),
                    "n",
                )
                .collect()
            )
        }
        assert got == want
        assert len(got) > 10
