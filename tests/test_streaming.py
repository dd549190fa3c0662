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

    @pytest.mark.slow
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


class TestStreamingAnomalies:
    def test_online_prefix_semantics(self, spark):
        """A planted outlier after the warm-up window must flag; rows
        inside the cold-start window must not (no stats yet); and the
        z is computed against PREFIX stats — no lookahead."""
        from h3_indexer_spark.streaming.events import streaming_anomalies

        d = tempfile.mkdtemp(prefix="h3idx_sanom_")
        try:
            base = "2024-06-01 "
            # batch 1: 40 calm values (mean 10, tiny spread)
            calm = [
                (i, base + f"10:{i:02d}:00", "click", 10.0 + (i % 5) * 0.1, 7)
                for i in range(40)
            ]
            # batch 2: one wild value + one calm
            wild = [
                (100, base + "11:00:00", "click", 50.0, 7),
                (101, base + "11:01:00", "click", 10.2, 7),
            ]
            stream_src = _write_event_batches(spark, d, [calm, wild])
            got, _ = _run_stream_with_drop_count(
                spark,
                streaming_anomalies(
                    stream_src, key_col="event_type", z_threshold=3.0
                ),
                output_mode="append",
            )
            rows = got.collect()
            flagged = {r.event_id for r in rows}
            assert 100 in flagged, rows
            # calm rows: batch 1 is entirely cold-start (state empty at
            # scoring time), 101 is within 3 sd of the calm prefix
            assert flagged == {100}, rows
            z = [r.z for r in rows if r.event_id == 100][0]
            assert z > 3.0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_running_stats_match_batch_moments(self, spark):
        """After all batches, the per-key Welford state must equal the
        batch mean/variance — verified indirectly: a final sentinel
        value scored by the stream gets the same z the batch formula
        gives against all prior data."""
        import math

        from h3_indexer_spark.streaming.events import streaming_anomalies

        d = tempfile.mkdtemp(prefix="h3idx_sanom2_")
        try:
            base = "2024-06-01 "
            vals = [10.0, 12.0, 9.0, 11.0, 10.5, 9.5, 11.5, 10.0] * 5
            hist = [
                (i, base + f"10:{i:02d}:00", "click", v, 7)
                for i, v in enumerate(vals)
            ]
            probe = [(999, base + "11:00:00", "click", 30.0, 7)]
            stream_src = _write_event_batches(spark, d, [hist, probe])
            got, _ = _run_stream_with_drop_count(
                spark,
                streaming_anomalies(
                    stream_src, z_threshold=3.0, min_n=30
                ),
                output_mode="append",
            )
            z_stream = {r.event_id: r.z for r in got.collect()}[999]
            n = len(vals)
            mean = sum(vals) / n
            var = sum((v - mean) ** 2 for v in vals) / (n - 1)
            z_batch = (30.0 - mean) / math.sqrt(var)
            assert abs(z_stream - z_batch) < 1e-9
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingHeavyHitters:
    def test_exact_within_capacity_and_guaranteed(self, spark):
        """With distinct items <= capacity the sketch is exact: the
        final update's counts equal the batch groupBy, errs are 0,
        and every item is certified."""
        from h3_indexer_spark.streaming.events import (
            streaming_heavy_hitters,
        )

        d = tempfile.mkdtemp(prefix="h3idx_shh_")
        try:
            base = "2024-06-01 "
            rows_a, rows_b = [], []
            eid = 0
            for u, n_a, n_b in [(1, 5, 3), (2, 2, 2), (3, 1, 0)]:
                for _ in range(n_a):
                    rows_a.append(
                        (eid, base + "10:00:00", "click", 1.0, u)
                    )
                    eid += 1
                for _ in range(n_b):
                    rows_b.append(
                        (eid, base + "10:30:00", "click", 1.0, u)
                    )
                    eid += 1
            stream_src = _write_event_batches(spark, d, [rows_a, rows_b])
            got, _ = _run_stream_with_drop_count(
                spark,
                streaming_heavy_hitters(
                    stream_src, key_col="event_type", item_col="user_id",
                    capacity=16,
                ),
                output_mode="update",
            )
            # memory sink in update mode appends each batch's emission;
            # keep the LAST emission per item (max est_count)
            final = {}
            for r in got.collect():
                cur = final.get(r.item)
                if cur is None or r.est_count > cur.est_count:
                    final[r.item] = r
            assert {k: v.est_count for k, v in final.items()} == {
                "1": 8, "2": 4, "3": 1
            }
            assert all(v.err == 0 and v.guaranteed for v in final.values())
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_eviction_keeps_bounds_honest(self, spark):
        """Past capacity, evicted-and-reinserted items carry err > 0
        and true_count <= est_count always holds."""
        from h3_indexer_spark.streaming.events import (
            streaming_heavy_hitters,
        )

        d = tempfile.mkdtemp(prefix="h3idx_shh2_")
        try:
            base = "2024-06-01 "
            rows = []
            eid = 0
            true = {}
            # heavy items 0,1 + a tail of singletons that forces churn
            stream_plan = [0] * 20 + [1] * 10 + list(range(100, 130))
            for u in stream_plan:
                rows.append((eid, base + "10:00:00", "click", 1.0, u))
                true[str(u)] = true.get(str(u), 0) + 1
                eid += 1
            stream_src = _write_event_batches(spark, d, [rows])
            got, _ = _run_stream_with_drop_count(
                spark,
                streaming_heavy_hitters(
                    stream_src, key_col="event_type", item_col="user_id",
                    capacity=8,
                ),
                output_mode="update",
            )
            table = {r.item: r for r in got.collect()}
            assert len(table) <= 8
            for item, r in table.items():
                t = true.get(item, 0)
                assert t <= r.est_count, (item, t, r)
                assert r.est_count - r.err <= t, (item, t, r)
            # the two heavies must be present and certified
            assert table["0"].est_count >= 20
            assert table["0"].guaranteed
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamToPartitionedParquet:
    def test_incremental_partition_writes_and_idempotent_replay(
        self, spark, events_dir
    ):
        """The foreachBatch upsert sink: (a) output equals the batch
        plan partitioned the same way; (b) re-running the SAME input
        through a FRESH checkpoint (a full replay — the worst case)
        converges to the same rows, not duplicates."""
        from h3_indexer_spark.streaming.events import (
            stream_to_partitioned_parquet,
        )

        d = tempfile.mkdtemp(prefix="h3idx_slake_")
        try:
            out = f"{d}/lake"
            src = _read_stream(spark, events_dir).withColumn(
                "day", F.to_date("ts")
            )
            q = stream_to_partitioned_parquet(
                src, out, ["day"], f"{d}/ckpt1",
                trigger_available_now=True,
            )
            q.awaitTermination(120)
            batch = spark.read.parquet(events_dir).withColumn(
                "day", F.to_date("ts")
            )
            got = spark.read.parquet(out)
            assert got.count() == batch.count()
            assert (
                got.select("day").distinct().count()
                == batch.select("day").distinct().count()
            )
            # full replay with a fresh checkpoint: same state, no dupes
            q2 = stream_to_partitioned_parquet(
                _read_stream(spark, events_dir).withColumn(
                    "day", F.to_date("ts")
                ),
                out,
                ["day"],
                f"{d}/ckpt2",
                trigger_available_now=True,
            )
            q2.awaitTermination(120)
            again = spark.read.parquet(out)
            assert again.count() == batch.count()
            assert {r.event_id for r in again.select("event_id").collect()} == {
                r.event_id for r in batch.select("event_id").collect()
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)


def _write_doc_batches(spark, d, batches):
    """Docs-shaped twin of _write_event_batches: (doc_id, ts, text)."""
    import time as _time

    for rows in batches:
        df = spark.createDataFrame(
            rows, "doc_id long, ts_s string, text string"
        ).select(
            "doc_id", F.to_timestamp("ts_s").alias("ts"), "text"
        )
        df.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)
    schema = spark.read.parquet(d).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


class TestStreamingNearDup:
    B = "2024-03-01 "

    _DOCS = {
        # 0/1: near-dups (30 shared words, one divergent tail word)
        0: "w" + " w".join(str(i) for i in range(30)) + " alpha",
        1: "w" + " w".join(str(i) for i in range(30)) + " beta",
        # 2: exact copy of 0 (also a near-dup and a content-dup)
        2: "w" + " w".join(str(i) for i in range(30)) + " alpha",
        # 3: unrelated
        3: "z" + " z".join(str(i) for i in range(40)),
    }

    def test_content_dedup_drops_exact_copy(self, spark):
        from h3_indexer_spark.streaming.events import (
            streaming_content_dedup,
        )

        d = tempfile.mkdtemp(prefix="h3idx_scdd_")
        try:
            src = _write_doc_batches(
                spark,
                d,
                [
                    [(0, self.B + "10:00:00", self._DOCS[0])],
                    [(2, self.B + "10:01:00", self._DOCS[2])],
                    [(3, self.B + "10:02:00", self._DOCS[3])],
                ],
            )
            out = _run_stream(
                spark,
                streaming_content_dedup(src),
                output_mode="append",
            )
            assert {r["doc_id"] for r in out.collect()} == {0, 3}
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def _batch_suppressed(self, spark, rows):
        """Batch reference: doc is suppressed iff it shares any band
        bucket with an earlier (ts, id) doc — computed with the SAME
        signature kernel the streaming op uses."""
        from h3_indexer_spark.operators.dedup import (
            minhash_signatures,
            shingles,
        )

        df = spark.createDataFrame(
            [(i, t) for i, _, t in rows], "doc_id long, text string"
        )
        sig = minhash_signatures(shingles(df), bands=16)
        buckets = {
            r["doc_id"]: set(r["bands"]) for r in sig.collect()
        }
        order = [i for i, _, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
        seen: set[int] = set()
        claimed: dict[int, int] = {}
        suppressed = set()
        for i in order:
            hit = any(b in claimed for b in buckets[i])
            if hit:
                suppressed.add(i)
            for b in buckets[i]:
                claimed.setdefault(b, i)
            seen.add(i)
        return suppressed

    @pytest.mark.slow
    def test_minhash_parity_with_batch(self, spark):
        from h3_indexer_spark.streaming.events import (
            streaming_minhash_dedup,
        )

        rows = [
            (0, self.B + "10:00:00", self._DOCS[0]),
            (1, self.B + "10:01:00", self._DOCS[1]),
            (2, self.B + "10:02:00", self._DOCS[2]),
            (3, self.B + "10:03:00", self._DOCS[3]),
        ]
        d = tempfile.mkdtemp(prefix="h3idx_smhd_")
        try:
            src = _write_doc_batches(
                spark, d, [[r] for r in rows]
            )
            out = _run_stream(
                spark,
                streaming_minhash_dedup(src),
                output_mode="append",
            )
            got = {r["doc_id"] for r in out.collect()}
            want = self._batch_suppressed(spark, rows)
            assert got == want
            assert want == {1, 2}  # both near-dups of doc 0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    @pytest.mark.slow
    def test_minhash_state_expires(self, spark):
        """A bucket claim expires once the watermark passes its
        claimant's event time + delay: a near-dup arriving after
        expiry is NOT suppressed (bounded-state trade, documented)."""
        from h3_indexer_spark.streaming.events import (
            streaming_minhash_dedup,
        )

        d = tempfile.mkdtemp(prefix="h3idx_smhe_")
        try:
            src = _write_doc_batches(
                spark,
                d,
                [
                    [(0, self.B + "10:00:00", self._DOCS[0])],
                    # advance watermark far past 10:00 + 1h
                    [(3, self.B + "14:00:00", self._DOCS[3])],
                    # burn a batch so eviction commits
                    [(4, self.B + "14:01:00", self._DOCS[3] + " q")],
                    # near-dup of doc 0, after its claims expired
                    [(5, self.B + "13:30:00", self._DOCS[1])],
                ],
            )
            out = _run_stream(
                spark,
                streaming_minhash_dedup(src),
                output_mode="append",
            )
            got = {r["doc_id"] for r in out.collect()}
            # 4 IS suppressed (near-dup of 3, inside the window);
            # 5 is NOT (doc 0's claims expired)
            assert 5 not in got
            assert 4 in got
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_minhash_dup_in_same_batch_as_watermark_jump(self, spark):
        """ADVICE r7 (medium): when the watermark jumps PAST a
        bucket's expiry and a near-dup for that bucket arrives in the
        very next micro-batch (no burn batch for the timeout to fire
        first), the state callback runs with data, sees
        first_ts+delay behind the watermark, and an unclamped
        setTimeoutTimestamp raises INVALID_TIMEOUT_TIMESTAMP — a
        deterministic crash loop under checkpoint replay. The clamp
        must keep the query alive; the retained claim still
        suppresses the dup."""
        from h3_indexer_spark.streaming.events import (
            streaming_minhash_dedup,
        )

        d = tempfile.mkdtemp(prefix="h3idx_smhc_")
        try:
            src = _write_doc_batches(
                spark,
                d,
                [
                    [(0, self.B + "10:00:00", self._DOCS[0])],
                    # watermark after this batch: 14:00 - 1h = 13:00,
                    # far past doc 0's 11:00 expiry
                    [(3, self.B + "14:00:00", self._DOCS[3])],
                    # near-dup of doc 0 IMMEDIATELY (no burn batch):
                    # state still holds the expired-but-unevicted claim
                    [(5, self.B + "13:30:00", self._DOCS[1])],
                ],
            )
            out = _run_stream(
                spark,
                streaming_minhash_dedup(src),
                output_mode="append",
            )
            got = {r["doc_id"] for r in out.collect()}
            assert 5 in got  # suppressed by the retained claim
            assert 0 not in got and 3 not in got
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_minhash_out_of_order_keeps_event_time_claimant(self, spark):
        """A later micro-batch delivering an EARLIER-event-time near-dup
        must take the bucket claim: the deposed (later-ts) doc emits as
        the dup, so the suppressed set matches the batch (ts, id)-order
        reference even under cross-batch disorder."""
        from h3_indexer_spark.streaming.events import (
            streaming_minhash_dedup,
        )

        rows = [
            (1, self.B + "10:30:00", self._DOCS[0]),   # arrives first
            (0, self.B + "10:00:00", self._DOCS[1]),   # earlier ts, late
        ]
        d = tempfile.mkdtemp(prefix="h3idx_smho_")
        try:
            src = _write_doc_batches(spark, d, [[r] for r in rows])
            out = _run_stream(
                spark,
                streaming_minhash_dedup(src),
                output_mode="append",
            )
            got = {r["doc_id"] for r in out.collect()}
            want = self._batch_suppressed(spark, rows)
            assert got == want == {1}
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_minhash_string_doc_ids(self, spark):
        """String ids are first-class in the batch kernel; the stream
        twin's schemas follow the input id type."""
        from h3_indexer_spark.streaming.events import (
            streaming_minhash_dedup,
        )
        import time as _time

        d = tempfile.mkdtemp(prefix="h3idx_smhs_")
        try:
            batches = [
                [("a", self.B + "10:00:00", self._DOCS[0])],
                [("b", self.B + "10:01:00", self._DOCS[1])],
            ]
            for rows in batches:
                df = spark.createDataFrame(
                    rows, "doc_id string, ts_s string, text string"
                ).select(
                    "doc_id", F.to_timestamp("ts_s").alias("ts"), "text"
                )
                df.coalesce(1).write.mode("append").parquet(d)
                _time.sleep(1.1)
            schema = spark.read.parquet(d).schema
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d)
            )
            out = _run_stream(
                spark,
                streaming_minhash_dedup(src),
                output_mode="append",
            )
            got = [(r["doc_id"], r["dup_of"]) for r in out.collect()]
            assert got and all(pair == ("b", "a") for pair in got)
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingMajorityLabel:
    def test_full_replay_parity_with_batch(self, spark, events_dir):
        """availableNow replay: each item's LAST update row must equal
        the batch majority_label result row-for-row (same tiebreak,
        same abstention handling)."""
        from h3_indexer_spark.operators.labeling import majority_label
        from h3_indexer_spark.streaming.events import (
            streaming_majority_label,
        )

        stream = streaming_majority_label(
            _read_stream(spark, events_dir),
            item_col="user_id",
            label_col="event_type",
        )
        got = _run_stream(spark, stream, output_mode="update")
        # update mode re-emits per batch; the final row per item is the
        # converged readout: take the max n_votes row (votes only grow)
        final = {
            r["user_id"]: r
            for r in got.orderBy("n_votes").collect()
        }
        batch = {
            r["user_id"]: r
            for r in majority_label(
                spark.read.parquet(events_dir), "user_id", "event_type"
            ).collect()
        }
        assert set(final) == set(batch)
        for uid, b in batch.items():
            s = final[uid]
            assert (
                s["top_label"], s["top_count"], s["n_votes"]
            ) == (b["top_label"], b["top_count"], b["n_votes"]), uid
            assert s["agreement"] == b["agreement"]

    def test_tie_breaks_to_smallest_label_across_batches(self, spark):
        """A tie created across two micro-batches must resolve to the
        smallest label, exactly as the batch operator does."""
        import shutil
        import tempfile

        from h3_indexer_spark.streaming.events import (
            streaming_majority_label,
        )

        d = tempfile.mkdtemp(prefix="h3idx_vote_")
        try:
            spark.createDataFrame(
                [(1, "zzz"), (1, "aaa")], "user_id long, event_type string"
            ).repartition(2).write.mode("overwrite").parquet(d)
            schema = spark.read.parquet(d).schema
            stream = streaming_majority_label(
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(d),
                item_col="user_id",
                label_col="event_type",
            )
            got = _run_stream(spark, stream, output_mode="update")
            last = got.orderBy("n_votes").collect()[-1]
            assert last["n_votes"] == 2
            assert last["top_label"] == "aaa" and last["top_count"] == 1
            assert last["agreement"] == 0.5
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingActiveUsersHll:
    def test_full_replay_matches_batch(self, spark, events_dir):
        """availableNow replay over the whole events table must equal
        the batch sketch row for row (same registers, same integer
        harmonic sum, same estimate) — take each day's LAST emission
        (update-mode stream)."""
        from h3_indexer_spark.operators.sketches import (
            rolling_active_users_hll,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_active_users_hll,
        )

        src = _read_stream(spark, events_dir)
        out = _run_stream(
            spark,
            streaming_active_users_hll(src),
            output_mode="update",
        )
        # update mode emits once per updated day per batch: the last
        # emission per day is the final state readout
        got = {}
        for r in out.collect():
            got[r["day"]] = (r["n_zero"], r["s_int"], r["est_distinct"])

        batch = spark.read.parquet(events_dir).select(
            "user_id",
            F.expr("unix_timestamp(ts) * 1000000000").alias("ts"),
        )
        want = {
            r["day"]: (r["n_zero"], r["s_int"], r["est_distinct"])
            for r in rolling_active_users_hll(batch).collect()
        }
        assert got == want

    def test_window_day_without_own_data_not_reported(self, spark):
        """A window position past the last active day accumulates
        register state but must NOT emit (batch phantom-day
        contract)."""
        import pandas as pd

        from h3_indexer_spark.streaming.events import (
            streaming_active_users_hll,
        )

        d = tempfile.mkdtemp(prefix="h3idx_shll_")
        try:
            rows = pd.DataFrame(
                {
                    "user_id": [1, 2, 3],
                    "ts": pd.to_datetime(
                        ["2024-01-01 10:00", "2024-01-01 11:00",
                         "2024-01-02 09:00"]
                    ),
                }
            )
            spark.createDataFrame(rows).write.mode("overwrite").parquet(d)
            schema = spark.read.parquet(d).schema
            src = spark.readStream.schema(schema).parquet(d)
            out = _run_stream(
                spark,
                streaming_active_users_hll(src),
                output_mode="update",
            )
            days = {r["day"] for r in out.collect()}
            active_days = {19723, 19724}  # 2024-01-01, 2024-01-02
            assert days == active_days
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingScd2:
    def test_full_replay_matches_batch(self, spark, events_dir):
        """availableNow replay over the (single-batch, hence
        in-order) events table equals scd2_build row for row — take
        the LAST emission per (key, effective_from) (update-mode
        stream)."""
        from h3_indexer_spark.operators.relational import scd2_build
        from h3_indexer_spark.streaming.events import streaming_scd2

        src = _read_stream(spark, events_dir).select(
            "user_id",
            "event_type",
            F.expr("unix_timestamp(ts) * 1000000000")
            .cast("long")
            .alias("ts"),
        ).where(F.col("event_type").isNotNull())
        out = _run_stream(
            spark, streaming_scd2(src), output_mode="update"
        )
        got = {}
        for r in out.collect():  # arrival order: later emission wins
            got[(r["user_id"], r["effective_from"])] = (
                r["event_type"],
                r["effective_to"],
                r["is_current"],
                r["n_observations"],
            )
        batch_in = (
            spark.read.parquet(events_dir)
            .where(F.col("event_type").isNotNull())
            .select(
                "user_id",
                "event_type",
                F.expr("unix_timestamp(ts) * 1000000000")
                .cast("long")
                .alias("ts"),
            )
        )
        want = {
            (r["user_id"], r["effective_from"]): (
                r["event_type"],
                r["effective_to"],
                r["is_current"],
                r["n_observations"],
            )
            for r in scd2_build(
                batch_in, "user_id", ["event_type"], "ts"
            ).collect()
        }
        assert got == want

    def test_interval_closes_across_batches(self, spark):
        """A run opened in batch 1 closes when batch 2 delivers the
        change — state carries the open run across micro-batches."""
        import shutil
        import tempfile

        from h3_indexer_spark.streaming.events import streaming_scd2

        d = tempfile.mkdtemp(prefix="h3idx_sscd2_")
        try:
            src = _write_event_batches(
                spark,
                d,
                [
                    [
                        (1, "2024-01-01 10:00:00", "A", 0.0, 7),
                        (2, "2024-01-01 11:00:00", "A", 0.0, 7),
                    ],
                    [
                        (3, "2024-01-02 09:00:00", "B", 0.0, 7),
                    ],
                ],
            ).select(
                "user_id",
                "event_type",
                F.expr("unix_timestamp(ts) * 1000000000")
                .cast("long")
                .alias("ts"),
            )
            out = _run_stream(
                spark, streaming_scd2(src), output_mode="update"
            )
            rows = {}
            for r in out.collect():
                rows[(r["user_id"], r["effective_from"])] = (
                    r["event_type"],
                    r["effective_to"],
                    r["is_current"],
                    r["n_observations"],
                )
            ns = 10**9
            t1 = 1704103200 * ns  # 2024-01-01 10:00 UTC
            t3 = 1704186000 * ns  # 2024-01-02 09:00 UTC
            assert rows == {
                (7, t1): ("A", t3, False, 2),
                (7, t3): ("B", None, True, 1),
            }
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def test_rejects_non_integral_ts(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_scd2

        src = _read_stream(spark, events_dir)
        with pytest.raises(ValueError):
            streaming_scd2(src)  # raw timestamp column


class TestStreamingOhlcBars:
    def test_full_replay_matches_batch(self, spark, events_dir):
        """availableNow replay equals the batch ohlc_bars on the
        shared columns — struct min/max ties resolve identically."""
        from h3_indexer_spark.operators.analytics import ohlc_bars
        from h3_indexer_spark.streaming.events import (
            streaming_ohlc_bars,
        )

        out = _run_stream(
            spark,
            streaming_ohlc_bars(
                _read_stream(spark, events_dir),
                group_cols=["event_type"],
            ),
            output_mode="complete",
        )
        got = {
            (int(r["window_start"].timestamp()), r["event_type"]): (
                r["open"], r["high"], r["low"], r["close"],
                r["volume"], r["value_sum"],
            )
            for r in out.collect()
        }
        # FULL-precision epoch nanos (unix_micros*1000, the
        # _load_events idiom): a seconds-truncated batch side would
        # see ties the micros-precision stream does not, silently
        # changing the struct-min/max open/close tiebreak this test
        # exists to lock
        batch_in = spark.read.parquet(events_dir).select(
            "event_type",
            (F.unix_micros("ts") * F.lit(1000)).alias("ts"),
            "value",
        )
        want = {
            (r["bucket_start"] // 10**9, r["event_type"]): (
                r["open"], r["high"], r["low"], r["close"],
                r["volume"], r["value_sum"],
            )
            for r in ohlc_bars(
                batch_in, group_cols=["event_type"]
            ).collect()
        }
        assert got == want

    def test_late_row_within_watermark_folds_in(self, spark):
        import shutil
        import tempfile

        from h3_indexer_spark.streaming.events import (
            streaming_ohlc_bars,
        )

        d = tempfile.mkdtemp(prefix="h3idx_sohlc_")
        try:
            src = _write_event_batches(
                spark,
                d,
                [
                    [(1, "2024-01-01 10:05:00", "A", 5.0, 1),
                     (2, "2024-01-01 10:50:00", "A", 9.0, 1)],
                    # late but inside the 2h watermark: folds into the
                    # 10:00 bar as the new low AND the new open
                    [(3, "2024-01-01 10:01:00", "A", 1.0, 1)],
                ],
            )
            out = _run_stream(
                spark, streaming_ohlc_bars(src), output_mode="complete"
            )
            rows = {
                int(r["window_start"].timestamp()): (
                    r["open"], r["high"], r["low"], r["close"],
                    r["volume"],
                )
                for r in out.collect()
            }
            t10 = 1704103200  # 2024-01-01 10:00 UTC
            assert rows == {t10: (1.0, 9.0, 1.0, 9.0, 3)}
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestStreamingCmsRegisters:
    @pytest.mark.slow
    def test_full_replay_matches_batch_per_window(
        self, spark, events_dir
    ):
        from h3_indexer_spark.operators.sketches import (
            count_min_registers,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_cms_registers,
        )

        out = _run_stream(
            spark,
            streaming_cms_registers(
                _read_stream(spark, events_dir),
                "event_type",
                depth=3,
                width=32,
            ),
            output_mode="complete",
        )
        got = {
            (int(r["window_start"].timestamp()), r["depth"],
             r["bucket"]): r["cnt"]
            for r in out.collect()
        }
        batch = spark.read.parquet(events_dir)
        hours = [
            r["h"]
            for r in batch.select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 3600")
                .alias("h")
            ).distinct().collect()
        ]
        want = {}
        for h in hours:
            sl = batch.where(
                F.expr(
                    f"unix_timestamp(ts) - unix_timestamp(ts) % 3600"
                    f" = {h}"
                )
            )
            for r in count_min_registers(
                sl, "event_type", depth=3, width=32
            ).collect():
                want[(h, r["depth"], r["bucket"])] = r["cnt"]
        assert got == want

    def test_register_state_is_bounded(self, spark, events_dir):
        """No window's register table exceeds depth x width rows."""
        from h3_indexer_spark.streaming.events import (
            streaming_cms_registers,
        )

        out = _run_stream(
            spark,
            streaming_cms_registers(
                _read_stream(spark, events_dir),
                "event_type",
                depth=2,
                width=8,
            ),
            output_mode="complete",
        )
        import collections

        per_window = collections.Counter(
            r["window_start"] for r in out.collect()
        )
        assert per_window and max(per_window.values()) <= 2 * 8


def _run_stream_max_state_rows(spark, stream_df, output_mode="update"):
    """Run to completion ONE FILE PER MICRO-BATCH and return
    (result table, max total state-store rows observed across all
    batches). The max-across-batches is the state-size regression
    lock: a stateful operator whose state grows with traffic rather
    than with its structural bound shows up here as a blown max even
    when every per-batch output is correct."""
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    import json as _json

    totals = []
    for pr in q.recentProgress:
        d = _json.loads(pr.json) if hasattr(pr, "json") else dict(pr)
        totals.append(
            sum(
                op.get("numRowsTotal", 0)
                for op in d.get("stateOperators", [])
            )
        )
    return spark.table(name), max(totals, default=0)


class TestStreamingStateBounds:
    """Round-8 sketch twins: the bounded-state claims in the
    docstrings, locked as asserts on StreamingQueryProgress's
    numRowsTotal — state must track the STRUCTURAL bound (registers,
    bars, open runs), not traffic. Each stream replays the events
    fixture one file per micro-batch so the max is taken across
    several batches, not one."""

    def _multi_batch(self, spark, events_dir):
        schema = spark.read.parquet(events_dir).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )

    def test_cms_state_bounded_by_windows_x_registers(
        self, spark, events_dir
    ):
        from h3_indexer_spark.streaming.events import (
            streaming_cms_registers,
        )

        depth, width = 3, 32
        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_cms_registers(
                self._multi_batch(spark, events_dir),
                "event_type",
                depth=depth,
                width=width,
            ),
            output_mode="append",
        )
        n_windows = (
            spark.read.parquet(events_dir)
            .select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 3600")
            )
            .distinct()
            .count()
        )
        assert 0 < max_state <= n_windows * depth * width

    def test_ohlc_state_bounded_by_bars(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_ohlc_bars

        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_ohlc_bars(
                self._multi_batch(spark, events_dir),
                group_cols=["event_type"],
            ),
            output_mode="append",
        )
        n_bars = (
            spark.read.parquet(events_dir)
            .where(F.col("value").isNotNull())
            .select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 3600"),
                "event_type",
            )
            .distinct()
            .count()
        )
        assert 0 < max_state <= n_bars

    def test_scd2_state_one_open_run_per_key(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_scd2

        src = (
            self._multi_batch(spark, events_dir)
            .select(
                "user_id",
                "event_type",
                F.expr("unix_timestamp(ts) * 1000000000")
                .cast("long")
                .alias("ts"),
            )
            .where(F.col("event_type").isNotNull())
        )
        _, max_state = _run_stream_max_state_rows(
            spark, streaming_scd2(src), output_mode="update"
        )
        n_keys = (
            spark.read.parquet(events_dir)
            .where(F.col("event_type").isNotNull())
            .select("user_id")
            .distinct()
            .count()
        )
        assert 0 < max_state <= n_keys

    def test_hll_state_one_register_set_per_window_day(
        self, spark, events_dir
    ):
        from h3_indexer_spark.streaming.events import (
            streaming_active_users_hll,
        )

        window_days = 7
        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_active_users_hll(
                self._multi_batch(spark, events_dir),
                window_days=window_days,
            ),
            output_mode="update",
        )
        n_days = (
            spark.read.parquet(events_dir)
            .select(F.expr("to_date(ts)"))
            .distinct()
            .count()
        )
        # each event fans to <= window_days window positions, so the
        # grouped state holds at most (active days + window_days - 1)
        # register-set rows — one fixed-size vector per window day
        assert 0 < max_state <= n_days + window_days - 1


class TestStreamingQuantileSketch:
    @pytest.mark.slow
    def test_full_replay_matches_batch_per_window(self, spark, events_dir):
        """availableNow replay (one file per micro-batch) must end at
        the SAME per-window register tables as the batch sketch over
        each window's slice — take the last emission per
        (window_start, rank)."""
        from h3_indexer_spark.operators.sketches import quantile_sketch
        from h3_indexer_spark.streaming.events import (
            streaming_quantile_sketch,
        )

        schema = spark.read.parquet(events_dir).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
        out = _run_stream(
            spark,
            streaming_quantile_sketch(
                src, "value", ["event_id"], k=16
            ),
            output_mode="update",
        )
        got = {}
        for r in out.collect():  # arrival order: later emission wins
            got[(r["window_start"], r["rank"])] = (
                r["hash_val"],
                r["value"],
            )
        batch = spark.read.parquet(events_dir).where(
            F.col("value").isNotNull()
        )
        hours = [
            r["h"]
            for r in batch.select(
                F.expr(
                    "unix_timestamp(ts) - unix_timestamp(ts) % 3600"
                ).alias("h")
            )
            .distinct()
            .collect()
        ]
        want = {}
        for h in hours:
            sl = batch.where(
                F.expr(
                    f"unix_timestamp(ts) - unix_timestamp(ts) % 3600"
                    f" = {h}"
                )
            )
            for r in quantile_sketch(
                sl, "value", F.col("event_id"), k=16
            ).collect():
                want[(h, r["rank"])] = (r["hash_val"], r["value"])
        assert got == want

    def test_state_bounded_by_windows_x_k(self, spark, events_dir):
        """numRowsTotal <= number of event-time windows — ONE state
        row per window, each holding a <= k-pair register array."""
        from h3_indexer_spark.streaming.events import (
            streaming_quantile_sketch,
        )

        schema = spark.read.parquet(events_dir).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )
        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_quantile_sketch(src, "value", ["event_id"], k=16),
            output_mode="update",
        )
        n_windows = (
            spark.read.parquet(events_dir)
            .where(F.col("value").isNotNull())
            .select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 3600")
            )
            .distinct()
            .count()
        )
        assert 0 < max_state <= n_windows


@pytest.fixture(scope="module")
def events_dir_timeordered(spark, events_dir):
    """The events fixture re-sliced into four CONTIGUOUS time ranges,
    written oldest-first (file sources order micro-batches by
    modification time) — the arrival pattern a watermark-driven
    operator is designed for. The shared round-robin fixture puts the
    whole 30-day span in EVERY file, so batch 1 advances the
    watermark to day 30 and drops batches 2-4 wholesale."""
    from pyspark.sql import Window

    d = tempfile.mkdtemp(prefix="h3idx_stream_ord_")
    src = spark.read.parquet(events_dir)
    w = F.ntile(4).over(
        Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    )
    sliced = src.select("*", w.alias("_slice"))
    for i in range(1, 5):
        sliced.where(F.col("_slice") == i).drop("_slice").coalesce(
            1
        ).write.mode("append").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestStreamingDrawdown:
    """streaming_drawdown: the sequential-fold twin — finalized
    prefix at the watermark, provisional open tail folded per
    emission, ONE state row total."""

    def _flows(self, df):
        # center flows so the equity curve actually dips
        return df.withColumn(
            "flow", (F.col("value") - F.lit(50.0)).cast("double")
        )

    @staticmethod
    def _final(rows):
        # the last batch maximizes both monotone counters
        return max(
            rows, key=lambda r: (r["n_finalized"], r["n_periods"])
        )

    def test_full_replay_matches_batch(self, spark, events_dir_timeordered):
        from h3_indexer_spark.operators.analytics import max_drawdown
        from h3_indexer_spark.streaming.events import streaming_drawdown

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._flows(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_drawdown(src, value_col="flow"),
            output_mode="update",
        )
        rows = out.collect()  # arrival order: later emission wins
        assert rows, "stream produced no emissions"
        final = self._final(rows)

        batch = self._flows(
            spark.read.parquet(events_dir_timeordered)
        ).select(
            F.window("ts", "1 hour").getField("start")
            .cast("long").alias("d"),
            "flow",
        )
        want = max_drawdown(batch, "d", "flow").collect()[0]
        assert final["n_periods"] == want["n_periods"]
        assert final["peak_equity"] == pytest.approx(
            want["peak_equity"], abs=1e-9
        )
        assert final["max_drawdown"] == pytest.approx(
            want["max_drawdown"], abs=1e-9
        )
        assert final["max_drawdown_frac"] == pytest.approx(
            want["max_drawdown_frac"], abs=1e-8
        )

    def test_finalized_prefix_advances_and_periods_monotone(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.streaming.events import streaming_drawdown

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._flows(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_drawdown(src, value_col="flow"),
            output_mode="update",
        )
        rows = out.collect()
        assert len(rows) >= 2, "expected one emission per micro-batch"
        periods = [r["n_periods"] for r in rows]
        assert periods == sorted(periods), (
            "n_periods must be monotone across emissions"
        )
        # the 30-day fixture with a 2h watermark must finalize most
        # of the curve by the last batch — the split actually splits
        fin = self._final(rows)
        assert fin["n_finalized"] > 0
        assert fin["n_finalized"] <= fin["n_periods"]

    def test_state_is_one_row(self, spark, events_dir_timeordered):
        """The whole fold lives in ONE state row (finalized scalars +
        the bounded open tail) — numRowsTotal == 1 at every batch."""
        from h3_indexer_spark.streaming.events import streaming_drawdown

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._flows(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_drawdown(src, value_col="flow"),
            output_mode="update",
        )
        assert max_state == 1, max_state


class TestStreamingBarRollup:
    """streaming_bar_rollup: CHAINED stateful aggregation (hourly OHLC
    bars -> daily rollup bars in one query) — watermark propagation
    through two windowed aggregations, append mode end to end."""

    def test_closed_prefix_matches_batch_exactly(
        self, spark, events_dir_timeordered
    ):
        """Append mode emits a daily rollup only once the propagated
        watermark closes it, so the stream produces a PREFIX of the
        batch result — every emitted row must equal its batch twin
        bit for bit, the prefix must be contiguous from the first
        day, and most of the 30-day fixture must have closed."""
        from h3_indexer_spark.streaming.events import (
            streaming_bar_rollup,
        )

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_bar_rollup(src),
            output_mode="append",
        )
        got = {r["rollup_start"]: r for r in out.collect()}
        assert got, "no rollup closed — watermark never propagated"

        # the builders run identically on a batch frame (watermark is
        # a no-op): the batch composition is the oracle
        want = {
            r["rollup_start"]: r
            for r in streaming_bar_rollup(
                spark.read.parquet(events_dir_timeordered)
            ).collect()
        }
        days = sorted(want)
        # contiguous prefix from the first day
        assert sorted(got) == days[: len(got)]
        # the 2h watermark over a 30-day span closes all but the tail
        assert len(got) >= len(days) - 2
        for d, r in got.items():
            w = want[d]
            assert (
                r["n_bars"], r["open"], r["high"], r["low"],
                r["close"], r["volume"],
            ) == (
                w["n_bars"], w["open"], w["high"], w["low"],
                w["close"], w["volume"],
            ), d
            assert r["value_sum"] == pytest.approx(
                w["value_sum"], abs=1e-9
            )

    def test_state_bounded_by_structural_windows(
        self, spark, events_dir_timeordered
    ):
        """Both levels' state must track window counts (bars + rollup
        days), never traffic — the loose structural lock that catches
        a per-event state leak."""
        from h3_indexer_spark.streaming.events import (
            streaming_bar_rollup,
        )

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        _, max_state = _run_stream_max_state_rows(
            spark,
            streaming_bar_rollup(src),
            output_mode="append",
        )
        batch = spark.read.parquet(events_dir_timeordered).where(
            F.col("value").isNotNull()
        )
        n_hours = (
            batch.select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 3600")
            )
            .distinct()
            .count()
        )
        n_days = (
            batch.select(
                F.expr("unix_timestamp(ts) - unix_timestamp(ts) % 86400")
            )
            .distinct()
            .count()
        )
        n_events = batch.count()
        assert max_state <= n_hours + n_days, (
            max_state, n_hours, n_days
        )
        assert max_state < n_events


class TestRocksDBStateStore:
    """Production state-store posture: the in-memory HDFS-backed
    provider OOMs once state outgrows executor heaps; RocksDB is the
    100 TB answer. Lock that the engine's stateful operators run —
    and agree with the default provider — under RocksDB, both for a
    built-in windowed aggregation and for a custom
    applyInPandasWithState twin."""

    ROCKS = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def test_windowed_agg_matches_default_provider(
        self, spark, events_dir
    ):
        key = "spark.sql.streaming.stateStore.providerClass"
        default_rows = {
            (r["window_start"], r["event_type"]): (
                r["sum_value"], r["n_events"]
            )
            for r in _run_stream(
                spark,
                windowed_event_agg(_read_stream(spark, events_dir)),
                "complete",
            ).collect()
        }
        old = spark.conf.get(key, None)
        spark.conf.set(key, self.ROCKS)
        try:
            rocks_rows = {
                (r["window_start"], r["event_type"]): (
                    r["sum_value"], r["n_events"]
                )
                for r in _run_stream(
                    spark,
                    windowed_event_agg(
                        _read_stream(spark, events_dir)
                    ),
                    "complete",
                ).collect()
            }
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        assert rocks_rows == default_rows
        assert rocks_rows

    def test_custom_state_twin_runs_on_rocksdb(
        self, spark, events_dir_timeordered
    ):
        """applyInPandasWithState state must round-trip through the
        RocksDB provider identically — drive the drawdown twin end to
        end and compare its final emission to the default provider's."""
        from h3_indexer_spark.streaming.events import streaming_drawdown

        key = "spark.sql.streaming.stateStore.providerClass"
        schema = spark.read.parquet(events_dir_timeordered).schema

        def run_once():
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir_timeordered)
                .withColumn(
                    "flow",
                    (F.col("value") - F.lit(50.0)).cast("double"),
                )
            )
            rows = _run_stream(
                spark,
                streaming_drawdown(src, value_col="flow"),
                output_mode="update",
            ).collect()
            return max(
                rows, key=lambda r: (r["n_finalized"], r["n_periods"])
            )

        base = run_once()
        old = spark.conf.get(key, None)
        spark.conf.set(key, self.ROCKS)
        try:
            rocks = run_once()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        assert rocks == base


def test_null_event_time_rows_drop_cleanly(spark, tmp_path):
    """A single null-ts record must not kill a stateful query (the
    watermark's late filter keeps NULLs, F.window(NULL) goes null,
    and an uncast int() in state code would crash the stream) — both
    new operators drop them up front and match the batch twin over
    the surviving rows."""
    import datetime

    from h3_indexer_spark.operators.analytics import max_drawdown
    from h3_indexer_spark.streaming.events import (
        streaming_bar_rollup,
        streaming_drawdown,
    )

    base = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        (i, base + datetime.timedelta(hours=3 * i), float(v))
        for i, v in enumerate([5.0, -2.0, 7.0, -9.0, 4.0])
    ] + [(99, None, 123.0)]
    d = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, value double"
    ).coalesce(1).write.parquet(d)
    schema = spark.read.parquet(d).schema
    src = spark.readStream.schema(schema).parquet(d)

    out = _run_stream(
        spark, streaming_drawdown(src), output_mode="update"
    ).collect()
    assert out, "null-ts row killed the drawdown stream"
    final = max(out, key=lambda r: (r["n_finalized"], r["n_periods"]))
    batch = spark.read.parquet(d).where(F.col("ts").isNotNull())
    want = max_drawdown(
        batch.select(
            F.window("ts", "1 hour").getField("start")
            .cast("long").alias("d"),
            "value",
        ),
        "d",
        "value",
    ).collect()[0]
    assert final["n_periods"] == want["n_periods"]
    assert final["max_drawdown"] == pytest.approx(
        want["max_drawdown"], abs=1e-9
    )

    src2 = spark.readStream.schema(schema).parquet(d)
    rollup = _run_stream(
        spark, streaming_bar_rollup(src2), output_mode="append"
    )
    # single batch: nothing closes, but the query must COMPLETE and
    # hold no poisoned null-window state (the crash/leak regression)
    assert rollup.count() >= 0


class TestStreamingClassReport:
    """streaming_class_report: per-window confusion-matrix monitor —
    availableNow replay must equal the batch classification_report
    applied per window, and state must stay (window x class)-bounded."""

    @staticmethod
    def _scored(df):
        # deterministic pseudo-classifier over the events fixture:
        # label = the true event_type, pred = a value-threshold rule
        return df.select(
            "ts",
            F.col("event_type").alias("label"),
            F.when(F.col("value") < 50.0, F.lit("view"))
            .otherwise(F.lit("purchase"))
            .alias("pred"),
        )

    @pytest.mark.slow
    def test_full_replay_matches_batch_per_window(self, spark, events_dir):
        from h3_indexer_spark.operators.analytics import classification_report
        from h3_indexer_spark.streaming.events import streaming_class_report

        # complete mode for FULL parity: in append mode the stream's
        # final windows correctly hold back until the watermark passes
        # them (availableNow ends the stream first) — append-subset
        # correctness is asserted in test_state_is_window_class_bounded
        out = _run_stream(
            spark,
            streaming_class_report(
                self._scored(_read_stream(spark, events_dir)),
                window="1 day",
            ),
            output_mode="complete",
        )
        got = {
            (r["window_start"], r["class"]): (
                r["n_true"], r["n_pred"], r["tp"], r["fp"], r["fn"],
                r["precision"], r["recall"], r["f1"],
            )
            for r in out.collect()
        }

        batch = self._scored(spark.read.parquet(events_dir))
        want = {}
        for w in (
            batch.select(F.window("ts", "1 day").alias("w"))
            .select("w.start").distinct().collect()
        ):
            start = w["start"]
            sliced = batch.where(
                F.window("ts", "1 day").getField("start") == F.lit(start)
            )
            for r in classification_report(sliced, "label", "pred").collect():
                want[(start, r["class"])] = (
                    r["n_true"], r["n_pred"], r["tp"], r["fp"], r["fn"],
                    r["precision"], r["recall"], r["f1"],
                )
        assert got == want and got

    @pytest.mark.slow
    def test_state_is_window_class_bounded(self, spark, events_dir):
        """numRowsTotal after the replay must be <= open windows x
        class vocabulary — structural bound, not traffic (the
        test_streaming state-bound pattern)."""
        import uuid as _uuid

        from h3_indexer_spark.streaming.events import streaming_class_report

        name = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (
            streaming_class_report(
                self._scored(_read_stream(spark, events_dir)),
                window="1 day",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        progress = q.lastProgress
        batch = self._scored(spark.read.parquet(events_dir))
        n_windows = (
            batch.select(F.window("ts", "1 day").alias("w"))
            .select("w.start").distinct().count()
        )
        n_classes = (
            batch.select(F.col("label").alias("c"))
            .unionByName(batch.select(F.col("pred").alias("c")))
            .distinct().count()
        )
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (progress or {}).get("stateOperators", [])
        )
        assert state_rows <= n_windows * n_classes, (
            state_rows, n_windows, n_classes
        )
        # append-mode subset parity: every row that DID emit (windows
        # the watermark closed) must equal the batch readout exactly
        from h3_indexer_spark.operators.analytics import (
            classification_report,
        )

        emitted = spark.table(name).collect()
        assert emitted, "append replay emitted no closed windows"
        for r in emitted:
            sliced = batch.where(
                F.window("ts", "1 day").getField("start")
                == F.lit(r["window_start"])
            )
            b = {
                row["class"]: row
                for row in classification_report(
                    sliced, "label", "pred"
                ).collect()
            }[r["class"]]
            assert (
                r["n_true"], r["n_pred"], r["tp"], r["fp"], r["fn"],
                r["precision"], r["recall"], r["f1"],
            ) == (
                b["n_true"], b["n_pred"], b["tp"], b["fp"], b["fn"],
                b["precision"], b["recall"], b["f1"],
            ), r["window_start"]

    def test_null_rows_drop(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_class_report

        src = _read_stream(spark, events_dir).select(
            "ts",
            F.lit(None).cast("string").alias("label"),
            F.lit("x").alias("pred"),
        )
        out = _run_stream(
            spark,
            streaming_class_report(src, window="1 day"),
            output_mode="append",
        )
        assert out.count() == 0


class TestStreamingKAnonymity:
    """streaming_k_anonymity: per-window quasi-identifier violation
    histogram via CHAINED stateful aggregation — replay parity with
    the batch k_anonymity_report per window, plus state bounds."""

    QI = ["event_type"]

    @pytest.mark.slow
    def test_closed_prefix_matches_batch_per_window(
        self, spark, events_dir_timeordered
    ):
        """Chained stateful aggregations are append-only (Spark
        rejects complete mode over two stateful operators), so the
        replay yields the CLOSED-WINDOW PREFIX of the batch readout —
        every emitted row must equal the independent batch
        k_anonymity_report on that window's slice, and the 2h
        watermark over the time-ordered multi-batch source must have
        closed most windows (the bar_rollup test pattern)."""
        from h3_indexer_spark.operators.curation import k_anonymity_report
        from h3_indexer_spark.streaming.events import streaming_k_anonymity

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_k_anonymity(
                src, quasi_cols=self.QI, window="6 hours", k=400
            ),
            output_mode="append",
        )
        got = {
            (r["window_start"], r["group_size"]): (r["n_groups"], r["n_rows"])
            for r in out.collect()
        }
        assert got, "no window closed — watermark never propagated"

        batch = spark.read.parquet(events_dir_timeordered)
        want = {}
        for w in (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().collect()
        ):
            start = w["start"]
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start") == F.lit(start)
            )
            for r in k_anonymity_report(sliced, self.QI, k=400).collect():
                want[(start, r["group_size"])] = (r["n_groups"], r["n_rows"])
        # every emitted row equals its batch twin
        for key, v in got.items():
            assert want[key] == v, key
        # the closed prefix covers all but the watermark tail
        open_windows = {w for (w, _s) in want} - {w for (w, _s) in got}
        assert len(open_windows) <= 2, sorted(open_windows)

    @pytest.mark.slow
    def test_append_subset_and_state_bounds(self, spark, events_dir):
        import uuid as _uuid

        from h3_indexer_spark.operators.curation import k_anonymity_report
        from h3_indexer_spark.streaming.events import streaming_k_anonymity

        name = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (
            streaming_k_anonymity(
                _read_stream(spark, events_dir),
                quasi_cols=self.QI,
                window="6 hours",
                k=400,
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        batch = spark.read.parquet(events_dir)
        # structural state bound: level 1 <= windows x QI classes,
        # level 2 <= windows x (k-1) sizes
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        n_classes = batch.select(*self.QI).distinct().count()
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        assert state_rows <= n_windows * (n_classes + 399), (
            state_rows, n_windows, n_classes
        )
        # append-subset parity: every emitted (closed) window row
        # equals the batch readout
        for r in spark.table(name).collect():
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start")
                == F.lit(r["window_start"])
            )
            b = {
                row["group_size"]: (row["n_groups"], row["n_rows"])
                for row in k_anonymity_report(
                    sliced, self.QI, k=400
                ).collect()
            }
            assert b[r["group_size"]] == (r["n_groups"], r["n_rows"])

    def test_rejects_bad_args(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_k_anonymity

        src = _read_stream(spark, events_dir)
        with pytest.raises(ValueError):
            streaming_k_anonymity(src, quasi_cols=["event_type"], k=1)
        with pytest.raises(ValueError):
            streaming_k_anonymity(src, quasi_cols=[])


class TestRocksDBRound10Twins:
    """RocksDB provider parity for the round-10 twins: the chained
    k-anonymity monitor (two stateful operators in one query — the
    state-store shape production privacy gates will run) and the
    class-report monitor."""

    ROCKS = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    KEY = "spark.sql.streaming.stateStore.providerClass"

    def _with_provider(self, spark, provider, fn):
        old = spark.conf.get(self.KEY, None)
        if provider is None:
            spark.conf.unset(self.KEY)
        else:
            spark.conf.set(self.KEY, provider)
        try:
            return fn()
        finally:
            if old is None:
                spark.conf.unset(self.KEY)
            else:
                spark.conf.set(self.KEY, old)

    def test_k_anonymity_chain_matches_default_provider(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.streaming.events import streaming_k_anonymity

        schema = spark.read.parquet(events_dir_timeordered).schema

        def run_once():
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir_timeordered)
            )
            return {
                (r["window_start"], r["group_size"]): (
                    r["n_groups"], r["n_rows"]
                )
                for r in _run_stream(
                    spark,
                    streaming_k_anonymity(
                        src, quasi_cols=["event_type"],
                        window="6 hours", k=400,
                    ),
                    output_mode="append",
                ).collect()
            }

        default_rows = self._with_provider(spark, None, run_once)
        rocks_rows = self._with_provider(spark, self.ROCKS, run_once)
        assert rocks_rows == default_rows and rocks_rows

    def test_class_report_matches_default_provider(
        self, spark, events_dir
    ):
        from h3_indexer_spark.streaming.events import streaming_class_report

        def run_once():
            src = _read_stream(spark, events_dir).select(
                "ts",
                F.col("event_type").alias("label"),
                F.when(F.col("value") < 50.0, F.lit("view"))
                .otherwise(F.lit("purchase"))
                .alias("pred"),
            )
            return {
                (r["window_start"], r["class"]): (
                    r["tp"], r["fp"], r["fn"], r["f1"]
                )
                for r in _run_stream(
                    spark,
                    streaming_class_report(src, window="1 day"),
                    output_mode="complete",
                ).collect()
            }

        default_rows = self._with_provider(spark, None, run_once)
        rocks_rows = self._with_provider(spark, self.ROCKS, run_once)
        assert rocks_rows == default_rows and rocks_rows


class TestStreamingSuppressSmallGroups:
    """streaming_suppress_small_groups: the ENFORCEMENT half of the
    privacy gate as a foreachBatch sink — closed windows publish only
    rows whose quasi-class reached k, matching the batch
    suppress_small_groups applied per window."""

    QI = ["event_type"]

    def _median_class_k(self, spark, events_dir):
        """A k that splits the per-(window, class) size distribution,
        so closed windows contain BOTH kept and suppressed classes."""
        batch = spark.read.parquet(events_dir)
        sizes = sorted(
            r["n"]
            for r in batch.groupBy(
                F.window("ts", "6 hours").alias("w"), *self.QI
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return max(2, sizes[len(sizes) // 2])

    @pytest.mark.slow
    def test_closed_windows_match_batch_suppression(
        self, spark, events_dir_timeordered, tmp_path
    ):
        from h3_indexer_spark.operators.curation import (
            suppress_small_groups,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_suppress_small_groups,
        )

        k = self._median_class_k(spark, events_dir_timeordered)
        out = str(tmp_path / "kept")
        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        q = streaming_suppress_small_groups(
            src,
            self.QI,
            staged_events_path=events_dir_timeordered,
            out_path=out,
            checkpoint=str(tmp_path / "ckpt"),
            k=k,
            window="6 hours",
            trigger_available_now=True,
        )
        q.awaitTermination(180)
        got = spark.read.parquet(out)
        closed = [
            r["window_start"]
            for r in got.select("window_start").distinct().collect()
        ]
        assert closed, "no window closed — watermark never propagated"
        batch = spark.read.parquet(events_dir_timeordered)
        total_closed = 0
        for start in closed:
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start")
                == F.lit(start)
            )
            want = sorted(
                r["event_id"]
                for r in suppress_small_groups(
                    sliced, self.QI, k=k
                ).collect()
            )
            have = sorted(
                r["event_id"]
                for r in got.where(
                    F.col("window_start") == F.lit(start)
                ).collect()
            )
            assert have == want, start
            total_closed += sliced.count()
        # the median-k choice guarantees genuine suppression happened
        assert 0 < got.count() < total_closed

    @pytest.mark.slow
    def test_live_staging_query_is_drained_before_publish(
        self, spark, events_dir_timeordered, tmp_path
    ):
        """ADVICE r11: with a LIVE staging stream, each publish must
        drain it first — otherwise a closed window's keep-list can
        fire before its rows are staged and publish a partial
        partition permanently. The staging stream here trickles one
        file per trigger, so without the drain the first closed
        window would race it."""
        from h3_indexer_spark.operators.curation import (
            suppress_small_groups,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_suppress_small_groups,
        )

        k = self._median_class_k(spark, events_dir_timeordered)
        staging = str(tmp_path / "staging")
        out = str(tmp_path / "kept")
        schema = spark.read.parquet(events_dir_timeordered).schema
        stage_q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
            .writeStream.format("parquet")
            .option("path", staging)
            .option("checkpointLocation", str(tmp_path / "ckpt_stage"))
            .start()
        )
        try:
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir_timeordered)
            )
            q = streaming_suppress_small_groups(
                src,
                self.QI,
                staged_events_path=staging,
                out_path=out,
                checkpoint=str(tmp_path / "ckpt"),
                k=k,
                window="6 hours",
                trigger_available_now=True,
                staging_query=stage_q,
            )
            q.awaitTermination(180)
        finally:
            stage_q.stop()
        got = spark.read.parquet(out)
        closed = [
            r["window_start"]
            for r in got.select("window_start").distinct().collect()
        ]
        assert closed, "no window closed"
        batch = spark.read.parquet(events_dir_timeordered)
        for start in closed:
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start")
                == F.lit(start)
            )
            want = sorted(
                r["event_id"]
                for r in suppress_small_groups(
                    sliced, self.QI, k=k
                ).collect()
            )
            have = sorted(
                r["event_id"]
                for r in got.where(
                    F.col("window_start") == F.lit(start)
                ).collect()
            )
            assert have == want, start

    def test_missing_staging_path_raises_contract_error(
        self, spark, events_dir_timeordered, tmp_path
    ):
        """ADVICE r11: without a staging_query, a missing staging
        path must kill the query with the ordering contract spelled
        out (loud + checkpoint-recoverable), not publish nothing."""
        from pyspark.errors import StreamingQueryException

        from h3_indexer_spark.streaming.events import (
            streaming_suppress_small_groups,
        )

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        q = streaming_suppress_small_groups(
            src,
            self.QI,
            staged_events_path=str(tmp_path / "never_written"),
            out_path=str(tmp_path / "kept"),
            checkpoint=str(tmp_path / "ckpt"),
            k=2,
            window="6 hours",
            trigger_available_now=True,
        )
        with pytest.raises(StreamingQueryException) as exc:
            q.awaitTermination(180)
            if q.exception() is not None:
                raise q.exception()
        assert "staging" in str(exc.value).lower()

    def test_state_bound_and_rejects_bad_args(
        self, spark, events_dir, tmp_path
    ):
        from h3_indexer_spark.streaming.events import (
            streaming_suppress_small_groups,
        )

        src = _read_stream(spark, events_dir)
        q = streaming_suppress_small_groups(
            src,
            self.QI,
            staged_events_path=events_dir,
            out_path=str(tmp_path / "kept"),
            checkpoint=str(tmp_path / "ckpt"),
            k=400,
            window="6 hours",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        batch = spark.read.parquet(events_dir)
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        n_classes = batch.select(*self.QI).distinct().count()
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        # ONE stateful operator: a row per (open window, quasi-class)
        assert state_rows <= n_windows * n_classes, (
            state_rows, n_windows, n_classes
        )
        with pytest.raises(ValueError):
            streaming_suppress_small_groups(
                src, self.QI, "x", "y", "z", k=1
            )
        with pytest.raises(ValueError):
            streaming_suppress_small_groups(src, [], "x", "y", "z")


class TestStreamingLDiversity:
    """streaming_l_diversity: per-window distinct l-diversity
    violation histogram via TRIPLE-chained stateful aggregation —
    replay parity with the batch l_diversity_report per window, plus
    state bounds."""

    QI = ["event_type"]
    SENS = "user_id"
    L = 10

    @pytest.mark.slow
    def test_closed_prefix_matches_batch_per_window(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.operators.curation import l_diversity_report
        from h3_indexer_spark.streaming.events import streaming_l_diversity

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_l_diversity(
                src, self.QI, self.SENS, window="6 hours", l_min=self.L
            ),
            output_mode="append",
        )
        got = {
            (r["window_start"], r["n_distinct_sensitive"]):
                (r["n_groups"], r["n_rows"])
            for r in out.collect()
        }
        assert got, "no window closed — watermark never propagated"
        batch = spark.read.parquet(events_dir_timeordered)
        want = {}
        for w in (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().collect()
        ):
            start = w["start"]
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start") == F.lit(start)
            )
            for r in l_diversity_report(
                sliced, self.QI, self.SENS, l_min=self.L
            ).collect():
                want[(start, r["n_distinct_sensitive"])] = (
                    r["n_groups"], r["n_rows"],
                )
        for key, v in got.items():
            assert want[key] == v, key
        open_windows = {w for (w, _d) in want} - {w for (w, _d) in got}
        assert len(open_windows) <= 2, sorted(open_windows)

    def test_state_bounds_and_null_sensitive_convention(
        self, spark, events_dir
    ):
        import uuid as _uuid

        from h3_indexer_spark.streaming.events import streaming_l_diversity

        # null out one type's sensitive column: its classes must
        # surface as d=0 (all-NULL = maximally homogeneous), matching
        # the batch count_distinct-skips-NULLs convention
        schema = spark.read.parquet(events_dir).schema
        src = (
            spark.readStream.schema(schema)
            .parquet(events_dir)
            .withColumn(
                "user_id",
                F.when(
                    F.col("event_type") == "view", F.col("user_id")
                ),
            )
        )
        name = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (
            streaming_l_diversity(
                src, self.QI, self.SENS, window="6 hours", l_min=self.L
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        batch = spark.read.parquet(events_dir)
        rows = spark.table(name).collect()
        # every non-'view' class carries user_id NULL -> d = 0 rows
        # must exist (those classes are never 10-diverse)
        assert any(r["n_distinct_sensitive"] == 0 for r in rows)
        # structural state bound: level 1 <= windows x classes x
        # (sensitive values + 1 for the NULL triple), level 2 <=
        # windows x classes, level 3 <= windows x (l_min - 1)
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        n_classes = batch.select(*self.QI).distinct().count()
        n_sens = batch.select(self.SENS).distinct().count() + 1
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        bound = n_windows * (
            n_classes * n_sens + n_classes + (self.L - 1)
        )
        assert state_rows <= bound, (state_rows, bound)

    def test_rejects_bad_args(self, spark, events_dir):
        from h3_indexer_spark.streaming.events import streaming_l_diversity

        src = _read_stream(spark, events_dir)
        with pytest.raises(ValueError):
            streaming_l_diversity(src, ["event_type"], "user_id", l_min=1)
        with pytest.raises(ValueError):
            streaming_l_diversity(src, [], "user_id")


class TestRocksDBRound11Twins:
    """RocksDB provider parity for the round-11 twins: the
    triple-chained l-diversity monitor (three stateful operators in
    one query — one deeper than the k-anonymity chain) and the
    suppression sink's driving aggregation."""

    ROCKS = TestRocksDBRound10Twins.ROCKS
    KEY = TestRocksDBRound10Twins.KEY

    def _with_provider(self, spark, provider, fn):
        return TestRocksDBRound10Twins._with_provider(
            self, spark, provider, fn
        )

    def test_l_diversity_chain_matches_default_provider(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.streaming.events import streaming_l_diversity

        schema = spark.read.parquet(events_dir_timeordered).schema

        def run_once():
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir_timeordered)
            )
            return {
                (r["window_start"], r["n_distinct_sensitive"]): (
                    r["n_groups"], r["n_rows"]
                )
                for r in _run_stream(
                    spark,
                    streaming_l_diversity(
                        src, ["event_type"], "user_id",
                        window="6 hours", l_min=10,
                    ),
                    output_mode="append",
                ).collect()
            }

        default_rows = self._with_provider(spark, None, run_once)
        rocks_rows = self._with_provider(spark, self.ROCKS, run_once)
        assert rocks_rows == default_rows and rocks_rows

    @pytest.mark.slow
    def test_suppression_sink_matches_default_provider(
        self, spark, events_dir_timeordered, tmp_path
    ):
        from h3_indexer_spark.streaming.events import (
            streaming_suppress_small_groups,
        )

        schema = spark.read.parquet(events_dir_timeordered).schema
        batch = spark.read.parquet(events_dir_timeordered)
        sizes = sorted(
            r["n"]
            for r in batch.groupBy(
                F.window("ts", "6 hours").alias("w"), "event_type"
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        )
        k = max(2, sizes[len(sizes) // 2])

        def run_once(tag):
            out = str(tmp_path / f"kept_{tag}")
            src = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_dir_timeordered)
            )
            q = streaming_suppress_small_groups(
                src, ["event_type"],
                staged_events_path=events_dir_timeordered,
                out_path=out,
                checkpoint=str(tmp_path / f"ckpt_{tag}"),
                k=k, window="6 hours",
                trigger_available_now=True,
            )
            q.awaitTermination(180)
            return sorted(
                r["event_id"] for r in spark.read.parquet(out).collect()
            )

        default_rows = self._with_provider(
            spark, None, lambda: run_once("d")
        )
        rocks_rows = self._with_provider(
            spark, self.ROCKS, lambda: run_once("r")
        )
        assert rocks_rows == default_rows and rocks_rows


class TestStreamingFisherExact:
    """streaming_fisher_exact: per-window grouped exact independence
    test — one stateful aggregation of four BIGINT partials, the
    whole readout stateless (shared fisher_readout back end), so
    closed windows must equal batch fisher_exact bit-for-bit."""

    def _prepared(self, df):
        return df.select(
            "ts",
            "event_type",
            (F.col("value") > 50.0).alias("a"),
            (F.col("user_id") % 2 == 0).alias("b"),
        )

    @pytest.mark.slow
    def test_closed_prefix_matches_batch_per_window(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.operators.analytics import fisher_exact
        from h3_indexer_spark.streaming.events import streaming_fisher_exact

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._prepared(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_fisher_exact(
                src, ["event_type"], "a", "b", window="6 hours"
            ),
            output_mode="append",
        )
        got = {
            (r["window_start"], r["event_type"]):
                (r["n"], r["n11"], r["p_num"], r["p_den"], r["p_value"],
                 r["odds_ratio"])
            for r in out.collect()
        }
        assert got, "no window closed — watermark never propagated"
        # at least one closed group is inside the exact domain and
        # carries a real p-value
        assert any(v[4] is not None for v in got.values())
        batch = self._prepared(
            spark.read.parquet(events_dir_timeordered)
        )
        want = {}
        for w in (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().collect()
        ):
            start = w["start"]
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start") == F.lit(start)
            )
            for r in fisher_exact(
                sliced, ["event_type"], "a", "b"
            ).collect():
                want[(start, r["event_type"])] = (
                    r["n"], r["n11"], r["p_num"], r["p_den"],
                    r["p_value"], r["odds_ratio"],
                )
        for key, v in got.items():
            assert want[key] == v, key
        open_windows = {w for (w, _g) in want} - {w for (w, _g) in got}
        assert len(open_windows) <= 2, sorted(open_windows)

    def test_state_is_partials_only_and_rejects_bad_args(
        self, spark, events_dir
    ):
        import uuid as _uuid

        from h3_indexer_spark.streaming.events import streaming_fisher_exact

        name = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (
            streaming_fisher_exact(
                self._prepared(_read_stream(spark, events_dir)),
                ["event_type"], "a", "b", window="6 hours",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        batch = spark.read.parquet(events_dir)
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        n_groups = batch.select("event_type").distinct().count()
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        # ONE stateful op, one partials row per (open window, group) —
        # the k-loop folds never touch state
        assert state_rows <= n_windows * n_groups, (
            state_rows, n_windows, n_groups
        )
        with pytest.raises(ValueError):
            streaming_fisher_exact(
                self._prepared(_read_stream(spark, events_dir)),
                [], "a", "b",
            )


class TestStreamingClassReportSummary:
    """streaming_class_report_summary: per-window macro/micro/weighted
    block via chained stateful aggregation over the SHARED batch
    cores — closed windows must equal batch classification_summary
    exactly (identical quantized inputs, identical pinned fold
    order)."""

    def _prepared(self, df):
        return df.select(
            "ts",
            F.col("event_type").alias("label"),
            F.when(F.col("value") < 50.0, F.lit("view"))
            .otherwise(F.lit("purchase"))
            .alias("pred"),
        )

    @pytest.mark.slow
    def test_closed_prefix_matches_batch_per_window(
        self, spark, events_dir_timeordered
    ):
        from h3_indexer_spark.operators.analytics import (
            classification_summary,
        )
        from h3_indexer_spark.streaming.events import (
            streaming_class_report_summary,
        )

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._prepared(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = _run_stream(
            spark,
            streaming_class_report_summary(src, window="6 hours"),
            output_mode="append",
        )
        got = {
            (r["window_start"], r["avg_mode"]): (
                r["n_classes"], r["support"],
                r["precision"], r["recall"], r["f1"],
            )
            for r in out.collect()
        }
        assert got, "no window closed — watermark never propagated"
        batch = self._prepared(spark.read.parquet(events_dir_timeordered))
        want = {}
        for w in (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().collect()
        ):
            start = w["start"]
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start") == F.lit(start)
            )
            for r in classification_summary(
                sliced, "label", "pred"
            ).collect():
                want[(start, r["avg_mode"])] = (
                    r["n_classes"], r["support"],
                    r["precision"], r["recall"], r["f1"],
                )
        for key, v in got.items():
            assert want[key] == v, key
        # closed windows emit all 3 averaging modes together
        by_window = {}
        for (w, mode) in got:
            by_window.setdefault(w, set()).add(mode)
        assert all(
            modes == {"macro", "micro", "weighted"}
            for modes in by_window.values()
        )
        open_windows = {w for (w, _m) in want} - {w for (w, _m) in got}
        assert len(open_windows) <= 2 * 3, sorted(open_windows)

    def test_state_bounds(self, spark, events_dir):
        import uuid as _uuid

        from h3_indexer_spark.streaming.events import (
            streaming_class_report_summary,
        )

        name = f"mem_{_uuid.uuid4().hex[:8]}"
        q = (
            streaming_class_report_summary(
                self._prepared(_read_stream(spark, events_dir)),
                window="6 hours",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        batch = spark.read.parquet(events_dir)
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        # classes = label vocab (event types) U pred vocab (2)
        n_classes = batch.select("event_type").distinct().count() + 2
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        # level 1 <= windows x classes; level 2 <= windows
        assert state_rows <= n_windows * (n_classes + 1), (
            state_rows, n_windows, n_classes
        )


class TestStreamingTCloseness:
    """streaming_t_closeness: per-window ordered-EMD skew histogram
    through the shared batch core (t_closeness_pairs census in append
    mode -> t_closeness_readout in foreachBatch) — replay parity with
    the batch t_closeness_report per window, plus state bounds and
    idempotent republish."""

    QI = ["event_type"]
    SENS = "user_id"
    T = 0.02

    def _sens_banded(self, df):
        # a small ordered sensitive vocabulary (user id mod 7), so the
        # EMD fold runs over a bounded category set like a real
        # sensitive attribute would
        return df.withColumn(
            "band", (F.col("user_id") % F.lit(7)).cast("bigint")
        )

    @pytest.mark.slow
    def test_closed_windows_match_batch_per_window(
        self, spark, events_dir_timeordered, tmp_path
    ):
        from h3_indexer_spark.operators.curation import t_closeness_report
        from h3_indexer_spark.streaming.events import streaming_t_closeness

        schema = spark.read.parquet(events_dir_timeordered).schema
        src = self._sens_banded(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir_timeordered)
        )
        out = str(tmp_path / "hist")
        q = streaming_t_closeness(
            src,
            self.QI,
            "band",
            out_path=out,
            checkpoint=str(tmp_path / "ckpt"),
            t_max=self.T,
            window="6 hours",
            trigger_available_now=True,
        )
        q.awaitTermination(180)
        got_df = spark.read.parquet(out)
        got = {
            (r["window_start"], r["t_bucket"]): (
                r["n_groups"], r["n_rows"], r["min_emd"], r["max_emd"],
            )
            for r in got_df.collect()
        }
        assert got, "no window closed — watermark never propagated"
        batch = self._sens_banded(
            spark.read.parquet(events_dir_timeordered)
        )
        closed = {w for (w, _b) in got}
        for start in closed:
            sliced = batch.where(
                F.window("ts", "6 hours").getField("start")
                == F.lit(start)
            )
            want = {
                r["t_bucket"]: (
                    r["n_groups"], r["n_rows"],
                    r["min_emd"], r["max_emd"],
                )
                for r in t_closeness_report(
                    sliced, self.QI, "band",
                    t_max=self.T, n_buckets=20,
                ).collect()
            }
            have = {
                b: v for (w, b), v in got.items() if w == start
            }
            assert have == want, start

    def test_state_bound_and_rejects_bad_args(
        self, spark, events_dir, tmp_path
    ):
        from h3_indexer_spark.streaming.events import streaming_t_closeness

        src = self._sens_banded(_read_stream(spark, events_dir))
        q = streaming_t_closeness(
            src,
            self.QI,
            "band",
            out_path=str(tmp_path / "hist"),
            checkpoint=str(tmp_path / "ckpt"),
            t_max=self.T,
            window="6 hours",
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        batch = self._sens_banded(spark.read.parquet(events_dir))
        n_windows = (
            batch.select(F.window("ts", "6 hours").alias("w"))
            .select("w.start").distinct().count()
        )
        n_cells = (
            batch.select(*self.QI, "band").distinct().count()
        )
        state_rows = sum(
            op.get("numRowsTotal", 0)
            for op in (q.lastProgress or {}).get("stateOperators", [])
        )
        # ONE stateful operator: a row per (open window, class, value)
        assert state_rows <= n_windows * n_cells, (
            state_rows, n_windows, n_cells
        )
        with pytest.raises(ValueError):
            streaming_t_closeness(src, [], "band", "x", "y")
        with pytest.raises(ValueError):
            streaming_t_closeness(src, self.QI, "band", "x", "y",
                                  t_max=1.5)
        with pytest.raises(ValueError):
            streaming_t_closeness(src, self.QI, "band", "x", "y",
                                  n_buckets=0)
