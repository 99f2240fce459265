"""Structured Streaming: file-source ingest, watermarked windows, stateful
sessionization. Every stream runs with trigger(availableNow=True) against a
closed input and is compared to the batch equivalent on the same data —
the transformations are identical code paths, so stream == batch is the
correctness contract.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from op_etl_spark.session import read_events
from op_etl_spark.streaming import ingest, stateful, windows
from op_etl_spark.suite.relational import sessionize_events, tumbling_hourly_events

SF_DIR = "/root/testdata/sf0.001"


def _write_event_json_files(spark, tmpdir, n_files=4) -> None:
    """events table -> n_files JSONL files split by time order (so later
    files hold later events — the arrival pattern a stream would see)."""
    ev = read_events(spark, SF_DIR).orderBy("ts", "event_id")
    rows = ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id",
        "event_type",
        "value",
    ).collect()
    per = (len(rows) + n_files - 1) // n_files
    base = time.time() - n_files * 10
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        path = f"{tmpdir}/events_{i:03d}.json"
        with open(path, "w") as f:
            for r in chunk:
                f.write(json.dumps(r.asDict()) + "\n")
        # strictly increasing mtimes: Spark's FileStreamSource orders
        # pending files by modification time, and four files written
        # back-to-back can TIE at fs timestamp granularity — the
        # tie-break then follows directory listing order, which is
        # OS-dependent, and a later-time file processed first splits
        # cross-file sessions differently (flaky session numbering).
        os.utime(path, (base + i * 10, base + i * 10))


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("event_stream")
    _write_event_json_files(spark, str(d))
    return str(d)


def _read_event_stream(spark, path, max_files=None):
    reader = spark.readStream.schema(
        "event_id bigint, ts string, user_id bigint, event_type string, value double"
    )
    if max_files:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    return (
        reader.json(path)
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )


def _run_to_memory(df, name, output_mode, max_sec=120):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(max_sec)
    return q


class TestWindowedAggs:
    def test_tumbling_hourly_matches_batch(self, spark, event_stream_dir):
        ev = _read_event_stream(spark, event_stream_dir)
        agg = windows.hourly_event_rollup(ev)
        _run_to_memory(agg, "hourly_stream", "complete")
        got = {
            (r.hour_start, r.event_type): (r.n, r.total_value)
            for r in spark.table("hourly_stream").collect()
        }
        want = {
            (r.hour_start, r.event_type): (r.n, r.total_value)
            for r in tumbling_hourly_events(spark, SF_DIR).collect()
        }
        assert got == want

    def test_sliding_rate_windows_cover_all_events(self, spark, event_stream_dir):
        ev = _read_event_stream(spark, event_stream_dir)
        agg = windows.sliding_event_rate(ev, window="30 minutes", slide="10 minutes")
        _run_to_memory(agg, "sliding_stream", "complete")
        rows = spark.table("sliding_stream").collect()
        n_total = read_events(spark, SF_DIR).count()
        # every event lands in exactly window/slide = 3 windows
        assert sum(r.n_events for r in rows) == 3 * n_total
        assert all(r.win_start < r.win_end for r in rows)

    def test_session_window_rollup_matches_batch_run(self, spark, event_stream_dir):
        ev = _read_event_stream(spark, event_stream_dir)
        agg = windows.session_window_rollup(ev, gap="30 minutes")
        _run_to_memory(agg, "sess_win_stream", "complete")
        got = sorted(
            (r.user_id, r.session_start, r.n_events)
            for r in spark.table("sess_win_stream").collect()
        )
        batch = windows.session_window_rollup(read_events(spark, SF_DIR))
        want = sorted(
            (r.user_id, r.session_start, r.n_events) for r in batch.collect()
        )
        assert got == want
        assert sum(n for _, _, n in got) == read_events(spark, SF_DIR).count()


class TestStatefulSessionize:
    def test_matches_batch_sessionization_across_microbatches(
        self, spark, event_stream_dir
    ):
        # one file per micro-batch -> state must carry across batches
        ev = _read_event_stream(spark, event_stream_dir, max_files=1)
        sess = stateful.sessionize_stream(ev)
        _run_to_memory(sess, "sessions_stream", "update")
        # update mode re-emits growing sessions; last emit per key is final
        final = {}
        for r in spark.table("sessions_stream").collect():
            key = (r.user_id, r.session_id)
            prev = final.get(key)
            if prev is None or r.n_events > prev[0]:
                final[key] = (r.n_events, r.session_start)
        got = {
            (u, s): v for (u, s), v in final.items()
        }
        want = {
            (r.user_id, r.session_id): (r.n_events, r.session_start)
            for r in sessionize_events(spark, SF_DIR).collect()
        }
        assert got == want


class TestStreamingDedup:
    def test_duplicates_across_microbatches_dropped(self, spark, tmp_path):
        # duplicate event_ids spread across two files/micro-batches
        rows_a = [
            {"event_id": 1, "ts": "2024-01-01 10:00:00.000000", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 10:01:00.000000", "user_id": 1, "event_type": "view", "value": 2.0},
        ]
        rows_b = [
            {"event_id": 2, "ts": "2024-01-01 10:01:00.000000", "user_id": 1, "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-01 10:02:00.000000", "user_id": 1, "event_type": "click", "value": 3.0},
        ]
        d = tmp_path / "dup_stream"
        d.mkdir()
        for i, rows in enumerate([rows_a, rows_b]):
            with open(d / f"f{i}.json", "w") as f:
                for r in rows:
                    f.write(json.dumps(r) + "\n")

        from op_etl_spark.streaming.dedup import dedup_events_stream

        ev = _read_event_stream(spark, str(d), max_files=1)
        out = dedup_events_stream(ev, keys=["event_id"], watermark="1 hour")
        _run_to_memory(out, "dedup_stream", "append")
        got = sorted(r.event_id for r in spark.table("dedup_stream").collect())
        assert got == [1, 2, 3]

    def test_batch_fallback_plain_dedup(self, spark):
        from op_etl_spark.streaming.dedup import dedup_events_stream

        ev = read_events(spark, SF_DIR)
        doubled = ev.unionByName(ev)
        assert dedup_events_stream(doubled).count() == ev.count()


class TestFileIngest:
    GEOJSON = {
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": "EPSG:3006"}},
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [410000.0, 6580000.0]},
                "properties": {"name": "a", "kind": 1},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[410000.0, 6580000.0], [411000.0, 6581000.0]],
                },
                "properties": {"name": "b"},
            },
        ],
    }

    def test_stream_staging_matches_batch_connector(self, spark, tmp_path):
        downloads = tmp_path / "downloads"
        downloads.mkdir()
        (downloads / "roads.geojson").write_text(json.dumps(self.GEOJSON))
        staging = str(tmp_path / "staging")
        ckpt = str(tmp_path / "ckpt")

        feats = ingest.stream_feature_files(spark, str(downloads), authority="TEST")
        q = ingest.start_staging_stream(feats, staging, ckpt, available_now=True)
        q.awaitTermination(120)

        out = spark.read.parquet(staging).orderBy("feature_id").collect()
        assert len(out) == 2
        assert [r.geom_type for r in out] == ["Point", "LineString"]
        assert all(r.crs == 3006 for r in out)
        assert all(r.authority == "TEST" for r in out)
        assert out[0].source_name == "roads"
        assert out[0].props["name"] == "a" and out[0].props["kind"] == "1"
        assert out[0].bbox.xmin == 410000.0

        # batch connector on the same file -> identical canonical rows
        from op_etl_spark.sources.geojson import read_feature_files

        batch = read_feature_files(
            spark,
            [{"path": str(downloads / "roads.geojson"),
              "source_name": "roads", "authority": "TEST"}],
        ).orderBy("feature_id").collect()
        assert [(r.feature_id, r.geom_type, bytes(r.geometry)) for r in out] == [
            (r.feature_id, r.geom_type, bytes(r.geometry)) for r in batch
        ]

    def test_incremental_files_are_appended_exactly_once(self, spark, tmp_path):
        downloads = tmp_path / "dl2"
        downloads.mkdir()
        (downloads / "a.geojson").write_text(json.dumps(self.GEOJSON))
        staging = str(tmp_path / "staging2")
        ckpt = str(tmp_path / "ckpt2")

        def run_once():
            feats = ingest.stream_feature_files(spark, str(downloads))
            q = ingest.start_staging_stream(feats, staging, ckpt, available_now=True)
            q.awaitTermination(120)

        run_once()
        assert spark.read.parquet(staging).count() == 2
        # second run with no new files: nothing re-ingested (checkpoint log)
        run_once()
        assert spark.read.parquet(staging).count() == 2
        # drop a new file; only its rows are added
        (downloads / "b.geojson").write_text(json.dumps(self.GEOJSON))
        run_once()
        assert spark.read.parquet(staging).count() == 4

    def test_truncate_and_load_stream_overwrites_target(self, spark, tmp_path, event_stream_dir):
        ev = _read_event_stream(spark, event_stream_dir)
        agg = windows.hourly_event_rollup(ev)
        target = str(tmp_path / "load_target")
        q = ingest.start_truncate_and_load_stream(
            agg, target, str(tmp_path / "ckpt3"), available_now=True
        )
        q.awaitTermination(120)
        got = {
            (r.hour_start, r.event_type): (r.n, r.total_value)
            for r in spark.read.parquet(target).collect()
        }
        want = {
            (r.hour_start, r.event_type): (r.n, r.total_value)
            for r in tumbling_hourly_events(spark, SF_DIR).collect()
        }
        assert got == want


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, event_stream_dir):
        from op_etl_spark.streaming import joins

        def split(df):
            return (
                df.filter(F.col("event_type") == "click"),
                df.filter(F.col("event_type") == "purchase"),
            )

        sc, sp = split(_read_event_stream(spark, event_stream_dir, max_files=2))
        q = _run_to_memory(
            joins.attribute_purchases_to_clicks(sc, sp), "ss_join", "append"
        )
        got = {tuple(r) for r in spark.table("ss_join").collect()}

        bc, bp = split(read_events(spark, SF_DIR))
        want = {
            tuple(r)
            for r in joins.attribute_purchases_to_clicks(bc, bp).collect()
        }
        q.stop()
        assert len(want) > 0
        assert got == want

    def test_join_state_is_bounded_by_range_condition(self, spark, event_stream_dir):
        # the interval condition must let Spark expire join state: assert
        # the streaming plan carries watermarks on both sides (without
        # them Spark rejects or buffers forever)
        from op_etl_spark.streaming import joins

        s = _read_event_stream(spark, event_stream_dir)
        c = s.filter(F.col("event_type") == "click")
        p = s.filter(F.col("event_type") == "purchase")
        df = joins.attribute_purchases_to_clicks(c, p)
        assert df.isStreaming
        plan = df._jdf.queryExecution().analyzed().toString()
        assert plan.count("EventTimeWatermark") == 2


class TestLateDataDrop:
    def test_events_later_than_watermark_are_dropped(self, spark, tmp_path):
        """Feed two micro-batches where the second's events are older than
        (max event time - watermark): the windowed aggregate must NOT
        count them — the state for their window already closed."""
        import json as _json

        d = tmp_path / "late"
        d.mkdir()
        on_time = [
            {"event_id": 1, "ts": "2024-01-01 10:05:00.000000", "user_id": 1,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01 13:00:00.000000", "user_id": 1,
             "event_type": "click", "value": 1.0},
        ]
        late = [
            # 10:xx window, but watermark has advanced to 13:00 - 2h = 11:00
            {"event_id": 3, "ts": "2024-01-01 10:10:00.000000", "user_id": 1,
             "event_type": "click", "value": 1.0},
        ]
        with open(d / "b0.json", "w") as f:
            for r in on_time:
                f.write(_json.dumps(r) + "\n")

        from op_etl_spark.streaming import windows as W_

        stream = _read_event_stream(spark, str(d), max_files=1)
        agg = W_.hourly_event_rollup(stream, watermark="2 hours")
        q = (
            agg.writeStream.format("memory")
            .queryName("late_drop")
            .outputMode("append")
            .trigger(processingTime="1 second")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            import time as _time

            deadline = _time.time() + 60
            while _time.time() < deadline:
                if q.lastProgress and q.lastProgress["numInputRows"] == 0 \
                        and q.recentProgress and sum(p["numInputRows"] for p in q.recentProgress) >= 2:
                    break
                _time.sleep(1)
            with open(d / "b1.json", "w") as f:
                for r in late:
                    f.write(_json.dumps(r) + "\n")
            deadline = _time.time() + 60
            while _time.time() < deadline:
                done = sum(p["numInputRows"] for p in (q.recentProgress or []))
                if done >= 3:
                    break
                _time.sleep(1)
            q.processAllAvailable()
        finally:
            q.stop()

        rows = {(r["hour_start"], r["n"]) for r in spark.table("late_drop").collect()}
        # the 10:00 window closed with exactly 1 event: the late event_id=3
        # arrived after the watermark passed 11:00 and was dropped
        assert ("2024-01-01 10:00:00", 1) in rows
        assert ("2024-01-01 10:00:00", 2) not in rows
