"""Structured Streaming twins: windowed aggregation (memory sink) and the
stateful adaptive-mode tracker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.streaming.events import (
    adaptive_mode_stream,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_schema(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").schema


def test_windowed_counts_stream_matches_batch(spark, events_schema, tmp_path):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
        for r in windowed_event_counts(batch).collect()
    }

    stream = (
        spark.readStream.schema(events_schema)
        .parquet(f"{SF_DIR}")  # the dir contains events.parquet
    )
    # restrict to event columns (dir-level glob would read other tables)
    stream = (
        spark.readStream.schema(events_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start, r.event_type): (r.n, round(r.total_value, 4))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert got == want
    assert len(got) > 0


def test_adaptive_mode_state_machine(spark, events_schema, tmp_path):
    stream = (
        spark.readStream.schema(events_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(SF_DIR)
    )
    q = (
        adaptive_mode_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("modes")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM modes").collect()
    finally:
        q.stop()
    assert len(rows) > 0
    assert {r.mode for r in rows} <= {"powerpoint", "demo"}
    assert all(r.events_per_minute >= 0 for r in rows)


def test_dedup_stream_matches_batch(spark, events_schema, tmp_path):
    """Exactly-once ingest guard: re-delivered rows (same user_id/event_id)
    must be dropped by the streaming dedup, and the surviving set must
    equal the batch twin's dropDuplicates."""
    from corporate_knowledge_extractor_spark.streaming.events import dedup_stream

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(500)
    dup_dir = str(tmp_path / "dup_events")
    # simulate at-least-once delivery: every row delivered twice
    events.unionAll(events).repartition(4).write.parquet(dup_dir)

    batch = spark.read.parquet(dup_dir)
    want = {
        (r.user_id, r.event_id) for r in dedup_stream(batch).collect()
    }
    assert len(want) == 500

    stream = spark.readStream.schema(events_schema).parquet(dup_dir)
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_events")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (r.user_id, r.event_id)
            for r in spark.sql("SELECT user_id, event_id FROM dedup_events").collect()
        ]
    finally:
        q.stop()
    assert len(got) == len(set(got)), "stream emitted a duplicate key"
    assert set(got) == want
