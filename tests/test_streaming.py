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
