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


def test_streaming_dedup_into_incremental_triples(spark, tmp_path):
    """The chained ingest front door: an at-least-once doc stream (every
    doc delivered twice, within the watermark) -> exactly-once dedup ->
    skip already-done keys -> per-micro-batch triple extraction. The
    emitted triple set must equal the batch pipeline run on the deduped,
    not-yet-done document set — micro-batching and re-delivery must be
    invisible."""
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples
    from corporate_knowledge_extractor_spark.streaming.events import (
        incremental_triples_stream,
    )

    docs = generate_corpus(spark, n_docs=150).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    )
    dup_dir = str(tmp_path / "docs_stream")
    # at-least-once delivery: second copy arrives 1 minute later, well
    # inside the 10-minute dedup watermark
    redelivered = docs.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
    docs.unionByName(redelivered).repartition(4).write.parquet(dup_dir)

    # 40 docs were already processed in a previous run
    done = (
        spark.read.parquet(dup_dir)
        .select("repo", "path", "commit")
        .distinct()
        .orderBy("repo", "path")
        .limit(40)
    )
    done.write.parquet(str(tmp_path / "done"))
    done_keys = spark.read.parquet(str(tmp_path / "done"))

    out = str(tmp_path / "triples_out")
    q = incremental_triples_stream(
        spark, dup_dir, done_keys, out, str(tmp_path / "ckpt_inc")
    )
    q.awaitTermination(300)

    batch_docs = (
        spark.read.parquet(dup_dir)
        .drop("ts")
        .dropDuplicates(["repo", "path", "commit"])
        .join(done_keys, ["repo", "path", "commit"], "left_anti")
    )
    want = {tuple(r) for r in extract_triples(batch_docs, persist=False).collect()}
    got_df = spark.read.parquet(out).select(
        *extract_triples(batch_docs, persist=False).columns
    )
    got = {tuple(r) for r in got_df.collect()}
    assert len(got) == got_df.count(), "streaming sink emitted duplicates"
    assert got == want
    assert len(want) > 500  # ~110 docs x ~18 triples/doc


def test_foreachbatch_sink_is_retry_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch whose write landed but whose
    checkpoint commit did not is re-executed verbatim (same id, same rows)
    on restart. The sink must absorb that replay — running the identical
    (batch, id) through twice must leave the output byte-identical, and a
    *different* batch id must still append."""
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.streaming.events import (
        write_triples_batch,
    )

    docs = generate_corpus(spark, n_docs=60)
    out = str(tmp_path / "triples_idem")
    b0 = docs.limit(30)
    b1 = docs.exceptAll(b0)

    write_triples_batch(b0, 0, out)
    n_after_b0 = spark.read.parquet(out).count()
    write_triples_batch(b0, 0, out)  # the crash-retry replay
    rows_after_retry = spark.read.parquet(out).collect()
    assert len(rows_after_retry) == n_after_b0, "retry re-appended triples"
    assert len({tuple(r) for r in rows_after_retry}) == n_after_b0

    write_triples_batch(b1, 1, out)  # a NEW batch must still append
    total = spark.read.parquet(out)
    assert total.count() > n_after_b0
    assert total.where(F.col("_batch_id") == 0).count() == n_after_b0


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
