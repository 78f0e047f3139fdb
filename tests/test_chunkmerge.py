"""Chunk-merge (W5 running offset + F7 overlap filter) — mirrors the
reference merge toy (tests/test_transcription.py:277-336)."""

from __future__ import annotations

from corporate_knowledge_extractor_spark.operators.chunkmerge import (
    merge_chunked_segments,
)

SEG = (
    "repo string, path string, commit string, chunk_idx int, "
    "start double, end double, text string"
)
DUR = "repo string, path string, commit string, chunk_idx int, duration double"
DOC = ("r", "p", "c")


def test_two_chunk_merge_offsets_and_overlap(spark):
    segs = spark.createDataFrame(
        [
            (*DOC, 0, 0.0, 5.0, "First chunk"),
            (*DOC, 0, 5.0, 10.0, "End of first"),
            (*DOC, 1, 0.0, 5.0, "Second chunk"),  # start < overlap -> dropped
            (*DOC, 1, 5.0, 10.0, "End of second"),
        ],
        SEG,
    )
    durs = spark.createDataFrame([(*DOC, 0, 10.0), (*DOC, 1, 10.0)], DUR)
    out = merge_chunked_segments(segs, durs, overlap_seconds=2.0).orderBy("start").collect()
    texts = [r.text for r in out]
    assert texts == ["First chunk", "End of first", "End of second"]
    # chunk 1 offset = 10 - 2 = 8
    assert [r.start for r in out] == [0.0, 5.0, 13.0]
    assert [r.end for r in out] == [5.0, 10.0, 18.0]


def test_single_chunk_passthrough(spark):
    segs = spark.createDataFrame(
        [(*DOC, 0, 0.0, 5.0, "Hello world"), (*DOC, 0, 5.0, 10.0, "test")], SEG
    )
    durs = spark.createDataFrame([(*DOC, 0, 10.0)], DUR)
    out = merge_chunked_segments(segs, durs, overlap_seconds=2.0).orderBy("start").collect()
    assert [(r.start, r.end, r.text) for r in out] == [
        (0.0, 5.0, "Hello world"),
        (5.0, 10.0, "test"),
    ]


def test_three_chunks_cumulative(spark):
    segs = spark.createDataFrame(
        [(*DOC, i, 3.0, 4.0, f"c{i}") for i in range(3)], SEG
    )
    durs = spark.createDataFrame([(*DOC, i, 10.0) for i in range(3)], DUR)
    out = merge_chunked_segments(segs, durs, overlap_seconds=2.0).orderBy("start").collect()
    # offsets 0, 8, 16; local start 3 >= overlap so all kept
    assert [r.start for r in out] == [3.0, 11.0, 19.0]
