"""Scored interval-join alignment (J1) — mirrors the reference's toy
fixtures (tests/test_pipeline.py:27-60) plus exact-semantics cases."""

from __future__ import annotations

import pytest

from corporate_knowledge_extractor_spark.config import AlignmentConfig
from corporate_knowledge_extractor_spark.operators.align import align_segments_to_frames

SEG_SCHEMA = (
    "repo string, path string, commit string, seg_id int, "
    "start double, end double, text string"
)
FRAME_SCHEMA = (
    "repo string, path string, commit string, ts double, "
    "text string, tags array<string>"
)
DOC = ("r", "p", "c")


def _align(spark, segs, frames, **kw):
    s = spark.createDataFrame([(*DOC, *x) for x in segs], SEG_SCHEMA)
    f = spark.createDataFrame([(*DOC, *x) for x in frames], FRAME_SCHEMA)
    out = align_segments_to_frames(s, f, **kw).orderBy("seg_id").collect()
    return {r.seg_id: r for r in out}


def test_align_basic_picks_timestamp_neighbor(spark):
    # the reference toy: 3 segments x 3 frames (tests/test_pipeline.py:29-47)
    segs = [
        (1, 0.0, 5.0, "Welcome to the presentation"),
        (2, 5.0, 10.0, "This is slide one"),
        (3, 10.0, 15.0, "Moving to slide two"),
    ]
    frames = [
        (0.0, "Title Slide", []),
        (6.0, "Slide One", []),
        (11.0, "Slide Two", []),
    ]
    got = _align(spark, segs, frames)
    assert len(got) == 3
    assert all(got[i].slide_text for i in (1, 2, 3))
    # text overlap drives seg2 -> "Slide One", seg3 -> "Slide Two"
    assert got[2].slide_text == "Slide One"
    assert got[3].slide_text == "Slide Two"


def test_tag_similarity_dominates(spark):
    segs = [(1, 10.0, 15.0, "we discuss revenue growth today")]
    frames = [
        (8.0, "agenda", ["weather"]),
        (9.0, "numbers", ["revenue growth"]),  # tag words overlap speech
    ]
    got = _align(spark, segs, frames)
    assert got[1].slide_text == "numbers"


def test_no_candidates_falls_back_to_closest(spark):
    # frame far beyond end tolerance -> candidate set empty -> closest text
    segs = [(1, 0.0, 1.0, "hello world")]
    frames = [(50.0, "way later", [])]
    got = _align(
        spark, segs, frames, cfg=AlignmentConfig(tolerance_before=100.0, tolerance_after=10.0)
    )
    assert got[1].slide_text == "way later"  # closest (and only) frame


def test_no_frames_yields_empty_slide_text(spark):
    segs = [(1, 0.0, 5.0, "some speech")]
    got = _align(spark, segs, [])
    assert got[1].slide_text == ""


def test_before_tolerance_excludes_future_frames(spark):
    # frame at ts=20 is > start+5 for a segment starting at 0 -> not closest;
    # closest defaults to first frame
    segs = [(1, 0.0, 30.0, "alpha beta gamma")]
    frames = [(20.0, "future", []), (25.0, "later", [])]
    got = _align(spark, segs, frames)
    # both frames fail the closest eligibility (ts <= 0+5); default idx 0,
    # but candidates within end tolerance (<=40) still score -> argmax on ts
    assert got[1].slide_text == "future"
