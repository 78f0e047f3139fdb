"""J1: the scored as-of/interval join — segments aligned to frames.

Reference semantics (/root/reference/src/align/aligner.py:4-110), exactly:

  1. per segment, the *closest* frame is the one with
     ``frame.ts <= seg.start + tolerance_before`` minimizing
     ``|frame.ts - seg.start|`` (first such frame on ties — strict `<` in
     the reference scan, aligner.py:45-50);
  2. candidates are frames within +-`window` *indices* of the closest
     frame that also satisfy ``frame.ts <= seg.end + tolerance_after``
     (aligner.py:52-57);
  3. each candidate is scored
     ``w_tags*tag_sim + w_text*text_sim + w_ts/(1+|dt|/divisor)``
     (aligner.py:58-73): tag_sim = fraction of tags sharing >=1 word with
     the speech (aligner.py:84-95); text_sim = |overlap| / |speech words|
     over stopword-filtered words of length > 2 (aligner.py:98-110);
  4. argmax wins, first candidate on ties (Python max keeps the first
     maximal element, aligner.py:80);
  5. no candidates -> fall back to the closest frame's text
     (aligner.py:77-78).

Spark form: everything is per-document, so both the candidate theta-join
and the two argmax windows run under one hash partitioning on the doc key
— no global shuffle, no skew beyond the largest single document. At
10^12-doc scale this stays a within-partition join exactly like the
per-doc stages of the KG pipeline (SURVEY.md §2.3 J1 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.config import AlignmentConfig

DOC = ["repo", "path", "commit"]


def _content_words(col: F.Column, stop_words: tuple[str, ...]) -> F.Column:
    """Stopword-filtered words of length > 2 (aligner.py:103-104)."""
    stops = F.array(*[F.lit(s) for s in stop_words]) if stop_words else F.array()
    return F.array_distinct(
        F.filter(
            F.split(F.lower(col), r"\s+"),
            lambda w: (F.length(w) > 2) & ~F.array_contains(stops, w),
        )
    )


def align_segments_to_frames(
    segments: DataFrame,  # DOC + (seg_id, start, end, text)
    frames: DataFrame,  # DOC + (ts, text, tags array<string>)
    cfg: AlignmentConfig = AlignmentConfig(),
    stop_words: tuple[str, ...] = (),
) -> DataFrame:
    """Returns DOC + (seg_id, start, end, speech, slide_text)."""
    f = frames.select(
        *DOC,
        F.col("ts").alias("f_ts"),
        F.col("text").alias("f_text"),
        F.col("tags").alias("f_tags"),
    )
    # frame index per doc by timestamp order (the reference's list index)
    w_doc = W.partitionBy(*DOC).orderBy("f_ts")
    f = f.withColumn("f_idx", F.row_number().over(w_doc) - 1)

    s = segments.select(
        *DOC,
        "seg_id",
        F.col("start").alias("s_start"),
        F.col("end").alias("s_end"),
        F.col("text").alias("speech"),
    )

    # step 1: closest eligible frame (ts <= start + tol_before), ties ->
    # lowest index (strict-< scan parity)
    elig = s.join(f, DOC).where(F.col("f_ts") <= F.col("s_start") + cfg.tolerance_before)
    w_closest = W.partitionBy(*DOC, "seg_id").orderBy(
        F.abs(F.col("f_ts") - F.col("s_start")), F.col("f_idx")
    )
    closest = (
        elig.withColumn("_rn", F.row_number().over(w_closest))
        .where(F.col("_rn") == 1)
        .select(*DOC, "seg_id", F.col("f_idx").alias("closest_idx"),
                F.col("f_text").alias("closest_text"))
    )
    # segments with no eligible frame: the reference defaults closest_idx=0
    # (aligner.py:42-43 initial value survives when no frame qualifies)
    first_frame = f.where(F.col("f_idx") == 0).select(
        *DOC, F.col("f_idx").alias("closest_idx"), F.col("f_text").alias("closest_text")
    )
    no_match = s.join(closest.select(*DOC, "seg_id"), [*DOC, "seg_id"], "left_anti")
    closest = closest.unionByName(
        no_match.select(*DOC, "seg_id").join(first_frame, DOC)
    )

    # step 2: candidate window of +-window indices, bounded by end tolerance
    base = s.join(closest, [*DOC, "seg_id"])
    cand = (
        base.join(f, DOC)
        .where(
            (F.abs(F.col("f_idx") - F.col("closest_idx")) <= cfg.window)
            & (F.col("f_ts") <= F.col("s_end") + cfg.tolerance_after)
        )
    )

    # step 3: the blended score
    speech_words = F.array_distinct(F.split(F.lower(F.col("speech")), r"\s+"))
    tag_hits = F.size(
        F.filter(
            F.coalesce(F.col("f_tags"), F.array()),
            lambda t: F.arrays_overlap(F.split(F.lower(t), r"\s+"), speech_words),
        )
    )
    n_tags = F.size(F.coalesce(F.col("f_tags"), F.array()))
    tag_sim = F.when(n_tags > 0, tag_hits / n_tags).otherwise(F.lit(0.0))

    words_speech = _content_words(F.col("speech"), stop_words)
    words_frame = _content_words(F.col("f_text"), stop_words)
    overlap = F.size(F.array_intersect(words_speech, words_frame))
    text_sim = F.when(
        (F.size(words_speech) > 0) & (F.size(words_frame) > 0),
        overlap / F.size(words_speech),
    ).otherwise(F.lit(0.0))

    ts_score = 1.0 / (1.0 + F.abs(F.col("f_ts") - F.col("s_start")) / cfg.timestamp_divisor)
    score = (
        cfg.weight_tags * tag_sim + cfg.weight_text * text_sim + cfg.weight_timestamp * ts_score
    )

    # step 4: argmax, first candidate (lowest index) on ties
    w_best = W.partitionBy(*DOC, "seg_id").orderBy(F.desc("_score"), F.col("f_idx"))
    best = (
        cand.withColumn("_score", score)
        .withColumn("_rn", F.row_number().over(w_best))
        .where(F.col("_rn") == 1)
        .select(*DOC, "seg_id", F.col("f_text").alias("best_text"))
    )

    # step 5: fallback to closest frame's text when no candidate survived
    out = (
        base.join(best, [*DOC, "seg_id"], "left")
        .withColumn("slide_text", F.coalesce("best_text", "closest_text"))
        .select(
            *DOC,
            "seg_id",
            F.col("s_start").alias("start"),
            F.col("s_end").alias("end"),
            "speech",
            "slide_text",
        )
    )
    # segments of docs with zero frames: empty slide_text (aligner.py:25-26)
    missing = s.join(f.select(*DOC).distinct(), DOC, "left_anti").select(
        *DOC,
        "seg_id",
        F.col("s_start").alias("start"),
        F.col("s_end").alias("end"),
        "speech",
        F.lit("").alias("slide_text"),
    )
    return out.unionByName(missing)
