"""W5 + F7: chunked-transcript merge with cumulative offsets.

Reference semantics (/root/reference/src/transcribe/chunker.py:197-272):
segments arrive per chunk with chunk-local timestamps; the merge

  * offsets each chunk by ``sum of (duration - overlap) of all prior
    chunks`` (cumulative running sum, chunker.py:262-267);
  * drops segments of non-first chunks whose local ``start`` falls inside
    the overlap head (chunker.py:251-256);
  * single-chunk inputs pass through untouched (chunker.py:229-231).

Spark form: one window running-sum per doc + a filter — the per-chunk
Python loop becomes ``sum(duration - overlap) over (partitionBy(doc)
orderBy(chunk_idx) rowsBetween(unboundedPreceding, -1))``. Also the
precedent for splitting huge content blobs at 100 TB: chunk, process,
re-offset, drop overlap heads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DOC = ["repo", "path", "commit"]


def merge_chunked_segments(
    segments: DataFrame,  # DOC + (chunk_idx int, start double, end double, text)
    chunk_durations: DataFrame,  # DOC + (chunk_idx int, duration double)
    overlap_seconds: float = 5.0,
) -> DataFrame:
    """Returns DOC + (start, end, text) on the stitched timeline."""
    n_chunks = chunk_durations.groupBy(*DOC).agg(
        F.count(F.lit(1)).alias("_n_chunks")
    )
    w_prior = (
        W.partitionBy(*DOC)
        .orderBy("chunk_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        chunk_durations.withColumn(
            "_offset",
            F.coalesce(
                F.sum(F.col("duration") - F.lit(overlap_seconds)).over(w_prior),
                F.lit(0.0),
            ),
        )
        .join(n_chunks, DOC)
        .select(*DOC, "chunk_idx", "_offset", "_n_chunks")
    )
    merged = segments.join(offsets, [*DOC, "chunk_idx"])
    # F7 overlap-head anti-filter; single-chunk docs pass through untouched
    keep = (F.col("_n_chunks") == 1) | (
        (F.col("chunk_idx") == 0) | (F.col("start") >= overlap_seconds)
    )
    return (
        merged.where(keep)
        .select(
            *DOC,
            (F.col("start") + F.col("_offset")).alias("start"),
            (F.col("end") + F.col("_offset")).alias("end"),
            "text",
        )
    )
