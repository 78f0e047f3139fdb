"""Segmentation: content blobs -> line rows -> contiguous blocks.

Reference analogue: the transcription stage turns one opaque document into
ordered ``segment{start, end, text}`` records
(/root/reference/src/transcribe/groq_backend.py:63-77). For source code
the segmenter is fully expressible with built-ins — `split` + `posexplode`
for lines, then run-length sessionization (the reference's consecutive
same-slide grouping, src/synthesize/base.py:31-51) to close blank-line
separated blocks.

Everything is JVM-side whole-stage-codegen; the only shuffle is the
window's hash partition by document key, which every later per-doc stage
reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

DOC_KEY = ["repo", "path", "commit"]


def split_lines(docs: DataFrame) -> DataFrame:
    """One row per line, 0-based ``line_no``, narrow (no shuffle).

    Column-prunes ``content`` away immediately after the explode so the
    blob never travels past this stage (SURVEY.md §4 truncation trick).
    """
    return docs.select(
        *DOC_KEY,
        "lang",
        F.posexplode(F.split(F.col("content"), "\n")).alias("line_no", "line"),
    )


def assign_blocks(lines: DataFrame) -> DataFrame:
    """Blank-line sessionization: ``block_id`` per contiguous run.

    Spark form of the reference's run-length group-by
    (src/synthesize/base.py:31-51): a running sum over a "previous line was
    blank" indicator. One window per document — partitioned by the doc key,
    so state never crosses documents and skew is bounded by the largest
    single document (cap enforced upstream by corpus/budget caps).
    """
    w = W.partitionBy(*DOC_KEY).orderBy("line_no")
    is_sep = (F.trim(F.col("line")) == "").cast("int")
    return (
        lines.withColumn("_sep", is_sep)
        .withColumn("block_id", F.sum("_sep").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .where(F.col("_sep") == 0)
        .drop("_sep")
    )


def block_segments(blocked_lines: DataFrame) -> DataFrame:
    """Collapse blocks to ``segments(start, end, text)`` records —
    the direct analogue of the reference segment shape
    (groq_backend.py:70-77), with line spans instead of seconds."""
    return blocked_lines.groupBy(*DOC_KEY, "block_id").agg(
        F.min("line_no").alias("start"),
        F.max("line_no").alias("end"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text"),
    )
