"""Triple synthesis: typed mentions -> (subj, pred, obj) rows.

Reference analogue: the LLM synthesis stage
(/root/reference/src/synthesize/gemini_backend.py:31-66) that turns
grouped, aligned records into structured slide_breakdown + qa_pair JSON.
BASELINE.json replaces the LLM with a deterministic rule extractor; each
rule below is a native column expression over the mention table, unioned
into one triples DataFrame — the 1-group -> N-structured-rows shape the
reference gets from `applyInPandas`-style chunking, here free of Python
entirely.

Triple schema (FIXTURES.md §2): (repo, path, commit, subj, pred, obj,
frame_id, line_no, category added by postprocess).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.operators.segment import DOC_KEY


def _doc_key() -> F.Column:
    return F.concat_ws("/", F.col("repo"), F.col("path"))


def synthesize_triples(mentions: DataFrame) -> DataFrame:
    """Rules:
      R1  import mention          -> (doc, imports, module)
      R2  import_symbol mention   -> (doc, imports_symbol, symbol)
      R3  function_def mention    -> (doc, defines, fn)
      R4  call mention            -> (doc::enclosing_fn, calls, callee)
    The enclosing fn of a call is the block's first function_def — a
    per-(doc, block) equi-join, shuffle-free after the mention stage's
    doc-key partitioning (same keys, Catalyst reuses the exchange).
    """
    doc = _doc_key()
    frame_id = F.lpad(F.col("orig_idx").cast("string"), 3, "0")

    def proj(df: DataFrame, subj: F.Column, pred: F.Column, obj: F.Column) -> DataFrame:
        return df.select(
            *DOC_KEY,
            subj.alias("subj"),
            pred.alias("pred"),
            obj.alias("obj"),
            frame_id.alias("frame_id"),
            F.col("line_no"),
        )

    # R1-R3 fused: one scan, pred mapped from mention_type (three filtered
    # unions would re-scan the mention table per rule)
    pred_map = {
        "import": "imports",
        "import_symbol": "imports_symbol",
        "function_def": "defines",
    }
    non_call = proj(
        mentions.where(F.col("mention_type").isin(*pred_map)),
        doc,
        F.coalesce(
            *[
                F.when(F.col("mention_type") == t, F.lit(p))
                for t, p in pred_map.items()
            ]
        ),
        F.col("surface"),
    )

    # R4: attach each call to its block's first def (min line_no).
    defs_per_block = (
        mentions.where(F.col("mention_type") == "function_def")
        .groupBy(*DOC_KEY, "block_id")
        .agg(F.min_by("surface", "line_no").alias("enclosing_fn"))
    )
    calls = (
        mentions.where(F.col("mention_type") == "call")
        .join(defs_per_block, [*DOC_KEY, "block_id"], "inner")
    )
    calls_t = proj(
        calls,
        F.concat(_doc_key(), F.lit("::"), F.col("enclosing_fn")),
        F.lit("calls"),
        F.col("surface"),
    )

    return non_call.unionByName(calls_t)


def renumber_frames(triples: DataFrame) -> DataFrame:
    """W3: compute the zero-padded FRAME_ID *once* and carry it — the
    reference computes it independently in two places and documents the
    resulting mismatch bug class (/root/reference/CLAUDE.md:157-163,
    216-218); computing once is the fix SURVEY.md §2.5 prescribes."""
    w = W.partitionBy(*DOC_KEY).orderBy("line_no", "pred", "obj")
    return triples.withColumn(
        "frame_id", F.lpad(F.row_number().over(w).cast("string"), 3, "0")
    )
