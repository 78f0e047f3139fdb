"""Report sinks + re-loader: S7 (markdown), S8 (JSONL), S9 (metadata),
S11 (verification re-loader).

Reference: /root/reference/src/output/generator.py:9-57 writes report.md,
knowledge.jsonl and metadata.json per run; scripts/compare_reports.py:37-99
loads them back for the regression diff. Spark form: the JSONL sink is a
distributed `df.write.json`; the markdown report renders a *small
collected summary* driver-side (presentation only — SURVEY.md §2.1/S7);
metadata is a tiny JSON of counts. S10's sort+renumber happens upstream
as the W3 window (operators/synthesize.renumber_frames).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_report(
    out_dir: str,
    triples: DataFrame,
    nodes: DataFrame,
    edges: DataFrame,
    created: str = "1970-01-01T00:00:00Z",
) -> dict:
    """Write report.md + knowledge.jsonl + metadata.json. Returns the
    metadata dict. `created` is injectable for determinism (the reference
    stamps wall-clock, generator.py:20 — a reproducibility bug class we
    avoid)."""
    os.makedirs(out_dir, exist_ok=True)

    # S8: JSONL sink — one JSON object per triple, distributed write
    triples.select(
        "subj", "pred", "obj", "frame_id", "category"
    ).write.mode("overwrite").json(os.path.join(out_dir, "knowledge.jsonl"))

    # S9: metadata counts (generator.py:49-55 shape)
    meta = {
        "created": created,
        "triples_count": triples.count(),
        "nodes_count": nodes.count(),
        "edges_count": edges.count(),
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)

    # S7: markdown report — small aggregates collected, rendered driver-side
    by_cat = (
        triples.groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "category")
        .collect()
    )
    top_nodes = (
        nodes.orderBy(F.desc("total_freq"), "canonical")
        .select("canonical", "n_aliases", "total_freq")
        .limit(10)
        .collect()
    )
    lines = ["# Knowledge report", "", "## Triples by category", ""]
    lines += [f"- **{r.category}**: {r.n}" for r in by_cat]
    lines += ["", "## Top entities", ""]
    lines += [
        f"- `{r.canonical}` ({r.n_aliases} aliases, freq {r.total_freq})"
        for r in top_nodes
    ]
    with open(os.path.join(out_dir, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return meta


def write_transcript_report(out_dir: str, segments: DataFrame,
                            created: str = "1970-01-01T00:00:00Z") -> dict:
    """Audio-only-mode output (reference scripts/run.py:61-69 +
    audio_only.yaml expected_output): the report is built from the
    transcript segments alone — no slides/mentions exist by construction.
    JSONL = the segments themselves (distributed write); markdown = a
    small collected summary; metadata = counts."""
    os.makedirs(out_dir, exist_ok=True)
    segments.select(
        "repo", "path", "commit", "block_id", "start", "end", "text"
    ).write.mode("overwrite").json(os.path.join(out_dir, "transcript.jsonl"))

    n_docs = segments.select("repo", "path", "commit").distinct().count()
    n_segs = segments.count()
    meta = {
        "created": created,
        "mode": "transcript_only",
        "documents_count": n_docs,
        "segments_count": n_segs,
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)

    longest = (
        segments.withColumn("_len", F.length("text"))
        .orderBy(F.desc("_len"), "repo", "path", "block_id")
        .select("repo", "path", "block_id", "_len")
        .limit(10)
        .collect()
    )
    lines = [
        "# Transcript report",
        "",
        f"- documents: {n_docs}",
        f"- segments: {n_segs}",
        "",
        "## Longest segments",
        "",
    ]
    lines += [
        f"- `{r.repo}/{r.path}` block {r.block_id} ({r._len} chars)"
        for r in longest
    ]
    with open(os.path.join(out_dir, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return meta


def load_report(spark: SparkSession, out_dir: str) -> dict:
    """S11: read a report dir back for verification
    (compare_reports.py:37-99 analogue). Mode-aware (ADVICE r04): a
    transcript-only report (metadata.json mode == "transcript_only",
    written by write_transcript_report) has transcript.jsonl instead of
    knowledge.jsonl — it loads under the "segments" key; full reports
    load under "triples"."""
    with open(os.path.join(out_dir, "metadata.json")) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, "report.md")) as f:
        markdown = f.read()
    out = {"metadata": meta, "markdown": markdown}
    if meta.get("mode") == "transcript_only":
        out["segments"] = spark.read.json(os.path.join(out_dir, "transcript.jsonl"))
    else:
        out["triples"] = spark.read.json(os.path.join(out_dir, "knowledge.jsonl"))
    return out
