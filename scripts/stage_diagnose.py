#!/usr/bin/env python
"""Intra-stage scaling decomposition for the two most expensive pipeline
stages (round-5 verdict orders 1 and 5).

``aligned`` (47% of staged wall @ 4 executors in round 4) is split into
its three phases — the as-of sort + running windows ("closest"), the
bounded candidate equi-join + blended score ("scored"), the winner pick
("argmax") — plus the full operator, each forced from identical on-disk
parquet inputs, so the next optimization targets the measured phase
instead of the whole stage. ``triples`` (efficiency 0.633 in round 4) is
split into synthesize-only vs the full post_process chain, and the
per-partition row balance of the dedup fan-out persist is recorded (the
two candidate causes named by the round-4 verdict: partition imbalance
after the dedup window vs the persist's writer population).

Protocol matches bench.py --scaling-stages: fresh local-cluster per
level via subprocess, best-of-reps, per-rep steal jiffies. Results ->
BENCH/stage_diagnose_r05.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_level(n_exec: int, cores: int, mem_mb: int, n_docs: int, reps: int) -> dict:
    import tempfile

    from pyspark.sql import functions as F

    from corporate_knowledge_extractor_spark.config import DEFAULT_CONFIG
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.materialize import release
    from corporate_knowledge_extractor_spark.operators.align import (
        align_segments_to_frames,
    )
    from corporate_knowledge_extractor_spark.operators.mentions import (
        junk_block_filter,
        mention_stage,
        tag_mentions,
    )
    from corporate_knowledge_extractor_spark.operators.postprocess import post_process
    from corporate_knowledge_extractor_spark.operators.redact import redact_columns
    from corporate_knowledge_extractor_spark.operators.segment import (
        assign_blocks,
        block_segments,
        split_lines,
    )
    from corporate_knowledge_extractor_spark.operators.synthesize import (
        synthesize_triples,
    )
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-diagnose-exec{n_exec}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=n_exec * cores * 2,
        extra_conf={"spark.executor.memory": f"{mem_mb - 1024}m"},
    )
    base = tempfile.mkdtemp(prefix="ckg_diag_")

    # shared on-disk inputs, built once per level (not timed): every
    # phase below reads the same parquet, so phase walls are the
    # operator's own cost, not upstream recompute
    docs = generate_corpus(spark, n_docs=n_docs)
    blocks = junk_block_filter(assign_blocks(split_lines(docs)))
    mentions = redact_columns(
        tag_mentions(mention_stage(blocks, DEFAULT_CONFIG.mentions)),
        ["surface"],
        DEFAULT_CONFIG.redaction,
    )
    mentions.write.mode("overwrite").parquet(f"{base}/mentions")
    block_segments(blocks).select(
        "repo", "path", "commit",
        F.col("block_id").alias("seg_id"),
        F.col("start").cast("double").alias("start"),
        F.col("end").cast("double").alias("end"),
        "text",
    ).write.mode("overwrite").parquet(f"{base}/segs")
    mentions_t = spark.read.parquet(f"{base}/mentions")
    mentions_t.select(
        "repo", "path", "commit",
        F.col("line_no").cast("double").alias("ts"),
        F.col("surface").alias("text"),
        "tags",
    ).write.mode("overwrite").parquet(f"{base}/frames")
    segs_t = spark.read.parquet(f"{base}/segs")
    frames_t = spark.read.parquet(f"{base}/frames")

    def timed(build, warm: bool = True):
        if warm:
            pass  # plans share codegen with the warm-up run below
        runs = []
        for _ in range(reps):
            s0, t0 = _steal(), time.time()
            scratch: list = []
            build(scratch)
            runs.append(
                {"sec": round(time.time() - t0, 2), "steal_jiffies": _steal() - s0}
            )
            release(*scratch)
            spark.catalog.clearCache()
        return {"best_sec": min(r["sec"] for r in runs), "runs": runs}

    # warm codegen on a small slice once
    _force(
        align_segments_to_frames(segs_t.limit(2000), frames_t.limit(2000))
    )
    spark.catalog.clearCache()

    out: dict = {"executors": n_exec, "phases": {}}
    for phase in ["closest", "scored", "argmax", None]:
        name = phase or "full"
        out["phases"][f"align_{name}"] = timed(
            lambda _s, p=phase: _force(
                align_segments_to_frames(segs_t, frames_t, _stage=p)
            )
        )

    _force(synthesize_triples(mentions_t.limit(2000)))
    spark.catalog.clearCache()
    out["phases"]["triples_synth_only"] = timed(
        lambda _s: _force(synthesize_triples(mentions_t))
    )
    out["phases"]["triples_full_post"] = timed(
        lambda s: _force(
            post_process(synthesize_triples(mentions_t), persist=True, scratch=s)
        )
    )

    # dedup fan-out partition balance (one extra pass, untimed)
    scratch: list = []
    post_process(synthesize_triples(mentions_t), persist=True, scratch=scratch)
    dd = scratch[0]
    parts = (
        dd.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ns = sorted((int(r["n"]) for r in parts), reverse=True)
    out["dedup_fanout_partitions"] = {
        "n_partitions": len(ns),
        "rows_max": ns[0] if ns else 0,
        "rows_mean": round(sum(ns) / max(len(ns), 1), 1),
        "top5": ns[:5],
    }
    release(*scratch)
    spark.catalog.clearCache()
    spark.stop()
    return out


def main(n_docs: int = 400_000, reps: int = 2, levels=(1, 4),
         cores: int = 2, mem_mb: int = 8192) -> dict:
    import subprocess

    results = {}
    for n_exec in levels:
        if results:
            time.sleep(20)
        cmd = [sys.executable, os.path.abspath(__file__), "--level",
               str(n_exec), str(cores), str(mem_mb), str(n_docs), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"diagnose level {n_exec} failed")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n_exec] = json.loads(line)
        sys.stderr.write(f"level {n_exec}: {line}\n")

    lo, hi = levels
    per_phase = {}
    for ph in results[lo]["phases"]:
        t_lo = results[lo]["phases"][ph]["best_sec"]
        t_hi = results[hi]["phases"][ph]["best_sec"]
        per_phase[ph] = {
            f"t_exec{lo}_sec": t_lo,
            f"t_exec{hi}_sec": t_hi,
            "speedup": round(t_lo / t_hi, 3) if t_hi else None,
            "efficiency": round(t_lo / t_hi / (hi / lo), 3) if t_hi else None,
        }
    out = {
        "n_docs": n_docs,
        "levels": list(levels),
        "mode": f"local-cluster[N,{cores},{mem_mb}]",
        "per_phase": per_phase,
        "dedup_fanout_partitions": {
            str(k): v["dedup_fanout_partitions"] for k, v in results.items()
        },
        "runs": {str(k): v["phases"] for k, v in results.items()},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "stage_diagnose_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        print(json.dumps(run_level(
            int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]),
            int(sys.argv[i + 4]), int(sys.argv[i + 5])
        )))
    else:
        main()
