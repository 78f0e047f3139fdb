"""Measure partition-local edge contraction on the deep-chain CC case
(the cc_diagnose chain shape: 100k vertices, chains of 12) at 4
two-core executors: raw iterative CC vs local_contract=True. Rounds,
wall, and label-set equality. Writes BENCH/cc_contract_r05.json.

Usage: python scripts/cc_contract_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from corporate_knowledge_extractor_spark.config import CanonicalizeConfig
    from corporate_knowledge_extractor_spark.operators.canonicalize import (
        connected_components,
    )
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="ckg-cc-contract",
        master="local-cluster[4,2,8192]",
        shuffle_partitions=16,
        extra_conf={"spark.executor.memory": "7168m"},
    )
    import tempfile

    base = tempfile.mkdtemp(prefix="ckg_ccc_")
    v_chain, chain_len = 100_000, 12
    spark.range(v_chain).select(F.col("id").alias("entity_id")).write.mode(
        "overwrite"
    ).parquet(f"{base}/v")
    (
        spark.range(v_chain)
        .where(F.pmod(F.col("id"), F.lit(chain_len)) != chain_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .write.mode("overwrite")
        .parquet(f"{base}/e")
    )
    v = spark.read.parquet(f"{base}/v")
    e = spark.read.parquet(f"{base}/e")

    def run(tag: str, cfg, reps: int = 2):
        best, rounds_n, sig = None, None, None
        for k in range(reps + 1):  # +1 warm-up
            rounds = []
            t0 = time.time()
            res = connected_components(
                v, e, cfg, scratch_dir=f"{base}/s_{tag}_{k}",
                on_iteration=lambda i, c: rounds.append(i),
            )
            sig = res.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.hash("entity_id", "component")).alias("h"),
            ).first()
            wall = time.time() - t0
            res.unpersist()
            spark.catalog.clearCache()
            if k > 0 and (best is None or wall < best):
                best = wall
            rounds_n = len(rounds)
        return {"best_sec": round(best, 2), "rounds": rounds_n,
                "labels_sig": [int(sig["n"]), int(sig["h"])]}

    raw = run("raw", CanonicalizeConfig(max_iterations=40))
    con = run("con", CanonicalizeConfig(max_iterations=40, local_contract=True))
    out = {
        "mode": "local-cluster[4,2,8192]",
        "graph": {"vertices": v_chain, "chain_len": chain_len},
        "raw": raw,
        "contracted": con,
        "labels_identical": raw["labels_sig"] == con["labels_sig"],
        "speedup": round(raw["best_sec"] / con["best_sec"], 3),
    }
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    with open(os.path.join(bench_dir, "cc_contract_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
