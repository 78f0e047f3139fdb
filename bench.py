#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": seconds, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full plan
execution, no collect-to-driver bias). The flagship number is the KG
pipeline's triples/sec, reported under "extra".

Usage:
  python bench.py                 # full bench at $SPARK_GRAFT_SF_DIR
  python bench.py --scaling       # local[8] vs local[32] scaling evidence
                                  # (spawns fresh JVMs; see BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries: one per operator family, the most load-bearing variants
HEADLINE = [
    "pricing_summary",
    "topk_per_group",
    "running_offset",
    "interval_join",
    "asof_join",
    "runlength_sessions",
    "sliding_window_rate",
    "category_argmax",
    "normalized_dedup",
    "dedup_exact_clusters",
    "minhash_neardup",
    "embedding_topk",
    "lang_id_confusion",
    "token_stats",
]


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _force(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_bench(cpus: int = CPUS, sf_dir: str = SF_DIR, emit: bool = True) -> dict:
    from corporate_knowledge_extractor_spark.session import get_spark
    from corporate_knowledge_extractor_spark.plans.queries import REGISTRY

    sf = _sf_of(sf_dir)
    # shuffle partitions scaled with parallelism so N-vs-4N is honest
    spark = get_spark(
        app_name=f"ckg-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        t0 = time.time()
        _force(q.fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # release per-query persists

    # flagship: KG pipeline triples/sec at corpus scale matching sf
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples

    t0 = time.time()
    docs = generate_corpus(spark, sf=sf)
    triples = extract_triples(docs)
    n_triples = triples.count()
    kg_sec = round(time.time() - t0, 3)
    timings["kg_triples_e2e"] = kg_sec

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extra": {
            "cpus": cpus,
            "kg_triples": n_triples,
            "kg_triples_per_sec": round(n_triples / kg_sec, 1),
        },
    }
    if emit:
        print(json.dumps(out))
    spark.stop()
    return out


def run_scaling() -> None:
    """N-vs-4N scaling evidence: identical job at local[8] and local[32]
    (fresh JVM each via subprocess), shuffle partitions scaled with cores.
    Efficiency = (T_8 / T_32) / 4 (SURVEY.md §6 / BASELINE.md)."""
    import subprocess

    results = {}
    for cpus in (8, 32):
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--single",
            str(cpus),
        ]
        env = dict(os.environ)
        p = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8 = results[8]["value"]
    t32 = results[32]["value"]
    speedup = t8 / t32
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(speedup / 4, 4),
        "unit": "ratio",
        "queries": {
            "t_local8_sec": t8,
            "t_local32_sec": t32,
            "speedup": round(speedup, 4),
        },
        "sf": results[32]["sf"],
        "extra": {
            "kg_tps_local8": results[8]["extra"]["kg_triples_per_sec"],
            "kg_tps_local32": results[32]["extra"]["kg_triples_per_sec"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single") + 1])
        run_bench(cpus=cpus)
    else:
        run_bench()
