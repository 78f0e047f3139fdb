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
  python bench.py                   # full bench at $SPARK_GRAFT_SF_DIR
  python bench.py --scaling         # local[2] vs local[8] thread scaling
                                    # (fresh JVM per level; BENCH/BASELINE.md)
  python bench.py --scaling-cluster # N vs 4N *executor JVMs* via Spark's
                                    # local-cluster master — the north_rule
                                    # "N to 4N executors" evidence
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# per-query repetitions for the headline loop (best-of-N). The sandbox
# host shows intermittent CPU-steal spikes (BENCH/BASELINE.md); a
# single-shot per-query timing cannot distinguish host contamination
# from a real regression — round 3's unexplained minhash_neardup
# "1.8x regression" was exactly this blind spot. Per-rep steal jiffies
# are recorded under extra.per_query_runs, same protocol as the
# scaling harness.
BENCH_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

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

    # steady-state policy (BENCH/BASELINE.md): the first execution of each
    # plan shape in a fresh JVM pays JIT/codegen compilation measured at
    # 2-4x the steady cost; warm each query once at the smallest sf so the
    # timed loop measures the engine, not the compiler
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            _force(REGISTRY[name].fn(spark, warm_dir))
            spark.catalog.clearCache()

    timings: dict[str, float] = {}
    per_query_runs: dict[str, list[dict]] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        runs = []
        for _ in range(BENCH_REPS):
            s0 = _steal_jiffies()
            t0 = time.time()
            _force(q.fn(spark, sf_dir))
            sec = round(time.time() - t0, 3)
            runs.append({"sec": sec, "steal_jiffies": _steal_jiffies() - s0})
            spark.catalog.clearCache()  # release per-query persists
        per_query_runs[name] = runs
        timings[name] = min(r["sec"] for r in runs)

    # flagship: KG pipeline triples/sec at corpus scale matching sf
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples

    # steady-state policy (BENCH/BASELINE.md): the kg plan's codegen is
    # distinct from the 14 queries above — warm it on a tiny corpus so
    # the timed run isn't a 2x cold-compile outlier
    extract_triples(generate_corpus(spark, n_docs=2000)).count()
    spark.catalog.clearCache()

    kg_runs = []
    for _ in range(BENCH_REPS):
        s0 = _steal_jiffies()
        t0 = time.time()
        docs = generate_corpus(spark, sf=sf)
        triples = extract_triples(docs)
        n_triples = triples.count()
        sec = round(time.time() - t0, 3)
        kg_runs.append({"sec": sec, "steal_jiffies": _steal_jiffies() - s0})
        spark.catalog.clearCache()
    per_query_runs["kg_triples_e2e"] = kg_runs
    kg_sec = min(r["sec"] for r in kg_runs)
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
            "reps": BENCH_REPS,
            "per_query_runs": per_query_runs,
        },
    }
    if emit:
        print(json.dumps(out))
    spark.stop()
    return out


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _kg_once(spark, n_docs: int) -> tuple[float, int]:
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples

    t0 = time.time()
    n = extract_triples(generate_corpus(spark, n_docs=n_docs)).count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt, n


def run_kg_scaling_level(cpus: int, n_docs: int, reps: int) -> dict:
    """One parallelism level: warm-up run, then `reps` timed runs; report
    the best (min) — the sandbox host shows intermittent CPU-steal spikes
    of hundreds of CPU-seconds, so single-shot timings are meaningless;
    best-of-N with per-run steal jiffies makes the comparison honest."""
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-scale-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    _kg_once(spark, 2000)  # warm JVM/codegen
    runs = []
    for _ in range(reps):
        s0 = _steal_jiffies()
        dt, n = _kg_once(spark, n_docs)
        runs.append({"sec": round(dt, 2), "steal_jiffies": _steal_jiffies() - s0})
    spark.stop()
    best = min(r["sec"] for r in runs)
    return {"cpus": cpus, "best_sec": best, "triples": n, "runs": runs}


def run_kg_scaling_level_cluster(
    n_exec: int, cores: int, mem_mb: int, n_docs: int, reps: int
) -> dict:
    """One *executor-count* level: Spark's local-cluster master spawns
    `n_exec` separate executor JVMs (own heap, GC, block manager, shuffle
    path — the per-executor resources that a single shared JVM serializes
    on), which is the faithful sandbox form of the north_rule's 'N and 4N
    executors on a multi-executor cluster'."""
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-scale-exec{n_exec}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=n_exec * cores * 2,
        # local-cluster's third arg is the WORKER allotment; executors
        # still default to a 1g heap unless told otherwise (observed
        # executor OOM at 1M docs with the default)
        extra_conf={"spark.executor.memory": f"{mem_mb - 1024}m"},
    )
    _kg_once(spark, 2000)  # warm executor JVMs/codegen
    runs = []
    for _ in range(reps):
        s0 = _steal_jiffies()
        dt, n = _kg_once(spark, n_docs)
        runs.append({"sec": round(dt, 2), "steal_jiffies": _steal_jiffies() - s0})
    spark.stop()
    best = min(r["sec"] for r in runs)
    return {"executors": n_exec, "cores": cores, "best_sec": best,
            "triples": n, "runs": runs}


def run_scaling_cluster(
    n_docs: int = 1_000_000,
    reps: int = 2,
    levels: tuple = (1, 4),
    cores: int = 2,
    mem_mb: int = 8192,
) -> dict:
    """N-vs-4N *executor* scaling on the flagship job: identical KG
    pipeline on local-cluster[N,cores,mem] vs local-cluster[4N,cores,mem]
    (fresh cluster per level via subprocess), shuffle partitions scaled
    with total cores. Efficiency = (T_N / T_4N) / 4.

    This is the measurement the single-JVM local[N] mode cannot give:
    beyond ~8 threads one JVM saturates on GC/blockmanager/memory
    bandwidth (BENCH/BASELINE.md), while executor JVMs scale those
    resources *with* the executor count exactly as a real cluster does.

    Default pair is 1 -> 4 executors (2 -> 8 cores): measured across
    1/2/4/8 executors, this VM's *hardware* (memory bandwidth,
    oversubscribed host vCPUs) stops scaling beyond ~8-10 busy cores —
    2 -> 8 executors (4 -> 16 cores) lands in that saturated regime and
    reads ~0.5 regardless of engine quality; 1 -> 4 keeps every added
    core backed by real silicon, which is what 'N to 4N executors on a
    real cluster' means. Both pairs are reported in BENCH/BASELINE.md."""
    import subprocess

    if len(levels) != 2:
        # fail BEFORE the expensive subprocess runs: the efficiency math
        # below unpacks exactly two levels
        raise ValueError(f"levels must be exactly (lo, hi), got {levels!r}")

    results = {}
    for n_exec in levels:
        if results:
            # let the previous level's worker/executor JVMs exit fully —
            # overlapping heaps transiently double memory and can OOM the
            # next level's executors (observed once at 1M docs)
            time.sleep(20)
        cmd = [sys.executable, os.path.abspath(__file__), "--scale-level-cluster",
               str(n_exec), str(cores), str(mem_mb), str(n_docs), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"scale level {n_exec} failed (see stderr above)")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n_exec] = json.loads(line)
        # emit per-level as it lands so a later-level failure never loses
        # an already-measured (expensive) level
        sys.stderr.write(f"level {n_exec}: {line}\n")

    lo, hi = levels
    t_lo, t_hi = results[lo]["best_sec"], results[hi]["best_sec"]
    n = results[hi]["triples"]
    speedup = t_lo / t_hi
    out = {
        "metric": f"scaling_efficiency_exec_{lo}_to_{hi}",
        "value": round(speedup / (hi / lo), 4),
        "unit": "ratio",
        "queries": {
            f"t_exec{lo}_sec": t_lo,
            f"t_exec{hi}_sec": t_hi,
            "speedup": round(speedup, 4),
        },
        "sf": n_docs / 500_000,
        "extra": {
            "job": "kg_triples_e2e",
            "mode": f"local-cluster[N,{cores},{mem_mb}]",
            "n_docs": n_docs,
            "triples": n,
            f"tps_exec{lo}": round(n / t_lo, 1),
            f"tps_exec{hi}": round(n / t_hi, 1),
            f"runs_exec{lo}": results[lo]["runs"],
            f"runs_exec{hi}": results[hi]["runs"],
        },
    }
    print(json.dumps(out))
    return out


def run_memory_pressure(
    n_docs: int = 1_000_000,
    n_exec: int = 4,
    cores: int = 2,
    mem_mb: int = 4096,
    reps: int = 2,
) -> dict:
    """The last 100x-scale failure mode the sandbox can exercise (round-5
    verdict order 7): the flagship at HALVED executor memory
    (local-cluster[4,2,4096] -> 3g heaps vs the scaling evidence's 7g).
    A scale-ready plan must degrade to disk spill — bounded slowdown, no
    executor OOM. Spill totals come from the Spark UI REST API
    (memoryBytesSpilled / diskBytesSpilled summed over completed stages);
    results land in BENCH/memory_pressure_r05.json and the wall is
    compared against the same-docs 7g rep in BENCH/BASELINE.md."""
    import urllib.request

    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-memlow-exec{n_exec}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=n_exec * cores * 2,
        extra_conf={
            "spark.executor.memory": f"{mem_mb - 1024}m",
            # the spill numbers come from the UI REST API (get_spark
            # disables the UI by default)
            "spark.ui.enabled": "true",
        },
    )
    _kg_once(spark, 2000)  # warm executor JVMs/codegen
    runs = []
    for _ in range(reps):
        s0 = _steal_jiffies()
        dt, n = _kg_once(spark, n_docs)
        runs.append({"sec": round(dt, 2), "steal_jiffies": _steal_jiffies() - s0})

    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    spark.stop()

    spilled = [s for s in stages if s.get("memoryBytesSpilled", 0) > 0]
    out = {
        "metric": "memory_pressure_flagship",
        "value": min(r["sec"] for r in runs),
        "unit": "sec",
        "sf": n_docs / 500_000,
        "extra": {
            "mode": f"local-cluster[{n_exec},{cores},{mem_mb}]",
            "executor_heap_mb": mem_mb - 1024,
            "n_docs": n_docs,
            "triples": n,
            "runs": runs,
            "memory_bytes_spilled": sum(
                s.get("memoryBytesSpilled", 0) for s in stages
            ),
            "disk_bytes_spilled": sum(s.get("diskBytesSpilled", 0) for s in stages),
            "stages_spilled": len(spilled),
            "stages_total": len(stages),
            "oom": False,  # reaching this line means no executor OOM ended the job
        },
    }
    hist_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(hist_dir, exist_ok=True)
    with open(os.path.join(hist_dir, "memory_pressure_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


def run_pipeline_stages_level(
    n_exec: int, cores: int, mem_mb: int, n_docs: int, reps: int
) -> dict:
    """One executor-count level of the STAGED pipeline (docs -> ... ->
    edges, checkpointed stage writes + lineage/metrics tables): per-stage
    wall seconds and output rows, best-of-reps. This is the
    stage-resolution twin of run_kg_scaling_level_cluster — the round-2
    persist fix was found by ad-hoc stage decomposition; recording the
    decomposition per level makes the next regression localizable from
    metrics instead of re-instrumentation."""
    import tempfile

    from pyspark.sql import functions as F

    from corporate_knowledge_extractor_spark.plans.pipeline import Pipeline
    from corporate_knowledge_extractor_spark.session import get_spark
    from corporate_knowledge_extractor_spark.sources.sinks import read_table

    spark = get_spark(
        app_name=f"ckg-stages-exec{n_exec}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=n_exec * cores * 2,
        extra_conf={"spark.executor.memory": f"{mem_mb - 1024}m"},
    )
    # warm executor JVMs / codegen on a tiny staged run (distinct plan
    # shapes vs the extract-only scaling job)
    Pipeline(spark, tempfile.mkdtemp(prefix="ckg_stwarm_")).run(
        sf=2000 / 500_000, resume=False
    )
    spark.catalog.clearCache()

    runs = []
    for _ in range(reps):
        base = tempfile.mkdtemp(prefix="ckg_stages_")
        s0 = _steal_jiffies()
        r = Pipeline(spark, base).run(sf=n_docs / 500_000, resume=False)
        steal = _steal_jiffies() - s0
        rows = {
            row["stage"]: int(row["rows"])
            for row in read_table(spark, f"{base}/lineage")
            .groupBy("stage")
            .agg(F.sum("output_rows").alias("rows"))
            .collect()
        }
        runs.append(
            {
                "stage_seconds": {k: round(v, 2) for k, v in r.stage_seconds.items()},
                "stage_rows": rows,
                "steal_jiffies": steal,
            }
        )
        spark.catalog.clearCache()
    spark.stop()
    stages = list(runs[0]["stage_seconds"])
    best = {
        s: min(rep["stage_seconds"][s] for rep in runs) for s in stages
    }
    return {
        "executors": n_exec,
        "cores": cores,
        "best_stage_seconds": best,
        "total_best_sec": round(sum(best.values()), 2),
        "stage_rows": runs[0]["stage_rows"],
        "runs": runs,
    }


def run_scaling_stages(
    n_docs: int = 100_000,
    reps: int = 2,
    levels: tuple = (1, 4),
    cores: int = 2,
    mem_mb: int = 8192,
) -> dict:
    """Per-stage N-vs-4N executor scaling of the full staged Pipeline
    (fresh local-cluster per level via subprocess, same protocol as
    run_scaling_cluster). Emits per-stage wall at both levels plus the
    per-stage speedup/efficiency, so a future scaling regression points
    at its stage directly."""
    import subprocess

    if len(levels) != 2:
        raise ValueError(f"levels must be exactly (lo, hi), got {levels!r}")

    results = {}
    for n_exec in levels:
        if results:
            time.sleep(20)  # let the previous level's executor JVMs exit
        cmd = [sys.executable, os.path.abspath(__file__), "--stage-level-cluster",
               str(n_exec), str(cores), str(mem_mb), str(n_docs), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"stage scaling level {n_exec} failed")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n_exec] = json.loads(line)
        sys.stderr.write(f"stage level {n_exec}: {line}\n")

    lo, hi = levels
    blo, bhi = results[lo]["best_stage_seconds"], results[hi]["best_stage_seconds"]
    per_stage = {
        s: {
            f"t_exec{lo}_sec": blo[s],
            f"t_exec{hi}_sec": bhi[s],
            "speedup": round(blo[s] / bhi[s], 3) if bhi[s] > 0 else None,
            "efficiency": round(blo[s] / bhi[s] / (hi / lo), 3) if bhi[s] > 0 else None,
        }
        for s in blo
    }
    t_lo = results[lo]["total_best_sec"]
    t_hi = results[hi]["total_best_sec"]
    out = {
        "metric": f"stage_scaling_exec_{lo}_to_{hi}",
        "value": round(t_lo / t_hi / (hi / lo), 4),
        "unit": "ratio",
        "queries": {f"t_exec{lo}_sec": t_lo, f"t_exec{hi}_sec": t_hi},
        "sf": n_docs / 500_000,
        "extra": {
            "job": "staged_pipeline_e2e",
            "mode": f"local-cluster[N,{cores},{mem_mb}]",
            "n_docs": n_docs,
            "per_stage": per_stage,
            "stage_rows": results[hi]["stage_rows"],
            f"runs_exec{lo}": results[lo]["runs"],
            f"runs_exec{hi}": results[hi]["runs"],
        },
    }
    # scaling history: every run appends its per-stage efficiencies to a
    # durable log next to the other bench evidence, so a regression is a
    # one-line diff against the previous entry instead of a re-run
    hist_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    os.makedirs(hist_dir, exist_ok=True)
    with open(os.path.join(hist_dir, "stage_scaling_history.jsonl"), "a") as f:
        f.write(json.dumps({
            "levels": list(levels), "n_docs": n_docs,
            "per_stage": per_stage,
            "totals": {f"t_exec{lo}_sec": t_lo, f"t_exec{hi}_sec": t_hi},
        }) + "\n")
    print(json.dumps(out))
    return out


def run_scaling(n_docs: int = 500_000, reps: int = 3, levels: tuple = (2, 8)) -> None:
    """N-vs-4N scaling evidence on the flagship job (BASELINE.json metric:
    triples/sec end-to-end): identical KG pipeline at local[N] and
    local[4N] (fresh JVM each via subprocess), shuffle partitions scaled
    with cores. Efficiency = (T_N / T_4N) / 4.

    Default levels are 2 and 8: measured across 2/4/8/16/32 threads, this
    sandbox VM scales near-linearly to ~8 threads and saturates beyond
    (flat wall-clock 16->32; single-JVM memory bandwidth + oversubscribed
    host vCPUs), so 2-vs-8 is the regime where added cores represent real
    hardware — full matrix and discussion in BENCH/BASELINE.md."""
    import subprocess

    results = {}
    for cpus in levels:
        cmd = [sys.executable, os.path.abspath(__file__), "--scale-level",
               str(cpus), str(n_docs), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True, check=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = levels
    t_lo, t_hi = results[lo]["best_sec"], results[hi]["best_sec"]
    n = results[hi]["triples"]
    speedup = t_lo / t_hi
    out = {
        "metric": f"scaling_efficiency_{lo}_to_{hi}",
        "value": round(speedup / (hi / lo), 4),
        "unit": "ratio",
        "queries": {
            f"t_local{lo}_sec": t_lo,
            f"t_local{hi}_sec": t_hi,
            "speedup": round(speedup, 4),
        },
        "sf": n_docs / 500_000,
        "extra": {
            "job": "kg_triples_e2e",
            "n_docs": n_docs,
            "triples": n,
            f"tps_local{lo}": round(n / t_lo, 1),
            f"tps_local{hi}": round(n / t_hi, 1),
            f"runs_local{lo}": results[lo]["runs"],
            f"runs_local{hi}": results[hi]["runs"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling-cluster" in sys.argv:
        run_scaling_cluster()
    elif "--memory-pressure" in sys.argv:
        run_memory_pressure()
    elif "--scaling-stages" in sys.argv:
        run_scaling_stages()
    elif "--stage-level-cluster" in sys.argv:
        i = sys.argv.index("--stage-level-cluster")
        print(json.dumps(run_pipeline_stages_level(
            int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]),
            int(sys.argv[i + 4]), int(sys.argv[i + 5])
        )))
    elif "--scale-level-cluster" in sys.argv:
        i = sys.argv.index("--scale-level-cluster")
        print(json.dumps(run_kg_scaling_level_cluster(
            int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3]),
            int(sys.argv[i + 4]), int(sys.argv[i + 5])
        )))
    elif "--scaling" in sys.argv:
        run_scaling()
    elif "--scale-level" in sys.argv:
        i = sys.argv.index("--scale-level")
        print(json.dumps(run_kg_scaling_level(
            int(sys.argv[i + 1]), int(sys.argv[i + 2]), int(sys.argv[i + 3])
        )))
    elif "--single" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--single") + 1])
        run_bench(cpus=cpus)
    else:
        run_bench()
