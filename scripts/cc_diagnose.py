"""CC hop-fusion diagnose (round 5): hops_per_job=1 vs 2 at 1 vs 4 executors.

The round-5 stage scaling caught `hops_per_job=2` TRIPLING the components
stage (15.4 -> 47.8 s @1 exec, anti-scaling 60.6 s @4): an intermediate
hop's aggregate fed three consumers inside one job (next hop's cold join,
hot semi-join, union) and, unpersisted, each re-executed the whole hop
subtree. canonicalize.py now lazily persists intermediate hops; this
script measures whether the FIXED fusion actually beats hops=1, on the
two graph shapes that bracket the operator's use:

* "alias"  — the pipeline's own shape: a shallow hub-heavy alias pool
  (36k vertices / ~730k edges, converges in a few hops). Fusion can only
  save driver-round latency here.
* "chain"  — deep components (chains of length 24), the regime the
  round-4 verdict flagged (`neardup_clusters` over a large near-dup
  graph): 23 propagation hops, so job count halves under fusion.

Writes BENCH/cc_diagnose_r05.json. Usage: python scripts/cc_diagnose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _build_graphs(spark, base: str) -> None:
    from pyspark.sql import functions as F

    # alias shape: 36k vertices, 730k edges; 500 hubs take most endpoints
    v_alias = 36_000
    e_alias = 730_000
    spark.range(v_alias).select(F.col("id").alias("entity_id")).write.mode(
        "overwrite"
    ).parquet(f"{base}/v_alias")
    (
        spark.range(e_alias)
        .select(
            F.pmod(F.xxhash64(F.col("id")), F.lit(500)).alias("id_a"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(v_alias)).alias("id_b"),
        )
        .write.mode("overwrite")
        .parquet(f"{base}/e_alias")
    )

    # chain shape: 100k vertices in chains of 12 -> 11 hops to converge
    # (long enough that hops=2 halves the driver-round count; a first
    # attempt with 24-long chains x 2 reps ran >1h at 1 executor --
    # each round pays a parquet lineage cut, so round count is the cost)
    v_chain = 100_000
    chain_len = 12
    spark.range(v_chain).select(F.col("id").alias("entity_id")).write.mode(
        "overwrite"
    ).parquet(f"{base}/v_chain")
    (
        spark.range(v_chain)
        .where(F.pmod(F.col("id"), F.lit(chain_len)) != chain_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .write.mode("overwrite")
        .parquet(f"{base}/e_chain")
    )


def run_level(n_exec: int, cores: int, mem_mb: int, reps: int) -> dict:
    import tempfile

    from corporate_knowledge_extractor_spark.config import CanonicalizeConfig
    from corporate_knowledge_extractor_spark.operators.canonicalize import (
        connected_components,
    )
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-ccdiag-exec{n_exec}",
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]",
        shuffle_partitions=n_exec * cores * 2,
        extra_conf={"spark.executor.memory": f"{mem_mb - 1024}m"},
    )
    base = tempfile.mkdtemp(prefix="ckg_ccdiag_")
    _build_graphs(spark, base)

    out: dict = {"executors": n_exec, "cases": {}}
    for shape in ("alias", "chain"):
        v = spark.read.parquet(f"{base}/v_{shape}")
        e = spark.read.parquet(f"{base}/e_{shape}")
        for hops in (1, 2):
            # fuse_after=0: measure PURE per-hops behavior — the adaptive
            # default (unfused prefix) is derived FROM this measurement
            cfg = CanonicalizeConfig(
                max_iterations=40, hops_per_job=hops, fuse_after=0
            )
            rounds_seen: list[int] = []

            def once():
                rounds_seen.clear()
                s0, t0 = _steal(), time.time()
                res = connected_components(
                    v,
                    e,
                    cfg,
                    scratch_dir=f"{base}/scratch_{shape}_{hops}",
                    on_iteration=lambda i, c: rounds_seen.append(i),
                )
                n = res.count()
                wall = time.time() - t0
                res.unpersist()
                spark.catalog.clearCache()
                return wall, _steal() - s0, n

            once()  # warm-up (JIT / codegen)
            runs = []
            n_labels = 0
            for _ in range(reps):
                wall, steal, n_labels = once()
                runs.append({"sec": round(wall, 2), "steal_jiffies": steal})
            out["cases"][f"{shape}_hops{hops}"] = {
                "best_sec": min(r["sec"] for r in runs),
                "runs": runs,
                "jobs_rounds": len(rounds_seen),
                "labels": n_labels,
            }
    print(json.dumps(out))
    return out


def main(levels=(1, 4), cores: int = 2, mem_mb: int = 8192, reps: int = 1) -> None:
    import subprocess

    results = {}
    for n_exec in levels:
        if results:
            time.sleep(15)
        cmd = [sys.executable, os.path.abspath(__file__), "--level",
               str(n_exec), str(cores), str(mem_mb), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"cc diagnose level {n_exec} failed")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[n_exec] = json.loads(line)
        sys.stderr.write(f"level {n_exec}: {line}\n")

    lo, hi = levels
    summary = {}
    for case in results[lo]["cases"]:
        t_lo = results[lo]["cases"][case]["best_sec"]
        t_hi = results[hi]["cases"][case]["best_sec"]
        summary[case] = {
            f"t_exec{lo}_sec": t_lo,
            f"t_exec{hi}_sec": t_hi,
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round(t_lo / t_hi / (hi / lo), 3),
            "jobs_rounds": results[lo]["cases"][case]["jobs_rounds"],
        }
    out = {
        "mode": f"local-cluster[N,{cores},{mem_mb}]",
        "per_case": summary,
        "runs": {str(k): v["cases"] for k, v in results.items()},
    }
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    with open(os.path.join(bench_dir, "cc_diagnose_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        run_level(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                  int(sys.argv[i + 3]), int(sys.argv[i + 4]))
    else:
        main()
