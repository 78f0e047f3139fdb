#!/usr/bin/env python
"""Second-pass round-6 profiling: per-JOB wall decomposition of a query
via the Spark UI REST API (guide §1.1/§7.1 — empirical loop). Jobs are
labelled with setJobDescription at each call site already; this harness
just turns the UI's job table into a wall-clock ledger.

  --minhash [--sf-dir DIR] [--reps N]
  --kg-split --sf SF            (wraps bench_extra semantics + job ledger)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _get_spark():
    from corporate_knowledge_extractor_spark.session import get_spark

    return get_spark(
        app_name="ckg-prof-r06b", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS, extra_conf={"spark.ui.enabled": "true"},
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _jobs(spark):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
    ) as r:
        return json.load(r)


def _ledger(spark, since_job_id):
    out = []
    for j in sorted(_jobs(spark), key=lambda x: x["jobId"]):
        if j["jobId"] <= since_job_id:
            continue
        t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        ms0 = int(j["submissionTime"][20:23])
        ms1 = int(j["completionTime"][20:23])
        dur = (time.mktime(t1) + ms1 / 1000) - (time.mktime(t0) + ms0 / 1000)
        out.append(
            {
                "jobId": j["jobId"],
                "sec": round(dur, 3),
                "desc": (j.get("description") or j["name"])[:110],
                "tasks": j["numCompletedTasks"],
            }
        )
    return out


def profile_minhash(sf_dir: str, reps: int) -> None:
    from corporate_knowledge_extractor_spark.plans.queries import REGISTRY

    spark = _get_spark()
    fn = REGISTRY["minhash_neardup"].fn
    # warm codegen
    _force(fn(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()
    for r in range(reps):
        last = max((j["jobId"] for j in _jobs(spark)), default=-1)
        t0 = time.time()
        _force(fn(spark, sf_dir))
        wall = time.time() - t0
        led = _ledger(spark, last)
        print(json.dumps({"rep": r, "wall": round(wall, 3),
                          "sum_jobs": round(sum(x["sec"] for x in led), 3)}))
        for x in led:
            print(f"  job {x['jobId']:>4} {x['sec']:>7.3f}s tasks={x['tasks']:>4} {x['desc']}")
        spark.catalog.clearCache()
    spark.stop()


def profile_kg(sf: float, reps: int) -> None:
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples

    spark = _get_spark()
    extract_triples(generate_corpus(spark, n_docs=2000)).count()
    spark.catalog.clearCache()
    for r in range(reps):
        last = max((j["jobId"] for j in _jobs(spark)), default=-1)
        t0 = time.time()
        n = extract_triples(generate_corpus(spark, sf=sf)).count()
        wall = time.time() - t0
        led = _ledger(spark, last)
        print(json.dumps({"rep": r, "wall": round(wall, 3), "triples": n,
                          "sum_jobs": round(sum(x["sec"] for x in led), 3)}))
        for x in led:
            print(f"  job {x['jobId']:>4} {x['sec']:>7.3f}s tasks={x['tasks']:>4} {x['desc']}")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]

    def _opt(flag, default=None):
        return args[args.index(flag) + 1] if flag in args else default

    reps = int(_opt("--reps", "3"))
    if "--minhash" in args:
        profile_minhash(_opt("--sf-dir", SF_DIR), reps)
    elif "--kg-split" in args:
        profile_kg(float(_opt("--sf", "1.0")), reps)
    else:
        print(__doc__)
