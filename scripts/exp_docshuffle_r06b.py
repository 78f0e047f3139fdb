#!/usr/bin/env python
"""A/B the placement of the extract's doc-key exchange (guide §2.3):
A = current (explode lines first, exchange the 25M-row line table),
B = repartition the 500k-doc table by doc key BEFORE split_lines, so the
exchange ships one content blob per doc and the downstream windows see
their clustering already satisfied (Generate preserves partitioning).
Identity asserted on a small corpus; CPU jiffies primary, wall secondary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _java_cpu() -> int:
    out = subprocess.run(
        ["pgrep", "-P", str(os.getpid()), "java"], capture_output=True, text=True
    ).stdout.split()
    total = 0
    for pid in out:
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += int(parts[11]) + int(parts[12])
        except OSError:
            pass
    return total


def main(sf: float, reps: int) -> None:
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.operators.segment import DOC_KEY
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="ckg-docshuffle-ab", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    def run_a(sf_):
        return extract_triples(generate_corpus(spark, sf=sf_))

    def run_b(sf_):
        docs = generate_corpus(spark, sf=sf_).repartition(*DOC_KEY)
        return extract_triples(docs)

    ra = sorted(map(tuple, run_a(0.02).collect()))
    spark.catalog.clearCache()
    rb = sorted(map(tuple, run_b(0.02).collect()))
    spark.catalog.clearCache()
    assert ra == rb, "variant rows differ!"
    print(f"identity ok ({len(ra)} triples at sf0.02)", flush=True)

    for v in (run_a, run_b):
        v(0.004).count()
        spark.catalog.clearCache()

    variants = {"A_line_exchange": run_a, "B_doc_exchange": run_b}
    results = {k: [] for k in variants}
    for r in range(reps):
        for name, v in variants.items():
            spark.sparkContext.setJobDescription(f"docshuffle:{name}:rep{r}")
            c0, t0 = _java_cpu(), time.time()
            n = v(sf).count()
            rec = {"sec": round(time.time() - t0, 2), "cpu": _java_cpu() - c0}
            results[name].append(rec)
            print(json.dumps({name: rec, "triples": n}), flush=True)
            spark.catalog.clearCache()
    for name, runs in results.items():
        print(
            f"{name}: best_wall={min(x['sec'] for x in runs)} "
            f"min_cpu={min(x['cpu'] for x in runs)}"
        )
    spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]

    def _opt(flag, default):
        return args[args.index(flag) + 1] if flag in args else default

    main(float(_opt("--sf", "1.0")), int(_opt("--reps", "3")))
