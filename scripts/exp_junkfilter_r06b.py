#!/usr/bin/env python
"""A/B the junk-block filter forms (guide §1: measure in one session,
CPU-jiffy primary): OLD = max over a (doc, block) window (second full
sort of the line table), NEW = fwd-max/bwd-min running aggregates over
the (doc, line_no) sort assign_blocks already pays for. Both forced
through the mention stage (detect + caps) so the measured region is the
real mentions chain; identical output rows asserted first.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

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


def junk_old(blocked_lines: DataFrame) -> DataFrame:
    from corporate_knowledge_extractor_spark.functions import rules
    from corporate_knowledge_extractor_spark.operators.segment import DOC_KEY

    low = F.lower(F.col("line"))
    is_junk_line = F.lit(False)
    for p in rules.JUNK_BLOCK_PATTERNS:
        is_junk_line = is_junk_line | F.contains(low, F.lit(p))
    w = W.partitionBy(*DOC_KEY, "block_id")
    return (
        blocked_lines.withColumn("_junk", F.max(is_junk_line.cast("int")).over(w))
        .where(F.col("_junk") == 0)
        .drop("_junk")
    )


def main(sf: float, reps: int) -> None:
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.operators.mentions import (
        junk_block_filter,
        mention_stage,
    )
    from corporate_knowledge_extractor_spark.operators.segment import (
        assign_blocks,
        split_lines,
    )
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="ckg-junk-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )

    def chain(jf, sf_):
        docs = generate_corpus(spark, sf=sf_)
        return mention_stage(jf(assign_blocks(split_lines(docs))))

    # identity check on a small corpus
    a = chain(junk_old, 0.02).collect()
    b = chain(junk_block_filter, 0.02).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "variant rows differ!"
    print(f"identity ok ({len(a)} mention rows at sf0.02)", flush=True)

    variants = {"old_blockwin": junk_old, "new_runagg": junk_block_filter}
    # warm both plan shapes
    for v in variants.values():
        chain(v, 0.004).write.format("noop").mode("overwrite").save()

    results = {k: [] for k in variants}
    for r in range(reps):
        for name, v in variants.items():
            spark.sparkContext.setJobDescription(f"junk-ab:{name}:rep{r}")
            c0, t0 = _java_cpu(), time.time()
            chain(v, sf).write.format("noop").mode("overwrite").save()
            rec = {"sec": round(time.time() - t0, 2), "cpu": _java_cpu() - c0}
            results[name].append(rec)
            print(json.dumps({name: rec}), flush=True)
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
