#!/usr/bin/env python
"""A/B the guarded redaction chain vs the plain 3x regexp_replace form
(guide §1.2 per-task work). Identity asserted on the full sf1.0 mention
surfaces AND on an adversarial frame (names/emails/phones/digit-bearing
identifiers/nulls); CPU jiffies primary."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _java_cpu() -> int:
    out = subprocess.run(
        ["pgrep", "-P", str(os.getpid()), "java"], capture_output=True, text=True
    ).stdout.split()
    t = 0
    for pid in out:
        try:
            p = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
            t += int(p[11]) + int(p[12])
        except OSError:
            pass
    return t


def plain_redact(col, cfg):
    from corporate_knowledge_extractor_spark.functions import rules

    out = col
    out = F.regexp_replace(out, cfg.name_pattern, rules.MASK_PERSON)
    out = F.regexp_replace(out, cfg.email_pattern, rules.MASK_EMAIL)
    out = F.regexp_replace(out, cfg.phone_pattern, rules.MASK_PHONE)
    return out


def main(sf: float, reps: int) -> None:
    from corporate_knowledge_extractor_spark.config import RedactionConfig
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.operators.mentions import (
        junk_block_filter,
        mention_stage,
    )
    from corporate_knowledge_extractor_spark.operators.redact import redact_expr
    from corporate_knowledge_extractor_spark.operators.segment import (
        DOC_KEY,
        assign_blocks,
        split_lines,
    )
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="ckg-redact-ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    cfg = RedactionConfig()

    # adversarial identity frame
    adv = spark.createDataFrame(
        [
            ("Alice Smith wrote this",),
            ("mail bob@example.com now",),
            ("call +1 415-555-0199 x",),
            ("ident_1234567890123 foo",),
            ("x1234567890",),
            ("plain_identifier",),
            ("Alice Smith bob@x.io +12345678901",),
            (None,),
            ("",),
            ("# Maintainer: Carol Chen carol@corp.io",),
        ],
        "s string",
    )
    a = adv.select(plain_redact(F.col("s"), cfg).alias("r")).collect()
    b = adv.select(redact_expr(F.col("s"), cfg).alias("r")).collect()
    assert [r.r for r in a] == [r.r for r in b], (a, b)
    print("adversarial identity ok", flush=True)

    def mentions(sf_):
        docs = generate_corpus(spark, sf=sf_).repartition(*DOC_KEY)
        return mention_stage(junk_block_filter(assign_blocks(split_lines(docs))))

    m_small = mentions(0.02)
    ga = m_small.select(plain_redact(F.col("surface"), cfg).alias("r")).collect()
    gb = m_small.select(redact_expr(F.col("surface"), cfg).alias("r")).collect()
    assert sorted(x.r for x in ga) == sorted(x.r for x in gb)
    print(f"corpus identity ok ({len(ga)} surfaces at sf0.02)", flush=True)

    variants = {
        "plain": lambda m: m.select(plain_redact(F.col("surface"), cfg).alias("r")),
        "guarded": lambda m: m.select(redact_expr(F.col("surface"), cfg).alias("r")),
    }
    for v in variants.values():
        v(mentions(0.004)).write.format("noop").mode("overwrite").save()
    results = {k: [] for k in variants}
    for r in range(reps):
        for name, v in variants.items():
            spark.sparkContext.setJobDescription(f"redact-ab:{name}:rep{r}")
            c0, t0 = _java_cpu(), time.time()
            v(mentions(sf)).write.format("noop").mode("overwrite").save()
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
