#!/usr/bin/env python
"""Round-6 experiment: lang_id + category_argmax scoring strategies.

lang_id's per-language stopword hit count is an interpreted
filter(tokens, t -> array_contains(...)) — higher-order lambdas are not
codegen'd. Variant B restates the token-hit count as a single
regexp_count over the normalized text with boundary lookarounds: a token
equals a stopword iff the stopword appears delimited by spaces/ends in
the space-collapsed string — one codegen'd pass per language, no array.

category_argmax's per-category score is size(filter(keywords,
kw -> contains(text, kw))) — variant B restates it as a sum of
contains(text, kw) casts, a plain codegen'd expression chain.

Both must yield the IDENTICAL result rows (asserted on full sf1.0).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.session import get_spark
from corporate_knowledge_extractor_spark.operators import textstats
from corporate_knowledge_extractor_spark.functions import rules

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def lang_id_regexp(col):
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    scored = F.array(
        *[
            F.struct(
                F.regexp_count(
                    norm,
                    F.lit("(?:^|(?<= ))(?:" + "|".join(words) + ")(?= |$)"),
                ).alias("score"),
                F.lit(-i).alias("neg_order"),
                F.lit(lang).alias("name"),
            )
            for i, (lang, words) in enumerate(textstats.LANG_STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["name"]).otherwise(F.lit("und"))


def category_sum(text_col):
    scored = F.array(
        *[
            F.struct(
                sum(
                    [F.contains(text_col, F.lit(k)).cast("int") for k in kws],
                    F.lit(0),
                ).alias("score"),
                F.lit(-i).alias("neg_order"),
                F.lit(cat).alias("name"),
            )
            for i, (cat, kws) in enumerate(rules.CATEGORY_KEYWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["name"]).otherwise(
        F.lit(rules.DEFAULT_CATEGORY)
    )


def main():
    spark = get_spark(app_name="exp-langid", master="local[32]", shuffle_partitions=32)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def q_lang(pred_fn):
        return (
            d.withColumn("pred_lang", pred_fn(F.col("text")))
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def cat_current(text_col):
        scored = F.array(
            *[
                F.struct(
                    F.size(
                        F.filter(
                            F.array(*[F.lit(k) for k in kws]),
                            lambda kw: F.contains(text_col, kw),
                        )
                    ).alias("score"),
                    F.lit(-i).alias("neg_order"),
                    F.lit(cat).alias("name"),
                )
                for i, (cat, kws) in enumerate(rules.CATEGORY_KEYWORDS)
            ]
        )
        best = F.array_max(scored)
        return F.when(best["score"] > 0, best["name"]).otherwise(
            F.lit(rules.DEFAULT_CATEGORY)
        )

    def q_cat(cat_fn):
        return (
            d.withColumn("category", cat_fn(F.col("text")))
            .groupBy("category").agg(F.count(F.lit(1)).alias("n_docs"))
        )

    for name, df_fn in [
        ("lang_current", lambda: q_lang(textstats.lang_id)),
        ("lang_regexp", lambda: q_lang(lang_id_regexp)),
        ("cat_current", lambda: q_cat(cat_current)),
        ("cat_sum", lambda: q_cat(category_sum)),
    ]:
        times = []
        for rep in range(3):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            noop(df_fn())
            times.append(round(time.time() - t0, 2))
        print(name, times, flush=True)

    ref = sorted(map(tuple, q_lang(textstats.lang_id).collect()))
    got = sorted(map(tuple, q_lang(lang_id_regexp).collect()))
    assert got == ref, f"lang mismatch {got[:5]} vs {ref[:5]}"
    print("lang: results identical", flush=True)
    ref = sorted(map(tuple, q_cat(cat_current).collect()))
    got = sorted(map(tuple, q_cat(category_sum).collect()))
    assert got == ref, f"cat mismatch {got} vs {ref}"
    print("cat: results identical", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


def lang_id_extract_once(col):
    """Variant C: one regexp_extract_all pass pulls out ONLY the stopword
    tokens (few per doc); per-language counts then filter that tiny array."""
    all_words = [w for _, ws in textstats.LANG_STOPWORDS for w in ws]
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    hits = F.regexp_extract_all(
        norm, F.lit("(?:^|(?<= ))(" + "|".join(all_words) + ")(?= |$)"), 1
    )
    scored = F.array(
        *[
            F.struct(
                F.size(
                    F.filter(
                        hits,
                        lambda t: F.array_contains(
                            F.array(*[F.lit(w) for w in words]), t
                        ),
                    )
                ).alias("score"),
                F.lit(-i).alias("neg_order"),
                F.lit(lang).alias("name"),
            )
            for i, (lang, words) in enumerate(textstats.LANG_STOPWORDS)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["score"] > 0, best["name"]).otherwise(F.lit("und"))


def main2():
    spark = get_spark(app_name="exp-langid2", master="local[32]", shuffle_partitions=32)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def q_lang(pred_fn):
        return (
            d.withColumn("pred_lang", pred_fn(F.col("text")))
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    for name, fn in [("lang_regexp", lang_id_regexp),
                     ("lang_extract_once", lang_id_extract_once)]:
        times = []
        for rep in range(3):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            noop(q_lang(fn))
            times.append(round(time.time() - t0, 2))
        print(name, times, flush=True)

    ref = sorted(map(tuple, q_lang(textstats.lang_id).collect()))
    got = sorted(map(tuple, q_lang(lang_id_extract_once).collect()))
    assert got == ref, f"extract_once mismatch"
    print("extract_once: results identical", flush=True)
    spark.stop()
