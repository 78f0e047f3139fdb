#!/usr/bin/env python
"""Round-6 experiment: minhash signature/banding strategy shootout.

The round-5 profile shows minhash_neardup dominated by the signature
stage: 32 interpreted array_min(transform(...)) passes over the shingle
hash array (higher-order lambdas are not codegen'd — guide §4.1/§4.2).

Variants measured here (same sf1.0 documents input, noop-forced):
  A. current  — minhash_lsh_pairs as shipped
  B. explode  — explode shingle hashes, groupBy(id).agg(32 codegen'd
                min((h*a+b)%P) columns) — all JVM whole-stage codegen
  C. arrow    — signature via one pandas UDF (numpy reduceat over the
                Arrow list column), hashes still JVM xxhash64

Each variant must emit the IDENTICAL final pair set (asserted).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.session import get_spark
from corporate_knowledge_extractor_spark.operators.dedup import (
    DOC_DEDUP_CFG, minhash_lsh_pairs, normalize_text, spread, word_shingles,
)
from corporate_knowledge_extractor_spark.operators.linking import (
    _P, _perm_params, candidate_id_pairs, shingle_hashes,
)
from corporate_knowledge_extractor_spark.materialize import materialize

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CFG = DOC_DEDUP_CFG


def base_table(docs):
    sh = word_shingles(F.col("t"), CFG.shingle_size)
    return materialize(
        spread(
            docs.select(F.col("doc_id").alias("id"),
                        normalize_text(F.col("text")).alias("t")), "id"
        ).select("id", sh.alias("sh"))
    )


def banded_current(base):
    from corporate_knowledge_extractor_spark.operators.linking import lsh_band_keys

    return lsh_band_keys(base, "id", F.col("sh"), CFG)


def banded_explode(base):
    rows_per_band = CFG.num_hashes // CFG.num_bands
    params = _perm_params(CFG.num_hashes)
    h = F.pmod(F.xxhash64(F.col("s")), F.lit(_P))
    exploded = base.select("id", F.explode("sh").alias("s")).select(
        "id", h.alias("h")
    )
    sig_cols = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_P)).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sigs = exploded.groupBy("id").agg(*sig_cols)
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(j),
                F.array(*[F.col(f"m{j * rows_per_band + r}")
                          for r in range(rows_per_band)]),
            )
            for j in range(CFG.num_bands)
        ]
    )
    return sigs.withColumn("band_key", F.explode(bands)).select("band_key", "id")


def banded_arrow(base):
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType

    params = _perm_params(CFG.num_hashes)
    A = np.array([a for a, _ in params], dtype=np.int64)
    B = np.array([b for _, b in params], dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(hash_arrays):
        out = []
        for arr in hash_arrays:
            h = np.asarray(arr, dtype=np.int64)
            m = (h[:, None] * A[None, :] + B[None, :]) % _P
            out.append(m.min(axis=0))
        return pd.Series(out)

    rows_per_band = CFG.num_hashes // CFG.num_bands
    df = base.withColumn("_h", shingle_hashes(F.col("sh"))).withColumn(
        "_sig", sig_udf(F.col("_h"))
    )
    bands = F.array(
        *[
            F.xxhash64(
                F.lit(j), F.slice(F.col("_sig"), j * rows_per_band + 1, rows_per_band)
            )
            for j in range(CFG.num_bands)
        ]
    )
    return df.withColumn("band_key", F.explode(bands)).select("band_key", "id")


def verify_pairs(base, banded):
    pairs = materialize(candidate_id_pairs(banded, CFG))
    cand_ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh_tbl = base.join(cand_ids, "id", "left_semi").select("id", "sh")
    a = sh_tbl.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh_tbl.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", F.round(jac, 4))
        .where(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
    )


def main():
    spark = get_spark(app_name="exp-minhash", master="local[32]", shuffle_partitions=32)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # timing: full pair pipeline per variant (includes base build)
    results = {}
    for name, fn in [("current", banded_current), ("explode", banded_explode),
                     ("arrow", banded_arrow)]:
        for rep in range(2):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            base = base_table(docs0)
            out = verify_pairs(base, fn(base))
            noop(out)
            dt = time.time() - t0
            results.setdefault(name, []).append(round(dt, 2))
            spark.catalog.clearCache()
        print(name, results[name], flush=True)

    # equality: same final pairs for all variants
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = base_table(docs0)
    ref = sorted(map(tuple, verify_pairs(base, banded_current(base)).collect()))
    for name, fn in [("explode", banded_explode), ("arrow", banded_arrow)]:
        got = sorted(map(tuple, verify_pairs(base, fn(base)).collect()))
        assert got == ref, f"{name} mismatch: {len(got)} vs {len(ref)}"
        print(f"{name}: pairs identical ({len(ref)})", flush=True)
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
