"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a crossJoin against the (tiny,
broadcast) query set with a native fused dot-product/norm expression.
Scale path: LSH-bucketed ANN — random-hyperplane signs bucket the
corpus; only the query's bucket (plus multiprobe neighbors) is scanned.
Both are pure `pyspark.sql.functions` (zip_with + aggregate fold);
no UDF, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k per query: broadcast the query set, score everything,
    window-rank. Returns (query_id, vec_id, cosine_sim, rank). Ties break
    on vec_id for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = embeddings.crossJoin(F.broadcast(q)).withColumn(
        "cosine_sim", F.round(cosine(F.col(vec_col), F.col("_qvec")), 4)
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (LCG; no wall-clock seeds)."""
    out = []
    x = (plane_idx + 1) * 2654435761 % 2**32
    for _ in range(dim):
        x = (1103515245 * x + 12345) % 2**31
        out.append((x / 2**30) - 1.0)  # in [-1, 1)
    return out


def lsh_bucket(vec: F.Column, dim: int, num_planes: int = 12) -> F.Column:
    """Random-hyperplane sign bucket (integer in [0, 2^num_planes))."""
    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket instead of crossJoin.
    Recall < 1 by design; at 100 TB this is the difference between
    scanning a handful of buckets and scanning everything.

    ``multiprobe=1`` (default) also probes every Hamming-1 neighbor of
    the query's bucket — the standard multiprobe-LSH recall lift: a
    vector near a hyperplane lands on either side with ~equal odds, so
    the 1-bit-flipped buckets hold most of the lost neighbors. The
    explode happens on the (tiny, broadcast) query side only; the corpus
    is still bucketed exactly once, so scan cost is
    (1 + num_planes) / 2^num_planes of the corpus per query.
    ``multiprobe=0`` probes the exact bucket only."""
    e = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, num_planes))
    base_bucket = lsh_bucket(F.col(vec_col), dim, num_planes)
    probes = [base_bucket]
    if multiprobe >= 1:
        probes += [
            base_bucket.bitwiseXOR(F.lit(1 << p).cast("long"))
            for p in range(num_planes)
        ]
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(F.array(*probes)).alias("_bucket"),
    )
    scored = e.join(F.broadcast(q), "_bucket").withColumn(
        "cosine_sim", F.round(cosine(F.col(vec_col), F.col("_qvec")), 4)
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )
