"""Staged-table writer/reader — the Iceberg seam.

On a real cluster every stage is an Iceberg table
(``df.writeTo(name).createOrReplace()`` / ``.append()``) so checkpoints
get snapshot isolation, partition evolution and time travel for free. The
sandbox image ships no Iceberg jars (see guide), so the same interface
falls back to parquet directories; `_SUCCESS` markers provide the
done-stage test the resume path needs. The reference analogue of these
writes is each stage's on-disk output dir (frames/, report.md, *.jsonl —
/root/reference/src/output/generator.py:9-57).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - not available in the sandbox image
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    _ICEBERG = False  # would probe spark.conf for the iceberg catalog
except Exception:  # pragma: no cover
    _ICEBERG = False


def table_exists(spark: SparkSession, path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# Fan-out ceiling for the post-read repartition below. Tables above it
# are assumed to arrive with enough native splits (row groups) to feed
# the cluster; at real scale every table clears this bar and the branch
# is inert. Parameterised so a deployment can disable (0) or retune it.
_FANOUT_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_MAX_BYTES", str(64 * 1024 * 1024))
)


def _table_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def load_testdata(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool = False
) -> DataFrame:
    """Driver testdata loader (TESTDATA.md tables).

    ``fanout=True`` requests scan parallelization for per-row-compute-
    heavy consumers: small driver tables arrive as a single parquet file
    with ONE row group (verified via footer metadata at sf1.0), and a row
    group is the atomic parquet read unit — no split setting can
    parallelize it, so every scan-fused stage (regex scoring, vector
    math, partial aggregation) runs on one core of the machine. Guide
    §2.5's unsplittable-input remedy applies: repartition immediately
    after the read. The round-robin exchange moves only the few MB the
    file holds, and the downstream compute runs at full parallelism —
    measured 3-8x on the sf1.0 text-scoring queries.

    It stays opt-in because it only pays when substantial per-row work
    precedes the first exchange: for plans whose first operation is a
    keyed shuffle (windows, cheap groupBys), the map side of that
    exchange IS the scan task either way, and the extra round-robin hop
    measurably lost time (dedup_exact_clusters +0.5 s at sf1.0). Tables
    above _FANOUT_MAX_BYTES keep their native splits — at 100-TB scale
    the branch is inert and the cap is env-tunable."""
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    df = spark.read.parquet(path)
    if not fanout:
        return df
    try:
        small = 0 < _table_bytes(path) <= _FANOUT_MAX_BYTES
    except OSError:  # non-local path (real deployments): keep native splits
        small = False
    if small:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df
