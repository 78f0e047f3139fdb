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


def load_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver testdata loader (TESTDATA.md tables)."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
