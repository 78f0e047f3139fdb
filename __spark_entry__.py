"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-extraction query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with
DuckDB oracles where SQL-expressible (see
corporate_knowledge_extractor_spark/plans/queries.py for the registry,
parity rules, and per-query reference citations).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from corporate_knowledge_extractor_spark.plans.queries import (  # noqa: E402
    REGISTRY,
    resolve_sql,
)


from corporate_knowledge_extractor_spark.session import (  # noqa: E402
    ship_package as _ship_package,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the knowledge-graph triple extraction pipeline.

    Loads /root/testdata/sf0.001/documents.parquet to anchor the scale,
    synthesizes the (repo, path, commit, lang, content) source-code corpus
    at the same row count (BASELINE.json input_hint — deterministic, seed
    42), and runs segmentation -> mention detection -> redaction -> triple
    synthesis -> post-processing, returning the (subj, pred, obj) table.
    """
    from corporate_knowledge_extractor_spark.corpus import generate_corpus
    from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples

    _ship_package(spark)
    n_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    docs = generate_corpus(spark, n_docs=n_docs)
    return extract_triples(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for every SQL-expressible query (column names and
    float rounding match the Spark side; see queries.py parity rules).
    Lazy oracles (the kg family — their construction materializes twin
    corpora) are resolved here, at harness time, not at module import."""
    out = {}
    for name, q in REGISTRY.items():
        sql = resolve_sql(q)
        if sql is not None:
            out[name] = sql
    return out
