"""Driver-contract parity: every queries() entry with a DuckDB oracle must
match row-count, schema shape, and order-insensitive values at sf0.001 —
the same comparison the driver runs at sf0.01."""

from __future__ import annotations


import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


from parity_util import rows_to_multiset as _rows_to_multiset  # noqa: E402


ORACLE = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, ddb, name):
    sdf = ALL[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    got = _rows_to_multiset(spark_rows, spark_cols)
    want = _rows_to_multiset(duck_rows, duck_cols)
    mism = [(g, w) for g, w in zip(got, want) if g != w][:5]
    assert got == want, f"{name}: value mismatch, first diffs: {mism}"


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLE)))
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"subj", "pred", "obj"} <= set(df.columns)


# The two parity twins retired from the driver registry (round-5
# consolidation — the driver's correctness file caps at 50 rows) keep
# their full Spark-vs-DuckDB certification HERE, with the exact same
# comparison the driver runs; see queries.RETIRED_PARITY for the why.
from corporate_knowledge_extractor_spark.plans.queries import (  # noqa: E402
    RETIRED_PARITY,
    resolve_sql,
)


@pytest.mark.parametrize("name", sorted(RETIRED_PARITY))
def test_retired_parity_matches_oracle(spark, ddb, name):
    q = RETIRED_PARITY[name]
    sdf = q.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(resolve_sql(q))
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: column names differ"
    got = _rows_to_multiset(spark_rows, spark_cols)
    want = _rows_to_multiset(duck_rows, duck_cols)
    assert got == want, f"{name}: value mismatch"
