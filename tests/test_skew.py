"""Salted-join correctness: identical result to a plain join, with the
hot key scattered across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.operators.skew import (
    add_salt,
    key_skew_report,
    salted_join,
)


def test_salted_join_matches_plain_join(spark):
    # Zipf-ish fact: key 'hot' dominates
    fact = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [(f"k{i}", i) for i in range(50)],
        "key string, payload int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k7", "B")], "key string, label string"
    )
    plain = {
        (r.key, r.payload, r.label)
        for r in fact.join(dim, "key").collect()
    }
    salted = {
        (r.key, r.payload, r.label)
        for r in salted_join(fact, dim, "key", ["payload"], buckets=8).collect()
    }
    assert salted == plain
    assert len(salted) == 502


def test_salt_scatters_hot_key(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(400)], "key string, payload int"
    )
    salted = add_salt(fact, ["payload"], 8)
    buckets = {r._salt for r in salted.select("_salt").distinct().collect()}
    assert len(buckets) == 8  # all reducer buckets in use


def test_skew_report_flags_hot_key(spark):
    fact = spark.createDataFrame(
        [("hot", i) for i in range(90)] + [("cold", i) for i in range(10)],
        "key string, payload int",
    )
    top = key_skew_report(fact, ["key"], top=1).collect()
    assert top[0].key == "hot"
    assert abs(top[0].share - 0.9) < 1e-6
