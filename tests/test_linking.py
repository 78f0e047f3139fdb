"""Entity linking + canonicalization unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.config import CanonicalizeConfig, LinkingConfig
from corporate_knowledge_extractor_spark.operators import linking
from corporate_knowledge_extractor_spark.operators.canonicalize import (
    build_nodes,
    connected_components,
)


def _entities(spark, surfaces):
    return (
        spark.createDataFrame([(s, 1) for s in surfaces], "surface string, freq long")
        .withColumn("norm", F.regexp_replace(F.lower(F.col("surface")), r"[_\-]", ""))
        .withColumn("entity_id", F.xxhash64(F.col("surface")))
    )


def test_alias_variants_link_and_strangers_do_not(spark):
    ents = _entities(
        spark,
        ["get_user_data", "getUserData", "get_user_data_v2", "parse_config", "parseConfig"],
    )
    cfg = LinkingConfig()
    pairs = linking.score_pairs(
        linking.entity_candidate_pairs(ents, cfg), ents, cfg
    )
    named = (
        pairs.join(
            ents.select(F.col("entity_id").alias("id_a"), F.col("surface").alias("sa")), "id_a"
        )
        .join(
            ents.select(F.col("entity_id").alias("id_b"), F.col("surface").alias("sb")), "id_b"
        )
        .collect()
    )
    linked = {frozenset((r.sa, r.sb)) for r in named}
    assert frozenset(("get_user_data", "getUserData")) in linked
    assert frozenset(("parse_config", "parseConfig")) in linked
    # no cross-entity link
    for pair in linked:
        assert not (pair & {"get_user_data", "getUserData", "get_user_data_v2"}) or not (
            pair & {"parse_config", "parseConfig"}
        )


def test_hot_block_cap_drops_giant_bands(spark):
    # 5 identical norms -> one band holds all 5; cap of 3 suppresses it
    ents = _entities(spark, [f"same_name{'_' * i}" for i in range(5)])
    cfg = LinkingConfig(max_block_size=3)
    pairs = linking.entity_candidate_pairs(ents, cfg)
    assert pairs.count() == 0


def test_connected_components_chain_and_islands(spark):
    verts = spark.createDataFrame([(i,) for i in range(6)], "entity_id long")
    # chain 0-1-2, pair 3-4, island 5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    comps = connected_components(verts, edges, CanonicalizeConfig())
    got = {r.entity_id: r.component for r in comps.collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_connected_components_records_convergence(spark):
    verts = spark.createDataFrame([(i,) for i in range(4)], "entity_id long")
    edges = spark.createDataFrame([(0, 1), (2, 3)], "id_a long, id_b long")
    seen = []
    connected_components(
        verts, edges, CanonicalizeConfig(), on_iteration=lambda i, c: seen.append((i, c))
    )
    assert seen[-1][1] == 0  # final round observed a fixpoint


def test_build_nodes_canonical_pick(spark):
    ents = spark.createDataFrame(
        [("fooBar", 10), ("foo_bar", 10), ("foo_bar_v2", 1)],
        "surface string, freq long",
    ).withColumn("entity_id", F.xxhash64(F.col("surface")))
    ids = {r.surface: r.entity_id for r in ents.collect()}
    comps = spark.createDataFrame(
        [(ids[s], min(ids.values())) for s in ids], "entity_id long, component long"
    )
    nodes = build_nodes(ents, comps).collect()
    assert len(nodes) == 1
    node = nodes[0]
    # highest freq wins; tie between fooBar/foo_bar broken lexicographically
    assert node.canonical == "fooBar"
    assert sorted(node.aliases) == ["fooBar", "foo_bar", "foo_bar_v2"]
    assert node.total_freq == 21
