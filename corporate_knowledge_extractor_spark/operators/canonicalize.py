"""Canonicalization: iterative connected components over alias pairs.

The reference's merge is single-pass, 1-hop (group by normalized title,
/root/reference/src/output/post_processor.py:102-130). Alias similarity is
transitive only through chains (`get_user_data` ~ `getuserdata` ~
`get_user_data_v2`), so the KG target requires true connected components
(BASELINE.json north_star).

Implemented as driver-looped min-label propagation: each iteration is one
shuffle-join round; `localCheckpoint()` truncates lineage every iteration
(unbounded lineage is the classic iterative-Spark failure mode, SURVEY.md
§7). Convergence is detected with a cheap changed-count aggregate and the
loop is bounded by `max_iterations` with an assert — alias clusters are
shallow (diameter ~2-4), so this converges in a handful of rounds even at
10^12 scale; each round's joins are plain equi-joins that AQE skew-splits
if a label goes hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.config import CanonicalizeConfig


def connected_components(
    vertices: DataFrame,  # (entity_id)
    edges: DataFrame,  # (id_a, id_b) undirected
    cfg: CanonicalizeConfig = CanonicalizeConfig(),
    on_iteration=None,
) -> DataFrame:
    """Returns (entity_id, component) with component = min entity_id of the
    component. ``on_iteration(i, changed)`` is the metrics hook — the
    pipeline records one convergence metric row per round (north_rule)."""
    sym = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = vertices.select(
        F.col("entity_id"), F.col("entity_id").alias("component")
    ).localCheckpoint(eager=True)

    for i in range(cfg.max_iterations):
        # candidate label for dst = min label over its neighbors' labels
        neighbor_labels = (
            sym.join(labels, sym.src == labels.entity_id, "inner")
            .select(F.col("dst").alias("entity_id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("entity_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), "entity_id")
            .where(F.col("o.component") != F.col("n.component"))
            .count()
        )
        labels = new_labels
        if on_iteration is not None:
            on_iteration(i, changed)
        if changed == 0:
            return labels
    raise AssertionError(
        f"connected_components did not converge in {cfg.max_iterations} iterations"
    )


def build_nodes(entities: DataFrame, components: DataFrame) -> DataFrame:
    """Nodes table (FIXTURES.md §2): one row per canonical entity.

    Canonical surface = most frequent alias, ties to lexicographically
    smallest — the deterministic analogue of the reference's "first frame
    as base" + longest-field merge (post_processor.py:133-175).
    ``merged_from`` records the absorbed alias ids exactly as the
    reference records merged frame ids (post_processor.py:172-173).
    """
    e = entities.join(components, "entity_id")
    # min over (-freq, surface): highest frequency, then smallest surface
    canonical_key = F.struct((-F.col("freq")).alias("nf"), F.col("surface").alias("s"))
    return e.groupBy(F.col("component").alias("canonical_id")).agg(
        F.min_by("surface", canonical_key).alias("canonical"),
        F.array_sort(F.collect_set("surface")).alias("aliases"),
        F.array_sort(F.collect_set("entity_id")).alias("merged_from"),
        F.sum("freq").alias("total_freq"),
        F.count(F.lit(1)).alias("n_aliases"),
    )


def canonical_map(entities: DataFrame, components: DataFrame) -> DataFrame:
    """(surface -> canonical_id, canonical surface) lookup for edge rewrite."""
    e = entities.join(components, "entity_id")
    canonical_key = F.struct((-F.col("freq")).alias("nf"), F.col("surface").alias("s"))
    canon = e.groupBy("component").agg(F.min_by("surface", canonical_key).alias("_c"))
    return (
        e.join(canon, "component")
        .select(
            "surface",
            F.col("component").alias("canonical_id"),
            F.col("_c").alias("canonical"),
        )
    )
