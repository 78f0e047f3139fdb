"""The staged KG-construction pipeline: docs -> ... -> nodes + edges.

Stage layout mirrors the reference's process_file() lifecycle
(/root/reference/scripts/run.py:106-199; trace in SURVEY.md §3.1), but as
a checkpointed DAG of table writes instead of an in-memory list relay:

  docs -> blocks -> mentions -> triples -> (entities, links) ->
  components -> nodes + edges     (+ lineage and metrics tables)

north_rule contracts implemented here:
  * resumable from per-stage checkpoints — each stage writes parquet with
    a `_SUCCESS` marker; a re-run reuses any stage whose output exists
    (kill/resume covered by tests/test_resume.py);
  * per-partition lineage — (run_id, stage, partition_id, output_rows,
    wall_ms) appended per stage, plus per-stage metrics rows (the Spark
    form of the reference's metadata.json, src/output/generator.py:49-55);
  * explicit partitioning — every per-document stage shares one hash
    partitioning on the doc key; linking repartitions by LSH band key;
    CC rounds are equi-joins under AQE skew handling.

In the sandbox "Iceberg table" materializes as parquet directories behind
the same writer interface (Iceberg jars are not in the image; the writer
gates on availability — sources/sinks.py).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corporate_knowledge_extractor_spark.config import (
    DEFAULT_CONFIG,
    PROFILES,
    EngineConfig,
    Profile,
)
from corporate_knowledge_extractor_spark.corpus import generate_corpus
from corporate_knowledge_extractor_spark.operators import canonicalize as cc
from corporate_knowledge_extractor_spark.operators import linking
from corporate_knowledge_extractor_spark.operators.mentions import (
    junk_block_filter,
    mention_stage,
    tag_mentions,
)
from corporate_knowledge_extractor_spark.operators.postprocess import post_process
from corporate_knowledge_extractor_spark.operators.redact import redact_columns
from corporate_knowledge_extractor_spark.operators.segment import (
    DOC_KEY,
    assign_blocks,
    split_lines,
)
from corporate_knowledge_extractor_spark.operators.synthesize import synthesize_triples
from corporate_knowledge_extractor_spark.sources.sinks import table_exists, read_table, write_table


def _resolve_profile(profile: str | Profile | None) -> Profile | None:
    if profile is None:
        return None
    return PROFILES[profile] if isinstance(profile, str) else profile


def extract_triples(docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG,
                    persist: bool = True,
                    profile: str | Profile | None = None) -> DataFrame:
    """The extraction slice (docs -> triples) as one lazy chain.

    ``profile`` selects a named (backend, anonymize) pair from
    config.PROFILES — the reference's profiles.yaml surface: "sensitive"
    routes synthesis through the batched backend seam with redaction on,
    "fast" keeps native synthesis with redaction on (every reference
    profile anonymizes), and the "trusted" extension compiles the
    redaction pass out of the plan entirely (tests/test_presets.py
    asserts all three behaviors).

    For callers that don't checkpoint stage tables (entry smoke, bench,
    the kg_triples query) the mention fan-out point is persisted
    explicitly: `synthesize_triples`/`post_process` re-scan the mention
    table several times — without persistence the whole upstream chain
    (including corpus generation) re-executes per scan (measured ~2x
    end-to-end at 300k docs).

    The materialization is a *serialized in-memory persist* (eagerly
    counted), not localCheckpoint: (a) serialized blocks are 3-5x
    smaller, so at bench scale they stay entirely in executor memory
    instead of serializing every round on the sandbox's one shared disk
    (the measured scaling drag: ext 0.82 -> ext_nockpt 0.91 efficiency at
    2->8 cores); (b) `spark.catalog.clearCache()` actually releases
    persisted blocks, while localCheckpoint RDDs leak until GC — repeated
    bench runs degraded measurably from the accumulation. The eager
    count keeps the round-1 rule: concurrent downstream scans must never
    race on uncached partitions.

    `tags` is deliberately not computed here — the triple path never
    reads it (the staged Pipeline's mentions table keeps tags for the
    `aligned` stage); an unused array<string> column would ride through
    the persist and both downstream scans for free.
    """
    prof = _resolve_profile(profile)
    if prof is not None:
        cfg = prof.engine_config(cfg)
    synth = prof.synthesizer() if prof is not None else synthesize_triples

    # Exchange placement (guide §2.3 / §3.3 "explode after the shuffle"):
    # the block/cap windows force one hash(doc-key) exchange; with the
    # explode first, that exchange ships the 25M-row LINE table with the
    # doc-key strings duplicated per line (541 MB at sf1.0). Clustering
    # the 500k-row doc table BEFORE split_lines moves the same exchange
    # below the explode — one content blob per doc crosses instead (50x
    # fewer rows, no per-line key duplication), and Generate preserves
    # the partitioning so every downstream window/join still reuses it.
    # Measured result-identical, ~5% less CPU at sf1.0 locally
    # (scripts/exp_docshuffle_r06b.py); the row-count win is the point
    # at network-shuffle scale.
    blocked = junk_block_filter(
        assign_blocks(split_lines(docs.repartition(*DOC_KEY)))
    )
    # blocked is consumed exactly once now that detect_mentions is a fused
    # single-scan rule bank — no checkpoint needed; the whole
    # docs->mentions chain is one job
    mentions = redact_columns(
        mention_stage(blocked, cfg.mentions),
        ["surface"],
        cfg.redaction,
    )
    if persist:
        from corporate_knowledge_extractor_spark.materialize import materialize

        mentions = materialize(mentions)
    # persist also gates the dedup fan-out inside post_process (the
    # known-surfaces subquery re-executes the whole dedup window chain
    # otherwise — measured 4x on the stage); same clearCache release
    # contract as the mentions persist above
    return post_process(synth(mentions), persist=persist)


@dataclass
class PipelineResult:
    run_id: str
    tables: dict[str, DataFrame] = field(default_factory=dict)
    stage_seconds: dict[str, float] = field(default_factory=dict)
    reused_stages: list[str] = field(default_factory=list)


class Pipeline:
    """Orchestrates stage execution with checkpoint/resume + lineage."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        cfg: EngineConfig = DEFAULT_CONFIG,
        run_id: str | None = None,
        profile: str | Profile | None = None,
        preset: str | Preset | None = None,
    ):
        from corporate_knowledge_extractor_spark.config import PRESETS

        self.spark = spark
        self.base_dir = base_dir.rstrip("/")
        self.profile = _resolve_profile(profile)
        self.preset = PRESETS[preset] if isinstance(preset, str) else preset
        if self.preset is not None:
            # a preset IS a config choice — a caller handing in a second,
            # disagreeing cfg would previously have it silently discarded
            # in favor of preset.config (ADVICE r04). Equal values are
            # fine (submit_pipeline folds manual overrides into both).
            if cfg is not DEFAULT_CONFIG and cfg != self.preset.config:
                raise ValueError(
                    "Pipeline: cfg and preset were both supplied and "
                    "disagree; pass one, or fold overrides into the "
                    "preset via dataclasses.replace(preset, config=...)"
                )
            cfg = self.preset.config
        # the profile's redaction choice applies wherever cfg.redaction is
        # read (the mentions stage); its backend choice applies at the
        # triples stage below — one named unit, like the reference's
        # --profile flag selecting a profiles.yaml row at run time
        self.cfg = self.profile.engine_config(cfg) if self.profile else cfg
        # audio_only.yaml analogue: frames disabled -> the run() plan
        # below genuinely omits the mention/alignment (and downstream KG)
        # stages and takes the reference's transcript-only early exit
        self.frames_enabled = (
            self.preset.frames_enabled if self.preset is not None else True
        )
        self.run_id = run_id or uuid.uuid4().hex[:12]

    # -- bookkeeping ------------------------------------------------------

    def _record_lineage(self, stage: str, df: DataFrame, wall_ms: float) -> int:
        per_part = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("output_rows"))
            .withColumn("run_id", F.lit(self.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("wall_ms", F.lit(float(wall_ms)))
            .select("run_id", "stage", "partition_id", "output_rows", "wall_ms")
        )
        # the per-partition frame is tiny (one row per partition); total
        # rows fall out of the same aggregation for free and feed the
        # per-stage throughput metric below
        rows = per_part.persist()
        write_table(rows, f"{self.base_dir}/lineage", mode="append")
        total = rows.agg(F.sum("output_rows")).first()[0] or 0
        rows.unpersist()
        return int(total)

    def record_metric(self, stage: str, metric: str, value: float) -> None:
        row = self.spark.createDataFrame(
            [(self.run_id, stage, metric, float(value))],
            "run_id string, stage string, metric string, value double",
        )
        write_table(row, f"{self.base_dir}/metrics", mode="append")

    # stage-table partition columns: docs partitioned by lang so downstream
    # lang-pruned scans (vendored/generated-code exclusion at 100 TB) hit
    # Iceberg/parquet partition pruning instead of reading everything;
    # the OUTPUT graph tables partitioned by canonical-id range bucket
    # (canonicalize.GRAPH_BUCKETS) so id-keyed graph lookups prune to one
    # dir instead of scanning the whole table — read_nodes_for_canonical /
    # read_edges_for_canonical below, pruning CI-pinned in test_plans
    STAGE_PARTITIONING: dict[str, list[str]] = {
        "docs": ["lang"],
        "nodes": ["_cid_bucket"],
        "edges": ["_dst_bucket"],
    }

    def _stage(self, name: str, build, result: PipelineResult, resume: bool) -> DataFrame:
        path = f"{self.base_dir}/tables/{name}"
        if resume and table_exists(self.spark, path):
            result.reused_stages.append(name)
            df = read_table(self.spark, path)
            result.tables[name] = df
            return df
        t0 = time.time()
        df = build()
        write_table(df, path, mode="overwrite", partition_by=self.STAGE_PARTITIONING.get(name))
        wall_ms = (time.time() - t0) * 1000
        out = read_table(self.spark, path)  # read back: downstream plans scan parquet
        result.stage_seconds[name] = wall_ms / 1000
        total_rows = self._record_lineage(name, out, wall_ms)
        self.record_metric(name, "wall_ms", wall_ms)
        # per-stage throughput: the scaling-history row (round-3 verdict
        # task 8) — runs at different parallelism/scale become comparable
        # straight from the metrics table, no re-instrumentation
        self.record_metric(name, "output_rows", float(total_rows))
        self.record_metric(
            name, "rows_per_sec", total_rows / max(wall_ms / 1000, 1e-9)
        )
        result.tables[name] = out
        return out

    def incremental_docs(self, docs: DataFrame) -> DataFrame:
        """Doc-level incremental ingest (the reference ROADMAP's
        'track processed videos, skip re-processing', ROADMAP.md:451-454;
        north_rule resumability): anti-join incoming docs against the
        (repo, path, commit) keys already present in the triples stage
        table. Returns only the not-yet-processed documents."""
        path = f"{self.base_dir}/tables/triples"
        if not table_exists(self.spark, path):
            return docs
        done = read_table(self.spark, path).select("repo", "path", "commit").distinct()
        return docs.join(done, ["repo", "path", "commit"], "left_anti")

    # -- the pipeline -----------------------------------------------------

    def run(
        self,
        docs: DataFrame | None = None,
        sf: float = 0.001,
        resume: bool = True,
        stop_after: str | None = None,
    ) -> PipelineResult:
        result = PipelineResult(run_id=self.run_id)
        order = (
            ["docs", "blocks", "transcript"]
            if not self.frames_enabled
            else [
                "docs", "blocks", "mentions", "aligned", "triples",
                "entities", "links", "components", "nodes", "edges",
            ]
        )

        def done(stage: str) -> bool:
            return stop_after is not None and order.index(stage) >= order.index(stop_after)

        docs_df = self._stage(
            "docs",
            lambda: (docs if docs is not None else generate_corpus(self.spark, sf=sf)),
            result,
            resume,
        )
        if done("docs"):
            return result

        blocks = self._stage(
            "blocks",
            # same exchange placement as extract_triples: cluster the doc
            # table by key before the explode so the windows' mandatory
            # exchange ships blobs, not lines
            lambda: junk_block_filter(
                assign_blocks(split_lines(docs_df.repartition(*DOC_KEY)))
            ),
            result,
            resume,
        )
        if done("blocks"):
            return result

        if not self.frames_enabled:
            # the reference's audio-only early exit (scripts/run.py:52-74):
            # no frames -> skip OCR/tagging/alignment entirely; anonymize
            # the transcript (audio_only.yaml notes: "Anonymization still
            # applied to transcripts") and build the report from segments
            from corporate_knowledge_extractor_spark.operators.segment import (
                block_segments,
            )
            from corporate_knowledge_extractor_spark.sources.report import (
                write_transcript_report,
            )

            transcript = self._stage(
                "transcript",
                lambda: redact_columns(
                    block_segments(blocks), ["text"], self.cfg.redaction
                ),
                result,
                resume,
            )
            if done("transcript"):
                return result
            meta = write_transcript_report(
                f"{self.base_dir}/report", transcript
            )
            self.record_metric("transcript", "segments", meta["segments_count"])
            return result

        mentions = self._stage(
            "mentions",
            lambda: redact_columns(
                tag_mentions(mention_stage(blocks, self.cfg.mentions)),
                ["surface"],
                self.cfg.redaction,
            ),
            result,
            resume,
        )
        if done("mentions"):
            return result

        # stage [5] analogue (scripts/run.py:83, src/align/aligner.py:4-20):
        # align each block segment ("speech") to its best-scoring mention
        # ("frame") — J1 scored interval join. Context table only; the
        # triple path consumes mentions directly.
        # the indexed-frame persist inside align is released the moment
        # the stage table is written (same precise-release contract as
        # the triples stage's dedup fan-out below)
        _align_scratch: list = []

        def build_aligned() -> DataFrame:
            from corporate_knowledge_extractor_spark.operators.align import (
                align_segments_to_frames,
            )
            from corporate_knowledge_extractor_spark.operators.segment import (
                block_segments,
            )

            segs = block_segments(blocks).select(
                "repo", "path", "commit",
                F.col("block_id").alias("seg_id"),
                F.col("start").cast("double").alias("start"),
                F.col("end").cast("double").alias("end"),
                "text",
            )
            frames = mentions.select(
                "repo", "path", "commit",
                F.col("line_no").cast("double").alias("ts"),
                F.col("surface").alias("text"),
                "tags",
            )
            return align_segments_to_frames(
                segs, frames, self.cfg.alignment,
                persist=True, scratch=_align_scratch,
            )

        self._stage("aligned", build_aligned, result, resume)
        from corporate_knowledge_extractor_spark.materialize import (
            release as _release,
        )

        _release(*_align_scratch)
        if done("aligned"):
            return result

        synth = self.profile.synthesizer() if self.profile else synthesize_triples
        # the dedup fan-out inside post_process is persisted for the
        # duration of this stage only — `scratch` hands the materialized
        # frame back so it can be released the moment the stage table is
        # written (precise release, not a session-wide clearCache that
        # would drop caches the caller owns)
        _scratch: list = []
        triples = self._stage(
            "triples",
            lambda: post_process(synth(mentions), persist=True, scratch=_scratch),
            result,
            resume,
        )
        from corporate_knowledge_extractor_spark.materialize import release

        release(*_scratch)
        if done("triples"):
            return result

        entities = self._stage(
            "entities", lambda: linking.extract_entities(triples), result, resume
        )
        if done("entities"):
            return result

        links = self._stage(
            "links",
            lambda: linking.score_pairs(
                linking.entity_candidate_pairs(entities, self.cfg.linking),
                entities,
                self.cfg.linking,
            ),
            result,
            resume,
        )
        if done("links"):
            return result

        components = self._stage(
            "components",
            lambda: cc.connected_components(
                entities,
                links,
                self.cfg.canonicalize,
                # scratch inside the run dir: CC's lineage-cut tables are
                # scrubbed to labels_final at convergence and the rest
                # lives/dies with the pipeline's own base_dir instead of
                # accumulating in the system tempdir
                scratch_dir=f"{self.base_dir}/tmp/cc_scratch",
                on_iteration=lambda i, changed: self.record_metric(
                    "components", f"cc_changed_iter_{i}", changed
                ),
                # shuffle-balance evidence (north_rule: skew handled
                # explicitly): worst per-join-key reducer load after the
                # hot/cold salt split, plus how many keys went hot
                on_skew_stats=lambda s: [
                    self.record_metric("components", f"cc_{k}", v)
                    for k, v in s.items()
                ],
            ),
            result,
            resume,
        )
        if done("components"):
            return result

        nodes = self._stage(
            "nodes", lambda: cc.build_nodes(entities, components), result, resume
        )
        if done("nodes"):
            return result

        def build_edges() -> DataFrame:
            cmap = cc.canonical_map(entities, components)
            linked_preds = ("defines", "calls", "imports_symbol")
            # no forced broadcast: the canonical map scales with distinct
            # entities; AQE broadcasts it only while it actually fits
            t_linked = triples.where(F.col("pred").isin(*linked_preds)).join(
                cmap, triples.obj == cmap.surface, "left"
            )
            t_other = triples.where(~F.col("pred").isin(*linked_preds))
            edges_linked = t_linked.select(
                F.xxhash64("subj").alias("src"),
                F.coalesce("canonical_id", F.xxhash64("obj")).alias("dst"),
                "pred",
                F.col("subj").alias("src_name"),
                F.coalesce("canonical", F.col("obj")).alias("dst_name"),
                "frame_id",
                "category",
                "repo", "path", "commit",
            )
            edges_other = t_other.select(
                F.xxhash64("subj").alias("src"),
                F.xxhash64("obj").alias("dst"),
                "pred",
                F.col("subj").alias("src_name"),
                F.col("obj").alias("dst_name"),
                "frame_id",
                "category",
                "repo", "path", "commit",
            )
            return (
                edges_linked.unionByName(edges_other)
                .groupBy("src", "dst", "pred", "src_name", "dst_name", "category")
                .agg(
                    F.count(F.lit(1)).alias("weight"),
                    F.min("frame_id").alias("frame_id"),
                    F.min(F.concat_ws("/", "repo", "path")).alias("example_doc"),
                )
                # destination-id range bucket = the stage table's partition
                # key (STAGE_PARTITIONING): "edges into canonical X" reads
                # prune to one of GRAPH_BUCKETS dirs
                .withColumn("_dst_bucket", cc.cid_bucket(F.col("dst")))
            )

        edges = self._stage("edges", build_edges, result, resume)

        self.record_metric("pipeline", "edges_rows", edges.count())
        return result


def read_edges_for_canonical(
    spark: SparkSession, base_dir: str, canonical_id: int
) -> DataFrame:
    """Id-keyed edge lookup against the partitioned edges stage table:
    the `_dst_bucket = pmod(id, GRAPH_BUCKETS)` predicate is a partition
    filter, so the scan prunes to one bucket directory (1/GRAPH_BUCKETS
    of the table) before the row-level `dst = id` filter runs — the
    access path an unpartitioned 100-TB edges table cannot give. Pruning
    is asserted on inputFiles() in tests/test_plans.py."""
    from corporate_knowledge_extractor_spark.operators.canonicalize import (
        GRAPH_BUCKETS,
    )

    df = read_table(spark, f"{base_dir.rstrip('/')}/tables/edges")
    return df.where(
        (F.col("_dst_bucket") == int(canonical_id) % GRAPH_BUCKETS)
        & (F.col("dst") == canonical_id)
    )


def read_nodes_for_canonical(
    spark: SparkSession, base_dir: str, canonical_id: int
) -> DataFrame:
    """Node-row lookup with partition pruning on `_cid_bucket` (see
    read_edges_for_canonical)."""
    from corporate_knowledge_extractor_spark.operators.canonicalize import (
        GRAPH_BUCKETS,
    )

    df = read_table(spark, f"{base_dir.rstrip('/')}/tables/nodes")
    return df.where(
        (F.col("_cid_bucket") == int(canonical_id) % GRAPH_BUCKETS)
        & (F.col("canonical_id") == canonical_id)
    )


def verify_sha256(docs: DataFrame, reference_docs: DataFrame) -> int:
    """The per-row content invariant (BASELINE.json input_hint): recompute
    sha2(content, 256) and anti-join against the reference corpus hashes;
    returns number of mismatches (must be 0)."""
    ours = docs.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("h")
    )
    ref = reference_docs.select(
        "repo", "path", "commit", F.col("content_sha256").alias("h")
    )
    return ours.join(ref, ["repo", "path", "commit", "h"], "left_anti").count()
