"""Preset registry: each named preset must (a) actually change the plan
(its knobs are read, not decorative) and (b) land inside its declared
expected-output envelope on the synthetic corpus — the Spark analogue of
the reference's per-preset expected_output blocks
(/root/reference/config/presets/powerpoint.yaml:63-66, excel.yaml,
demo.yaml, hybrid.yaml) selected via --preset (scripts/run.py:108-159).
"""

from __future__ import annotations

import pytest

from corporate_knowledge_extractor_spark.config import PRESETS
from corporate_knowledge_extractor_spark.corpus import generate_corpus
from corporate_knowledge_extractor_spark.operators.mentions import (
    junk_block_filter,
    mention_stage,
)
from corporate_knowledge_extractor_spark.operators.segment import (
    assign_blocks,
    split_lines,
)
from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples


@pytest.fixture(scope="module")
def corpus(spark):
    from corporate_knowledge_extractor_spark.materialize import materialize

    docs = materialize(generate_corpus(spark, sf=0.001))
    blocked = materialize(junk_block_filter(assign_blocks(split_lines(docs))))
    return docs, blocked, docs.count()


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_envelope(spark, corpus, name):
    docs, blocked, n_docs = corpus
    preset = PRESETS[name]
    if not preset.frames_enabled:
        pytest.skip("frames-disabled preset: plan shape covered by "
                    "test_prose_only_preset_omits_mention_stages")
    m_rate = mention_stage(blocked, preset.config.mentions).count() / n_docs
    t_rate = extract_triples(docs, preset.config).count() / n_docs
    lo, hi = preset.envelope.mentions_per_doc
    assert lo <= m_rate <= hi, f"{name}: mentions/doc {m_rate:.2f} not in [{lo},{hi}]"
    lo, hi = preset.envelope.triples_per_doc
    assert lo <= t_rate <= hi, f"{name}: triples/doc {t_rate:.2f} not in [{lo},{hi}]"


def test_presets_are_distinct(spark, corpus):
    """The four frame-scanning presets must produce four genuinely
    different extraction volumes (knobs wired end-to-end, not dead
    config); the frames-disabled preset has no mention stage at all."""
    _, blocked, _ = corpus
    counts = {
        name: mention_stage(blocked, p.config.mentions).count()
        for name, p in PRESETS.items()
        if p.frames_enabled
    }
    assert len(set(counts.values())) == len(counts), counts
    assert counts["sparse_scan"] < counts["walkthrough"] < counts["dense_code"]


def test_prose_only_preset_omits_mention_stages(spark, corpus, tmp_path):
    """The audio_only.yaml analogue (frames: enabled: false +
    run.py:52-74 early exit): the prose_only Pipeline plan must genuinely
    compile the mention/alignment/KG stages out — no stage table, no
    stage timing, nothing on disk — while still anonymizing the
    transcript (audio_only.yaml notes) and writing the transcript-only
    report."""
    import os

    from pyspark.sql import functions as F

    from corporate_knowledge_extractor_spark.plans.pipeline import Pipeline

    docs, _, n_docs = corpus
    base = str(tmp_path / "prose")
    r = Pipeline(spark, base, preset="prose_only").run(docs=docs, resume=False)

    assert set(r.stage_seconds) == {"docs", "blocks", "transcript"}
    for absent in ("mentions", "aligned", "triples", "entities", "links",
                   "components", "nodes", "edges"):
        assert not os.path.exists(f"{base}/tables/{absent}"), absent

    transcript = r.tables["transcript"]
    n_segs = transcript.count()
    assert 4 * n_docs <= n_segs <= 9 * n_docs  # segments-per-doc envelope
    # anonymization still applied to the transcript
    assert transcript.where(F.col("text").contains("@example.com")).count() == 0
    assert transcript.where(F.col("text").contains("[EMAIL]")).count() > 0
    # transcript-only report written
    assert os.path.exists(f"{base}/report/report.md")
    assert os.path.exists(f"{base}/report/metadata.json")


def test_profiles_redaction_and_backend(spark, corpus, tmp_path):
    """Profiles (config/profiles.yaml analogue): the sensitive profile
    must actually redact the mention surfaces AND route synthesis through
    the batched backend; `fast` mirrors the reference contract (every
    profiles.yaml row keeps anonymize: true) so it must ALSO redact; the
    `trusted` extension profile is the only one that compiles the
    redaction pass out (raw PII survives). Checked on the staged
    Pipeline's mentions table, where the maintainer-comment person
    mentions carry the emails."""
    from pyspark.sql import functions as F

    from corporate_knowledge_extractor_spark.plans.pipeline import Pipeline

    docs, _, _ = corpus

    def mentions_with(profile, sub):
        p = Pipeline(spark, str(tmp_path / profile), profile=profile)
        r = p.run(docs=docs, stop_after="mentions")
        m = r.tables["mentions"]
        return m.where(F.col("surface").contains(sub)).count()

    assert mentions_with("sensitive", "@example.com") == 0
    assert mentions_with("sensitive", "[EMAIL]") > 0
    assert mentions_with("fast", "@example.com") == 0
    assert mentions_with("fast", "[EMAIL]") > 0
    assert mentions_with("trusted", "@example.com") > 0
    assert mentions_with("trusted", "[EMAIL]") == 0


def test_profile_backends_agree_on_triples(spark, corpus):
    """The sensitive profile's batched backend must emit the exact same
    triple set as the default native path — the interchangeability
    contract that keeps every profile under the same P/R gate."""
    docs, _, _ = corpus
    native = {
        tuple(r)
        for r in extract_triples(docs, persist=False).collect()
    }
    batched = {
        tuple(r)
        for r in extract_triples(docs, persist=False, profile="sensitive").collect()
    }
    assert native == batched


def test_sampler_is_noop_at_one(spark, corpus):
    """sample_every_n_lines=1 must leave the line stream untouched (the
    default contract the kg_triples oracle depends on)."""
    from corporate_knowledge_extractor_spark.config import MentionConfig
    from corporate_knowledge_extractor_spark.operators.mentions import sample_lines

    _, blocked, _ = corpus
    assert sample_lines(blocked, MentionConfig()) is blocked
