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
    docs = generate_corpus(spark, sf=0.001).localCheckpoint(eager=True)
    blocked = junk_block_filter(assign_blocks(split_lines(docs))).localCheckpoint(
        eager=True
    )
    return docs, blocked, docs.count()


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_envelope(spark, corpus, name):
    docs, blocked, n_docs = corpus
    preset = PRESETS[name]
    m_rate = mention_stage(blocked, preset.config.mentions).count() / n_docs
    t_rate = extract_triples(docs, preset.config).count() / n_docs
    lo, hi = preset.envelope.mentions_per_doc
    assert lo <= m_rate <= hi, f"{name}: mentions/doc {m_rate:.2f} not in [{lo},{hi}]"
    lo, hi = preset.envelope.triples_per_doc
    assert lo <= t_rate <= hi, f"{name}: triples/doc {t_rate:.2f} not in [{lo},{hi}]"


def test_presets_are_distinct(spark, corpus):
    """The four presets must produce four genuinely different extraction
    volumes (knobs wired end-to-end, not dead config)."""
    _, blocked, _ = corpus
    counts = {
        name: mention_stage(blocked, p.config.mentions).count()
        for name, p in PRESETS.items()
    }
    assert len(set(counts.values())) == len(counts), counts
    assert counts["sparse_scan"] < counts["walkthrough"] < counts["dense_code"]


def test_sampler_is_noop_at_one(spark, corpus):
    """sample_every_n_lines=1 must leave the line stream untouched (the
    default contract the kg_triples oracle depends on)."""
    from corporate_knowledge_extractor_spark.config import MentionConfig
    from corporate_knowledge_extractor_spark.operators.mentions import sample_lines

    _, blocked, _ = corpus
    assert sample_lines(blocked, MentionConfig()) is blocked
