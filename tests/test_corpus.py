"""Corpus generator: determinism, scale, invariants."""

from __future__ import annotations

import hashlib

from corporate_knowledge_extractor_spark import corpus


def test_doc_generation_is_deterministic():
    a = corpus.generate_doc(7, 500, 20)
    b = corpus.generate_doc(7, 500, 20)
    assert a == b
    assert a["content_sha256"] == hashlib.sha256(a["content"].encode()).hexdigest()


def test_distributed_matches_pandas(spark):
    dist = (
        corpus.generate_corpus(spark, n_docs=60, sf=0.001)
        .toPandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    local = (
        corpus.generate_corpus_pandas(n_docs=60, sf=0.001)
        .sort_values("path")
        .reset_index(drop=True)
    )
    assert dist.equals(local)


def test_scale_knobs():
    assert corpus.n_docs_for_sf(0.001) == 500
    assert corpus.n_docs_for_sf(0.01) == 5_000
    assert corpus.n_repos_for_sf(0.001) == 20


def test_entity_aliases_ground_truth():
    aliases = corpus.entity_aliases(0)
    assert aliases[0] == "get_user"
    assert "getUser" in aliases and "get_user_v2" in aliases
