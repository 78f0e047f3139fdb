"""P/R gate at sf0.01 — the driver's correctness scale (TESTDATA.md t2).

The sf0.001 gate in test_pipeline.py covers the staged pipeline; this one
runs the lazy extraction chain at 10x the corpus and re-asserts
BASELINE.json's P/R >= 0.95 against the pandas oracle, plus the sha256
invariant, at the scale the driver actually grades."""

from __future__ import annotations

import pytest

from corporate_knowledge_extractor_spark.corpus import (
    generate_corpus,
    generate_corpus_pandas,
)
from corporate_knowledge_extractor_spark.plans.oracle import oracle_triples
from corporate_knowledge_extractor_spark.plans.pipeline import extract_triples, verify_sha256
from corporate_knowledge_extractor_spark.plans.verify import (
    precision_recall,
    precision_recall_distributed,
)


@pytest.fixture(scope="module")
def sf001(spark):
    docs = generate_corpus(spark, sf=0.01)
    triples = extract_triples(docs)
    docs_pdf = generate_corpus_pandas(sf=0.01)
    return docs, triples, docs_pdf


def test_pr_gate_sf001(spark, sf001):
    docs, triples, docs_pdf = sf001
    pr = precision_recall(triples, oracle_triples(docs_pdf))
    assert pr.precision >= 0.95, pr
    assert pr.recall >= 0.95, pr
    assert pr.n_pipeline > 50_000  # scale sanity: ~93k triples at sf0.01


def test_pr_distributed_matches_collect(spark, sf001):
    """The no-collect P/R (now the ONLY production path) must agree
    exactly with literal driver-side set arithmetic on the same inputs —
    the certification that let the collect variant be demoted to the
    test helper used here."""
    from parity_util import collect_precision_recall

    docs, triples, docs_pdf = sf001
    keys = ("subj", "pred", "obj", "category")
    want = oracle_triples(docs_pdf)
    n_got, n_want, n_matched = collect_precision_recall(triples, want, keys)
    dist = precision_recall_distributed(
        triples, spark.createDataFrame(want[list(keys)]), keys
    )
    assert (dist.n_pipeline, dist.n_oracle, dist.n_matched) == (
        n_got, n_want, n_matched,
    )


def test_sha256_invariant_sf001(spark, sf001):
    docs, _, docs_pdf = sf001
    ref = spark.createDataFrame(docs_pdf)
    assert verify_sha256(docs, ref) == 0


def test_pr_empty_oracle_guard(spark):
    """An empty oracle frame must yield PRResult(0, 0, ...) instead of
    createDataFrame's 'can not infer schema from empty dataset'."""
    import pandas as pd

    triples = spark.createDataFrame(
        [("a", "calls", "b", "code")], "subj string, pred string, obj string, category string"
    )
    pr = precision_recall(
        triples, pd.DataFrame(columns=["subj", "pred", "obj", "category"])
    )
    assert (pr.precision, pr.recall, pr.n_oracle, pr.n_matched) == (0.0, 0.0, 0, 0)
    assert pr.n_pipeline == 1
