"""P/R verification harness: pipeline triples vs the pandas oracle.

Spark form of the reference's compare_reports.py verdict
(/root/reference/scripts/compare_reports.py:150-345): join rebuilt
triples to oracle triples on (subj, pred, obj[, category]) and compute
precision / recall; the pytest gate asserts both >= 0.95 (BASELINE.json).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PRResult:
    precision: float
    recall: float
    n_pipeline: int
    n_oracle: int
    n_matched: int

    @property
    def f1(self) -> float:
        if self.precision + self.recall == 0:
            return 0.0
        return 2 * self.precision * self.recall / (self.precision + self.recall)


def precision_recall(
    pipeline_triples: DataFrame,
    oracle: pd.DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj", "category"),
) -> PRResult:
    got = {
        tuple(r) for r in pipeline_triples.select(*keys).distinct().collect()
    }
    want = {tuple(r) for r in oracle[list(keys)].drop_duplicates().itertuples(index=False)}
    matched = len(got & want)
    return PRResult(
        precision=matched / len(got) if got else 0.0,
        recall=matched / len(want) if want else 0.0,
        n_pipeline=len(got),
        n_oracle=len(want),
        n_matched=matched,
    )


def precision_recall_distributed(
    pipeline_triples: DataFrame,
    reference_triples: DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj", "category"),
) -> PRResult:
    """Join-based P/R: never collects either triple set to the driver.

    `precision_recall` above materializes the full distinct set driver-side
    — fine at the sf0.01 gate, a driver OOM at sf >= 1. This variant keeps
    everything as three distributed counts (distinct sizes + inner-join
    size), so it runs at any corpus scale; use it when the reference side
    is itself a DataFrame (e.g. a previous run's triples table)."""
    got = pipeline_triples.select(*keys).distinct()
    want = reference_triples.select(*list(keys)).distinct()
    n_got = got.count()
    n_want = want.count()
    n_matched = got.join(want, list(keys), "inner").count()
    return PRResult(
        precision=n_matched / n_got if n_got else 0.0,
        recall=n_matched / n_want if n_want else 0.0,
        n_pipeline=n_got,
        n_oracle=n_want,
        n_matched=n_matched,
    )
