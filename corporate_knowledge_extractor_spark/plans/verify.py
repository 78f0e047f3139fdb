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


def precision_recall_distributed(
    pipeline_triples: DataFrame,
    reference_triples: DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj", "category"),
) -> PRResult:
    """Join-based P/R — the ONLY production path: never collects either
    triple set to the driver, so it runs at any corpus scale (three
    distributed counts: distinct sizes + inner-join size). The round-2
    driver-collect variant is demoted to a test helper
    (tests/parity_util.py collect_precision_recall), kept solely to
    assert this form agrees with literal set arithmetic at sf0.01
    (tests/test_pr_sf001.py::test_pr_distributed_matches_collect)."""
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


def precision_recall(
    pipeline_triples: DataFrame,
    oracle: pd.DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj", "category"),
) -> PRResult:
    """P/R against the pandas oracle, via the distributed form: the
    oracle frame (bounded — it is the *expected* triple set, generated
    driver-side by plans/oracle.py in the first place) is lifted into a
    DataFrame and everything else stays distributed."""
    if len(oracle) == 0:
        # createDataFrame cannot infer a schema from an empty pandas
        # frame; an empty oracle means nothing was expected — precision
        # and recall are both 0 by the conventions above
        return PRResult(
            precision=0.0,
            recall=0.0,
            n_pipeline=pipeline_triples.select(*keys).distinct().count(),
            n_oracle=0,
            n_matched=0,
        )
    spark = pipeline_triples.sparkSession
    want = spark.createDataFrame(oracle[list(keys)].drop_duplicates())
    return precision_recall_distributed(pipeline_triples, want, keys)
