"""Run-comparison harness: old vs new triples -> deltas + verdict.

Reference: /root/reference/scripts/compare_reports.py — count deltas with
div-by-zero guards (:173-222, A9), removed/added sets via anti joins
(:193-197, J5), inner join on common keys classifying improved / degraded
/ rewritten by a ±20%% size band (:277-315, J4), and a final verdict
(:318-345). Here the compared unit is the (subj, pred, obj) triple table
keyed by subject.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Comparison:
    deltas: dict = field(default_factory=dict)
    removed_subjects: list = field(default_factory=list)
    added_subjects: list = field(default_factory=list)
    changed: dict = field(default_factory=dict)
    verdict: str = "unchanged"
    regressions: list = field(default_factory=list)


def compare_runs(old: DataFrame, new: DataFrame, top: int = 10) -> Comparison:
    out = Comparison()

    # A9: count deltas per predicate with greatest(old, 1) guard
    oc = old.groupBy("pred").agg(F.count(F.lit(1)).alias("old_n"))
    nc = new.groupBy("pred").agg(F.count(F.lit(1)).alias("new_n"))
    joined = oc.join(nc, "pred", "full").na.fill(0)
    for r in joined.collect():
        pct = (r.new_n - r.old_n) * 100.0 / max(r.old_n, 1)
        out.deltas[r.pred] = {
            "old": r.old_n,
            "new": r.new_n,
            "change_pct": round(pct, 2),
        }

    # J5: subject-set diffs via anti joins, top-N examples (W7)
    o_subj = old.select("subj").distinct()
    n_subj = new.select("subj").distinct()
    out.removed_subjects = [
        r.subj for r in o_subj.join(n_subj, "subj", "left_anti").orderBy("subj").limit(top).collect()
    ]
    out.added_subjects = [
        r.subj for r in n_subj.join(o_subj, "subj", "left_anti").orderBy("subj").limit(top).collect()
    ]

    # J4: common subjects, classify by ±20% triple-count band
    o_per = old.groupBy("subj").agg(F.count(F.lit(1)).alias("o"))
    n_per = new.groupBy("subj").agg(F.count(F.lit(1)).alias("n"))
    common = o_per.join(n_per, "subj", "inner")
    classified = common.select(
        F.when(F.col("n") > F.col("o") * 1.2, "improved")
        .when(F.col("n") < F.col("o") * 0.8, "degraded")
        .otherwise("stable")
        .alias("cls")
    ).groupBy("cls").agg(F.count(F.lit(1)).alias("n"))
    out.changed = {r.cls: r.n for r in classified.collect()}

    # verdict (compare_reports.py:318-345 spirit)
    improved = out.changed.get("improved", 0) + len(out.added_subjects)
    degraded = out.changed.get("degraded", 0) + len(out.removed_subjects)
    if degraded == 0 and improved == 0:
        out.verdict = "unchanged"
    elif degraded == 0:
        out.verdict = "improved"
    elif improved == 0:
        out.verdict = "degraded"
    else:
        out.verdict = "mixed"
    if degraded:
        out.regressions = [
            f"{out.changed.get('degraded', 0)} subjects shrank >20%",
            f"{len(out.removed_subjects)}+ subjects removed",
        ]
    return out
