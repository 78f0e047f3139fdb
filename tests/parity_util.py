"""Shared cross-engine canonicalization for Spark-vs-DuckDB parity tests
(the same order-insensitive multiset comparison the driver runs)."""

from __future__ import annotations

import math


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 4)
        if r == int(r):
            return str(int(r))
        return f"{r:.4f}".rstrip("0")
    if isinstance(v, int):
        return str(v)
    return str(v)


def rows_to_multiset(rows, colnames) -> list[str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def collect_precision_recall(pipeline_triples, oracle_pdf, keys):
    """Driver-collect set-arithmetic P/R — TEST HELPER ONLY (demoted from
    plans/verify.py): literal Python-set ground truth used to certify the
    distributed join-based form at sf0.01. Returns (n_got, n_want,
    n_matched)."""
    got = {tuple(r) for r in pipeline_triples.select(*keys).distinct().collect()}
    want = {
        tuple(r)
        for r in oracle_pdf[list(keys)].drop_duplicates().itertuples(index=False)
    }
    return len(got), len(want), len(got & want)
