"""J7: nearest-boundary assignment with sequential consumption.

Reference: chunk split points pick, per target position, the silence
boundary minimizing |boundary - target|, and each boundary is consumed
(removed) once used (/root/reference/src/transcribe/chunker.py:147-157).
Consumption makes assignments order-dependent — a plain per-target argmin
join (`min_by`) can assign one boundary to two targets. So, per
SURVEY.md §2.3/J7: the non-consuming relaxation is a join + `min_by`;
the exact form is a per-doc sequential scan in `applyInPandas`.

KG analogue: choosing block split points for oversized content blobs
before chunked extraction (operators/chunkmerge.py re-stitches).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOC = ["repo", "path", "commit"]


def nearest_boundary_relaxed(
    targets: DataFrame,  # DOC + (target_idx int, target double)
    boundaries: DataFrame,  # DOC + (boundary double)
) -> DataFrame:
    """Non-consuming argmin: every target independently takes its closest
    boundary (`min_by` over the per-doc join). Ties -> smaller boundary."""
    j = targets.join(boundaries, DOC)
    key = F.struct(
        F.abs(F.col("boundary") - F.col("target")).alias("d"),
        F.col("boundary").alias("b"),
    )
    return j.groupBy(*DOC, "target_idx", "target").agg(
        F.min_by("boundary", key).alias("boundary")
    )


def nearest_boundary_consuming(
    targets: DataFrame,
    boundaries: DataFrame,
) -> DataFrame:
    """Exact reference semantics: targets processed in target_idx order,
    each consuming its nearest remaining boundary (chunker.py:147-157;
    first-minimum tie-breaking of Python's min). Per-doc sequential scan
    via applyInPandas; boundaries arrays are per-document small."""
    bounds = boundaries.groupBy(*DOC).agg(
        F.array_sort(F.collect_list("boundary")).alias("_bounds")
    )
    joined = targets.join(bounds, DOC)
    schema = (
        "repo string, path string, commit string, target_idx int, "
        "target double, boundary double"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("target_idx", kind="mergesort")
        remaining = list(pdf["_bounds"].iloc[0]) if len(pdf) else []
        out = []
        for _, row in pdf.iterrows():
            if not remaining:
                break
            best = min(remaining, key=lambda b: abs(b - row["target"]))
            remaining.remove(best)
            out.append(
                {
                    "repo": row["repo"],
                    "path": row["path"],
                    "commit": row["commit"],
                    "target_idx": int(row["target_idx"]),
                    "target": float(row["target"]),
                    "boundary": float(best),
                }
            )
        return pd.DataFrame(out, columns=[
            "repo", "path", "commit", "target_idx", "target", "boundary"
        ])

    return joined.groupBy(*DOC).applyInPandas(lambda p: scan(p), schema=schema)
