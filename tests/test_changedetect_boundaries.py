"""Previous-kept change detection / dedup (F3, A4) and consuming
nearest-boundary assignment (J7) — the sequential-per-doc operators."""

from __future__ import annotations

from corporate_knowledge_extractor_spark.operators.boundaries import (
    nearest_boundary_consuming,
    nearest_boundary_relaxed,
)
from corporate_knowledge_extractor_spark.operators.changedetect import (
    dedup_vs_previous_kept,
    keep_changed,
)

DOC = ("r", "p", "c")


def test_keep_changed_vs_previous_kept(spark):
    # values: 0, 4, 9, 10, 30 with threshold 5:
    # keep 0 (first); 4 (|4-0|<=5 -> drop); 9 (|9-0|>5 keep);
    # 10 (|10-9|<=5 drop); 30 (keep). Previous-ROW lag would keep 9 but
    # also evaluate 4 against 0 — the distinguishing case is 9 vs last
    # KEPT (0), not vs previous row (4).
    rows = [(*DOC, i, v) for i, v in enumerate([0.0, 4.0, 9.0, 10.0, 30.0])]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, idx int, value double"
    )
    kept = sorted(
        r.idx for r in keep_changed(df, ["repo", "path", "commit"], "idx", "value", 5.0).collect()
    )
    assert kept == [0, 2, 4]


def test_dedup_vs_previous_kept_text(spark):
    rows = [
        (*DOC, 0, "alpha beta gamma delta"),
        (*DOC, 1, "alpha beta gamma delta epsilon"),  # sim 0.8 < 0.9 -> kept? no: 4/5=0.8 < 0.9 -> KEPT
        (*DOC, 2, "alpha beta gamma delta epsilon"),  # identical to kept -> dropped
        (*DOC, 3, "totally different words here"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, idx int, text string"
    )
    kept = sorted(
        r.idx
        for r in dedup_vs_previous_kept(
            df, ["repo", "path", "commit"], "idx", "text", 0.90
        ).collect()
    )
    assert kept == [0, 1, 3]


def test_nearest_boundary_consuming_vs_relaxed(spark):
    # two targets both closest to boundary 10; consumption forces the
    # second target onto 20, the relaxed form assigns 10 twice
    targets = spark.createDataFrame(
        [(*DOC, 0, 9.0), (*DOC, 1, 11.0)],
        "repo string, path string, commit string, target_idx int, target double",
    )
    bounds = spark.createDataFrame(
        [(*DOC, 10.0), (*DOC, 20.0)],
        "repo string, path string, commit string, boundary double",
    )
    relaxed = {
        r.target_idx: r.boundary
        for r in nearest_boundary_relaxed(targets, bounds).collect()
    }
    assert relaxed == {0: 10.0, 1: 10.0}
    consuming = {
        r.target_idx: r.boundary
        for r in nearest_boundary_consuming(targets, bounds).collect()
    }
    assert consuming == {0: 10.0, 1: 20.0}


def test_report_roundtrip_and_compare(spark, tmp_path):
    from corporate_knowledge_extractor_spark.plans.compare import compare_runs
    from corporate_knowledge_extractor_spark.sources.report import (
        load_report,
        write_report,
    )

    triples = spark.createDataFrame(
        [
            ("d1", "defines", "foo", "001", "compute"),
            ("d1", "calls", "bar", "002", "general"),
            ("d2", "defines", "baz", "001", "data"),
        ],
        "subj string, pred string, obj string, frame_id string, category string",
    )
    nodes = spark.createDataFrame(
        [(1, "foo", ["foo"], [1], 3, 1)],
        "canonical_id long, canonical string, aliases array<string>, "
        "merged_from array<long>, total_freq long, n_aliases int",
    )
    out_dir = str(tmp_path / "report")
    meta = write_report(out_dir, triples, nodes, triples)
    assert meta["triples_count"] == 3

    back = load_report(spark, out_dir)
    assert back["metadata"]["triples_count"] == 3
    assert back["triples"].count() == 3
    assert "# Knowledge report" in back["markdown"]
    assert "compute" in back["markdown"]

    # compare: dropping d2 and growing d1 -> mixed
    new = spark.createDataFrame(
        [
            ("d1", "defines", "foo", "001", "compute"),
            ("d1", "calls", "bar", "002", "general"),
            ("d1", "calls", "qux", "003", "general"),
            ("d1", "imports", "os", "004", "general"),
        ],
        "subj string, pred string, obj string, frame_id string, category string",
    )
    cmp_result = compare_runs(triples, new)
    assert cmp_result.verdict == "mixed"
    assert cmp_result.removed_subjects == ["d2"]
    assert cmp_result.changed.get("improved", 0) == 1  # d1: 2 -> 4 triples
    assert cmp_result.deltas["defines"]["old"] == 2
    assert cmp_result.deltas["defines"]["new"] == 1
