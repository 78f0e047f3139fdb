#!/usr/bin/env python
"""Cluster entry point for the staged KG pipeline.

Launch (north_rule contract):

    spark-submit \
        --py-files ckg.zip \
        scripts/submit_pipeline.py \
        --base-dir s3://bucket/ckg --sf 0.1 [--no-resume] \
        [--docs-table <iceberg-or-parquet-path>]

where ``ckg.zip`` is a zip of corporate_knowledge_extractor_spark/
(``session.ship_package`` builds and attaches the same zip automatically
when running locally, so plain ``python scripts/submit_pipeline.py``
also works). On a cluster, size ``--shuffle-partitions`` to
executors x cores x 2.

Emits one JSON line with run_id, per-stage seconds, reused stages, and
final table counts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dir", required=True, help="stage-table root (posix path in sandbox; object store on a cluster)")
    ap.add_argument("--sf", type=float, default=0.01, help="synthetic corpus scale (ignored when --docs-table given)")
    ap.add_argument("--docs-table", default=None, help="existing (repo,path,commit,lang,content) parquet/Iceberg path")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from corporate_knowledge_extractor_spark.plans.pipeline import Pipeline
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="ckg-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    docs = spark.read.parquet(args.docs_table) if args.docs_table else None
    pipe = Pipeline(spark, args.base_dir)
    result = pipe.run(docs=docs, sf=args.sf, resume=not args.no_resume)
    out = {
        "run_id": result.run_id,
        "reused_stages": result.reused_stages,
        "stage_seconds": {k: round(v, 2) for k, v in result.stage_seconds.items()},
        "counts": {
            name: result.tables[name].count()
            for name in ("triples", "nodes", "edges")
            if name in result.tables
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
