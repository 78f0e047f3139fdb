"""A/B: parquet codec for stage-table writes (snappy vs zstd) on the
staged pipeline. The sandbox's staged-scaling cap is the ONE shared
virtio disk every stage table lands on; fewer bytes written = less time
on the serial resource — and at 100 TB zstd is the modern lake default
(scan-bound stages read ~30-40% fewer bytes off storage). This measures
both sides of the trade (write CPU up, bytes down) at 200k docs on the
same 4-executor cluster shape the scaling evidence uses.

Writes BENCH/codec_ab_r05.json. Usage: python scripts/codec_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_codec(codec: str, n_docs: int, reps: int) -> dict:
    import tempfile

    from corporate_knowledge_extractor_spark.plans.pipeline import Pipeline
    from corporate_knowledge_extractor_spark.session import get_spark

    spark = get_spark(
        app_name=f"ckg-codec-{codec}",
        master="local-cluster[4,2,8192]",
        shuffle_partitions=16,
        extra_conf={
            "spark.executor.memory": "7168m",
            "spark.sql.parquet.compression.codec": codec,
        },
    )
    Pipeline(spark, tempfile.mkdtemp(prefix="ckg_cwarm_")).run(
        sf=2000 / 500_000, resume=False
    )
    spark.catalog.clearCache()
    runs = []
    bytes_written = 0
    for _ in range(reps):
        base = tempfile.mkdtemp(prefix=f"ckg_codec_{codec}_")
        t0 = time.time()
        r = Pipeline(spark, base).run(sf=n_docs / 500_000, resume=False)
        wall = time.time() - t0
        du = subprocess.run(
            ["du", "-sb", f"{base}/tables"], capture_output=True, text=True
        )
        bytes_written = int(du.stdout.split()[0])
        runs.append(
            {
                "sec": round(wall, 2),
                "stage_seconds": {k: round(v, 2) for k, v in r.stage_seconds.items()},
            }
        )
        spark.catalog.clearCache()
    spark.stop()
    return {
        "codec": codec,
        "best_sec": min(r["sec"] for r in runs),
        "tables_bytes": bytes_written,
        "runs": runs,
    }


def main(n_docs: int = 200_000, reps: int = 2) -> None:
    results = {}
    for codec in ("snappy", "zstd"):
        if results:
            time.sleep(15)
        cmd = [sys.executable, os.path.abspath(__file__), "--codec", codec,
               str(n_docs), str(reps)]
        p = subprocess.run(cmd, capture_output=True, text=True)
        if p.returncode != 0:
            sys.stderr.write(p.stderr[-4000:])
            raise RuntimeError(f"codec {codec} run failed")
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[codec] = json.loads(line)
        sys.stderr.write(f"{codec}: {line}\n")
    sn, zs = results["snappy"], results["zstd"]
    out = {
        "n_docs": n_docs,
        "mode": "local-cluster[4,2,8192]",
        "snappy": sn,
        "zstd": zs,
        "bytes_ratio_zstd_over_snappy": round(
            zs["tables_bytes"] / sn["tables_bytes"], 3
        ),
        "wall_ratio_zstd_over_snappy": round(zs["best_sec"] / sn["best_sec"], 3),
    }
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    with open(os.path.join(bench_dir, "codec_ab_r05.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--codec" in sys.argv:
        i = sys.argv.index("--codec")
        print(json.dumps(run_codec(sys.argv[i + 1], int(sys.argv[i + 2]),
                                   int(sys.argv[i + 3]))))
    else:
        main()
