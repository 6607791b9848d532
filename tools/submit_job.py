"""spark-submit entry point for the flagship dedup+cluster pipeline.

Package and run (the north-rule deployment shape — works unchanged on a real
multi-executor cluster; ``--master local[N]`` stands in for cluster managers
here):

    cd /root/repo && zip -qr /tmp/lmw_tree_spark.zip lmw_tree_spark
    spark-submit --py-files /tmp/lmw_tree_spark.zip \
        --master local[8] --driver-memory 8g tools/submit_job.py \
        --n-images 2000 --checkpoint-dir /tmp/lmw_run --out /tmp/lmw_out

Pass ``--driver-memory`` explicitly: spark-submit's 1g default is marginal for
the CC broadcast joins at ≳100k rows (observed intermittent "Could not
allocate memory to grow BytesToBytesMap" at 96k with the default; 8g is
comfortable — in cluster mode executors size separately as usual).

The job creates NO SparkSession of its own configuration demands beyond what
``lmw_tree_spark.session.get_spark`` sets; on a cluster, pass the usual
``--num-executors/--executor-cores/--executor-memory`` and the same script runs
at any parallelism (scaling evidence: run at N and 4N executors, compare wall
time — see bench.py / BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="parquet dir in the input_hint schema; omit to use the synthetic generator")
    ap.add_argument("--n-images", type=int, default=2000, help="synthetic row count when --input is omitted")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--out", default=None, help="write assignments parquet here")
    ap.add_argument("--sig-bits", type=int, default=4096)
    ap.add_argument("--tree-order", type=int, default=10)
    ap.add_argument("--tree-depth", type=int, default=4)
    ap.add_argument("--em-iters", type=int, default=4)
    ap.add_argument(
        "--tsvq-sample", type=int, default=None,
        help="TSVQ seed sample size; defaults to min(2000, n/4) for synthetic "
             "input so small demo runs don't seed more leaves than warranted",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from lmw_tree_spark.config import PipelineConfig
    from lmw_tree_spark.plans.pipeline import run_pipeline
    from lmw_tree_spark.sources.images import generate_images

    spark = SparkSession.builder.appName("lmw-dedup-cluster").getOrCreate()
    sample = args.tsvq_sample or (
        2000 if args.input else min(2000, max(64, args.n_images // 4))
    )
    cfg = PipelineConfig(
        sig_bits=args.sig_bits,
        tree_order=args.tree_order,
        tree_depth=args.tree_depth,
        em_iters=args.em_iters,
        tsvq_sample=sample,
    )
    t0 = time.time()
    images = (
        spark.read.parquet(args.input) if args.input else generate_images(spark, args.n_images)
    )
    res = run_pipeline(spark, images, cfg, checkpoint_dir=args.checkpoint_dir)
    if args.out:
        res.assignments.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = res.assignments.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "rows": n,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n / wall, 1),
                "leaves": res.tree.n_leaves,
                "em_metrics": res.metrics,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
