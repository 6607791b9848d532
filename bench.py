"""Benchmark harness: flagship dedup+cluster throughput + headline queries.

Prints ONE JSON line:
  {"metric": "...", "value": <seconds>, "unit": "sec", "queries": {...}, "sf": ...,
   "throughput_images_per_sec": ..., "scaling": {...}}

- Flagship: synthetic image+caption table (scale from $SPARK_GRAFT_SF_DIR) →
  signatures → LSH dedup → connected components → EM-tree fit+assign, timed
  end-to-end at local[$SPARK_GRAFT_CPUS].
- Scaling evidence (north rule, per driver instruction): the same flagship job runs
  at local[N/4] and local[N] on identical input; efficiency =
  (t_small / t_big) / 4 — 1.0 is perfect linear scaling.
- queries: per-query wall seconds for representative operators on the driver tables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf() -> float:
    name = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_config():
    from lmw_tree_spark.config import PipelineConfig

    # reference-geometry signatures (4096-bit, StreamingEMTreeExperiments.h:50-52)
    # with a tree sized to the bench corpus (order 10 like the flagship, depth 3)
    return PipelineConfig(
        sig_bits=4096, tree_order=10, tree_depth=3, em_iters=2,
        tsvq_sample=4000, tsvq_maxiters=1,
    )


def run_flagship(master: str, shuffle_partitions: int, n_images: int) -> dict:
    """One full dedup+cluster job in a fresh Spark session; returns stage timings."""
    from lmw_tree_spark.operators import emtree, lsh
    from lmw_tree_spark.operators.ccomp import connected_components
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.session import get_spark
    from lmw_tree_spark.sources.images import generate_images

    spark = get_spark(
        app_name=f"bench-{master}", master=master, shuffle_partitions=shuffle_partitions
    )
    cfg = bench_config()
    try:
        t0 = time.time()
        images = generate_images(spark, n_images)
        sigs = extract_signatures(images, cfg).persist()
        sigs.count()
        t_sig = time.time() - t0

        t1 = time.time()
        verified = lsh.verify_edges(lsh.candidate_edges(sigs, cfg), sigs, cfg).where(
            "is_dup"
        )
        groups = connected_components(verified, vertices=sigs)
        n_groups = groups.count()
        t_dedup = time.time() - t1

        t2 = time.time()
        fit = emtree.em_tree_fit(sigs, cfg)
        assignments = emtree.assign(sigs, fit.tree)
        n_assigned = assignments.count()
        t_cluster = time.time() - t2

        total = time.time() - t0
        return {
            "t_signatures": round(t_sig, 2),
            "t_dedup": round(t_dedup, 2),
            "t_cluster": round(t_cluster, 2),
            "t_total": round(total, 2),
            "rows": n_assigned,
            "dup_vertices": n_groups,
            "leaves": fit.tree.n_leaves,
        }
    finally:
        sigs.unpersist()
        spark.stop()


def run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry

    names = [
        "pricing_summary", "subset_semi_join", "topk_dims", "token_count",
        "lang_id", "exact_dedup", "token_jaccard", "simhash32", "minhash_sql",
        "cosine_topk", "centroid_assign", "minhash_lsh_dedup", "simhash_dedup",
        "ivf_ann", "user_sessions", "events_hourly",
    ]
    qs = entry.queries()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main():
    sf = _sf()
    n_images = max(700, int(sf * 70_000))

    # flagship at full parallelism
    big = run_flagship(f"local[{CPUS}]", CPUS, n_images)

    # scaling: same job at quarter parallelism (N vs 4N evidence)
    small_cpus = max(2, CPUS // 4)
    small = run_flagship(f"local[{small_cpus}]", small_cpus, n_images)
    efficiency = round((small["t_total"] / big["t_total"]) / (CPUS / small_cpus), 3)

    # headline queries on the driver tables
    from lmw_tree_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", master=f"local[{CPUS}]")
    queries = run_queries(spark, SF_DIR)
    spark.stop()

    result = {
        "metric": "dedup_cluster_e2e_seconds",
        "value": big["t_total"],
        "unit": "sec",
        "sf": sf,
        "n_images": n_images,
        "throughput_images_per_sec": round(n_images / big["t_total"], 1),
        "stages": big,
        "scaling": {
            "cpus_small": small_cpus,
            "cpus_big": CPUS,
            "t_small": small["t_total"],
            "t_big": big["t_total"],
            "efficiency": efficiency,
        },
        "queries": queries,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
