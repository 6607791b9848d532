"""End-to-end dedup + cluster pipeline (the flagship job).

    images (input_hint schema)
      → signatures        (decode once; SimHash/sig/MinHash; bytes dropped)
      → candidate edges   (MinHash bands ∪ phash/simhash pigeonhole ∪ L-gram substring)
      → verified pairs    (JVM-side Hamming / MinHash-agreement thresholds)
      → dup groups        (connected components, hash-to-min)
      → EM-tree fit       (TSVQ-seeded, distributed EM iterations)
      → assignments       (leaf cluster_id + distance + dup_group per image)

Each stage checkpoints (parquet/Iceberg) with per-partition lineage metrics and is
skipped on resume when complete. The tree itself is checkpointed as rows
(FIXTURES.md §4 schema) so a restart continues from the fitted tree.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lmw_tree_spark.config import PipelineConfig
from lmw_tree_spark.operators import emtree, lsh
from lmw_tree_spark.operators.ccomp import connected_components
from lmw_tree_spark.operators.signature_stage import extract_signatures
from lmw_tree_spark.operators.tree import CentroidTree
from lmw_tree_spark.plans.checkpoint import Checkpointer

TREE_STAGE_SCHEMA = "level int, node_id long, parent_id long, centroid array<long>"


@dataclass
class PipelineResult:
    signatures: DataFrame
    dup_groups: DataFrame      # (image_id, dup_group)
    assignments: DataFrame     # (image_id, cluster_id, distance, dup_group)
    cluster_stats: DataFrame   # (cluster_id, n_objects, rmse) — ClusterStats parity
    tree: CentroidTree
    metrics: list[dict]


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    cfg: PipelineConfig,
    checkpoint_dir: str | None = None,
) -> PipelineResult:
    ckpt = Checkpointer(spark, checkpoint_dir) if checkpoint_dir else None

    def staged(name: str, build, sig_col: str | None = None) -> DataFrame:
        if ckpt is None:
            return build()
        out = ckpt.stage(name, build, sig_col)
        # checkpointed runs are the bounded-scratch deployment shape: the
        # stage just materialized to parquet, so its shuffle files are dead
        # weight — force a driver GC so ContextCleaner deletes them before
        # the next stage starts (peak local-disk = max-over-stages, not
        # sum; the 8M-image probe only completes this way — BASELINE.md).
        # For corpora where the verify JOIN alone exceeds local disk, the
        # hash-sliced verify in bench.run_flagship(staged=True) is the
        # template (pmod(xxhash64) slices of the edge list, released
        # between slices).
        try:
            spark.sparkContext._jvm.System.gc()
        except AttributeError:
            # Spark Connect sessions have no sparkContext/_jvm gateway; the
            # eager-cleanup nudge is an optimization, so degrade gracefully
            pass
        return out

    sigs = staged("signatures", lambda: extract_signatures(images, cfg), sig_col="sig")
    if ckpt is None:
        # single-action reuse without a durable checkpoint
        sigs = sigs.persist()

    def build_verified() -> DataFrame:
        edges = lsh.verify_edges(lsh.candidate_edges(sigs, cfg), sigs, cfg).where("is_dup")
        if cfg.suffix_dup_min_len is not None:
            # exact suffix-array substring pass on captions (operators/suffix.py):
            # pairs sharing ≥ suffix_dup_min_len chars are dup edges too
            from lmw_tree_spark.operators.suffix import substring_pairs

            sub = substring_pairs(
                sigs, "image_id", "caption", min_len=cfg.suffix_dup_min_len
            ).select(
                "src",
                "dst",
                F.lit(None).cast("long").alias("phash_dist"),
                F.lit(None).cast("long").alias("simhash_dist"),
                F.lit(None).cast("double").alias("caption_sim"),
                F.lit(True).alias("is_dup"),
            )
            edges = edges.unionByName(sub).dropDuplicates(["src", "dst"])
        return edges

    verified = staged("verified_pairs", build_verified)
    if ckpt is None:
        # CC's label loop starts from these edges; don't recompute the whole
        # candidate-generation DAG when materializing them
        verified = verified.persist()
    def build_groups() -> DataFrame:
        edges = verified
        if cfg.truss_k is not None:
            # optional precision hardening: peel uncorroborated edges (k-truss,
            # operators/graph.py) so a single spurious verified pair cannot
            # fuse two dup groups in the closure below
            from lmw_tree_spark.operators.graph import ktruss

            edges = ktruss(verified.select("src", "dst"), k=cfg.truss_k)
        return connected_components(edges, vertices=sigs)

    groups = staged("dup_groups", build_groups)

    # EM-tree fit: resume from a checkpointed tree when present
    metrics: list[dict] = []
    if ckpt is not None and ckpt.exists("tree"):
        rows = ckpt.read("tree").collect()
        tree = CentroidTree.from_rows(
            [(r["level"], r["node_id"], r["parent_id"], r["centroid"]) for r in rows],
            order=cfg.tree_order,
        )
    else:
        fit = emtree.em_tree_fit(sigs, cfg)
        tree, metrics = fit.tree, fit.metrics
        if ckpt is not None:
            tree_df = spark.createDataFrame(
                [(lvl, nid, pid, words) for lvl, nid, pid, words in tree.to_rows()],
                TREE_STAGE_SCHEMA,
            )
            ckpt.write("tree", tree_df)

    assignments = staged(
        "assignments",
        lambda: emtree.assign(sigs, tree).join(groups, "image_id", "left").select(
            "image_id",
            "cluster_id",
            "distance",
            F.coalesce("dup_group", "image_id").alias("dup_group"),
        ),
    )
    # the reference's final pass emits ClusterWriter AND ClusterStats outputs
    # (/root/reference/src/StreamingEMTreeExperiments.h:66-92); assignments above
    # are the former, this per-cluster stats table is the latter
    stats = staged("cluster_stats", lambda: emtree.cluster_stats(assignments))
    return PipelineResult(sigs, groups, assignments, stats, tree, metrics)
