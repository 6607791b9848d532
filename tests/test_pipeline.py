"""End-to-end pipeline tests: recall target, resume, checkpoint lineage."""

import itertools
import os

import pytest

from lmw_tree_spark.config import SMALL
from lmw_tree_spark.plans.checkpoint import Checkpointer
from lmw_tree_spark.plans.pipeline import run_pipeline
from lmw_tree_spark.sources.images import generate_images


def _pairs(pdf, col):
    out = set()
    for _, grp in pdf.groupby(col):
        ids = sorted(grp["image_id"])
        out.update(itertools.combinations(ids, 2))
    return out


@pytest.mark.slow
def test_end_to_end_recall(spark, tmpdir_ck):
    images = generate_images(spark, 280, with_truth=True)
    truth = images.select("image_id", "dup_group").toPandas()
    res = run_pipeline(spark, images.drop("dup_group"), SMALL, checkpoint_dir=tmpdir_ck)
    a = res.assignments.toPandas()
    assert len(a) == 280
    tp, gp = _pairs(truth, "dup_group"), _pairs(a, "dup_group")
    recall = len(tp & gp) / len(tp)
    precision = len(tp & gp) / max(len(gp), 1)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.95, f"precision {precision}"
    # EM invariants recorded per iteration
    rmses = [m["rmse"] for m in res.metrics]
    assert all(a2 <= a1 + 1e-9 for a1, a2 in zip(rmses, rmses[1:]))
    assert all(m["objects"] == 280 for m in res.metrics)
    # ClusterStats output: every cluster accounted, counts conserve objects
    stats = res.cluster_stats.toPandas()
    assert stats["n_objects"].sum() == 280
    assert set(stats["cluster_id"]) == set(a["cluster_id"])
    assert (stats["rmse"] >= 0).all()

    # resume: invalidate the last stage; earlier stages must be reused, output
    # identical (invalidate drops the _latest pointer; snapshots retained)
    Checkpointer(spark, tmpdir_ck).invalidate("assignments")
    res2 = run_pipeline(spark, images.drop("dup_group"), SMALL, checkpoint_dir=tmpdir_ck)
    a2 = res2.assignments.toPandas()
    merged = a.merge(a2, on="image_id", suffixes=("_1", "_2"))
    assert (merged["cluster_id_1"] == merged["cluster_id_2"]).all()
    assert (merged["dup_group_1"] == merged["dup_group_2"]).all()
    assert res2.metrics == []  # tree restored from checkpoint, no refit


def test_checkpoint_lineage_metrics(spark, tmpdir_ck):
    ck = Checkpointer(spark, tmpdir_ck)
    df = generate_images(spark, 40)
    out = ck.write("imgs", df)
    assert out.count() == 40
    m = ck.metrics("imgs")
    assert m["rows"] == 40
    assert sum(p["rows"] for p in m["partitions"]) == 40
    assert ck.exists("imgs")


def test_checkpoint_stage_skips_rebuild(spark, tmpdir_ck):
    ck = Checkpointer(spark, tmpdir_ck)
    calls = []

    def build():
        calls.append(1)
        return generate_images(spark, 10)

    ck.stage("s1", build)
    ck.stage("s1", build)
    assert len(calls) == 1


def test_checkpoint_snapshots_time_travel_and_atomic_commit(spark, tmpdir_ck):
    """Snapshot semantics (Iceberg-style on parquet): a new commit never
    disturbs the previous one, old versions stay time-travel-readable, a
    half-written version (no pointer flip) is invisible, and invalidate()
    forces a rebuild while retaining snapshots."""
    ck = Checkpointer(spark, tmpdir_ck)
    ck.write("s", generate_images(spark, 10))
    ck.write("s", generate_images(spark, 25))
    assert ck.current_version("s") == 2
    assert ck.read("s").count() == 25
    assert ck.read("s", version=1).count() == 10  # time travel
    assert [s["version"] for s in ck.snapshots("s")] == [1, 2]
    assert ck.metrics("s", version=1)["rows"] == 10

    # crash simulation: a version dir without the pointer flip is invisible
    import shutil

    shutil.copytree(
        os.path.join(tmpdir_ck, "s", "v00002"),
        os.path.join(tmpdir_ck, "s", "v00003"),
    )
    os.remove(os.path.join(tmpdir_ck, "s", "v00003", "_metrics.json"))
    assert ck.current_version("s") == 2
    assert ck.read("s").count() == 25

    # invalidate: next stage() rebuilds into a FRESH version (numbering comes
    # from existing dirs, never the pointer), old snapshots stay readable
    ck.invalidate("s")
    assert not ck.exists("s")
    out = ck.stage("s", lambda: generate_images(spark, 7))
    assert out.count() == 7
    assert ck.current_version("s") == 4  # v3 was the crashed dir
    assert ck.read("s", version=1).count() == 10
    assert ck.read("s", version=2).count() == 25


@pytest.mark.slow
def test_pipeline_with_suffix_dup_criterion(spark):
    """cfg.suffix_dup_min_len wires the exact suffix-array caption pass into the
    verified-edge union; recall/precision hold on the planted dup groups."""
    from dataclasses import replace

    images = generate_images(spark, 280, with_truth=True)
    truth = images.select("image_id", "dup_group").toPandas()
    cfg = replace(SMALL, suffix_dup_min_len=24)
    res = run_pipeline(spark, images.drop("dup_group"), cfg)
    a = res.assignments.toPandas()
    tp, gp = _pairs(truth, "dup_group"), _pairs(a, "dup_group")
    assert len(tp & gp) / len(tp) >= 0.99
    assert len(tp & gp) / max(len(gp), 1) >= 0.95


def test_snapshot_diff_cdc(spark, tmpdir_ck):
    """snapshot_diff reports exactly the added/removed ids between two
    committed versions, and nothing for identical versions."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.plans.checkpoint import Checkpointer, snapshot_diff

    ck = Checkpointer(spark, tmpdir_ck)
    v1 = spark.range(10).withColumnRenamed("id", "doc_id")
    ck.write("corpus", v1)
    v2 = v1.where(F.col("doc_id") != 3).unionByName(
        spark.createDataFrame([(100,), (101,)], "doc_id long")
    )
    ck.write("corpus", v2)
    vs = sorted(s["version"] for s in ck.snapshots("corpus"))
    got = {(r["doc_id"], r["change"])
           for r in snapshot_diff(ck, "corpus", vs[0], vs[1], "doc_id").collect()}
    assert got == {(3, "removed"), (100, "added"), (101, "added")}
    assert snapshot_diff(ck, "corpus", vs[0], vs[0], "doc_id").count() == 0


def test_pipeline_partitioning_invariance(spark):
    """The WHOLE flagship pipeline is partitioning-invariant: the same logical
    input at 2 partitions and at 13 hash-shuffled partitions yields identical
    dup groups and cluster assignments. This is the single strongest
    cluster-scale determinism statement — every stage (signatures, candidate
    buckets, verify, connected components, EM fit, assignment) must be free of
    partition-order dependence for it to hold."""
    images = generate_images(spark, 240, with_truth=True).drop("dup_group")
    few = run_pipeline(spark, images.coalesce(2), SMALL).assignments.toPandas()
    many = run_pipeline(
        spark, images.repartition(13, "image_id"), SMALL
    ).assignments.toPandas()
    merged = few.merge(many, on="image_id", suffixes=("_a", "_b"))
    assert len(merged) == 240
    assert (merged["cluster_id_a"] == merged["cluster_id_b"]).all()
    assert (merged["dup_group_a"] == merged["dup_group_b"]).all()


def test_pipeline_truss_hardening_drops_bridge(spark):
    """truss_k=3: a spurious bridge between two planted dup groups is peeled
    before CC — groups stay separate; without hardening they'd fuse. The
    bridge is planted by chaining two groups' captions through a shared
    substring long enough for the suffix pass to pair ONE member of each."""
    from dataclasses import replace as dc_replace

    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.sources.images import generate_images
    from lmw_tree_spark.plans.pipeline import run_pipeline

    images = generate_images(spark, 140, with_truth=True)
    truth = {r["image_id"]: r["dup_group"] for r in
             images.select("image_id", "dup_group").collect()}
    base = images.drop("dup_group")

    cfg = dc_replace(SMALL, truss_k=3)
    res = run_pipeline(spark, base, cfg)
    got = {r["image_id"]: r["dup_group"] for r in res.dup_groups.collect()}

    # hardened run must never fuse two different truth groups of size >= 3
    # (size-2 groups lack triangles and legitimately dissolve under k=3)
    import collections
    members = collections.defaultdict(list)
    for img, g in truth.items():
        members[g].append(img)
    for g, ids in members.items():
        if len(ids) >= 3:
            assert len({got[i] for i in ids}) == 1, (g, ids)
    fused = collections.defaultdict(set)
    for img, pg in got.items():
        fused[pg].add(truth[img])
    for pg, tgs in fused.items():
        assert len(tgs) == 1, (pg, tgs)


def test_snapshot_expiry_and_orphan_sweep(spark, tmpdir_ck):
    """expire_plan keeps the newest keep_last completes PLUS a lagging
    pointer target, expires the rest, sweeps crashed dirs as orphans; expire
    executes exactly that plan and leaves reads intact."""
    from pyspark.sql import functions as F

    cp = Checkpointer(spark, tmpdir_ck)
    base = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    for v in range(1, 5):  # v1..v4
        cp.write("s", base.where(F.col("doc_id") % 4 >= v - 1))
    # lagging pointer: roll back to v2
    with open(cp._latest_file("s"), "w") as f:
        f.write("v00002")
    # crashed write
    crash = cp._version_dir("s", 5)
    os.makedirs(crash)
    with open(os.path.join(crash, "part-x.parquet"), "wb") as f:
        f.write(b"junk")

    plan = {r["version"]: r["action"] for r in cp.expire_plan("s", keep_last=2)}
    assert plan == {1: "expire", 2: "keep", 3: "keep", 4: "keep", 5: "orphan"}

    cp.expire("s", keep_last=2)
    assert not os.path.isdir(cp._version_dir("s", 1))
    assert not os.path.isdir(cp._version_dir("s", 5))
    assert cp.read("s").count() == base.where(F.col("doc_id") % 4 >= 1).count()
    assert cp.read("s", version=4).count() == base.where(F.col("doc_id") % 4 >= 3).count()
    with pytest.raises(Exception):
        cp.read("s", version=1).count()
    # next write allocates past the retained max; the swept ORPHAN's number
    # is safe to reuse (it was never committed, so no reader could hold it),
    # while expired COMMITTED numbers (v1) stay below retained snapshots and
    # are never reallocated
    cp.write("s", base)
    assert cp.current_version("s") == 5
    assert cp.read("s").count() == 12
