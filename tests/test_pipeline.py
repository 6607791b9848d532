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

    # resume: wipe the last stage; earlier stages must be reused, output identical
    os.remove(os.path.join(tmpdir_ck, "assignments", "_SUCCESS"))
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
