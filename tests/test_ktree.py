"""K-tree invariants (reference /root/reference/src/lmw/KTree.h semantics):
height balance, capacity bounds, object conservation, determinism, delayed
updates, rearrange, CentroidTree conversion + hybrid fit quality."""

import numpy as np
import pandas as pd
import pytest

from lmw_tree_spark.functions.bitops import hamming_cdist, pack_bits, unpack_bits
from lmw_tree_spark.operators.ktree import KTree


def _planted(rng, n_clusters=6, per=60, words=4, flip=0.04):
    seeds = rng.integers(0, 2**63, (n_clusters, words), dtype=np.uint64)
    sigs, labels = [], []
    for c in range(n_clusters):
        base = unpack_bits(seeds[c][None])[0]
        for _ in range(per):
            flips = (rng.random(words * 64) < flip).astype(np.uint8)
            sigs.append(pack_bits((base ^ flips)[None])[0])
            labels.append(c)
    return np.array(sigs, dtype=np.uint64), np.array(labels)


def test_ktree_structure_invariants():
    rng = np.random.default_rng(7)
    sigs, _ = _planted(rng)
    kt = KTree(order=8, seed=1, update_delay=50)
    kt.add_all(sigs)
    assert kt.n_objects == len(sigs)
    assert len(kt.leaf_depths()) == 1            # height-balanced
    assert sum(kt.leaf_sizes()) == len(sigs)     # object conservation
    assert all(s < 8 for s in kt.leaf_sizes())   # leaf capacity bound

    def max_fanout(n):
        if n.leaf:
            return 0
        return max([len(n.children)] + [max_fanout(c) for c in n.children])

    assert max_fanout(kt.root) <= 8


def test_ktree_deterministic():
    rng = np.random.default_rng(8)
    sigs, _ = _planted(rng, n_clusters=4, per=40)
    trees = []
    for _ in range(2):
        kt = KTree(order=6, seed=3)
        kt.add_all(sigs)
        ct = kt.to_centroid_tree()
        trees.append([lv.centroid.copy() for lv in ct.levels])
    assert len(trees[0]) == len(trees[1])
    for a, b in zip(trees[0], trees[1]):
        np.testing.assert_array_equal(a, b)


def test_ktree_rearrange_improves_or_holds_rmse():
    rng = np.random.default_rng(9)
    sigs, _ = _planted(rng)

    def rmse(kt):
        ct = kt.to_centroid_tree()
        leaves = ct.levels[-1].centroid
        d = hamming_cdist(sigs, leaves).min(axis=1).astype(np.float64)
        return float(np.sqrt((d * d).mean()))

    kt = KTree(order=8, seed=2, update_delay=25)
    kt.add_all(sigs)
    before = rmse(kt)
    kt.rearrange()
    assert sum(kt.leaf_sizes()) == len(sigs)
    after = rmse(kt)
    assert after <= before * 1.05  # second pass tightens (small tolerance)


def test_ktree_recovers_planted_clusters():
    rng = np.random.default_rng(10)
    sigs, labels = _planted(rng, n_clusters=5, per=50, flip=0.02)
    kt = KTree(order=10, seed=4, update_delay=100)
    kt.add_all(sigs)
    kt.rearrange()
    ct = kt.to_centroid_tree()
    leaves = ct.levels[-1].centroid
    assign = hamming_cdist(sigs, leaves).argmin(axis=1)
    # majority-label purity over leaf clusters
    purity = 0
    for c in np.unique(assign):
        members = labels[assign == c]
        purity += np.bincount(members).max()
    assert purity / len(labels) > 0.9


def test_ktree_degenerate_single_leaf():
    kt = KTree(order=16, seed=5)
    sigs = np.array([[7, 7]] * 5, dtype=np.uint64)
    kt.add_all(sigs)
    ct = kt.to_centroid_tree()
    assert ct.depth == 1 and ct.n_leaves == 1
    np.testing.assert_array_equal(ct.levels[0].centroid[0], [7, 7])


def test_ktree_fit_hybrid_on_spark(spark):
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators.emtree import assign as em_assign
    from lmw_tree_spark.operators.ktree import ktree_fit

    rng = np.random.default_rng(11)
    sigs, labels = _planted(rng, n_clusters=4, per=60, flip=0.03)
    pdf = pd.DataFrame(
        {
            "image_id": [f"img{i:06d}" for i in range(len(sigs))],
            "sig": [s.view(np.int64).tolist() for s in sigs],
        }
    )
    df = spark.createDataFrame(pdf, "image_id string, sig array<long>")
    fit = ktree_fit(df, SMALL, order=8, update_delay=50)
    assert fit.metrics[0]["objects"] == len(sigs)
    rmses = [m["rmse"] for m in fit.metrics]
    assert all(rmses[i + 1] <= rmses[i] + 1e-9 for i in range(len(rmses) - 1))
    a = em_assign(df, fit.tree).toPandas()
    assert len(a) == len(sigs)
    # purity vs planted labels
    merged = a.assign(label=labels[a["image_id"].str[3:].astype(int)])
    purity = sum(
        g["label"].value_counts().iloc[0] for _, g in merged.groupby("cluster_id")
    )
    assert purity / len(labels) > 0.85
