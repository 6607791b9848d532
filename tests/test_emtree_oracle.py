"""Oracle parity: the Spark EM-tree must match an INDEPENDENT pure-Python/NumPy
reimplementation of the reference's streaming EM-tree loop at dup-pair recall ≥ 0.99
(north rule; FIXTURES.md "Oracle for assignment parity").

The oracle below is written reference-style — per-row descent loops, per-leaf
accumulators, strict > count/2 majority, prune-empty — sharing NOTHING with the
engine's vectorized kernels except the (driver-side, deterministic) TSVQ seed tree,
which both sides consume identically, mirroring how the reference shares its TSVQ
init between runs (/root/reference/src/StreamingEMTreeExperiments.h:28-41).
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from lmw_tree_spark.config import PipelineConfig
from lmw_tree_spark.operators import emtree
from lmw_tree_spark.operators.tree import tsvq_init


# ---------------------------------------------------------------------------
# reference-style oracle (slow, loopy, obviously-correct)
# ---------------------------------------------------------------------------


def _popcount(x: int) -> int:
    return bin(x).count("1")


def _dist(a, b) -> int:
    return sum(_popcount(int(x) ^ int(y)) for x, y in zip(a, b))


class OracleTree:
    """Plain-Python m-way tree over packed signatures (list-of-int rows)."""

    def __init__(self, levels):
        # levels: list of list of dict(node_id, parent_pos, words)
        self.levels = levels

    @classmethod
    def from_seed(cls, tree):
        levels = []
        for lv in tree.levels:
            levels.append(
                [
                    {
                        "node_id": int(lv.node_id[j]),
                        "parent_pos": int(lv.parent_idx[j]),
                        "words": [int(w) for w in lv.centroid[j]],
                    }
                    for j in range(len(lv.node_id))
                ]
            )
        return cls(levels)

    def descend(self, row):
        cur = -1
        choice = None
        for li, nodes in enumerate(self.levels):
            best_d, best_j = None, None
            for j, node in enumerate(nodes):
                if li > 0 and node["parent_pos"] != cur:
                    continue
                d = _dist(row, node["words"])
                if best_d is None or d < best_d:  # strict < → first-wins ties
                    best_d, best_j = d, j
            cur, choice = best_j, (best_j, best_d)
        return choice

    def em_iteration(self, rows, n_bits):
        leaves = self.levels[-1]
        acc = [[0] * n_bits for _ in leaves]
        counts = [0] * len(leaves)
        for row in rows:
            j, _ = self.descend(row)
            counts[j] += 1
            a = acc[j]
            for b in range(n_bits):
                if (int(row[b // 64]) >> (b % 64)) & 1:
                    a[b] += 1
        # bottom-up accumulate + majority update + prune, level by level
        level_accs = [None] * len(self.levels)
        level_accs[-1] = (acc, counts)
        for li in range(len(self.levels) - 1, 0, -1):
            child_acc, child_cnt = level_accs[li]
            parents = self.levels[li - 1]
            p_acc = [[0] * n_bits for _ in parents]
            p_cnt = [0] * len(parents)
            for j, node in enumerate(self.levels[li]):
                p = node["parent_pos"]
                p_cnt[p] += child_cnt[j]
                for b in range(n_bits):
                    p_acc[p][b] += child_acc[j][b]
            level_accs[li - 1] = (p_acc, p_cnt)

        new_levels = []
        keep_prev = None
        for li, nodes in enumerate(self.levels):
            a_l, c_l = level_accs[li]
            new_nodes, remap = [], {}
            for j, node in enumerate(nodes):
                if c_l[j] == 0:
                    continue
                if li > 0 and node["parent_pos"] not in keep_prev:
                    continue
                words = [0] * (n_bits // 64)
                half = c_l[j] // 2
                for b in range(n_bits):
                    if a_l[j][b] > half:  # STRICT > count/2, ties → 0
                        words[b // 64] |= 1 << (b % 64)
                remap[j] = len(new_nodes)
                new_nodes.append(
                    {
                        "node_id": node["node_id"],
                        "parent_pos": keep_prev[node["parent_pos"]] if li > 0 else -1,
                        "words": words,
                    }
                )
            new_levels.append(new_nodes)
            keep_prev = remap
        self.levels = new_levels


def _pairs(ids, labels):
    groups = {}
    for i, l in zip(ids, labels):
        groups.setdefault(l, []).append(i)
    out = set()
    for members in groups.values():
        out.update(itertools.combinations(sorted(members), 2))
    return out


def test_emtree_deterministic_across_partitioning(spark, planted_signatures):
    """Identical assignments regardless of how the input is partitioned — the
    sample is a partition-count-independent top-k by xxhash64 and all kernels
    are seeded, so parallelism never changes the result (the N vs 4N claim)."""
    sigs_u64, _ = planted_signatures
    rows = [
        (f"img{i:06d}", sigs_u64[i].view(np.int64).tolist())
        for i in range(len(sigs_u64))
    ]
    cfg = PipelineConfig(
        sig_bits=256, tree_order=3, tree_depth=2, em_iters=2, tsvq_sample=150,
        tsvq_maxiters=1, seed=42,
    )
    results = []
    for parts in (3, 11):
        df = spark.createDataFrame(rows, "image_id string, sig array<long>").repartition(parts)
        fit = emtree.em_tree_fit(df, cfg)
        a = {
            r["image_id"]: (int(r["cluster_id"]), float(r["distance"]))
            for r in emtree.assign(df, fit.tree).collect()
        }
        results.append(a)
    assert results[0] == results[1]


@pytest.mark.slow
def test_spark_emtree_matches_numpy_oracle(spark, planted_signatures):
    sigs_u64, _ = planted_signatures
    n = len(sigs_u64)
    ids = [f"img{i:06d}" for i in range(n)]
    rows = [(ids[i], sigs_u64[i].view(np.int64).tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "image_id string, sig array<long>").repartition(4)

    cfg = PipelineConfig(
        sig_bits=256, tree_order=3, tree_depth=2, em_iters=3, tsvq_sample=150,
        tsvq_maxiters=1, seed=42,
    )

    # Spark side
    fit = emtree.em_tree_fit(df, cfg)
    spark_assign = {
        r["image_id"]: int(r["cluster_id"])
        for r in emtree.assign(df, fit.tree).collect()
    }

    # Oracle side: same deterministic sample + seed tree, independent loop
    sample = emtree.sample_signatures(df, cfg.tsvq_sample, cfg.seed)
    seed_tree = tsvq_init(sample, cfg.tree_order, cfg.tree_depth, cfg.tsvq_maxiters, cfg.seed)
    oracle = OracleTree.from_seed(seed_tree)
    sig_rows = [sigs_u64[i].view(np.int64).tolist() for i in range(n)]
    # oracle works on unsigned views
    usig_rows = [[int(np.uint64(np.int64(w))) for w in r] for r in sig_rows]
    for _ in range(cfg.em_iters):
        oracle.em_iteration(usig_rows, 256)
    oracle_assign = {}
    for i, row in enumerate(usig_rows):
        j, _ = oracle.descend(row)
        oracle_assign[ids[i]] = oracle.levels[-1][j]["node_id"]

    # dup-pair recall: co-clustered pairs in oracle found co-clustered in Spark
    op = _pairs(ids, [oracle_assign[i] for i in ids])
    sp = _pairs(ids, [spark_assign[i] for i in ids])
    recall = len(op & sp) / len(op)
    assert recall >= 0.99, f"recall {recall}"
    # and with identical config + seeds the assignments should be exactly equal
    mismatches = sum(1 for i in ids if oracle_assign[i] != spark_assign[i])
    assert mismatches / n <= 0.01
