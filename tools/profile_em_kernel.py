"""Single-core profile of the EM insert-pass kernel (no Spark).

Splits one `accumulate_leaves` pass over N packed 4096-bit signatures at the
flagship geometry (m=10, depth=4 → ~1000 leaves) into its phases:

  descend   — pass A: adaptive BLAS/packed nearest-child descent
  bincount  — counts + sse reductions
  sort      — the global leaf-order argsort
  unpackB   — pass B's second unpack of the sorted rows
  segsum    — pass B's per-length segment sums into the (L, B) sums array

and prints per-phase seconds + derived sigs/sec, so kernel work can target the
dominant term. The reference's own breakdown attributes ~half the iteration to
accumulation (/root/reference/src/lmw/SVector.h:313-316); this measures ours.

Usage: python tools/profile_em_kernel.py [n_rows=200000] [trials=3]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from lmw_tree_spark.functions.bitops import pack_bits, unpack_bits  # noqa: E402
from lmw_tree_spark.operators import tree as T  # noqa: E402
from lmw_tree_spark.operators.tree import (  # noqa: E402
    CentroidTree,
    _descend_core,
    _rows01_from_bits,
    accumulate_leaves,
    descend,
)


def synth(n: int, words: int = 64, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, np.iinfo(np.uint64).max, size=(n, words), dtype=np.uint64)


def build_tree(sigs: np.ndarray, m: int = 10, depth: int = 4, seed: int = 11) -> CentroidTree:
    from lmw_tree_spark.operators.tree import tsvq_init

    return tsvq_init(sigs[: min(len(sigs), 50_000)], order=m, depth=depth, max_iters=3, seed=seed)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sigs = synth(n)
    tree = build_tree(sigs)
    n_leaves = tree.n_leaves
    print(f"n={n} leaves={n_leaves} depth={tree.depth} trials={trials}")

    # warm pads
    descend(tree, sigs[:8192])

    chunk = 4096
    best: dict[str, float] = {}
    for _ in range(trials):
        t: dict[str, float] = {}

        t0 = time.perf_counter()
        leaf_pos = np.empty(n, dtype=np.int64)
        leaf_d = np.empty(n, dtype=np.int64)
        for lo in range(0, n, chunk):
            cs = sigs[lo : lo + chunk]
            lp, dists = _descend_core(tree, cs, _rows01_from_bits(unpack_bits(cs)))
            leaf_pos[lo : lo + chunk] = lp
            leaf_d[lo : lo + chunk] = dists[:, -1]
        t["descend"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        counts = np.bincount(leaf_pos, minlength=n_leaves)
        fd = leaf_d.astype(np.float64)
        sse = np.bincount(leaf_pos, weights=fd * fd, minlength=n_leaves)
        t["bincount"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        order = np.argsort(leaf_pos, kind="stable")
        t["sort"] = time.perf_counter() - t0

        b = sigs.shape[1] * 64
        sums = np.zeros((n_leaves, b), dtype=np.int64)
        t_unpack = 0.0
        t_seg = 0.0
        for lo in range(0, n, chunk):
            rows = order[lo : lo + chunk]
            t0 = time.perf_counter()
            sorted_bits = unpack_bits(sigs[rows])
            t_unpack += time.perf_counter() - t0
            t0 = time.perf_counter()
            sp = leaf_pos[rows]
            uniq, starts = np.unique(sp, return_index=True)
            ends = np.append(starts[1:], len(sp))
            sizes = ends - starts
            for g in np.unique(sizes):
                sel = np.where(sizes == g)[0]
                if g == 1:
                    sums[uniq[sel]] += sorted_bits[starts[sel]]
                    continue
                pos = (starts[sel][:, None] + np.arange(g)[None, :]).ravel()
                grp = sorted_bits[pos].reshape(len(sel), int(g), -1)
                sums[uniq[sel]] += grp.sum(axis=1, dtype=np.int64)
            t_seg += time.perf_counter() - t0
        t["unpackB"] = t_unpack
        t["segsum"] = t_seg

        for k, v in t.items():
            best[k] = min(best.get(k, 1e9), v)

    total = sum(best.values())
    print(f"{'phase':<10} {'sec':>8} {'%':>6}")
    for k, v in best.items():
        print(f"{k:<10} {v:>8.3f} {100 * v / total:>5.1f}%")
    print(f"{'TOTAL':<10} {total:>8.3f}  => {n / total:,.0f} sigs/s single-core")

    # cross-check against the production entry point
    t0 = time.perf_counter()
    accumulate_leaves(tree, sigs)
    t_prod = time.perf_counter() - t0
    print(f"accumulate_leaves (production): {t_prod:.3f} s => {n / t_prod:,.0f} sigs/s")
    print(f"packed-min-parents: {T._PACKED_LEVEL_MIN_PARENTS}")


if __name__ == "__main__":
    main()
