"""Z-order layout planning (operators/layout.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lmw_tree_spark.operators.layout import (
    morton2_col,
    prune_estimate,
    zorder_manifest,
)


def _morton_ref(bx: int, by: int, bits: int = 4) -> int:
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i + 1)
        z |= ((by >> i) & 1) << (2 * i)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    rows = [(x * 16 + y, x, y) for x in range(16) for y in range(16)]
    return spark.createDataFrame(rows, "id long, bx int, byy int")


def test_morton_matches_reference(grid):
    got = grid.select(
        "bx", "byy", morton2_col(F.col("bx"), F.col("byy")).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["bx"], r["byy"]), (r["bx"], r["byy"])


def test_morton_is_a_bijection(grid):
    zs = [r["z"] for r in grid.select(morton2_col(F.col("bx"), F.col("byy")).alias("z")).collect()]
    assert sorted(zs) == list(range(256))


def test_manifest_files_partition_z_ranges(grid):
    """16 files over the 8-bit z space = 16 codes per file, all non-empty,
    equal row counts on the full grid."""
    m = zorder_manifest(grid, "bx", "byy", "bx", "byy", n_files=16).toPandas()
    assert sorted(m["file_id"]) == list(range(16))
    assert set(m["n_rows"]) == {16}


def test_zorder_clusters_both_dims():
    """The point of the curve: on a z-ordered layout BOTH bucketized columns
    have per-file spans ~sqrt(grid) wide, so a range predicate on either
    prunes most files — compare with an x-sorted layout where y never prunes."""
    spans_x, spans_y = [], []
    for f in range(16):
        codes = [z for z in range(256) if (z * 16) >> 8 == f]
        xs = [sum(((z >> (2 * i + 1)) & 1) << i for i in range(4)) for z in codes]
        ys = [sum(((z >> (2 * i)) & 1) << i for i in range(4)) for z in codes]
        spans_x.append(max(xs) - min(xs))
        spans_y.append(max(ys) - min(ys))
    # every file spans at most a 4-wide x slab and 8-wide y slab (vs 16 for
    # an unclustered dimension)
    assert max(spans_x) <= 4 and max(spans_y) <= 8


def test_prune_estimate_overlap(spark):
    rows = [(1, 10, 0, 100), (2, 5, 200, 300), (3, 7, 150, 250)]
    m = spark.createDataFrame(
        rows, "file_id int, n_rows long, min_x long, max_x long"
    ).withColumn("min_y", F.lit(0)).withColumn("max_y", F.lit(0))
    got = (
        prune_estimate(m, 120, 220, on="x")
        .toPandas()
        .set_index("file_id")["scan_x"]
    )
    assert got[1] == 0 and got[2] == 1 and got[3] == 1


def test_compaction_plan_bin_packing(spark):
    """Hand-computed binPack: exclusive-run bucketing per partition, large
    files pass through, straddling file joins the group its start falls in."""
    from lmw_tree_spark.operators.layout import compaction_plan

    rows = [
        # partition a: smalls 300+300+500 -> runs 0,300,600 with target 1000
        ("a", 1, 300), ("a", 2, 300), ("a", 3, 500),
        # large file (>= small=500): passes through, does NOT advance the run
        ("a", 4, 900),
        # next small continues the run at 1100 -> group 1
        ("a", 5, 400),
        # partition b: independent run
        ("b", 6, 450), ("b", 7, 450),
    ]
    m = spark.createDataFrame(rows, "part_key string, file_id long, bytes long")
    got = (
        compaction_plan(m, target_bytes=1000, small_bytes=500)
        .toPandas().set_index("file_id").sort_index()
    )
    assert got.loc[1, "compact"] == 1 and got.loc[1, "group_id"] == 0  # run 0
    assert got.loc[2, "compact"] == 1 and got.loc[2, "group_id"] == 0  # run 300
    # 500 is NOT < small_bytes=500: boundary file passes through
    assert got.loc[3, "compact"] == 0 and pd.isna(got.loc[3, "group_id"])
    assert got.loc[4, "compact"] == 0 and pd.isna(got.loc[4, "group_id"])
    # run for file 5 = 300+300+400's exclusive sum = 600 -> group 0
    assert got.loc[5, "compact"] == 1 and got.loc[5, "group_id"] == 0
    # partition b runs independently: 0 and 450 -> both group 0
    assert got.loc[6, "group_id"] == 0 and got.loc[7, "group_id"] == 0

    # straddle: target 400 -> file 2 starts at run 300 -> group 0; file 5 at 600 -> group 1
    tight = (
        compaction_plan(m, target_bytes=400, small_bytes=500)
        .toPandas().set_index("file_id")
    )
    assert tight.loc[2, "group_id"] == 0 and tight.loc[5, "group_id"] == 1


def test_compaction_plan_invariants_randomized(spark):
    """Seeded randomized invariants: candidate group ids are contiguous from
    0 per partition (each step adds < target), every group's byte total is
    bounded by target + largest-small-file (the straddle bound), and
    non-candidates are never grouped."""
    import numpy as np

    from lmw_tree_spark.operators.layout import compaction_plan

    target, small = 1000, 500
    for seed in (3, 17, 99):
        rng = np.random.default_rng(seed)
        rows = [
            (f"p{int(rng.integers(0, 4))}", int(i), int(rng.integers(1, 2000)))
            for i in range(300)
        ]
        m = spark.createDataFrame(rows, "part_key string, file_id long, bytes long")
        got = compaction_plan(m, target_bytes=target, small_bytes=small).toPandas()
        assert (got[got.compact == 0].group_id.isna()).all()
        cands = got[got.compact == 1]
        for part, grp in cands.groupby("part_key"):
            gids = sorted(grp.group_id.unique())
            assert gids == list(range(len(gids))), (seed, part, gids)
            per = grp.groupby("group_id")["bytes"].sum()
            assert (per <= target + small).all(), (seed, part, per.max())
