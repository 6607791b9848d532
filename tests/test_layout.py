"""Z-order layout planning (operators/layout.py)."""

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
