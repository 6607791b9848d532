"""Connected-components tests (hash-to-min label propagation)."""

from lmw_tree_spark.operators.ccomp import connected_components


def test_simple_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    got = {r["image_id"]: r["dup_group"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_chain_converges(spark):
    # long path graph — worst case for propagation depth
    n = 40
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i+1:03d}") for i in range(n - 1)], "src string, dst string"
    )
    got = connected_components(edges).collect()
    assert {r["dup_group"] for r in got} == {"v000"}
    assert len(got) == n


def test_singletons_from_vertex_universe(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    verts = spark.createDataFrame(
        [("a",), ("b",), ("lonely",)], "image_id string"
    )
    got = {r["image_id"]: r["dup_group"] for r in connected_components(edges, verts).collect()}
    assert got == {"a": "a", "b": "a", "lonely": "lonely"}


def test_label_is_min_id(spark):
    edges = spark.createDataFrame(
        [("zz", "mm"), ("mm", "aa"), ("zz", "aa")], "src string, dst string"
    )
    got = {r["image_id"]: r["dup_group"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {"aa"}
