"""Two-level accumulator combine: the distributed gatherAccumulators
(reference /root/reference/src/lmw/StreamingEMTree.h:253-268). The driver gather
must be bounded by combine_keys blobs — never O(partitions) — and the merged
result must be bit-identical to the direct path (integer algebra commutes)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lmw_tree_spark.operators import emtree
from lmw_tree_spark.operators.tree import tsvq_init


def _sig_df(spark, sigs_u64, n_parts):
    rows = [
        (f"img{i:05d}", sigs_u64[i].view(np.int64).tolist())
        for i in range(len(sigs_u64))
    ]
    return spark.createDataFrame(rows, "image_id string, sig array<long>").repartition(
        n_parts
    )


def test_two_level_combine_equals_direct_gather(spark, planted_signatures):
    sigs_u64, _ = planted_signatures
    tree = tsvq_init(sigs_u64[:120], 4, 2, 1, 11)
    df = _sig_df(spark, sigs_u64, n_parts=8).persist()
    bc = spark.sparkContext.broadcast(tree)
    try:
        direct = emtree._accumulate_pass(df, bc, combine_threshold=10_000)
        combined = emtree._accumulate_pass(
            df, bc, combine_threshold=1, combine_keys=3
        )
    finally:
        bc.unpersist()
    for a, b in zip(direct, combined):
        assert np.array_equal(a, b)


def _stub_partial(keys):
    def run(batches):
        from pyspark import TaskContext

        if not any(len(pdf) for pdf in batches):
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        yield pd.DataFrame({"merge_key": [pid % keys], "payload": [b""]})

    return run


def test_combined_gather_is_bounded_by_combine_keys(spark, planted_signatures):
    """In two-level mode the driver collects the post-merge DataFrame, which has
    at most combine_keys rows regardless of input partitioning — O(keys ×
    leaves) driver memory, not O(partitions × leaves). Asserted on the same
    plan shape (partial blobs keyed by partition_id % keys → groupBy merge)."""
    sigs_u64, _ = planted_signatures
    keys = 4
    df = _sig_df(spark, sigs_u64, n_parts=16)
    merged_rows = (
        df.select("sig")
        .mapInPandas(_stub_partial(keys), emtree.KEYED_ACC_SCHEMA)
        .groupBy("merge_key")
        .agg(F.count("*").alias("n"))
        .count()
    )
    assert merged_rows <= keys
