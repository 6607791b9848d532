"""Bucketed-table co-location — the shuffle-elimination layer for the hot
join keys.

The engine's most repeated join is by document/image id: the signature table
meets candidate edges, verify output, assignments, and quality columns over
and over (one join per pipeline stage, several per EM iteration family). At
100 TB each of those joins is a full shuffle of the fact table UNLESS the
table is stored bucketed on the join key: Spark's bucketed scan exposes a
``HashPartitioning(key, n)`` output partitioning, so an equi-join of two
tables bucketed (same key, same bucket count) plans as a SortMergeJoin with
ZERO Exchange on either side — the 100 TB side never moves again after the
one-time bucketed write. (This is the DataFrame-native equivalent of the
reference's single-address-space locality: /root/reference/src/lmw's trees
never shuffle because everything lives in one heap; on a cluster, bucketing
is how you buy that locality durably.)

Bucketing metadata lives in the session catalog (``saveAsTable``); with a
Hive metastore or Iceberg catalog the same calls persist across sessions —
the sandbox has neither, so tests exercise the in-session path, which is
also exactly what a single spark-submit pipeline run uses.

Usage shape::

    write_bucketed(sigs, "sigs_b", "image_id", 64, sort_cols=["image_id"])
    write_bucketed(edges, "edges_b", "image_id", 64)
    joined = bucketed(spark, "sigs_b").join(bucketed(spark, "edges_b"), "image_id")
    # plan: SortMergeJoin, no Exchange on either side

Pick ``n_buckets`` so one bucket of the big table fits an executor core's
working set (~128-512 MB): at 100 TB of signatures that is O(10^5) buckets;
bucket counts must MATCH between co-joined tables (Spark only aligns equal
counts; with AQE ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` also
joins 4x-ratio counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """One-time bucketed write of ``df`` as managed table ``table``.

    ``sort_cols`` additionally sorts within each bucket file, which lets the
    SortMergeJoin skip its per-task sort when joining on a sort prefix."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (``table`` must
    have been written via ``write_bucketed`` in a catalog this session sees)."""
    return spark.table(table)


def is_colocated_join_plan(plan: str) -> bool:
    """True iff a physical-plan string is a shuffle-free sort-merge join:
    contains a SortMergeJoin and NO Exchange node. Used by tests and by
    callers that want to assert co-location actually engaged (a silently
    mis-bucketed table degrades to a full shuffle without erroring)."""
    return "SortMergeJoin" in plan and "Exchange" not in plan
