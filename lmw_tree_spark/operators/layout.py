"""Z-order (Morton) file layout planning — multi-dimensional data skipping.

At 100 TB the dominant query cost is how many files a predicate has to open:
per-file min/max statistics (parquet footers / Iceberg manifests) prune a scan
only if rows with similar key values sit in the same files. A sort on one
column clusters that column perfectly and every other column not at all;
interleaving the bits of two (or more) bucketized columns — the Z-order curve
(Morton 1966; the same layout Delta/Iceberg `OPTIMIZE ZORDER BY` writes) —
gives every interleaved column locality ~sqrt of a dedicated sort, so ranged
predicates on EITHER column skip most files.

This module does the engine-side planning: compute the Morton code, assign
rows to equal-z-range output files, and emit the per-file manifest
(row count, per-column min/max) that a scan planner would prune against.
All-integer algebra (bit shifts and masks), so the layout is deterministic
across partitioning/retries/cluster size and replayable in any SQL engine.

Scale shape: the code is a pure map; the manifest is one groupBy(file_id)
with #files result rows; the physical write would be
``df.repartitionByRange(n_files, "zcode").write`` — a single range shuffle,
exactly what a sort-based OPTIMIZE costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def morton2_col(bx: Column, by: Column, bits: int = 4) -> Column:
    """Interleave two ``bits``-wide bucket ids into a 2*bits-bit Morton code
    (x bits land in odd positions, y bits in even). Pure integer algebra —
    shift/mask/add — identical in Spark and DuckDB."""
    z: Column = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftright(bx, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
            + F.shiftright(by, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
    return z


def zorder_manifest(
    df: DataFrame,
    xbucket_col: str,
    ybucket_col: str,
    xstat_col: str,
    ystat_col: str,
    n_files: int = 16,
    bits: int = 4,
) -> DataFrame:
    """Plan a Z-ordered layout of ``df`` into ``n_files`` files and emit the
    per-file pruning manifest.

    ``xbucket_col``/``ybucket_col`` are the ``bits``-wide integer bucket ids
    the curve interleaves (caller quantizes — bucket width is the layout's
    clustering resolution); ``xstat_col``/``ystat_col`` are the raw columns
    whose min/max the manifest records (what a scan predicate prunes on).
    Files are equal z-ranges: ``file_id = (z * n_files) >> (2*bits)``, so
    file boundaries are data-independent and an incremental writer appends to
    the same file grid. Output: one row per non-empty file with
    (file_id, n_rows, min_x, max_x, min_y, max_y)."""
    z = morton2_col(F.col(xbucket_col), F.col(ybucket_col), bits)
    file_id = F.shiftright(z * n_files, 2 * bits).cast("int")
    return (
        df.withColumn("_file", file_id)
        .groupBy(F.col("_file").alias("file_id"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(xstat_col).alias("min_x"),
            F.max(xstat_col).alias("max_x"),
            F.min(ystat_col).alias("min_y"),
            F.max(ystat_col).alias("max_y"),
        )
    )


def prune_estimate(
    manifest: DataFrame, lo, hi, on: str = "x"
) -> DataFrame:
    """Annotate a ``zorder_manifest`` result with whether a range predicate
    ``lo <= col <= hi`` on the x (or y) stat column has to scan each file —
    the min/max overlap test a manifest-pruning planner runs. Adds
    ``scan_{on}`` (1 = file overlaps the range, must be read)."""
    mn, mx = (f"min_{on}", f"max_{on}")
    flag = (F.col(mx) >= F.lit(lo)) & (F.col(mn) <= F.lit(hi))
    return manifest.withColumn(f"scan_{on}", flag.cast("int"))


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    small_bytes: int | None = None,
    part_col: str = "part_key",
    file_col: str = "file_id",
    bytes_col: str = "bytes",
    order_col: str | None = None,
) -> DataFrame:
    """Small-file compaction planning — the Iceberg/Delta ``OPTIMIZE``
    (binPack) maintenance pass that keeps a 100 TB table's file count sane:
    streaming writers and per-partition appends leave thousands of sub-target
    files whose per-file open cost dominates scans. Files smaller than
    ``small_bytes`` (default ``target_bytes // 2``) are compaction candidates;
    within each table partition they are packed, in ``order_col`` order (key
    order, so compacted files keep their clustering), into groups of
    ``target_bytes`` by bucketing the EXCLUSIVE running byte sum —
    ``group_id = floor(run / target)`` — the one-window-pass distributed
    rendering of sequential first-fit (a straddling file joins the group its
    start falls in, so groups hover around target size rather than never
    exceeding it; bit-for-bit deterministic and engine-replayable, unlike
    greedy reset-on-overflow which needs a sequential scan). Files at or
    above ``small_bytes`` pass through unplanned (``compact = 0``,
    ``group_id`` null).

    Output: one row per manifest file — (part_col, file_col, bytes_col,
    compact int, group_id long); group ids are per-partition. Scale shape:
    the manifest is the table's METADATA (≤ millions of rows at 100 TB), one
    window per partition key bounded by files-per-partition; the data itself
    is never touched until the rewrite executes the plan."""
    order_col = order_col or file_col
    small = small_bytes if small_bytes is not None else target_bytes // 2
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    contrib = F.when(F.col(bytes_col) < small, F.col(bytes_col)).otherwise(F.lit(0))
    run = F.sum(contrib).over(w) - contrib
    cand = F.col(bytes_col) < small
    grp = F.when(cand, F.floor(run / F.lit(float(target_bytes))).cast("long"))
    return manifest.select(
        part_col,
        file_col,
        bytes_col,
        cand.cast("int").alias("compact"),
        grp.alias("group_id"),
    )
