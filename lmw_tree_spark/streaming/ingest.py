"""Structured Streaming ingest of the image+caption table shape.

The reference's "streaming" is bounded multi-pass iteration over a file, not
event-time streaming (/root/reference/src/lmw/StreamingEMTree.h:452-455 — chunked
pull, order-irrelevant), so the clustering itself stays iterative batch. What a
production deployment streams is the INGEST: new images land continuously and are
appended to the input table, which the batch pipeline then re-clusters (the
reference's mini-batch mode, StreamingEMTreeExperiments.h:143-189, maps to running
the EM update per ingested batch).

``stream_images`` wires a rate-source → deterministic generator → parquet/Iceberg
append via ``foreachBatch``; ``stream_signature_counts`` shows an event-time
windowed aggregation (watermark + tumbling window) over the ingest stream for
monitoring — signature popcount distribution per window, the same lineage metric the
batch checkpointer records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lmw_tree_spark.sources.images import IMAGES_SCHEMA, generate_batch


def stream_images(
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    rows_per_second: int = 100,
):
    """rate source → synthetic image rows → append to a parquet table.

    Returns the StreamingQuery; caller stops it. Row indices come from the rate
    source's monotonically increasing ``value``, so ingest is deterministic and
    restart-safe (checkpointed offsets resume exactly)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        ids = [r["value"] for r in batch_df.select("value").collect()]
        if not ids:
            return
        import numpy as np

        pdf = generate_batch(np.array(ids, dtype=np.int64))
        spark.createDataFrame(pdf, IMAGES_SCHEMA).write.mode("append").parquet(out_dir)

    return (
        rate.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="2 seconds")
        .start()
    )


def stream_event_counts(
    spark: SparkSession,
    events_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark — the monitoring
    aggregation for a continuously ingesting table. Input needs ``ts`` (timestamp)
    and ``event_type`` columns; works on any stream including the rate source."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
