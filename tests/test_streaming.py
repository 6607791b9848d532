"""Structured Streaming ingest + event-time windowed monitoring aggregation.

The reference's own "streaming" is bounded multi-pass batch
(/root/reference/src/lmw/StreamingEMTree.h:452-455 — order-irrelevant chunk pull),
so the engine streams only INGEST; these tests cover the watermarked windowed
aggregation (file source → availableNow → memory sink, deterministic) and the
rate-source ingest wiring.
"""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lmw_tree_spark.streaming.ingest import stream_event_counts, stream_images


def test_windowed_event_counts_match_batch(spark, tmpdir_ck):
    src = os.path.join(tmpdir_ck, "events_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:10", "2026-01-01 00:00:50", "2026-01-01 00:01:10",
                 "2026-01-01 00:02:05", "2026-01-01 00:02:30", "2026-01-01 00:05:59"]
            ),
            "event_type": ["a", "b", "a", "a", "a", "b"],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    )
    out = stream_event_counts(spark, stream, window="1 minute", watermark="2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    got = (
        spark.table("win_counts")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    expect = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
        )
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), expect.reset_index(drop=True))


def test_stream_em_updates_converge_and_resume(spark, tmpdir_ck, planted_signatures):
    """foreachBatch EM: each micro-batch updates the centroid tree (reference
    mini-batch mode as a stream); trees are durably committed per batch and
    `latest_tree` resumes from the last commit."""
    import numpy as np

    from lmw_tree_spark.functions.bitops import unpack_bits
    from lmw_tree_spark.operators.tree import tsvq_init
    from lmw_tree_spark.streaming.ingest import latest_tree, stream_em_updates

    sigs_u64, _ = planted_signatures
    src = os.path.join(tmpdir_ck, "sig_src")
    tree_dir = os.path.join(tmpdir_ck, "trees")
    ck = os.path.join(tmpdir_ck, "em_ck")
    rows = [
        (f"img{i:05d}", sigs_u64[i].view(np.int64).tolist())
        for i in range(len(sigs_u64))
    ]
    # two source files → at least one micro-batch each under availableNow
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], "image_id string, sig array<long>").write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(rows[half:], "image_id string, sig array<long>").write.mode(
        "append"
    ).parquet(src)

    seed = tsvq_init(sigs_u64[:100], 4, 2, 0, 7)
    stream = spark.readStream.schema("image_id string, sig array<long>").parquet(src)
    q = stream_em_updates(
        spark, stream, seed, tree_dir, ck, trigger={"availableNow": True}
    )
    q.awaitTermination(120)

    final = latest_tree(spark, tree_dir)
    assert final is not None and final.n_leaves >= 2
    # the streamed updates must not degenerate: centroids differ from the seed
    assert not np.array_equal(final.levels[-1].centroid, seed.levels[-1].centroid)

    # resume: a new query instance starts from the committed tree, not the seed
    resumed = latest_tree(spark, tree_dir)
    assert np.array_equal(resumed.levels[-1].centroid, final.levels[-1].centroid)

    # replaying the same availableNow source is a no-op (offsets are committed)
    q2 = stream_em_updates(
        spark, stream, seed, tree_dir, ck, trigger={"availableNow": True}
    )
    q2.awaitTermination(60)
    after = latest_tree(spark, tree_dir)
    assert np.array_equal(after.levels[-1].centroid, final.levels[-1].centroid)

    # configured order is persisted with the commit, not inferred from fan-out
    assert after.order == seed.order

    # at-least-once replay: a FRESH checkpoint forces the source batches to be
    # re-delivered with already-committed batch ids. The idempotent commit must
    # neither duplicate tree rows in the batch directories nor re-apply the EM
    # update on top of a tree that already includes it.
    row_counts_before = {
        d: spark.read.parquet(os.path.join(tree_dir, d)).count()
        for d in os.listdir(tree_dir)
        if d.startswith("batch=")
    }
    q3 = stream_em_updates(
        spark, stream, seed, tree_dir, os.path.join(tmpdir_ck, "em_ck2"),
        trigger={"availableNow": True},
    )
    q3.awaitTermination(60)
    replayed = latest_tree(spark, tree_dir)
    assert np.array_equal(replayed.levels[-1].centroid, final.levels[-1].centroid)
    row_counts_after = {
        d: spark.read.parquet(os.path.join(tree_dir, d)).count()
        for d in os.listdir(tree_dir)
        if d.startswith("batch=")
    }
    assert row_counts_after == row_counts_before


@pytest.mark.slow
def test_rate_source_ingest_appends_input_schema(spark, tmpdir_ck):
    out_dir = os.path.join(tmpdir_ck, "ingest_out")
    ck_dir = os.path.join(tmpdir_ck, "ingest_ck")
    q = stream_images(spark, out_dir, ck_dir, rows_per_second=200)
    try:
        deadline = time.time() + 45
        rows = 0
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out_dir).count()
            except Exception:
                rows = 0
            if rows > 0:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert rows > 0
    df = spark.read.parquet(out_dir)
    assert set(df.columns) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    # ingest is deterministic per id: re-generating the same ids matches
    from lmw_tree_spark.sources.images import generate_batch
    import numpy as np

    sample = df.orderBy("image_id").limit(3).toPandas()
    ids = sample["image_id"].str[3:].astype(int).to_numpy()
    regen = generate_batch(np.array(ids, dtype=np.int64))
    assert list(regen["caption"]) == list(sample["caption"])
    assert [bytes(b) for b in regen["bytes"]] == [bytes(b) for b in sample["bytes"]]


def test_stream_dedup_groups_stateful(spark, tmpdir_ck):
    """applyInPandasWithState dedup: per-fingerprint state (canonical min id +
    running count) accumulates across micro-batches."""
    from lmw_tree_spark.streaming.ingest import stream_dedup_groups

    src = os.path.join(tmpdir_ck, "dedup_src")
    b1 = pd.DataFrame({"image_id": ["img_b", "img_a", "img_c"], "phash": [1, 1, 2]})
    b2 = pd.DataFrame({"image_id": ["img_d", "img_e"], "phash": [1, 3]})
    spark.createDataFrame(b1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("image_id string, phash long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_dedup_groups(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmpdir_ck, "dedup_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.table("dedup_state").toPandas()
    # latest update per fingerprint = max n_seen
    final = rows.sort_values("n_seen").groupby("fingerprint").last()
    assert final.loc[1, "canonical_id"] == "img_a"
    assert final.loc[1, "n_seen"] == 3  # img_a, img_b + late img_d
    assert final.loc[2, "canonical_id"] == "img_c" and final.loc[2, "n_seen"] == 1
    assert final.loc[3, "canonical_id"] == "img_e" and final.loc[3, "n_seen"] == 1


def test_stream_first_seen_drops_duplicates(spark, tmpdir_ck):
    from lmw_tree_spark.streaming.ingest import stream_first_seen

    src = os.path.join(tmpdir_ck, "fs_src")
    pdf = pd.DataFrame(
        {
            "image_id": ["a", "b", "c", "d"],
            "phash": [7, 7, 8, 7],
            "ts": pd.to_datetime(
                ["2026-01-01 00:00:01", "2026-01-01 00:00:02",
                 "2026-01-01 00:00:03", "2026-01-01 00:00:04"]
            ),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("image_id string, phash long, ts timestamp").parquet(src)
    out = stream_first_seen(stream, "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = spark.table("first_seen").toPandas()
    assert sorted(got["phash"].tolist()) == [7, 8]  # one row per fingerprint


def test_stream_neardup_edges_equal_batch_band_algebra(spark, tmpdir_ck):
    """The distinct streamed Hamming edge set equals the batch simhash_dedup
    band algebra over the same input — batch boundaries don't change it."""
    from lmw_tree_spark.operators.dedup import simhash_dedup
    from lmw_tree_spark.sources.images import IMAGES_SCHEMA, generate_images
    from lmw_tree_spark.streaming.ingest import stream_neardup_edges

    src = os.path.join(tmpdir_ck, "snd_src")
    ck = os.path.join(tmpdir_ck, "snd_ck")
    images = generate_images(spark, 200)
    images.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(F.substring("image_id", 4, 10).cast("long").alias("doc_id"), "phash")
    )
    q = (
        stream_neardup_edges(stream, hash_col="phash", id_col="doc_id")
        .writeStream.format("memory")
        .queryName("snd_test")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["src"], r["dst"], r["dist"])
        for r in spark.table("snd_test").distinct().collect()
    }

    ph = spark.read.parquet(src).select(
        F.substring("image_id", 4, 10).cast("long").alias("doc_id"),
        F.col("phash").alias("simhash"),
    )
    batch = {
        (r["src"], r["dst"], r["dist"])
        for r in simhash_dedup(ph, max_dist=6, pair_cap=100_000, sh=ph).collect()
    }
    assert streamed == batch and len(batch) > 0
