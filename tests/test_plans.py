"""Physical-plan assertions — the 100 TB design contract, checked per commit.

These tests pin the *physical* properties that make each operator survive a
1000-executor / 100 TB scale-up, independent of the small test data:

- filters and column selection reach the parquet scan (PushedFilters / ReadSchema)
- small-side joins broadcast (BroadcastHashJoin, never SortMergeJoin on a dim)
- the EM-tree assignment pass is a pure map: NO Exchange anywhere in its plan
- the partial-accumulator pass shuffles only blob rows (one per partition), never
  signature rows
- the LSH band self-join is a shuffle hash/sort-merge equi-join on the band key
  (the one data-sized shuffle the design allows), not a nested-loop join
"""

import contextlib
import io
import os
import re

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_filter_and_pruning_pushed_to_parquet_scan(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    q = orders.where(F.col("o_orderkey") % 10 == 0).select("o_orderkey", "o_totalprice")
    plan = plan_of(q)
    scan = plan[plan.index("Scan parquet") :]
    # column pruning: the scan reads exactly the two projected columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", scan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"o_orderkey", "o_totalprice"}, scan
    # predicate pushdown: IsNotNull reaches the scan (the %10 residual stays above)
    assert "PushedFilters: [IsNotNull(o_orderkey)]" in scan, scan


def test_subset_semi_join_is_broadcast(spark):
    import __spark_entry__ as entry

    plan = plan_of(entry.q_subset_semi_join(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_top_customers_dim_join_is_broadcast(spark):
    import __spark_entry__ as entry

    plan = plan_of(entry.q_top_customers(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    # top-k compiles to TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan, plan


def test_emtree_assign_has_no_shuffle(spark):
    """The labeling pass (reference `visit`, StreamingEMTree.h:48-80) must stay a
    pure map at any scale: broadcast tree + mapInPandas, zero Exchange nodes."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators.emtree import assign, em_tree_fit
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.sources.images import generate_images

    sigs = extract_signatures(generate_images(spark, 64), SMALL)
    fit = em_tree_fit(sigs, SMALL)
    plan = simple_plan(assign(sigs, fit.tree))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_accumulator_pass_shuffles_blobs_not_rows(spark):
    """The EM insert pass reduces each partition to ONE binary blob before
    anything crosses the wire (emtree._accumulate_pass): the plan is
    scan → MapInPandas → (driver Arrow collect). No Exchange, no per-row
    shuffle — same plan shape as the real `partial` closure (which is not
    importable; a stub with the identical mapInPandas signature stands in)."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators import emtree
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.sources.images import generate_images

    def stub(batches):
        import pandas as pd

        for _pdf in batches:
            yield pd.DataFrame({"payload": [b""]})

    sigs = extract_signatures(generate_images(spark, 64), SMALL)
    blob_df = sigs.select("sig").mapInPandas(stub, emtree.ACC_SCHEMA)
    plan = simple_plan(blob_df)
    assert "Exchange" not in plan, plan


def test_band_join_is_equi_join_not_nested_loop(spark):
    """LSH candidate pairing must compile to an equi-join on the band key —
    never BroadcastNestedLoopJoin / CartesianProduct (which would be O(n²)
    at scale)."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators import lsh
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.sources.images import generate_images

    sigs = extract_signatures(generate_images(spark, 64), SMALL)
    edges = lsh.candidate_edges(sigs, SMALL)
    plan = simple_plan(edges)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_events_filter_pushdown_on_driver_tables(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    q = events.where(F.col("event_type") == "click").select("user_id")
    scan = plan_of(q)
    assert "PushedFilters" in scan and "EqualTo(event_type,click)" in scan, scan


def test_aqe_and_arrow_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_verify_edges_uses_jvm_bit_count(spark):
    """Edge verification must stay JVM-side (bit_count SQL expr inside
    whole-stage codegen), not fall back to a Python UDF."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators import lsh
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.sources.images import generate_images

    sigs = extract_signatures(generate_images(spark, 64), SMALL)
    verified = lsh.verify_edges(lsh.candidate_edges(sigs, SMALL), sigs, SMALL)
    plan = simple_plan(verified)
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python
    assert "bit_count" in plan, plan  # Hamming verify is a codegen'd JVM expr


def test_substring_grams_is_jvm_equi_join(spark):
    """The gram-join substring detection path must be whole-stage-codegen JVM:
    no Python evaluation anywhere, no nested-loop joins — at 100 TB it is one
    distinct + bounded equi-joins."""
    from lmw_tree_spark.operators.suffix import substring_pairs_grams

    df = spark.createDataFrame(
        [(i, ("word%d " % (i % 5)) + "shared boilerplate phrase here") for i in range(30)],
        "doc_id long, text string",
    )
    plan = simple_plan(substring_pairs_grams(df, min_len=20))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_dense_assign_is_pure_map(spark):
    """Dense k-means labeling (the float twin of the EM-tree visit pass) must
    stay a broadcast-argmin pure map: zero Exchange nodes."""
    import numpy as np

    from lmw_tree_spark.operators.dense import assign_dense

    df = spark.createDataFrame(
        [(i, [float(i), float(i + 1)]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    plan = simple_plan(assign_dense(df, np.zeros((4, 2))))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan


def test_candidate_buckets_cached_before_fanout(spark):
    """edges_from_buckets fans out over its input four ways (chains, reps,
    counts, clique join); the bucket table must come from cache so the four
    branches don't re-run the four bucket-generator mapInPandas stages
    (measured 4-8x the warm stage cost at bench scale)."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators import lsh
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from lmw_tree_spark.sources.images import generate_images

    sigs = extract_signatures(generate_images(spark, 48), SMALL)
    plan = simple_plan(lsh.candidate_edges(sigs, SMALL))
    assert "InMemoryTableScan" in plan, plan


def test_multimodal_feature_stages_are_pure_maps(spark):
    """Frame sampling, audio features, and pixel stats are single mapInPandas
    stages: zero Exchange nodes — the property that makes the multimodal layer
    embarrassingly parallel at any scale."""
    import numpy as np

    from lmw_tree_spark.operators.pixels import image_stats
    from lmw_tree_spark.sources.images import generate_images
    from lmw_tree_spark.sources.multimodal import (
        audio_features,
        encode_audio,
        encode_video,
        sample_frames,
    )

    videos = spark.createDataFrame(
        [("v0", encode_video(np.zeros((2, 8, 8, 3), dtype=np.uint8)), "fvid")],
        "video_id string, bytes binary, fmt string",
    )
    audio = spark.createDataFrame(
        [("a0", encode_audio(np.zeros(1600, dtype=np.int16)), "faud")],
        "audio_id string, bytes binary, fmt string",
    )
    for df in (
        sample_frames(videos),
        audio_features(audio),
        image_stats(generate_images(spark, 8)),
    ):
        plan = simple_plan(df)
        assert "Exchange" not in plan, plan


def test_new_text_ops_are_pure_maps(spark):
    """scrub_pii and bpe_token_counts compile to zero-Exchange map plans, and
    transcode_fidelity / dhash_images are single mapInPandas stages."""
    from lmw_tree_spark.functions.text import bpe_token_counts, scrub_pii
    from lmw_tree_spark.operators.pixels import dhash_images, transcode_fidelity
    from lmw_tree_spark.sources.images import generate_images

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (scrub_pii(docs), bpe_token_counts(docs)):
        plan = simple_plan(df)
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan, plan
    images = generate_images(spark, 8)
    for df in (transcode_fidelity(images), dhash_images(images)):
        plan = simple_plan(df)
        assert "Exchange" not in plan, plan


def test_editdist_and_line_dedup_have_no_nested_loop_joins(spark):
    """The candidate/verify and line-frequency joins must all be equi-joins —
    never CartesianProduct / BroadcastNestedLoopJoin at any scale."""
    from lmw_tree_spark.operators.dedup import editdist_pairs
    from lmw_tree_spark.operators.quality import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (
        editdist_pairs(docs, min_sim=0.4, ngram=5, max_gram_df=200),
        line_dedup(docs.selectExpr("doc_id", "replace(text, '. ', chr(10)) AS text")),
    ):
        plan = simple_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tar_writer_is_single_shuffle(spark):
    """The shard writer's whole plan is one hash Exchange on the 16-way shard
    key followed by the grouped write — no joins, no second shuffle."""
    from lmw_tree_spark.sources.archives import write_tar_shards
    from lmw_tree_spark.sources.images import generate_images

    df = write_tar_shards(generate_images(spark, 8), "/tmp/plan_probe_shards")
    plan = simple_plan(df)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_sketch_ops_are_bounded_aggs_with_broadcast_probes(spark):
    """CMS build's groupBy key space IS the sketch (d x w) and the estimate /
    bloom probe joins broadcast the sketch side — no sort-merge join, no
    nested loop, no Python in any plan. The corpus side of a bloom build
    never shuffles more than the position strings."""
    import __spark_entry__ as entry

    for q in (entry.q_cms_heavy_hitters, entry.q_bloom_membership,
              entry.q_bm25_topk):
        plan = plan_of(q(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
    # the sketch/bloom join side is broadcast, not sort-merge
    for q in (entry.q_cms_heavy_hitters, entry.q_bloom_membership):
        plan = plan_of(q(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, plan


def test_packing_window_is_shard_partitioned(spark):
    """The packing window must hash-partition by shard (parallel, bounded
    tasks) — never a single unpartitioned global sort — and stay JVM-only."""
    import __spark_entry__ as entry

    plan = plan_of(entry.q_pack_sequences(spark, SF_DIR))
    assert "BatchEvalPython" not in plan, plan
    assert re.search(r"hashpartitioning\(shard", plan), plan
    assert "SinglePartition" not in plan, plan


def test_alignment_is_two_maps_one_equi_join(spark):
    """crossmodal_alignment: the image side is one Arrow map stage, the caption
    side whole-stage-codegen aggregation, and the modalities meet in exactly
    one equi-join — never a nested-loop/cartesian join."""
    import __spark_entry__ as entry

    df = entry.queries()["align_filter"](spark, SF_DIR)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # formatted explain lists each node in the tree AND a details section —
    # count unique "(n) Op" node headers
    assert len(set(re.findall(r"\((\d+)\) MapInPandas", plan))) == 1  # the SRP GEMM
    # exactly one join between the modalities
    assert (
        len(set(re.findall(r"\((\d+)\) (?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)))
        == 1
    )


def test_domain_gate_blocklist_and_gate_joins_broadcast(spark):
    """domain_cap: the blocklist anti-side and the kept-domain gate are both
    domain-cardinality tables and must broadcast — the corpus never shuffles
    for them; the only corpus-sized operation is the per-domain rank window."""
    import __spark_entry__ as entry

    df = entry.queries()["domain_cap"](spark, SF_DIR)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ar_bucket_is_zero_shuffle_projection(spark):
    """assign_ar_buckets is a single whole-stage-codegen projection — the
    bucket table folds in as a column-literal array_min, so the stage has no
    Exchange, no join, and no Python at any row count."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import assign_ar_buckets

    df = spark.range(0, 100, 1, 4).select(
        F.col("id").alias("image_id"),
        (F.col("id") % 500 + 16).alias("w"),
        (F.col("id") % 700 + 16).alias("h"),
    )
    plan = assign_ar_buckets(df, id_col="image_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_bucketed_tables_join_without_shuffle(spark):
    """write_bucketed + equal bucket counts on the join key → SortMergeJoin
    with ZERO Exchange on either side (the durable co-location that makes
    repeated by-id joins free at 100 TB); a non-bucketed copy of the same
    join DOES shuffle, proving the assertion has teeth."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.plans.bucketing import (
        bucketed,
        is_colocated_join_plan,
        write_bucketed,
    )

    a = spark.range(0, 5000, 1, 4).select(
        F.col("id").alias("image_id"), (F.col("id") * 3).alias("sig_word")
    )
    b = spark.range(0, 5000, 1, 4).select(
        F.col("id").alias("image_id"), (F.col("id") % 7).alias("component")
    )
    write_bucketed(a, "t_sigs_b", "image_id", 8, sort_cols=["image_id"])
    write_bucketed(b, "t_edges_b", "image_id", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed(spark, "t_sigs_b").join(bucketed(spark, "t_edges_b"), "image_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert is_colocated_join_plan(plan), plan
        assert j.count() == 5000
        # control: same join over non-bucketed frames must contain an Exchange
        jn = a.join(b, "image_id")
        plan_n = jn._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_n, plan_n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_sigs_b")
        spark.sql("DROP TABLE IF EXISTS t_edges_b")


def test_triangle_and_ktruss_are_equi_joins_only(spark):
    """Triangle enumeration: the wedge join and the closing-edge join are hash
    equi-joins (AQE-splittable) — never CartesianProduct/nested-loop, and no
    window anywhere (the O(m^1.5) oriented-wedge bound is only real if the
    plan is pure equi-join + partial agg)."""
    from lmw_tree_spark.operators.graph import triangle_supports

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(i, i + 2) for i in range(48)],
        "src long, dst long",
    )
    plan = plan_of(triangle_supports(edges))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan


def test_interleave_argmin_is_partial_agg_not_window(spark):
    """interleave_assembly: the per-image argmin must be a hash aggregation
    with a partial (map-side) phase — a window over candidates would break the
    skew bound; the only window allowed is the per-doc capacity ranking."""
    import __spark_entry__ as entry

    df = entry.queries()["interleave_docs"](spark, SF_DIR)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan
    assert "HashAggregate" in plan, plan


def test_incremental_phash_equi_join_only(spark):
    """The shard-vs-corpus perceptual dedup must plan as equi-joins on the
    bucket key (plus the two hash-verify equi-joins) — never a nested loop:
    the corpus side is 10^12 rows."""
    from lmw_tree_spark.operators.dedup import simhash_dedup_against_corpus

    new = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7919).alias("simhash")
    )
    corpus = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 104729).alias("simhash")
    )
    plan = plan_of(
        simhash_dedup_against_corpus(new, corpus, max_dist=6, max_bucket_df=64)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_centroid_outlier_assign_is_pure_projection(spark):
    """The outlier gate's per-row work (quantize + k distances + argmin) is a
    single zero-shuffle projection; the only Exchange in the whole gate is
    the ≤k-cell stats groupBy and its broadcast back."""
    import numpy as np

    from lmw_tree_spark.operators.similarity import centroid_outlier_filter

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1) % 97).cast("double") for i in range(8)])
        .alias("embedding"),
    )
    cents = np.arange(24, dtype=np.float64).reshape(3, 8)
    out = centroid_outlier_filter(emb, cents, mult=2)
    plan = plan_of(out)
    # stats side broadcasts back onto the full table: no sort-merge join
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # exactly one aggregation-shuffle pair (partial+final over cells) plus the
    # broadcast: no data-sized exchange of the embedding rows
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 1, plan


def test_graph_diagnostics_plans_are_bounded(spark):
    """pagerank / modularity / group_diameter / bucket_skew: no cartesian
    products, no row-at-a-time Python; modularity's only BNLJ is the 1-row
    broadcast of m (total edges)."""
    from lmw_tree_spark.operators.ccomp import connected_components
    from lmw_tree_spark.operators.dedup import group_diameter
    from lmw_tree_spark.operators.graph import modularity_by_community, pagerank
    from lmw_tree_spark.operators.lsh import bucket_skew_stats

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "src long, dst long"
    )
    sigs = spark.createDataFrame(
        [(i, i * 37) for i in range(41)], "image_id long, phash long"
    )
    labels = connected_components(edges, id_col="image_id", label_col="dup_group")
    buckets = spark.createDataFrame(
        [("minhash", i % 5, str(i)) for i in range(40)],
        "modality string, bucket long, image_id string",
    )
    plans = {
        "pagerank": plan_of(pagerank(edges, iters=2)),
        "modularity": plan_of(modularity_by_community(edges, labels)),
        "diameter": plan_of(group_diameter(labels, sigs, id_col="image_id")),
        "skew": plan_of(bucket_skew_stats(buckets)),
    }
    for name, p in plans.items():
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name
    for name in ("pagerank", "diameter", "skew"):
        assert "BroadcastNestedLoopJoin" not in plans[name], name


def test_ball_cover_join_has_no_cartesian_product(spark):
    """embedding_neardup's bounded ball-cover join: the pairing is a broadcast
    equi-join on the admitted (cell_a, cell_b) list plus chunk-pair GEMM —
    never CartesianProduct / BroadcastNestedLoopJoin, at any n_cells."""
    import numpy as np

    from lmw_tree_spark.operators.similarity import cosine_neardup_pairs_bounded

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p = plan_of(cosine_neardup_pairs_bounded(df, min_cosine=0.9, n_cells=4))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BatchEvalPython" not in p
