"""Similarity / embedding-dedup operators: the bounded ball-cover near-dup join
must equal brute force exactly (triangle-inequality pruning is lossless), and its
plan must stay equi-join-only; token-Jaccard's document-frequency guard must match
a NumPy reference over the df-capped token universe."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, n=120, d=16, seed=9, dup_every=10):
    """Random embeddings with planted near-dups (row i+1 ≈ row i for i%dup_every==0)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d))
    for i in range(0, n - 1, dup_every):
        x[i + 1] = x[i] + 0.01 * rng.standard_normal(d)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_bounded_neardup_equals_brute_force(spark):
    from lmw_tree_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_bounded,
    )

    emb = _emb_df(spark)
    for t in (0.3, 0.6, 0.95):
        brute = (
            cosine_neardup_pairs(emb, min_cosine=t)
            .orderBy("src", "dst")
            .toPandas()
        )
        bounded = (
            cosine_neardup_pairs_bounded(emb, min_cosine=t, n_cells=6)
            .orderBy("src", "dst")
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            brute.reset_index(drop=True), bounded.reset_index(drop=True)
        )
        assert len(brute) > 0  # the comparison is non-vacuous


def test_bounded_neardup_plan_has_no_cross_join(spark):
    from lmw_tree_spark.operators.similarity import cosine_neardup_pairs_bounded

    from tests.test_plans import simple_plan

    emb = _emb_df(spark, n=60)
    plan = simple_plan(cosine_neardup_pairs_bounded(emb, min_cosine=0.9, n_cells=4))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kmeans_dense_matches_numpy_lloyd_and_partitioning(spark):
    """Distributed dense k-means must equal a single-machine NumPy Lloyd loop
    with the identical algebra (lowest-id seeds, first-min ties, empty keeps
    centroid), at any input partitioning."""
    from lmw_tree_spark.operators.dense import assign_dense, kmeans_dense

    rng = np.random.default_rng(17)
    n, d, k, iters = 200, 8, 6, 3
    x = rng.standard_normal((n, d))
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]

    cents = x[:k].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            m = x[a == c]
            if len(m):
                new[c] = m.mean(axis=0)
        cents = new
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    expect_assign = d2.argmin(axis=1)

    for parts in (1, 7):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
            parts
        )
        got_cents = kmeans_dense(df, k=k, iters=iters, init="lowest_ids")
        assert np.allclose(got_cents, cents, atol=1e-9)
        got = (
            assign_dense(df, got_cents)
            .orderBy("vec_id")
            .toPandas()["cluster"]
            .to_numpy()
        )
        assert (got == expect_assign).all()


def test_ivf_distributed_trainer_probe_all_equals_brute_force(spark):
    """IVF with the distributed trainer at a large cell count: probing every
    cell makes the candidate set total, so results must equal exact brute-force
    top-k; probing few cells is the approximate trade and must keep high
    recall on this data."""
    from lmw_tree_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    emb = _emb_df(spark, n=250)
    pred = F.col("vec_id") % 25 == 0
    exact = cosine_topk(emb, k=3, query_pred=pred).orderBy("query_id", "rank").toPandas()
    probe_all = (
        ivf_cosine_topk(
            emb, k=3, n_cells=64, n_probe=64, query_pred=pred,
            trainer="distributed", train_iters=3,
        )
        .orderBy("query_id", "rank")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), probe_all.reset_index(drop=True)
    )
    few = (
        ivf_cosine_topk(
            emb, k=3, n_cells=64, n_probe=8, query_pred=pred,
            trainer="distributed", train_iters=3,
        )
        .toPandas()
    )
    exact_set = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    few_set = set(map(tuple, few[["query_id", "neighbor_id"]].to_numpy()))
    assert len(exact_set & few_set) / len(exact_set) >= 0.5


def test_token_jaccard_df_guard_matches_numpy(spark):
    """max_token_df drops hot tokens from the token universe (both the join and
    the size counts); the result equals a NumPy reference of Jaccard over the
    df-capped universe."""
    from lmw_tree_spark.operators.dedup import token_jaccard_pairs

    texts = {
        0: "the alpha beta gamma",
        1: "the alpha beta delta",
        2: "the epsilon zeta eta",
        3: "the alpha beta gamma",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    cap = 3  # 'the' has df=4 > cap → excluded everywhere
    got = (
        token_jaccard_pairs(docs, min_jaccard=0.2, max_token_df=cap)
        .orderBy("src", "dst")
        .toPandas()
    )

    toksets = {k: set(v.split()) for k, v in texts.items()}
    df_count = {}
    for s in toksets.values():
        for t in s:
            df_count[t] = df_count.get(t, 0) + 1
    capped = {k: {t for t in s if df_count[t] <= cap} for k, s in toksets.items()}
    expect = []
    for a in sorted(texts):
        for b in sorted(texts):
            if a < b:
                inter = len(capped[a] & capped[b])
                union = len(capped[a] | capped[b])
                if union and inter / union >= 0.2:
                    expect.append((a, b, inter / union))
    assert [(r.src, r.dst, round(r.jaccard, 6)) for r in got.itertuples()] == [
        (a, b, round(j, 6)) for a, b, j in expect
    ]
    # 'the' alone no longer connects docs: (0,2) etc. must be absent
    assert (0, 2) not in {(r.src, r.dst) for r in got.itertuples()}


def test_bounded_neardup_chunked_cells_equal_brute_force(spark):
    """Row-size bound: with chunk_rows far below cell occupancy every cell
    splits into many (cell, chunk) slices, and the chunk-pair expansion must
    still score each unordered row pair exactly once — equal to brute force on
    a deliberately skewed dataset (all rows packed into one tight ball, so one
    cell holds nearly everything)."""
    from lmw_tree_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_bounded,
    )

    rng = np.random.default_rng(23)
    base = rng.standard_normal(12)
    x = base[None, :] + 0.05 * rng.standard_normal((90, 12))  # one hot ball
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = cosine_neardup_pairs(emb, min_cosine=0.995).orderBy("src", "dst").toPandas()
    chunked = (
        cosine_neardup_pairs_bounded(emb, min_cosine=0.995, n_cells=3, chunk_rows=8)
        .orderBy("src", "dst")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        brute.reset_index(drop=True), chunked.reset_index(drop=True)
    )
    assert len(brute) > 50  # non-vacuous: the hot ball produces many pairs


def test_bounded_neardup_zero_norm_rows_do_not_poison_cells(spark):
    """A zero vector must not NaN its cell's radius and silently drop OTHER
    qualifying pairs (ADVICE r2): with a zero-norm row present, all nonzero
    near-dup pairs must still come back."""
    from lmw_tree_spark.operators.similarity import (
        cosine_neardup_pairs_bounded,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((40, 8))
    x[13] = x[12] + 0.001 * rng.standard_normal(8)  # planted near-dup
    x[20] = 0.0  # poison row
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_neardup_pairs_bounded(emb, min_cosine=0.999, n_cells=2).toPandas()
    assert (12, 13) in set(map(tuple, got[["src", "dst"]].to_numpy()))
    assert not got["cosine_sim"].isna().any()


def test_kmeans_dense_two_level_combine_matches_direct(spark):
    """Forcing the two-level combine (combine_threshold below the partition
    count) must be bit-identical to the direct driver gather — the merge is
    pure reassociation of float sums in a fixed grouping."""
    from lmw_tree_spark.operators.dense import kmeans_dense

    rng = np.random.default_rng(31)
    x = rng.standard_normal((150, 6))
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(12)
    direct = kmeans_dense(df, k=5, iters=3, combine_threshold=1000)
    merged = kmeans_dense(df, k=5, iters=3, combine_threshold=8, combine_keys=4)
    assert np.allclose(direct, merged, atol=1e-12)


def test_hard_negative_exclusion_drops_same_group_candidates(spark):
    """exclude_groups removes same-component candidates BEFORE ranking: the
    planted near-dup (anchor's exact top-1) must vanish from the excluded
    result and the remaining ranking must equal brute-force-over-the-same-
    candidate-set with those pairs removed; ids absent from the groups frame
    are never excluded."""
    from lmw_tree_spark.operators.similarity import ivf_cosine_topk

    emb = _emb_df(spark, n=120, dup_every=10)
    # planted pairs (i, i+1) for i % 10 == 0 share a dup component
    groups = spark.createDataFrame(
        [(i, i - (i % 10)) for i in range(0, 120) if i % 10 <= 1],
        "vec_id long, grp long",
    )
    pred = F.col("vec_id") % 30 == 0  # anchors 0, 30, 60, 90 — all planted
    plain = ivf_cosine_topk(
        emb, k=3, n_cells=4, n_probe=4, query_pred=pred, seed=3
    ).toPandas()
    mined = ivf_cosine_topk(
        emb, k=3, n_cells=4, n_probe=4, query_pred=pred, seed=3,
        exclude_groups=groups,
    ).toPandas()
    # n_probe == n_cells → candidate set is total; the planted dup is top-1
    plain_top1 = plain[plain["rank"] == 1].set_index("query_id")["neighbor_id"]
    for q in (0, 30, 60, 90):
        assert plain_top1[q] == q + 1
    pairs = set(zip(mined["query_id"], mined["neighbor_id"]))
    for q in (0, 30, 60, 90):
        assert (q, q + 1) not in pairs
    # exclusion-then-rank == drop excluded pairs from plain full ranking
    full = ivf_cosine_topk(
        emb, k=10**6, n_cells=4, n_probe=4, query_pred=pred, seed=3
    ).toPandas()
    full = full[full["neighbor_id"] != full["query_id"] + 1]
    full = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    full["rank"] = full.groupby("query_id").cumcount() + 1
    expect = full[full["rank"] <= 3].reset_index(drop=True)
    got = mined.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["query_id", "neighbor_id", "cosine_sim"]],
        expect[["query_id", "neighbor_id", "cosine_sim"]].reset_index(drop=True),
    )


def test_ivf_ops_compose_with_non_default_id_col(spark):
    """ivf_cells / ivf_cosine_topk / ivfadc keyed by a caller-chosen id column
    must produce the same results as the default 'vec_id' (the output schema is
    built from id_col, not hardcoded)."""
    from lmw_tree_spark.operators.pq import ivfadc_topk, train_pq
    from lmw_tree_spark.operators.similarity import (
        ivf_cells,
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    emb = _emb_df(spark, n=80)
    emb2 = emb.withColumnRenamed("vec_id", "doc_id")
    cents = train_ivf_centroids(emb, n_cells=4, seed=7)

    a = ivf_cells(emb, cents).orderBy("vec_id").toPandas()
    b = ivf_cells(emb2, cents, id_col="doc_id").orderBy("doc_id").toPandas()
    assert list(b.columns) == ["doc_id", "cell"]
    assert (a["cell"].to_numpy() == b["cell"].to_numpy()).all()

    pred = F.col("vec_id") % 20 == 0
    pred2 = F.col("doc_id") % 20 == 0
    ta = ivf_cosine_topk(emb, k=3, n_cells=4, n_probe=2, query_pred=pred, seed=7).toPandas()
    tb = ivf_cosine_topk(
        emb2, k=3, n_cells=4, n_probe=2, query_pred=pred2, seed=7, id_col="doc_id"
    ).toPandas()
    pd.testing.assert_frame_equal(
        ta.sort_values(["query_id", "rank"]).reset_index(drop=True),
        tb.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )

    cb = train_pq(emb, m=4, ksub=8, seed=7)
    ia = ivfadc_topk(emb, cents, cb, k=3, n_probe=2, query_pred=pred).toPandas()
    ib = ivfadc_topk(
        emb2, cents, cb, k=3, n_probe=2, query_pred=pred2, id_col="doc_id"
    ).toPandas()
    pd.testing.assert_frame_equal(
        ia.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ib.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_centroid_outlier_filter_exact_gate(spark):
    """centroid_outlier_filter matches a NumPy fixed-point replay exactly
    (assignment, dist2, floor-mean gate) and drops planted far points."""
    import numpy as np

    from lmw_tree_spark.operators.similarity import centroid_outlier_filter

    rng = np.random.default_rng(3)
    cents = rng.standard_normal((3, 8))
    x = np.concatenate(
        [c + 0.1 * rng.standard_normal((20, 8)) for c in cents]
        + [(cents[0] + 5.0)[None, :]]  # one far outlier, id 60
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cell"], r["dist2"], r["keep"])
        for r in centroid_outlier_filter(df, cents, mult=2).collect()
    }

    f = np.floor(x * (1 << 20)).astype(np.int64)
    cf = np.floor(cents * (1 << 20)).astype(np.int64)
    d2 = ((f[:, None, :] - cf[None, :, :]) ** 2).sum(axis=2)
    cell = d2.argmin(axis=1)  # unique argmin here; ties impossible at random
    dist2 = d2[np.arange(len(x)), cell]
    for ci in range(3):
        m = cell == ci
        thr = 2 * (int(dist2[m].sum()) // int(m.sum()))
        for i in np.where(m)[0]:
            assert got[i] == (ci, int(dist2[i]), bool(dist2[i] <= thr))
    assert got[60][2] is False  # the planted far point is dropped
    assert sum(1 for v in got.values() if not v[2]) <= 3


def test_silhouette_dense_matches_numpy_reference(spark):
    """Per-point simplified silhouette must equal the NumPy formula (a = own
    centroid dist, b = nearest other, (b-a)/max(a,b)) at any partitioning;
    equidistant-tie and on-centroid degenerate points are pinned to 0."""
    from lmw_tree_spark.operators.dense import silhouette_dense

    rng = np.random.default_rng(5)
    n, d, k = 150, 6, 4
    x = rng.standard_normal((n, d))
    cents = rng.standard_normal((k, d))
    # planted degenerates: row 0 sits exactly on centroid 1; centroid 3 is a
    # duplicate of centroid 2, so its members are exact ties (sil = 0)
    x[0] = cents[1]
    cents[3] = cents[2]

    dmat = np.sqrt(((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    a = dmat.argmin(axis=1)
    da = dmat[np.arange(n), a]
    dm = dmat.copy()
    dm[np.arange(n), a] = np.inf
    db = dm.min(axis=1)
    denom = np.maximum(da, db)
    expect = np.where(denom > 0, (db - da) / np.where(denom == 0, 1, denom), 0.0)

    for parts in (1, 5):
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in x[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        ).repartition(parts)
        got = silhouette_dense(df, cents).orderBy("vec_id").toPandas()
        assert (got["cluster"].to_numpy() == a).all()
        assert np.allclose(got["sil"].to_numpy(), expect, atol=1e-12)
    # ties to a duplicated centroid resolve to the lower index and score 0
    assert (a != 3).all()
    assert expect[a == 2].max() == 0.0


def test_silhouette_dense_rejects_single_centroid(spark):
    from lmw_tree_spark.operators.dense import silhouette_dense

    df = spark.createDataFrame([(0, [0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        silhouette_dense(df, np.zeros((1, 1)))


def test_mutual_knn_probe_all_equals_numpy_brute_force(spark):
    """Probe-all mutual kNN must equal the NumPy brute-force graph (rank on
    4-digit-rounded cosine, ties to lowest id, edge iff both directions in
    top-k); every edge must be genuinely mutual."""
    from lmw_tree_spark.operators.similarity import mutual_knn_edges

    rng = np.random.default_rng(23)
    n, d, k = 90, 8, 4
    x = rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(5)

    norms = np.linalg.norm(x, axis=1, keepdims=True)
    cs = np.round((x @ x.T) / (norms * norms.T), 4)
    np.fill_diagonal(cs, -np.inf)
    topk = []
    for i in range(n):
        # sort by (-cosine, id): argsort on the negated rounded value is
        # stable with kind='stable', so equal cosines keep ascending id
        order = np.argsort(-cs[i], kind="stable")[:k]
        topk.append(set(order.tolist()))
    expect = {
        (i, j): cs[i, j]
        for i in range(n)
        for j in topk[i]
        if i < j and i in topk[j]
    }

    got = {
        (r["src"], r["dst"]): r["cosine_sim"]
        for r in mutual_knn_edges(df, k=k, n_cells=6, n_probe=6).collect()
    }
    assert set(got) == set(expect)
    for e, v in got.items():
        assert abs(v - expect[e]) < 1e-9
    assert len(got) > 0


def test_mutual_knn_approximate_probe_is_subset_with_high_recall(spark):
    """n_probe < n_cells gives a SUBSET of the exact mutual edges (candidates
    only shrink) and keeps high recall on clusterable data."""
    from lmw_tree_spark.operators.similarity import mutual_knn_edges

    rng = np.random.default_rng(31)
    centers = rng.standard_normal((5, 8)) * 4
    x = np.vstack([c + rng.standard_normal((30, 8)) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id long, embedding array<double>",
    )
    exact = {
        (r["src"], r["dst"])
        for r in mutual_knn_edges(df, k=3, n_cells=5, n_probe=5, seed=7).collect()
    }
    approx = {
        (r["src"], r["dst"])
        for r in mutual_knn_edges(df, k=3, n_cells=5, n_probe=2, seed=7).collect()
    }
    assert approx <= exact
    assert len(approx) >= 0.9 * len(exact)
