"""Similarity / embedding-dedup operators: the bounded ball-cover near-dup join
must equal brute force exactly (triangle-inequality pruning is lossless), and its
plan must stay equi-join-only; token-Jaccard's document-frequency guard must match
a NumPy reference over the df-capped token universe."""

import numpy as np
import pandas as pd
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
