"""Hashed-ngram linear classifier vs an independent hashlib/python oracle."""

import hashlib

from pyspark.sql import functions as F

from lmw_tree_spark.operators.classifier import (
    classifier_scores,
    hashed_ngram_features,
    synthetic_weight_table,
)

D = 256


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _weight(bucket: int) -> int:
    return (bucket * 2654435761) % 1001 - 500


def _expected(text: str):
    toks = [t for t in text.lower().split(" ") if t]
    grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
    buckets = [_h32(g) % D for g in grams]
    total = sum(_weight(b) for b in buckets)
    return len(grams), total


DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "spark spark spark spark"),          # repeated token: bag semantics
    (3, "singleton"),                         # one token -> no bigrams
    (4, "  padded   with   extra   spaces "),  # empty-token filtering
    (5, "The quick brown fox jumps over the lazy dog"),  # dup of 1
]


def test_scores_match_python_oracle(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    w = synthetic_weight_table(spark, D)
    out = {
        r["doc_id"]: (r["n_feats"], r["total_weight"], r["keep"])
        for r in classifier_scores(df, w, n_buckets=D).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    for doc_id, text in DOCS:
        n, total = _expected(text)
        assert out[doc_id][0] == n, (doc_id, out[doc_id], n)
        assert out[doc_id][1] == total, (doc_id, out[doc_id], total)
        assert out[doc_id][2] == int(total > 0)
    assert out[1] == out[5]  # identical text, identical score


def test_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame([(3, "singleton")], "doc_id long, text string")
    feats = hashed_ngram_features(df, n_buckets=D).collect()
    assert len(feats) == 1
    assert feats[0]["bucket"] == _h32("singleton") % D


def test_tau_threshold_is_exact_integer_compare(spark):
    # craft tau so keep flips exactly at total_weight == tau * n_feats
    df = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    w = synthetic_weight_table(spark, D)
    n, total = _expected(DOCS[0][1])
    assert total % n != 0 or total // n  # sanity: non-degenerate
    tau_eq = total // n
    row = classifier_scores(df, w, n_buckets=D, tau=tau_eq).collect()[0]
    assert row["keep"] == int(total > tau_eq * n)
    row2 = classifier_scores(df, w, n_buckets=D, tau=tau_eq + 1).collect()[0]
    assert row2["keep"] == int(total > (tau_eq + 1) * n)


def test_plan_broadcasts_weights_and_stays_jvm(spark):
    import contextlib
    import io

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    w = synthetic_weight_table(spark, D)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        classifier_scores(df, w, n_buckets=D).explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_nb_train_matches_python_oracle(spark):
    import math

    from lmw_tree_spark.operators.classifier import nb_train_weights

    labeled = [(i, t, 1 if i % 2 else 0) for i, t in DOCS]
    df = spark.createDataFrame(labeled, "doc_id long, text string, label int")
    out = {r["bucket"]: r for r in nb_train_weights(df, n_buckets=D).collect()}
    assert set(out) == set(range(D))  # dense spine

    # independent python oracle
    pos, neg = {}, {}
    for doc_id, text, y in labeled:
        toks = [t for t in text.lower().split(" ") if t]
        grams = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            b = _h32(g) % D
            (pos if y else neg)[b] = (pos if y else neg).get(b, 0) + 1
    pt, nt = sum(pos.values()), sum(neg.values())
    for b in range(D):
        pc, nc = pos.get(b, 0), neg.get(b, 0)
        w = round(math.log((pc + 1) / (pt + D)) - math.log((nc + 1) / (nt + D)), 4)
        assert out[b]["pos_cnt"] == pc and out[b]["neg_cnt"] == nc, b
        assert abs(out[b]["weight"] - w) < 1e-9, (b, out[b]["weight"], w)


def test_nb_weights_feed_scorer(spark):
    from lmw_tree_spark.operators.classifier import nb_train_weights

    labeled = [(i, t, 1 if i % 2 else 0) for i, t in DOCS]
    df = spark.createDataFrame(labeled, "doc_id long, text string, label int")
    w = nb_train_weights(df, n_buckets=D).select(
        "bucket", (F.round(F.col("weight") * 1000).cast("int")).alias("weight")
    )
    scored = classifier_scores(df.drop("label"), w, n_buckets=D).collect()
    assert len(scored) == len(DOCS)
    # docs seen only in the positive class must score positive (and vice versa)
    by_id = {r["doc_id"]: r for r in scored}
    assert by_id[3]["total_weight"] != 0  # singleton doc gets the smoothed ratio


def test_nasty_inputs_match_python_oracle(spark):
    nasty = [
        (10, "héllo wörld héllo"),
        (11, "tab\tstays inside token"),
        (12, "emoji 🙂 token 🙂"),
        (13, "MIXED Case TOKENS mixed case tokens"),
        (14, "a " * 50 + "b"),                 # 51 tokens, heavy repeats
        (15, "x" * 300 + " short"),            # very long token
    ]
    df = spark.createDataFrame(nasty, "doc_id long, text string")
    w = synthetic_weight_table(spark, D)
    out = {
        r["doc_id"]: (r["n_feats"], r["total_weight"])
        for r in classifier_scores(df, w, n_buckets=D).collect()
    }
    for doc_id, text in nasty:
        n, total = _expected(text)
        assert out[doc_id] == (n, total), (doc_id, out[doc_id], (n, total))


# ---------------------------------------------------------------------------
# rank_auc (exact tied-rank Mann-Whitney AUC)
# ---------------------------------------------------------------------------


def _auc_bruteforce(pairs):
    """AUC by direct pair counting: wins + half-ties over pos x neg pairs."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def test_rank_auc_matches_bruteforce_with_ties(spark):
    from lmw_tree_spark.operators.classifier import rank_auc

    # heavy ties: scores drawn from a small codomain
    rows = [(i, (i * 7) % 5, 1 if (i * 13) % 3 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score long, label int")
    got = rank_auc(df, "score", "label").collect()[0]
    want = _auc_bruteforce([(s, y) for _, s, y in rows])
    assert got["auc_den"] == 2 * got["n_pos"] * got["n_neg"]
    assert got["auc_num"] / got["auc_den"] == want  # exact rational equality
    assert abs(got["auc"] - round(want, 6)) < 1e-12


def test_rank_auc_perfect_and_inverted(spark):
    from lmw_tree_spark.operators.classifier import rank_auc

    perfect = [(i, i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(perfect, "doc_id long, score long, label int")
    assert rank_auc(df, "score", "label").collect()[0]["auc"] == 1.0
    inverted = [(i, -i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(inverted, "doc_id long, score long, label int")
    assert rank_auc(df, "score", "label").collect()[0]["auc"] == 0.0


def test_rank_auc_partitioning_invariance(spark):
    from lmw_tree_spark.operators.classifier import rank_auc

    rows = [(i, (i * 31) % 17, i % 2) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, score long, label int")
    a = rank_auc(df.coalesce(1), "score", "label").collect()[0]
    b = rank_auc(df.repartition(16), "score", "label").collect()[0]
    assert a == b
