"""Incremental (shard-vs-corpus) dedup and contamination-check tests."""

from lmw_tree_spark.operators.dedup import (
    contamination_pairs,
    minhash_dedup_against_corpus,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_finds_cross_corpus_dups_only(spark):
    corpus = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "completely unrelated text about spark dataframes and arrow batches here"),
        (4, "another corpus document with its own distinctive vocabulary set entirely"),
    ])
    new = _docs(spark, [
        (11, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (13, "the quick brown fox jumps over the lazy dog near the river bank now"),
        (15, "fresh shard content sharing nothing with anything stored before this"),
    ])
    out = minhash_dedup_against_corpus(new, corpus, min_sim=0.5).collect()
    got = {(r["new_id"], r["corpus_id"]) for r in out}
    assert (11, 0) in got           # verbatim copy detected
    assert (13, 0) in got           # one-token edit detected
    assert all(c == 0 for _, c in got)   # only the true corpus target matches
    assert all(n in (11, 13) for n, _ in got)  # the novel doc stays clean
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0


def test_incremental_bucket_df_guard_drops_hot_bands(spark):
    # 30 identical corpus docs form one hot band bucket; guard excludes it
    corpus = _docs(spark, [(i, "boilerplate footer text repeated on every page") for i in range(30)])
    new = _docs(spark, [(100, "boilerplate footer text repeated on every page")])
    full = minhash_dedup_against_corpus(new, corpus, min_sim=0.5)
    guarded = minhash_dedup_against_corpus(new, corpus, min_sim=0.5, max_bucket_df=8)
    assert full.count() == 30
    assert guarded.count() == 0


def test_contamination_containment_semantics(spark):
    train = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "totally different training text with no overlap whatsoever at all"),
    ])
    evals = _docs(spark, [
        (100, "beta gamma delta epsilon zeta"),     # fully contained in doc 1
        (101, "nothing here matches training data"),
    ])
    out = contamination_pairs(train, evals, ngram=3, min_containment=0.5).collect()
    got = {(r["eval_id"], r["train_id"]): r["containment"] for r in out}
    assert got == {(100, 1): 1.0}   # 3 of 3 distinct 3-grams found; clean eval absent
