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


def test_simhash_against_corpus_cross_side_only(spark):
    """simhash_dedup_against_corpus: detects new-vs-corpus near hashes only
    (never corpus×corpus or new×new), respects max_dist, and the corpus-hot
    bucket guard drops flooded bands."""
    from lmw_tree_spark.operators.dedup import simhash_dedup_against_corpus

    def sh(rows):
        return spark.createDataFrame(rows, "doc_id long, simhash long")

    corpus = sh([
        (0, 0x1234_5678_9ABC_DEF0),
        (1, 0x1234_5678_9ABC_DEF3),   # 2 bits from corpus 0 — corpus-side only
        (2, -42),
    ])
    new = sh([
        (10, 0x1234_5678_9ABC_DEF1),  # 1 bit from corpus 0, 1 bit from 1
        (11, 0x7777_0000_0000_0000),  # matches nothing
        (12, -42),                    # exact dup of corpus 2 (negative hash)
    ])
    got = {
        (r["new_id"], r["corpus_id"]): r["dist"]
        for r in simhash_dedup_against_corpus(new, corpus, max_dist=6).collect()
    }
    assert got[(10, 0)] == 1
    assert got[(10, 1)] == 1
    assert got[(12, 2)] == 0
    assert all(n in (10, 12) for n, _ in got)  # only cross-side pairs
    assert len(got) == 3

    # hot-bucket guard: corpus rows sharing every band with each other make
    # the bucket df exceed the cap and the candidate disappears
    hot_corpus = sh([(i, 0x0F0F_0F0F_0F0F_0F0F) for i in range(5)])
    probe = sh([(99, 0x0F0F_0F0F_0F0F_0F0E)])
    full = simhash_dedup_against_corpus(probe, hot_corpus, max_dist=6).count()
    guarded = simhash_dedup_against_corpus(
        probe, hot_corpus, max_dist=6, max_bucket_df=3
    ).count()
    assert full == 5
    assert guarded == 0
