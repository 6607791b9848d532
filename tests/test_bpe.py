"""Distributed BPE trainer: merge table and final vocabulary must equal a
single-machine reference implementation (classic Sennrich ACL16 semantics —
overlap-inclusive counting, greedy leftmost non-overlapping application,
ties by count desc then pair asc), at any input partitioning."""

from collections import Counter

from lmw_tree_spark.operators.bpe import END_TOKEN, apply_merge, bpe_train, word_corpus


def _ref_bpe(texts, n_merges, end=END_TOKEN):
    freqs = Counter(w for t in texts for w in t.lower().split(" ") if w)
    vocab = {w: list(w) + [end] for w in freqs}
    merges = []
    for step in range(n_merges):
        pc = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < 2:
            break
        merges.append((step, l, r, l + r, c))
        for w in vocab:
            s, new, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            vocab[w] = new
    return merges, vocab


def test_bpe_matches_reference_merges_and_vocab(spark):
    texts = [
        "low low low lower lowest newer newest new",
        "wider wide new newer newer",
        "the lowly widow knew the newt",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got_merges, words = bpe_train(df, 10)
    ref_merges, ref_vocab = _ref_bpe(texts, 10)
    assert got_merges == ref_merges
    got_vocab = {
        r["word"]: list(r["syms"]) for r in words.select("word", "syms").collect()
    }
    assert got_vocab == ref_vocab
    words.unpersist()


def test_bpe_greedy_leftmost_nonoverlap(spark):
    """'aaaa' + merge (a,a) -> ['aa','aa'], 'aaa' -> ['aa','a'] (never three
    overlapping merges), while COUNTING still sees both positions in 'aaa'."""
    from lmw_tree_spark.operators.bpe import pair_counts

    df = spark.createDataFrame([("aaaa aaa",)], "text string")
    w = word_corpus(df)
    cnt = {
        (r["left"], r["right"]): r["cnt"] for r in pair_counts(w).collect()
    }
    assert cnt[("a", "a")] == 3 + 2  # overlap-inclusive
    out = {
        r["word"]: list(r["syms"])
        for r in apply_merge(w, "a", "a").select("word", "syms").collect()
    }
    assert out["aaaa"] == ["aa", "aa", END_TOKEN]
    assert out["aaa"] == ["aa", "a", END_TOKEN]


def test_bpe_partitioning_invariance(spark):
    texts = ["abc abd abe bcd", "abc abc bcd bce", "xyz abc abd"]
    df1 = spark.createDataFrame([(t,) for t in texts], "text string").repartition(1)
    df7 = spark.createDataFrame([(t,) for t in texts], "text string").repartition(7)
    m1, w1 = bpe_train(df1, 5)
    m7, w7 = bpe_train(df7, 5)
    assert m1 == m7
    v1 = {r["word"]: list(r["syms"]) for r in w1.collect()}
    v7 = {r["word"]: list(r["syms"]) for r in w7.collect()}
    assert v1 == v7
    w1.unpersist()
    w7.unpersist()


def test_bpe_stops_when_no_pair_repeats(spark):
    """cnt < 2 terminates training early (merging singletons is pointless);
    a fully-merged single-symbol word must not emit phantom pairs (Spark's
    sequence(1, 0) is descending, guarded in pair_counts)."""
    from lmw_tree_spark.operators.bpe import pair_counts

    df = spark.createDataFrame([("ab ab cd",)], "text string")
    merges, words = bpe_train(df, 50)
    # 'ab' merges fully (freq 2): a+b, ab+END; then everything left is unique
    assert [m[1:4] for m in merges][:2] == [
        ("a", "b", "ab"),
        ("ab", END_TOKEN, "ab" + END_TOKEN),
    ]
    assert len(merges) < 50
    fully = {r["word"]: list(r["syms"]) for r in words.collect()}
    assert fully["ab"] == ["ab" + END_TOKEN]
    # no phantom pair from the size-1 word
    pcs = {(r["left"], r["right"]) for r in pair_counts(words).collect()}
    assert all(l is not None and r is not None for l, r in pcs)
    words.unpersist()


def test_bpe_encode_matches_reference(spark):
    from lmw_tree_spark.operators.bpe import bpe_encode

    texts = [
        "low low low lower lowest newer newest new",
        "wider wide new newer newer",
        "the lowly widow knew the newt",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, words = bpe_train(df, 6)
    words.unpersist()
    _, ref_vocab = _ref_bpe(texts, 6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.lower().split(" ") if w]
        want[i] = (len(ws), sum(len(ref_vocab[w]) for w in ws))
    assert got == want


def test_bpe_1024_merges_matches_reference(spark):
    """Vocabulary-scale training: 1024 merges over a synthetic corpus must
    equal the single-machine reference exactly (merge table AND final vocab).
    Exercises the driver-side bounded-table loop (one Spark job total, not one
    job per merge) at a depth where the old per-merge-job shape would launch
    1024 sequential Spark jobs."""
    import random

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    vocab_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(6, 12)))
        for _ in range(900)
    ]
    # each word repeated 2-5x so pair counts clear the cnt>=2 merge floor
    bag = [w for w in vocab_words for _ in range(rng.randint(2, 5))]
    rng.shuffle(bag)
    texts = [" ".join(bag[i : i + 40]) for i in range(0, len(bag), 40)]
    df = spark.createDataFrame([(t,) for t in texts], "text string").repartition(9)
    got_merges, words = bpe_train(df, 1024)
    ref_merges, ref_vocab = _ref_bpe(texts, 1024)
    assert len(got_merges) == 1024  # corpus is rich enough to reach full depth
    assert got_merges == ref_merges
    got_vocab = {r["word"]: list(r["syms"]) for r in words.collect()}
    assert got_vocab == ref_vocab


def test_bpe_encode_no_merges_is_chars_plus_marker(spark):
    from lmw_tree_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(1, "ab abc")], "doc_id long, text string")
    row = bpe_encode(df, []).collect()[0]
    assert (row["n_words"], row["n_tokens"]) == (2, 3 + 4)


def test_bpe_distributed_fallback_matches_driver_path(spark):
    """max_driver_words=0 forces the per-merge distributed loop — merge table
    and vocabulary must be identical to the driver-side heap trainer."""
    texts = [
        "low low low lower lowest newer newest new",
        "wider wide new newer newer",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    m_drv, w_drv = bpe_train(df, 8)
    m_dist, w_dist = bpe_train(df, 8, max_driver_words=0)
    assert m_dist == m_drv
    v_drv = {r["word"]: (r["freq"], list(r["syms"])) for r in w_drv.collect()}
    v_dist = {r["word"]: (r["freq"], list(r["syms"])) for r in w_dist.collect()}
    assert v_dist == v_drv


def test_bpe_heavy_tail_pruned_exactly(spark):
    """A web-scale heavy tail (freq-1 words sharing no repeated pairs) must
    not change the merge table vs the clean corpus, must never reach the
    driver (collected rows == viable words only), and must survive untouched
    in the returned vocabulary."""
    clean = ["low low low lower lowest", "newer newest new newer"]
    # tail words built from characters the clean corpus never uses, so every
    # pair of theirs is unique → unviable by construction
    tail = ["qzjx81 vkp93% #" , "zz", "q7&"]
    df_clean = spark.createDataFrame([(t,) for t in clean], "text string")
    df_noisy = spark.createDataFrame([(t,) for t in clean + tail], "text string")
    m_clean, _ = bpe_train(df_clean, 6)
    m_noisy, w_noisy = bpe_train(df_noisy, 6)
    # 'zz' IS viable ((z,z) count 2 in one freq-1 word? no — one word 'zz'
    # contributes the pair once, count 1) — everything in the tail is pruned
    assert m_noisy == m_clean
    vocab = {r["word"]: list(r["syms"]) for r in w_noisy.collect()}
    for w in ("qzjx81", "vkp93%", "#", "zz", "q7&"):
        assert vocab[w] == list(w) + [END_TOKEN]
