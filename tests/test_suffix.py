"""Suffix-array substring pass: kernel properties + Spark operator exactness.

The reference has no substring machinery (it consumes precomputed signatures,
/root/reference/src/CreateSignatures.h:26-60); the pass is specified by the target
(suffix-array substring candidate generation on captions). Oracle = brute-force
O(n^2) LCS over all pairs.
"""

import itertools

import numpy as np
import pandas as pd
import pytest

from lmw_tree_spark.functions.signatures import char_shingle_hashes


def test_adjacent_lcp_matches_kasai():
    """The vectorized doubling-rank LCP must equal the scalar Kasai loop on
    sequences with repeated symbols and a unique final sentinel (the
    _concat_group invariant that licenses the truncation-free rank compare)."""
    from lmw_tree_spark.functions.suffix import adjacent_lcp, lcp_array, suffix_array

    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(2, 3000))
        s = rng.integers(0, 4, n).astype(np.int64)
        s[-1] = -1  # unique sentinel, as _concat_group guarantees
        sa, levels = suffix_array(s, return_levels=True)
        assert (lcp_array(s, sa) == adjacent_lcp(sa, levels, n)).all()
from lmw_tree_spark.functions.suffix import (
    brute_force_lcs,
    lcp_array,
    substring_pairs_in_group,
    suffix_array,
    winnow_select,
)

VOCAB = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]


def _corpus(rng, n_docs, with_clones=True):
    docs = []
    for _ in range(n_docs):
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), rng.integers(3, 12))]
        docs.append(" ".join(words).encode())
    if with_clones and n_docs >= 4:
        docs[1] = b"pre " + docs[0] + b" post"          # superstring
        docs[3] = docs[2][: max(len(docs[2]) - 4, 8)]   # prefix clone
    return docs


def test_suffix_array_matches_sorted_suffixes():
    rng = np.random.default_rng(1)
    for _ in range(25):
        s = rng.integers(0, 4, rng.integers(1, 80))
        sa = suffix_array(s)
        assert list(sa) == sorted(range(len(s)), key=lambda i: tuple(s[i:]))


def test_lcp_array_is_kasai_correct():
    rng = np.random.default_rng(2)
    for _ in range(15):
        s = rng.integers(0, 3, rng.integers(2, 60))
        sa = suffix_array(s)
        lcp = lcp_array(s, sa)
        assert lcp[0] == 0
        for i in range(1, len(s)):
            a, b = s[sa[i - 1] :], s[sa[i] :]
            m = 0
            while m < len(a) and m < len(b) and a[m] == b[m]:
                m += 1
            assert lcp[i] == m


def test_group_pairs_exact_vs_brute_force():
    rng = np.random.default_rng(3)
    L = 10
    for _ in range(12):
        docs = _corpus(rng, int(rng.integers(2, 9)))
        got = substring_pairs_in_group(docs, L)
        for i, j in itertools.combinations(range(len(docs)), 2):
            true = brute_force_lcs(docs[i], docs[j])
            if true >= L:
                assert got.get((i, j)) == true
            else:
                assert (i, j) not in got


def test_winnow_guarantee_shared_substring_implies_shared_fingerprint():
    rng = np.random.default_rng(4)
    k, L = 5, 12
    w = L - k + 1
    for _ in range(40):
        base = " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), 4))
        a = ("xx" + base + " tail").encode()
        b = ("other prefix " + base).encode()
        hashes, mask = char_shingle_hashes(pd.Series([a, b]), k)
        sel = winnow_select(hashes, mask, w)
        assert len(np.intersect1d(sel[0], sel[1])) > 0


def test_winnow_short_texts_select_nothing():
    hashes, mask = char_shingle_hashes(pd.Series([b"tiny", b"abcdefghij"]), 5)
    sel = winnow_select(hashes, mask, 8)  # needs >= 12 chars
    assert all(len(s) == 0 for s in sel)


def test_substring_pairs_operator_exact(spark):
    from lmw_tree_spark.operators.suffix import substring_pairs

    rng = np.random.default_rng(5)
    docs = _corpus(rng, 40)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": [d.decode() for d in docs]}
    )
    df = spark.createDataFrame(pdf)
    L = 12
    got = {
        (r["src"], r["dst"]): r["lcs_len"]
        for r in substring_pairs(df, "doc_id", "text", min_len=L).collect()
    }
    expect = {}
    for i, j in itertools.combinations(range(len(docs)), 2):
        true = brute_force_lcs(docs[i].lower(), docs[j].lower())
        if true >= L:
            expect[(i, j)] = true
    assert got == expect


def test_substring_pairs_grams_matches_sa_path_and_brute_force(spark):
    """The JVM gram-join detection path must find exactly the pairs the
    winnow→SA path finds (and brute force confirms) whenever no gram exceeds
    df_cap — same corpus, same L."""
    from lmw_tree_spark.operators.suffix import substring_pairs, substring_pairs_grams

    rng = np.random.default_rng(6)
    docs = _corpus(rng, 40)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": [d.decode() for d in docs]}
    )
    df = spark.createDataFrame(pdf)
    L = 12
    sa_pairs = {
        (r["src"], r["dst"])
        for r in substring_pairs(df, "doc_id", "text", min_len=L).collect()
    }
    gram_pairs = {
        (r["src"], r["dst"])
        for r in substring_pairs_grams(df, "doc_id", "text", min_len=L).collect()
    }
    brute = {
        (i, j)
        for i, j in itertools.combinations(range(len(docs)), 2)
        if brute_force_lcs(docs[i].lower(), docs[j].lower()) >= L
    }
    assert gram_pairs == sa_pairs == brute


def test_substring_pairs_grams_chain_fallback_keeps_connectivity(spark):
    """Above df_cap, a hot gram emits chain edges instead of the O(df²) clique:
    every emitted pair still genuinely shares the gram (precision 1), and all
    docs sharing it stay in one connected component."""
    from lmw_tree_spark.operators.ccomp import connected_components
    from lmw_tree_spark.operators.suffix import substring_pairs_grams

    shared = "this exact boilerplate phrase repeats"
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(12, dtype=np.int64),
            "text": [f"doc {i} unique preamble {shared}" for i in range(12)],
        }
    )
    df = spark.createDataFrame(pdf)
    pairs = substring_pairs_grams(df, "doc_id", "text", min_len=20, df_cap=4)
    rows = pairs.collect()
    n_all_pairs = 12 * 11 // 2
    assert 0 < len(rows) < n_all_pairs  # capped, not the full clique
    comp = connected_components(
        pairs.selectExpr("cast(src as string) src", "cast(dst as string) dst")
    )
    assert comp.select("dup_group").distinct().count() == 1


def test_substring_pairs_string_ids_and_case_fold(spark):
    from lmw_tree_spark.operators.suffix import substring_pairs

    pdf = pd.DataFrame(
        {
            "image_id": ["a", "b", "c"],
            "caption": [
                "The QUICK brown fox jumps over",
                "the quick brown fox JUMPS over",
                "completely different caption here",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = substring_pairs(df, "image_id", "caption", min_len=15).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src"], r["dst"]) == ("a", "b")
    assert r["lcs_len"] == 30  # full caption matches after case folding


def test_group_diameter_chain_drift(spark):
    """Planted A~B~C chain: group diameter equals the far-pair distance, not
    the per-hop radius; oversize groups report NULL."""
    from lmw_tree_spark.operators.ccomp import connected_components
    from lmw_tree_spark.operators.dedup import group_diameter
    from pyspark.sql import functions as F

    # chain 1-2-3: hashes 0b0, 0b11 (d=2), 0b1111 (d(1,3)=4)
    sigs = spark.createDataFrame(
        [("a", 0), ("b", 3), ("c", 15), ("x", 1 << 40), ("y", (1 << 40) | 1)]
        + [(f"big{i}", i) for i in range(70)],
        "image_id string, phash long",
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")]
        + [(f"big{i}", f"big{i+1}") for i in range(69)],
        "src string, dst string",
    )
    groups = connected_components(edges, vertices=sigs)
    got = {r.dup_group: r for r in group_diameter(groups, sigs, size_cap=64).collect()}
    chain = got["a"]
    assert chain.n_members == 3 and chain.diameter == 4
    pair = got["x"]
    assert pair.n_members == 2 and pair.diameter == 1
    big = got["big0"]
    assert big.n_members == 70 and big.diameter is None
