"""Gopher-style repetition filter (operators/quality.py) vs hand-computed
metrics on constructed documents."""

import pytest
from pyspark.sql import functions as F

from lmw_tree_spark.operators.quality import repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # clean: 24 distinct-ish tokens, no repeated 3-gram
        (0, "the quick brown fox jumps over a lazy dog while birds sing "
            "songs about distant hills and rivers flowing gently toward "
            "the open sea"),
        # stuffed: one token dominates
        (1, "spam spam spam spam spam spam spam eggs spam spam spam spam "
            "spam spam spam spam spam spam spam spam"),
        # looping boilerplate: a repeated 5-gram phrase
        (2, "click here to buy now click here to buy now click here to "
            "buy now click here to buy now"),
        # too short
        (3, "a tiny document with six tokens"),
        # double spaces collapse to the same token stream as single spaces
        (4, "alpha  beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_metrics_match_hand_computation(docs):
    out = _by_id(repetition_stats(docs))

    clean = out[0]
    assert clean["n_tokens"] == 24
    assert clean["dup_gram_frac"] == 0.0
    # "the" appears twice -> 2/24
    assert clean["top_tok_frac"] == round(2 / 24, 4)

    stuffed = out[1]
    assert stuffed["n_tokens"] == 20
    assert stuffed["top_tok_frac"] == round(19 / 20, 4)

    looped = out[2]
    # 20 tokens -> 18 3-grams, phrase of 5 repeated 4x -> few distinct grams
    assert looped["n_tokens"] == 20
    assert looped["dup_gram_frac"] > 0.5

    short = out[3]
    assert short["n_tokens"] == 6

    spaced = out[4]
    assert spaced["n_tokens"] == 20  # empty tokens from "  " dropped
    assert spaced["top_tok_frac"] == round(1 / 20, 4)


def test_keep_decision(docs):
    out = _by_id(
        repetition_stats(
            docs, max_top_tok_frac=0.15, max_dup_gram_frac=0.0, min_tokens=8
        )
    )
    assert out[0]["keep"] == 1
    assert out[1]["keep"] == 0  # token mode
    assert out[2]["keep"] == 0  # duplicate 3-grams
    assert out[3]["keep"] == 0  # too short
    assert out[4]["keep"] == 1


def test_no_python_udf_in_plan(docs):
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_editdist_pairs_candidate_then_verify(spark):
    """One-word edits clear the 5-gram candidate stage and score high edit_sim;
    unrelated docs never pair; a boilerplate shingle above the df cap cannot
    create pairs on its own."""
    from lmw_tree_spark.operators.dedup import editdist_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    boiler = "terms of service apply here"  # shared 5-gram across many docs
    docs = spark.createDataFrame(
        [(0, base), (1, edited), (2, "totally different words entirely now here maybe")]
        + [(10 + i, f"{boiler} unique{i} filler{i} pad{i} x{i} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    got = {
        (r["src"], r["dst"]): r
        for r in editdist_pairs(docs, min_sim=0.5, ngram=5, max_gram_df=3).collect()
    }
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["lev"] == 4  # kappa -> lambda
    assert abs(r["edit_sim"] - round(1 - 4 / max(len(base), len(edited)), 4)) < 1e-9
    # doc 2 shares no shingle with anything; boilerplate docs exceed the df cap
    assert all(s not in (2,) and d not in (2,) for s, d in got)
    assert not any(s >= 10 or d >= 10 for s, d in got)


def test_line_dedup_removes_cross_doc_lines_keeps_order(spark):
    from lmw_tree_spark.operators.quality import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "unique a\nshared header\nunique b"),
            (1, "shared header\nonly here"),
            (2, "solo one\nsolo two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_doc_freq=2).collect()}
    assert out[0]["kept_text"] == "unique a\nunique b"
    assert out[0]["n_lines"] == 3 and out[0]["n_removed"] == 1
    assert out[1]["kept_text"] == "only here" and out[1]["n_removed"] == 1
    assert out[2]["kept_text"] == "solo one\nsolo two" and out[2]["n_removed"] == 0
    # a doc whose every line is boilerplate keeps an empty text, not a dropped row
    docs2 = spark.createDataFrame(
        [(0, "x\ny"), (1, "x\ny")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r for r in line_dedup(docs2, min_doc_freq=2).collect()}
    assert out2[0]["kept_text"] == "" and out2[0]["n_removed"] == 2
    assert len(out2) == 2


def test_scrub_pii_masks_and_counts(spark):
    from lmw_tree_spark.functions.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@site.org or see https://a.b/c?d=1 now"),
            (1, "no pii here at all"),
            (2, "two mails a@b.co c@d.io and http://plain.url"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[0]["scrubbed"] == "mail me at <EMAIL> or see <URL> now"
    assert out[0]["n_emails"] == 1 and out[0]["n_urls"] == 1
    assert out[1]["scrubbed"] == "no pii here at all"
    assert out[1]["n_emails"] == 0 and out[1]["n_urls"] == 0
    assert out[2]["scrubbed"] == "two mails <EMAIL> <EMAIL> and <URL>"
    assert out[2]["n_emails"] == 2 and out[2]["n_urls"] == 1


def test_bpe_token_counts(spark):
    from lmw_tree_spark.functions.text import bpe_token_counts

    docs = spark.createDataFrame(
        [(0, "Hello, world 42 times!"), (1, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bpe_token_counts(docs).collect()}
    # hello , world 42 times !  -> 3 words, 1 num, 2 punct
    assert out[0]["n_words"] == 3 and out[0]["n_nums"] == 1
    assert out[0]["n_punct"] == 2 and out[0]["n_bpe_tokens"] == 6
    assert out[1]["n_bpe_tokens"] == 0


def test_decontaminate_spans_masks_exact_windows(spark):
    from lmw_tree_spark.operators.quality import decontaminate_spans

    evals = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "intro quick brown fox outro tail"),       # one 3-gram hit
            (2, "the quick brown fox jumps again"),        # overlapping hits merge
            (3, "nothing shared here at all"),             # untouched
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           decontaminate_spans(train, evals, ngram=3, mask="_").collect()}
    assert got[1]["masked_text"] == "intro _ _ _ outro tail"
    assert got[1]["n_masked"] == 3
    # doc 2: starts 0,1,2 match (start 3 "fox jumps again" is not an eval
    # gram) -> overlapping windows merge to positions 0..4, "again" survives
    assert got[2]["masked_text"] == "_ _ _ _ _ again"
    assert got[2]["n_masked"] == 5
    assert got[3]["masked_text"] == "nothing shared here at all"
    assert got[3]["n_masked"] == 0


def test_decontaminate_short_docs_pass_through(spark):
    from lmw_tree_spark.operators.quality import decontaminate_spans

    evals = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    got = decontaminate_spans(train, evals, ngram=3).collect()[0]
    assert got["n_masked"] == 0 and got["masked_text"] == "a b"


def test_unigram_nll_matches_python(spark):
    import math

    from lmw_tree_spark.functions.text import unigram_nll

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["nll"] for r in unigram_nll(docs).collect()}
    freq, total = {"a": 2, "b": 2, "c": 1}, 5
    for doc_id, toks in ((1, ["a", "a", "b"]), (2, ["b", "c"])):
        exact = sum(-math.log2(freq[t] / total) for t in toks) / len(toks)
        assert abs(got[doc_id] - round(exact, 4)) < 1e-9


def test_canonicalize_url_hand_cases(spark):
    """canonicalize_url_col vs hand-derived canonical forms covering every
    rule: fragment, scheme/host case, default ports, tracking params,
    trailing slash, dangling '?'."""
    from lmw_tree_spark.functions.text import canonicalize_url_col, url_domain_col

    cases = [
        ("HTTP://WWW.Example.COM:80/a/?utm_source=x#frag",
         "http://www.example.com/a", "example.com"),
        ("https://Site.ORG:443/p/1?id=1&gclid=abc",
         "https://site.org/p/1?id=1", "site.org"),
        ("http://a.b.c.net/x/", "http://a.b.c.net/x", "c.net"),
        # non-default port preserved; path case preserved
        ("https://Host.io:8443/Path?Q=1", "https://host.io:8443/Path?Q=1",
         "host.io"),
        # tracking param in the middle of the query
        ("http://h.com/p?utm_medium=m&id=2&fbclid=z", "http://h.com/p?id=2",
         "h.com"),
        # bare host with trailing slash and dangling '?'
        ("http://h.com/?", "http://h.com", "h.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    out = df.select(
        "url",
        canonicalize_url_col("url").alias("canon"),
    ).withColumn("domain", url_domain_col(F.col("canon"))).collect()
    got = {r["url"]: (r["canon"], r["domain"]) for r in out}
    for url, canon, domain in cases:
        assert got[url] == (canon, domain), url


def test_canonicalize_url_idempotent_and_collapses_variants(spark):
    from lmw_tree_spark.functions.text import canonicalize_url_col

    variants = [
        "http://ex.com/p/9?id=9",
        "HTTP://EX.COM:80/p/9/?id=9&utm_source=feed&gclid=xy#sec1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    canon = df.select(canonicalize_url_col("url").alias("c"))
    vals = [r["c"] for r in canon.collect()]
    assert vals[0] == vals[1] == "http://ex.com/p/9?id=9"
    # idempotent: canonicalizing the canonical form is a no-op
    twice = canon.select(canonicalize_url_col(F.col("c")).alias("c2")).collect()
    assert all(r["c2"] == vals[0] for r in twice)


def test_domain_quality_gate_decisions(spark):
    """domain_quality_gate: blocklist, min_docs, and rounded-mean threshold
    each independently flip `kept`."""
    from lmw_tree_spark.operators.quality import domain_quality_gate

    rows = (
        [(i, "good.com", 0.9) for i in range(5)]
        + [(10 + i, "lowq.com", 0.2) for i in range(5)]
        + [(20, "tiny.com", 0.9)]
        + [(30 + i, "blocked.com", 0.9) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, domain string, quality double")
    blk = spark.createDataFrame([("blocked.com",)], "domain string")
    out = {
        r["domain"]: r
        for r in domain_quality_gate(
            df, min_docs=2, min_quality=0.5, blocklist=blk
        ).collect()
    }
    assert out["good.com"]["kept"] is True
    assert out["lowq.com"]["kept"] is False  # quality below threshold
    assert out["tiny.com"]["kept"] is False  # below min_docs
    assert out["blocked.com"]["kept"] is False  # blocklisted
    assert out["good.com"]["n_docs"] == 5
    assert abs(out["good.com"]["avg_quality"] - 0.9) < 1e-9


def test_domain_quality_gate_rounded_boundary(spark):
    """The decision compares the ROUNDED mean: avg 0.49995 rounds to 0.5 and
    passes a 0.5 threshold — the documented integer-stable contract."""
    from lmw_tree_spark.operators.quality import domain_quality_gate

    df = spark.createDataFrame(
        [(0, "edge.com", 0.4999), (1, "edge.com", 0.5)],
        "doc_id long, domain string, quality double",
    )
    row = domain_quality_gate(df, min_docs=2, min_quality=0.5).collect()[0]
    assert row["avg_quality"] == 0.5 and row["kept"] is True


def test_extract_html_text_edge_cases(spark):
    """Script bodies with bare '>' are removed whole, entities single-decode
    (&amp;lt; → literal &lt;), short boilerplate lines are dropped, and line
    counts are exact."""
    from lmw_tree_spark.functions.text import extract_html_text

    html = (
        "<html><head><title>T</title>"
        "<style>p{x:1}</style></head><body>\n"
        '<div class="nav"><a href="/">Home</a></div>\n'
        "<script>if (a > b) { naive_strip_would_leak_this(); }</script>"
        "<p>the quick brown fox jumps over the lazy dog</p>"
        "<p>escaped entity stays literal here: &amp;lt; but Tom &amp; "
        "Jerry decodes</p>"
        "<p>&copy; 2026</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = extract_html_text(df).collect()[0]
    lines = r["extracted"].split("\n")
    assert lines[0] == "the quick brown fox jumps over the lazy dog"
    assert "&lt;" in lines[1]          # single decode, not "<"
    assert "Tom & Jerry" in lines[1]   # &amp; decodes
    assert "naive_strip" not in r["extracted"]  # script body gone entirely
    assert "Home" not in r["extracted"]         # nav boilerplate dropped
    assert "2026" not in r["extracted"]         # footer dropped
    assert r["n_lines_kept"] == 2
    # non-empty pre-filter lines: title+nav glue, script-residue h-line
    # variants collapse per the break rules — just check kept <= total
    assert r["n_lines_kept"] <= r["n_lines_total"]


def test_corpus_drift_exact_tv(spark):
    """corpus_drift: TV distance and per-token drift match an exact integer
    replay; identical corpora drift zero."""
    from fractions import Fraction

    from lmw_tree_spark.operators.quality import corpus_drift

    v1 = spark.createDataFrame(
        [(1, "a a b c"), (2, "b c d")], "doc_id long, text string"
    )
    v2 = spark.createDataFrame(
        [(1, "a b b c"), (2, "b c e e")], "doc_id long, text string"
    )
    out = corpus_drift(v1, v2, top_k=10).collect()
    n1 = {"a": 2, "b": 2, "c": 2, "d": 1}          # N1 = 7
    n2 = {"a": 1, "b": 3, "c": 2, "e": 2}          # N2 = 8
    tv = Fraction(0)
    for t in sorted(set(n1) | set(n2)):
        tv += abs(
            Fraction(n1.get(t, 0), 7) - Fraction(n2.get(t, 0), 8)
        )
    tv /= 2
    got = {r["tok"]: r for r in out}
    assert set(got) == set(n1) | set(n2)
    for t, r in got.items():
        assert r["n1"] == n1.get(t, 0) and r["n2"] == n2.get(t, 0)
        want = abs(n1.get(t, 0) * 8 - n2.get(t, 0) * 7) / (7.0 * 8.0)
        assert abs(r["share_drift"] - want) < 1e-8
        assert abs(r["tv_total"] - float(tv)) < 1e-8

    same = corpus_drift(v1, v1, top_k=5).collect()
    assert all(r["tv_total"] == 0.0 and r["share_drift"] == 0.0 for r in same)


def test_safety_gate_blocklist_counts(spark):
    from lmw_tree_spark.functions.text import safety_gate

    rows = [
        (0, "clean words only here"),
        (1, "one bad token lurks"),
        (2, "bad bad words and more bad"),
        (3, "badge is not bad token bad"),  # substring 'bad' in 'badge' must NOT hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in safety_gate(df, ["bad", "lurks"]).collect()}
    assert out[0]["n_flagged"] == 0 and out[0]["keep"] == 1
    assert out[1]["n_flagged"] == 2 and out[1]["keep"] == 0
    assert out[2]["n_flagged"] == 3 and out[2]["keep"] == 0
    assert out[3]["n_flagged"] == 2 and out[3]["keep"] == 0
    assert out[3]["n_tokens"] == 6
    # max_hits loosens the gate, counts unchanged
    loose = {r["doc_id"]: r.asDict() for r in
             safety_gate(df, ["bad", "lurks"], max_hits=2).collect()}
    assert loose[1]["keep"] == 1 and loose[2]["keep"] == 0


def test_curation_funnel_counts(spark):
    from lmw_tree_spark.operators.quality import curation_funnel

    long_good = " ".join(f"tok{i}" for i in range(25))        # 25 tokens, clean
    rows = [
        (0, long_good),                    # survives everything
        (1, long_good),                    # exact dup of 0 -> dropped at stage 1
        (2, long_good + " verboten"),      # blocklisted -> dropped at stage 2
        (3, "short but clean text here"),  # 5 tokens: passes safety, fails length
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["stage"]: r.asDict() for r in curation_funnel(df, ["verboten"]).collect()}
    assert out["exact_dedup"]["n_in"] == 4 and out["exact_dedup"]["n_kept"] == 3
    assert out["safety"]["n_in"] == 3 and out["safety"]["n_kept"] == 2
    # doc 3's quality: alpha 1.0*0.5 + len_ok 0.25 + sat 5/20*0.25 -> 0.8125 >= 0.5
    assert out["quality"]["n_in"] == 2 and out["quality"]["n_kept"] == 2
    assert out["length"]["n_in"] == 2 and out["length"]["n_kept"] == 1


def test_affix_strip_edge_cases(spark):
    """Hand-computed affix mining: min_doc_freq boundary, too-short docs
    never measured, suffix strip blocked when both strips would empty the
    doc, and original-list composition when both strip."""
    from lmw_tree_spark.operators.quality import affix_strip

    pre = "stock photo of"
    suf = "getty images inc"
    rows = []
    # 3 docs with the mined prefix + long bodies (supports prefix mining)
    for i in range(3):
        rows.append((i, f"{pre} body{i} words{i} here{i} now{i}"))
    # 3 docs with the mined suffix
    for i in range(3, 6):
        rows.append((i, f"real content body{i} {suf}"))
    # doc 6: BOTH affixes, n=10 >= 7 -> both strip
    rows.append((6, f"{pre} middle core kept {suf}"))
    # doc 7: both affixes, n=6 < 7 -> prefix wins, suffix blocked
    rows.append((7, f"{pre} {suf}"))
    # doc 8: exactly the prefix, n=3 < k+1 -> never measured, kept whole
    rows.append((8, pre))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        affix_strip(df, k=3, min_doc_freq=3)
        .toPandas().set_index("doc_id").sort_index()
    )
    for i in range(3):
        assert got.loc[i, "pre_hit"] == 1 and got.loc[i, "suf_hit"] == 0
        assert got.loc[i, "stripped_text"] == f"body{i} words{i} here{i} now{i}"
    for i in range(3, 6):
        assert got.loc[i, "pre_hit"] == 0 and got.loc[i, "suf_hit"] == 1
        assert got.loc[i, "stripped_text"] == f"real content body{i}"
    assert got.loc[6, "pre_hit"] == 1 and got.loc[6, "suf_hit"] == 1
    assert got.loc[6, "stripped_text"] == "middle core kept"
    assert got.loc[7, "pre_hit"] == 1 and got.loc[7, "suf_hit"] == 0
    assert got.loc[7, "stripped_text"] == suf
    assert got.loc[8, "pre_hit"] == 0 and got.loc[8, "suf_hit"] == 0
    assert got.loc[8, "stripped_text"] == pre
    # below min_doc_freq (prefix support is 5: docs 0,1,2,6,7) nothing mines
    clean = affix_strip(df, k=3, min_doc_freq=6).toPandas()
    assert (clean["pre_hit"] == 0).all() and (clean["suf_hit"] == 0).all()


def test_affix_strip_invariants_randomized(spark):
    """Seeded randomized invariants: n_tokens always equals the input's
    token count, stripped output is never empty when any strip fired, and a
    corpus with no repeating affix passes through verbatim (normalized)."""
    import numpy as np

    from lmw_tree_spark.operators.quality import affix_strip

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(120):
        n = int(rng.integers(1, 12))
        toks = [vocab[int(t)] for t in rng.integers(0, len(vocab), n)]
        if i % 3 == 0:
            toks = ["the", "best", "of"] + toks     # mined prefix (40 docs)
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = affix_strip(df, k=3, min_doc_freq=20).toPandas().set_index("doc_id")
    for i, text in rows:
        toks = [t for t in text.lower().split(" ") if t]
        assert got.loc[i, "n_tokens"] == len(toks), i
        out = got.loc[i, "stripped_text"]
        if got.loc[i, "pre_hit"] or got.loc[i, "suf_hit"]:
            assert out != "" and len(out.split(" ")) >= 1
            assert len(out.split(" ")) == len(toks) - 3 * (
                got.loc[i, "pre_hit"] + got.loc[i, "suf_hit"]
            ), i
        else:
            assert out == " ".join(toks), i
    # every planted-prefix doc long enough to strip actually stripped
    for i, text in rows:
        toks = [t for t in text.lower().split(" ") if t]
        if i % 3 == 0 and len(toks) >= 4:
            assert got.loc[i, "pre_hit"] == 1, i
