"""Text-analysis column functions for the training-data pipeline: token counting,
quality scoring, language-ID scoring, document fingerprinting.

All are pure ``pyspark.sql.functions`` compositions (JVM-side, whole-stage codegen —
no Python in the hot path) with exact ANSI-SQL equivalents so every one is
DuckDB-oracle-checkable. Tokenization convention everywhere: split on single spaces
(the corpus is single-space separated); lowercase before matching.

The reference's only string ops are lowercase/trim/tag-extraction in its indexer
(/root/reference/src/indexer/TitleExtractor.cpp:20-47, UnparsedFile.h:75-79); these
operators extend that surface to what a 100 TB text/caption pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language. The heuristic is intentionally
# simple (count stopword hits per language, argmax with lexicographic tie-break) —
# the point is a deterministic, oracle-checkable n-gram/stopword scorer, not a
# production language model.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "value", "table", "row"),
    "es": ("el", "la", "de", "y", "que", "los", "por", "con"),
    "de": ("der", "die", "das", "und", "zu", "mit", "von", "ist"),
    "fr": ("le", "la", "les", "et", "de", "des", "une", "est"),
}


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(c), " ")


def token_count_col(text: str | Column = "text") -> Column:
    """Whitespace token count (matches DuckDB len(string_split(lower(text),' '')))."""
    return F.size(tokens_col(text)).cast("long")


def alpha_ratio_col(text: str | Column = "text") -> Column:
    """Fraction of characters that are lowercase letters or spaces."""
    c = F.col(text) if isinstance(text, str) else text
    clean = F.length(F.regexp_replace(F.lower(c), "[^a-z ]", ""))
    return (clean.cast("double") / F.length(c)).alias("alpha_ratio")


def mean_token_len_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n = token_count_col(c)
    # total chars minus separators, averaged over tokens
    return (F.length(c) - (n - F.lit(1))).cast("double") / n


def stopword_hits_col(lang: str, text: str | Column = "text") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    toks = tokens_col(text)
    words = STOPWORDS[lang]
    return F.size(
        F.filter(toks, lambda t: t.isin(*words))
    ).cast("long")


def blocklist_hits_col(words: list[str], text: str | Column = "text") -> Column:
    """Number of tokens that match a safety blocklist (C4-style "bad words"
    gate, Raffel et al. 2020 §2.2: documents with any blocklist token are
    dropped). Exact token-set membership over the whitespace tokens — the
    same algebra as :func:`stopword_hits_col`, so DuckDB replays it with
    len(list_filter(string_split(...), t -> t IN (...)))."""
    toks = tokens_col(text)
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")


def safety_gate(
    df: DataFrame,
    words: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> DataFrame:
    """Blocklist curation gate: per-document flagged-token count and a keep
    decision (``n_flagged <= max_hits``). Pure JVM expressions — a map-only
    projection with no shuffle at any corpus size."""
    return df.select(
        id_col,
        token_count_col(text).alias("n_tokens"),
        blocklist_hits_col(words, text).alias("n_flagged"),
        (blocklist_hits_col(words, text) <= max_hits).cast("int").alias("keep"),
    )


def quality_score_col(text: str | Column = "text") -> Column:
    """Deterministic quality score in [0,1]: blend of alpha ratio, token-length
    sanity (mean token length in [3,10]) and length saturation (≥ 20 tokens)."""
    n = token_count_col(text)
    mtl = mean_token_len_col(text)
    len_ok = F.when((mtl >= 3) & (mtl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    sat = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    return (alpha_ratio_col(text) * 0.5 + len_ok * 0.25 + sat * 0.25).cast("double")


def fingerprint_col(text: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the lowercased, punctuation-stripped,
    whitespace-collapsed text (content-defined identity for exact dedup)."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", ""), " +", " "))
    return F.md5(norm)


def token_hash32_col(tok: Column) -> Column:
    """Portable 32-bit token hash: first 8 hex chars of md5, as BIGINT — identical
    in Spark (conv) and DuckDB (CAST('0x'||… AS BIGINT)), used wherever signature
    bits must be oracle-checkable in pure SQL."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def token_simhash32(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "simhash32",
) -> DataFrame:
    """32-bit token SimHash, fully JVM-side with the SQL-portable md5 token
    hash: explode tokens → per-bit ±1 votes → majority bit. The relational
    twin of the packed-numpy kernel (functions/signatures.simhash_from_token_
    hashes), used where the signature must be DuckDB-checkable bit-for-bit."""
    toks = df.select(
        id_col, F.explode(F.split(F.lower(text_col), " ")).alias("tok")
    ).select(id_col, token_hash32_col(F.col("tok")).alias("h"))
    bits = toks.select(
        id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j")
    )
    votes = bits.groupBy(id_col, "j").agg(
        F.sum(F.expr("(shiftright(h, j) & 1) * 2 - 1")).alias("vote")
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(out_col)
    )


def lang_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc stopword-hit scores for each language + argmax prediction.

    Deterministic tie-break: highest score wins, ties to lexicographically first
    language code.
    """
    scored = df.select(
        id_col, *[stopword_hits_col(lang).alias(f"score_{lang}") for lang in sorted(STOPWORDS)]
    )
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"score_{code}") for code in langs])
    pred = F.lit(None).cast("string")
    for code in reversed(langs):
        pred = F.when(F.col(f"score_{code}") == best, F.lit(code)).otherwise(pred)
    return scored.withColumn("pred_lang", pred)


# PII scrubbing — the redaction pass of a web-scale corpus pipeline (emails and
# URLs masked before training, cf. the C4/RefinedWeb cleaning stages). Patterns
# are deliberately restricted to a regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB) so the scrub is oracle-checkable:
# character classes, +, {m,}, alternation-free.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
URL_RE = "https?://[^ ]+"


def scrub_pii(
    df: DataFrame, text: str = "text", out: str = "scrubbed"
) -> DataFrame:
    """Mask emails and URLs in ``text`` and count what was removed.

    Adds ``out`` (text with emails → ``<EMAIL>``, urls → ``<URL>``),
    ``n_emails``, ``n_urls``. Pure JVM regexp expressions — map-only, no
    shuffle, whole-stage codegen; at 100 TB this is a free rider on any
    existing scan. Emails are masked first so an address inside a URL query
    string is counted once as email, the remaining URL still as URL.
    """
    c = F.col(text)
    return (
        df.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"))
        .withColumn("n_urls", F.regexp_count(c, F.lit(URL_RE)).cast("long"))
        .withColumn(
            out,
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
            ),
        )
    )


# BPE-ish pre-tokenization: the GPT-2-style pre-tokenizer splits words /
# numbers / punctuation runs before byte-pair merges. The full GPT-2 pattern
# needs lookahead (unsupported in RE2), so this uses the portable core —
# letter runs, digit runs, single non-alnum-non-space marks — which gives the
# same token-budget estimate the pipeline needs for length filtering and
# cost accounting.
BPE_WORD_RE = "[a-z]+"
BPE_NUM_RE = "[0-9]+"
BPE_PUNCT_RE = "[^a-z0-9 ]"


def bpe_token_counts(df: DataFrame, text: str = "text") -> DataFrame:
    """Add n_words / n_nums / n_punct / n_bpe_tokens columns (lowercased
    input). Pure JVM regexp_count — map-only, codegen, shuffle-free."""
    c = F.lower(F.col(text))
    words = F.regexp_count(c, F.lit(BPE_WORD_RE)).cast("long")
    nums = F.regexp_count(c, F.lit(BPE_NUM_RE)).cast("long")
    punct = F.regexp_count(c, F.lit(BPE_PUNCT_RE)).cast("long")
    return (
        df.withColumn("n_words", words)
        .withColumn("n_nums", nums)
        .withColumn("n_punct", punct)
        .withColumn("n_bpe_tokens", words + nums + punct)
    )


# BM25 relevance scoring (Robertson & Spärck Jones; the Okapi BM25 form).
# The retrieval-side companion of the dedup pipeline: score every document
# against a term set for corpus triage / query-based subset extraction
# (e.g. "pull the k most on-topic docs per domain before training").
# Plan shape at 100 TB: one explode + two hash aggregations whose key spaces
# are (doc_id x |terms|) and |terms|; the per-term document frequencies and
# the global avgdl are tiny and broadcast back — no self-join, no window
# over the corpus.


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    topk: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by BM25 over ``terms``. Deterministic ties (score desc,
    id asc); idf = ln(1 + (N - df + .5)/(df + .5)) — the standard
    Lucene-style floor-free positive form.
    """
    toks = df.select(
        id_col, token_count_col(text).alias("dl"),
        F.explode(tokens_col(text)).alias("token"),
    ).where(F.col("token").isin(terms))
    tf = toks.groupBy(id_col, "dl", "token").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    avgdl = df.select(F.avg(token_count_col(text))).first()[0]
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = tf.join(F.broadcast(dfreq), "token").select(
        id_col,
        (
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / float(avgdl)))
        ).alias("s"),
    )
    return (
        per_term.groupBy(id_col)
        .agg(F.round(F.sum("s"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(topk)
    )


def unigram_nll(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc unigram negative log-likelihood under the corpus's own token
    distribution — the cheap stand-in for CCNet's LM-perplexity quality
    signal (Wenzek et al. 2020): gibberish and off-distribution docs score
    high, formulaic boilerplate scores low. ``nll = avg(-log2 cnt/total)``
    over the doc's tokens.

    Two bounded aggregations (token counts; per-doc sum over a broadcast
    frequency join) — the frequency table is vocabulary-sized, never
    row-sized. Adds ``nll`` (bits/token, rounded 4)."""
    toks = df.select(id_col, F.explode(tokens_col(text)).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = toks.count()
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(-F.log2(F.col("cnt") / F.lit(float(total)))), 4
            ).alias("nll")
        )
    )
    return df.join(scored, id_col, "left")


# URL canonicalization — the pre-dedup normalization every crawl pipeline runs
# (two fetches of the same page differ only by case, default port, tracking
# params, fragments, or a trailing slash). The rule set is the portable
# Java-regex/RE2 subset: character classes, alternation, anchors, ONE capture
# group per replace (Spark replacement syntax is `$1`, DuckDB's is `\1` — the
# oracle re-implements the same chain in its own dialect, which is exactly
# the independent-replay property the correctness gate wants).
_SCHEME_HOST_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_TRACKING = "(utm_[a-z0-9]+|fbclid|gclid)"


def canonicalize_url_col(url: str | Column = "url") -> Column:
    """Canonical form of a URL column: strip the fragment, lowercase the
    scheme+host (path/query case is significant, so it is preserved), drop
    default ports (http:80 / https:443), remove tracking query params
    (``utm_*``, ``fbclid``, ``gclid``), collapse a pre-query trailing slash,
    and strip trailing ``/`` and dangling ``?``. Pure JVM regexp chain —
    map-only, codegen, free on any scan."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")
    head = F.regexp_extract(u, _SCHEME_HOST_RE, 1)
    rest = F.regexp_extract(u, _SCHEME_HOST_RE + "(.*)$", 2)
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80([/?#])", "$1$2")
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80$", "$1")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443([/?#])", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443$", "$1")
    u = F.regexp_replace(u, _TRACKING + "=[^&#]*&", "")
    u = F.regexp_replace(u, "[?&]" + _TRACKING + "=[^&#]*$", "")
    u = F.regexp_replace(u, "/+\\?", "?")
    u = F.regexp_replace(u, "/+$", "")
    u = F.regexp_replace(u, "\\?$", "")
    return u


def url_domain_col(canon: Column) -> Column:
    """Registered domain (last two host labels) of a canonicalized URL."""
    host = F.regexp_extract(canon, "://([^/:?#]+)", 1)
    return F.regexp_extract(host, "[^.]+\\.[^.]+$", 0)


# ---------------------------------------------------------------------------
# HTML boilerplate extraction (C4/RefinedWeb first step: crawl HTML → text)
# ---------------------------------------------------------------------------
# The patterns stick to the portable regex core (inline (?is) flags,
# non-greedy spans, character classes — no lookahead/backrefs), so the same
# chain runs under Java regex (Spark) and RE2 (DuckDB) — the scrub_pii
# two-dialect cross-check pattern. Entity decode order matters: named
# entities first, &amp; LAST, so "&amp;lt;" single-decodes to the literal
# "&lt;" instead of double-decoding to "<".
_HTML_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_HTML_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_HTML_BREAK_RE = r"(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>"
_HTML_TAG_RE = r"<[^>]*>"
_HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", "\""),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must stay last
)


def extract_html_text(
    df: DataFrame,
    html: str = "html",
    out: str = "extracted",
    min_alpha: int = 10,
) -> DataFrame:
    """Crawl-HTML → training text: drop script/style blocks, convert block
    closers to line breaks, strip remaining tags, decode the common entities,
    then keep only lines with ≥ ``min_alpha`` alphabetic characters (the
    jusText/C4 "short lines are boilerplate" rule — nav bars, copyright
    footers, button labels all die here).

    Adds ``out`` (newline-joined kept lines, runs of spaces collapsed),
    ``n_lines_kept`` and ``n_lines_total`` (non-empty pre-filter lines).
    Pure JVM regexp/array expressions — map-only, shuffle-free, whole-stage
    codegen; at 100 TB this rides the ingest scan for free. Reference anchor:
    the reference consumes pre-extracted text (UnparsedFile,
    CompressedWARCReader.h:27-81) — this supplies that step natively."""
    c = F.col(html)
    c = F.regexp_replace(c, _HTML_SCRIPT_RE, " ")
    c = F.regexp_replace(c, _HTML_STYLE_RE, " ")
    c = F.regexp_replace(c, _HTML_BREAK_RE, "\n")
    c = F.regexp_replace(c, _HTML_TAG_RE, " ")
    for ent, rep in _HTML_ENTITIES:
        # entity strings contain no regex metacharacters — used verbatim
        c = F.regexp_replace(c, ent, rep)
    lines = F.split(c, "\n")
    nonempty = F.filter(lines, lambda x: F.length(F.trim(x)) > 0)
    kept = F.filter(
        lines,
        lambda x: F.length(F.regexp_replace(x, "[^A-Za-z]", "")) >= min_alpha,
    )
    cleaned = F.transform(
        kept, lambda x: F.trim(F.regexp_replace(x, "[ \t]+", " "))
    )
    return (
        df.withColumn("n_lines_total", F.size(nonempty).cast("long"))
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn(out, F.array_join(cleaned, "\n"))
    )
