"""Distributed BPE tokenizer training (Sennrich et al. ACL 2016) — the
vocabulary-induction step of a training-data pipeline, run as iterative
DataFrame algebra at corpus scale.

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus: tokenize
the corpus once, count each distinct word (one bounded groupBy — at 100 TB the
distinct-word table is sharded but many orders smaller than the corpus), then
iterate: (1) count adjacent symbol pairs weighted by word frequency, (2) take
the most frequent pair, (3) merge its greedy leftmost non-overlapping
occurrences inside every word. Each iteration is:

* **pair counting** — a pure-map ``transform(sequence(...))`` explode over the
  symbol arrays followed by one bounded ``groupBy(left, right)``; key space =
  active pair vocabulary, so map-side partial aggregation bounds every task.
  NO window, NO join.
* **argmax** — tiny global agg (``orderBy(cnt desc, left, right).limit(1)``),
  the algorithm's inherent sequential dependency; the driver holds ONE pair
  per step (same shape as the dense k-means driver loop,
  operators/dense.py:kmeans_dense).
* **merge application** — a word-local fold expressed with the ``aggregate``
  higher-order function: ZERO shuffle, pure whole-stage-codegen map. Words
  that cannot contain the pair (``array_contains`` pre-filter) are passed
  through untouched, so late iterations rewrite only the shrinking subset of
  affected words.

Greedy semantics match the standard implementation: occurrences merge left to
right without overlap ("aaaa" + merge (a,a) -> "aa","aa", not three
overlapping pairs), while COUNTING sees every adjacent position ("aaa"
contributes (a,a) twice), exactly like the original ACL16 reference code.

The DuckDB oracle replays every iteration with an INDEPENDENT algebra —
gaps-and-islands windows (match runs by pos - row_number, odd parity = merged)
instead of a fold — the two-implementations cross-check pattern used for
scrub_pii (RE2 vs Java regex).

Reference tie-in: the reference's text side stops at term extraction
(TermIndexer in /root/reference/java — tokenization for TopSig input); BPE
training is the modern vocabulary-induction analogue, a target add like
MinHash/SimHash (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END_TOKEN = "·"  # end-of-word marker appended to every symbol sequence


def word_corpus(
    df: DataFrame, text_col: str = "text", end_token: str = END_TOKEN
) -> DataFrame:
    """Corpus -> (word, freq, syms): distinct lowercased whitespace words with
    corpus frequencies; syms = the word's characters + the end-of-word marker.

    Chars come from ``transform(sequence(1, length), i -> substr(word, i, 1))``
    — the exact expression the SQL oracle uses, so the initial state is
    engine-independent by construction.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
    ).where(F.length("word") > 0)
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms",
            F.concat(
                F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
                F.array(F.lit(end_token)),
            ),
        )
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts weighted by word frequency — every adjacent
    position counts (overlaps included), per the reference BPE counting rule.
    Pure map explode + one bounded groupBy."""
    # size guard: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
    # a fully-merged single-symbol word must not emit a phantom pair
    pairs = words.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS left, syms[i] AS right))"
            )
        ).alias("p"),
    )
    return (
        pairs.select("freq", "p.left", "p.right")
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(words: DataFrame, left: str, right: str) -> DataFrame:
    """Merge greedy leftmost non-overlapping (left, right) occurrences in every
    word's symbol array — a word-local fold via the ``aggregate`` HOF: zero
    shuffle. Words that cannot contain the pair pass through untouched."""
    l_lit, r_lit = _sql_str(left), _sql_str(right)
    merged = _sql_str(left + right)
    fold = f"""
        aggregate(
            syms,
            struct(cast(array() AS array<string>) AS out, cast(NULL AS string) AS pend),
            (acc, s) -> CASE
                WHEN acc.pend IS NULL THEN struct(acc.out AS out, s AS pend)
                WHEN acc.pend = {l_lit} AND s = {r_lit}
                    THEN struct(concat(acc.out, array({merged})) AS out,
                                cast(NULL AS string) AS pend)
                ELSE struct(concat(acc.out, array(acc.pend)) AS out, s AS pend)
            END,
            acc -> CASE WHEN acc.pend IS NULL THEN acc.out
                        ELSE concat(acc.out, array(acc.pend)) END)
    """
    can_hit = F.array_contains("syms", left) & F.array_contains("syms", right)
    return words.withColumn(
        "syms", F.when(can_hit, F.expr(fold)).otherwise(F.col("syms"))
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    end_token: str = END_TOKEN,
) -> DataFrame:
    """Apply a trained merge list → per-document token counts.

    The tokenizer-APPLY step (the cost model every data-budget decision keys
    on). Merges are applied in training order to the DISTINCT-WORD table —
    bounded at any corpus size, many orders smaller than the corpus — then one
    equi-join maps every document word to its encoded length and one groupBy
    rolls up the doc totals. ``n_tokens`` counts the end-of-word marker, so a
    word that survives unmerged costs ``len(word) + 1`` (standard '</w>'
    accounting).

    Zero shuffles beyond the word-table groupBy, the broadcast-able word join,
    and the final doc rollup; merge application itself is the same
    whole-stage-codegen fold as training (``apply_merge``)."""
    words = word_corpus(df, text_col, end_token)
    for _step, l, r, _m, _c in merges:
        words = apply_merge(words, l, r)
    word_costs = words.select("word", F.size("syms").alias("n_toks"))
    doc_words = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
    ).where(F.length("word") > 0)
    return (
        doc_words.join(word_costs, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    end_token: str = END_TOKEN,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE iterations; returns (merge table, final words).

    Merge table rows: (step, left, right, merged, cnt). Argmax tie rule:
    highest count, then left asc, then right asc — deterministic at any
    partitioning. Each round persists the rewritten word table and unpersists
    the previous one (the iterative-lineage discipline of the EM loop,
    operators/emtree.py)."""
    words = word_corpus(df, text_col, end_token).persist()
    words.count()
    merges: list[tuple[int, str, str, str, int]] = []
    prev = words
    for step in range(n_merges):
        top = (
            pair_counts(prev)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        l, r, c = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((step, l, r, l + r, c))
        nxt = apply_merge(prev, l, r).persist()
        nxt.count()
        prev.unpersist()
        prev = nxt
    return merges, prev
