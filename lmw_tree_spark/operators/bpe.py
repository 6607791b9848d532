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


def _greedy_merge(syms: list, left: str, right: str) -> list:
    """Greedy leftmost non-overlapping merge of (left, right) in one word —
    the driver-side twin of the ``aggregate`` fold in :func:`apply_merge`."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _word_pairs_df(words: DataFrame) -> DataFrame:
    """(word, left, right) — every adjacent symbol pair of every word."""
    return words.where(F.size("syms") >= 2).select(
        "word",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] AS left, syms[i] AS right))"
            )
        ).alias("p"),
    ).select("word", "p.left", "p.right")


def _bpe_train_distributed(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Fallback trainer: one (pair-count, argmax, merge) Spark round per merge
    — n sequential bounded jobs instead of driver-side state, for word tables
    too large to collect. Lineage is cut periodically so the plan doesn't
    grow by one fold per merge."""
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["cnt"]) < 2:
            break
        l, r, c = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((step, l, r, l + r, c))
        words = apply_merge(words, l, r)
        if (step + 1) % 8 == 0:
            words = words.localCheckpoint(eager=True)
    return merges, words


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    end_token: str = END_TOKEN,
    max_driver_words: int = 5_000_000,
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE iterations; returns (merge table, final words).

    Merge table rows: (step, left, right, merged, cnt). Argmax tie rule:
    highest count, then left asc, then right asc — deterministic at any
    partitioning.

    Scale shape: ONE distributed aggregation (``word_corpus`` — the only part
    that touches the corpus) produces the distinct-word frequency table,
    which is then PRE-PRUNED distributed-side before anything reaches the
    driver: only words containing at least one pair with corpus count ≥ 2
    ("viable" words) can ever be rewritten by a merge, so the heavy tail a
    web corpus carries (URLs, hashes, code, typos — freq-1 words whose pairs
    are unique to them) never leaves the cluster. The prune is EXACT, not a
    heuristic: merged symbols are always ≥ 2 chars, so a pruned word's
    single-char pairs can never gain count from merges elsewhere, its pairs
    stay < 2 forever, and no chosen merge (count ≥ 2) can occur in it —
    equivalently, pruned and viable words share no pairs at all, so pair
    counts over viable words alone are the full-corpus counts.

    The pruned viable table is collected (guarded by ``max_driver_words``)
    and the merge loop runs driver-side with incremental pair-count updates
    and a lazy-deletion max-heap — zero cluster round-trips per merge, so a
    32k-merge vocabulary costs one Spark job instead of 32k sequential jobs
    (the classic Sennrich/HF/SentencePiece trainer shape). If the viable
    table still exceeds ``max_driver_words``, training degrades gracefully
    to :func:`_bpe_train_distributed` (one bounded Spark round per merge)
    instead of risking a driver OOM. The encode join (:func:`bpe_encode`)
    stays fully distributed either way.

    Heap argmax is O(log P) amortized per count change; applying a merge
    touches only the words currently containing the pair adjacently (inverted
    index pair -> word ids), so late iterations rewrite only the shrinking
    affected subset — same asymptotics as the reference ACL16 trainer."""
    import heapq

    spark = df.sparkSession
    # materialize the bounded word table once — it feeds the viability pass,
    # the split, and (on the fallback path) the per-merge loop
    wc = word_corpus(df, text_col, end_token).localCheckpoint(eager=True)
    viable_pairs = pair_counts(wc).where(F.col("cnt") >= 2).select("left", "right")
    viable_words = (
        _word_pairs_df(wc).join(viable_pairs, ["left", "right"]).select("word").distinct()
    )
    tracked = wc.join(viable_words, "word", "semi").localCheckpoint(eager=True)
    pruned = wc.join(viable_words, "word", "anti").select("word", "freq", "syms")

    if tracked.count() > max_driver_words:
        merges, out_tracked = _bpe_train_distributed(tracked, n_merges)
        return merges, out_tracked.select("word", "freq", "syms").unionByName(pruned)

    rows = tracked.collect()
    names = [r["word"] for r in rows]
    freqs = [int(r["freq"]) for r in rows]
    vocab = [list(r["syms"]) for r in rows]

    def word_pairs(s):
        return [(s[i], s[i + 1]) for i in range(len(s) - 1)]

    pc: dict = {}          # pair -> corpus count (overlap-inclusive)
    occ: dict = {}         # pair -> set of word ids with an adjacent occurrence
    for wi, s in enumerate(vocab):
        f = freqs[wi]
        for p in word_pairs(s):
            pc[p] = pc.get(p, 0) + f
            occ.setdefault(p, set()).add(wi)
    heap = [(-c, l, r) for (l, r), c in pc.items()]
    heapq.heapify(heap)

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(n_merges):
        # pop lazily-deleted entries until the top matches the live count
        best = None
        while heap:
            negc, l, r = heap[0]
            if pc.get((l, r), 0) == -negc:
                best = (l, r, -negc)
                break
            heapq.heappop(heap)
        if best is None or best[2] < 2:
            break
        l, r, c = best
        merges.append((step, l, r, l + r, c))
        for wi in sorted(occ.get((l, r), ())):
            f, old = freqs[wi], vocab[wi]
            new = _greedy_merge(old, l, r)
            vocab[wi] = new
            op, np_ = word_pairs(old), word_pairs(new)
            delta: dict = {}
            for p in op:
                delta[p] = delta.get(p, 0) - f
            for p in np_:
                delta[p] = delta.get(p, 0) + f
            for p, d in delta.items():
                if d == 0:
                    continue
                nc = pc.get(p, 0) + d
                if nc <= 0:
                    pc.pop(p, None)
                else:
                    pc[p] = nc
                    heapq.heappush(heap, (-nc, p[0], p[1]))
            ops, nps = set(op), set(np_)
            for p in ops - nps:
                occ.get(p, set()).discard(wi)
            for p in nps - ops:
                occ.setdefault(p, set()).add(wi)

    out = spark.createDataFrame(
        list(zip(names, freqs, vocab)), "word string, freq bigint, syms array<string>"
    )
    # pruned words are provably never rewritten — return them untouched
    return merges, out.unionByName(pruned)
