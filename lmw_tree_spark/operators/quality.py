"""Gopher-style document quality / repetition filters.

Per-document repetition metrics and a composite keep/drop decision, the
standard pre-training corpus filter family (Rae et al. 2021, "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher", appendix A1.1).
The reference engine has no equivalent — this is part of the training-data
pipeline surface layered on top of its dedup/clustering core (the reference's
text handling stops at signature extraction, cf.
/root/reference/src/lmw/StdIncludes.h string utils).

Scale notes (100 TB design):
  * ``dup_gram_frac`` and ``mean_tok_len`` are computed entirely map-side with
    array higher-order functions — zero shuffle, whole-stage codegen.
  * ``top_tok_frac`` needs the per-document token mode, which arrays can't
    express without O(n·d) rescans, so it uses explode → two-level groupBy.
    Both aggregations partial-combine map-side; shuffle keys are
    (doc_id, token) then doc_id — per-document cardinality, never
    corpus-global, so no hot keys regardless of corpus skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _clean_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens with empties dropped (parity contract with
    the DuckDB oracle: string_split + ``tok <> ''``)."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def repetition_stats(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    max_top_tok_frac: float = 0.18,
    max_dup_gram_frac: float = 0.05,
    min_tokens: int = 8,
    mean_tok_len_bounds: tuple[float, float] = (3.0, 10.0),
) -> DataFrame:
    """Per-document repetition/shape metrics + composite ``keep`` decision.

    Output columns: (id_col, n_tokens long, top_tok_frac double,
    dup_gram_frac double, mean_tok_len double, keep int). Fractions are
    rounded to 4 digits so the driver's value hash is float-noise-proof.

    ``top_tok_frac``  — count of the most frequent token / n_tokens
                        (boilerplate / keyword-stuffing detector).
    ``dup_gram_frac`` — fraction of word-``ngram``-grams that are repeats of
                        an earlier gram in the same document (within-document
                        repetition, the Gopher "duplicate n-gram" rule).
    ``keep``          — 1 iff all thresholds pass.
    """
    toks = df.select(F.col(id_col), _clean_tokens(F.col(text)).alias("toks"))

    # map-side metrics: no shuffle, pure whole-stage-codegen array ops
    n = F.size("toks")
    n_grams = n - ngram + 1
    grams = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {ngram} + 1, 0)),"
        f" k -> array_join(slice(toks, k, {ngram}), ' '))"
    )
    char_sum = F.aggregate(
        "toks", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    mapside = toks.select(
        id_col,
        n.cast("long").alias("n_tokens"),
        F.when(
            n_grams > 0,
            (n_grams - F.size(F.array_distinct(grams))).cast("double") / n_grams,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_gram_frac"),
        (char_sum.cast("double") / n).alias("mean_tok_len"),
    )

    # token mode: explode → (doc, token) counts → per-doc max; both stages
    # partial-aggregate map-side, keys bounded by per-document vocabulary
    top = (
        toks.select(id_col, F.explode("toks").alias("tok"))
        .groupBy(id_col, "tok")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("top_c"))
    )

    lo, hi = mean_tok_len_bounds
    out = mapside.join(top, id_col)
    keep = (
        (F.col("top_c") / F.col("n_tokens") <= max_top_tok_frac)
        & (F.col("dup_gram_frac") <= max_dup_gram_frac)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_tok_len") >= lo)
        & (F.col("mean_tok_len") <= hi)
    )
    return out.select(
        id_col,
        "n_tokens",
        F.round(F.col("top_c") / F.col("n_tokens"), 4).alias("top_tok_frac"),
        F.round("dup_gram_frac", 4).alias("dup_gram_frac"),
        F.round("mean_tok_len", 4).alias("mean_tok_len"),
        keep.cast("int").alias("keep"),
    )


def affix_strip(
    df: DataFrame,
    k: int = 3,
    min_doc_freq: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate affix mining + strip: a ``k``-token prefix or suffix
    recurring across ``min_doc_freq`` or more distinct documents is template
    chrome ("stock photo of …", "… courtesy getty images") — mine it
    corpus-wide and strip it, keeping the content core. The single-line
    caption counterpart of ``line_dedup`` (captions have no line structure,
    so boilerplate lives in their affixes), the RefinedWeb/alt-text-cleanup
    shape.

    Rules (all on the ORIGINAL token list, so the two strips compose
    deterministically): an affix is only measured when the document has more
    than ``k`` tokens (stripping must leave content); a mined suffix strips
    only if the prefix doesn't strip OR ``n >= 2k+1`` (both strips must leave
    at least one token). Output: (id_col, stripped_text, n_tokens, pre_hit,
    suf_hit).

    Scale shape: two groupBy's over k-token affix strings (hot affixes cost
    one reduce key each — partial aggregation absorbs the skew that makes
    them boilerplate in the first place), the mined-template tables are tiny
    by construction (≤ docs / min_doc_freq rows) so AQE broadcasts the joins
    back; everything else is whole-stage-codegen array algebra."""
    toks = df.select(
        F.col(id_col).alias("id"), _clean_tokens(F.col(text)).alias("toks")
    )
    n = F.size("toks")
    base = toks.select(
        "id",
        "toks",
        n.alias("n"),
        F.when(n >= k + 1, F.concat_ws(" ", F.slice("toks", 1, k))).alias("pre"),
        F.when(n >= k + 1, F.concat_ws(" ", F.slice("toks", -k, k))).alias("suf"),
    )

    def mined(col: str) -> DataFrame:
        return (
            base.where(F.col(col).isNotNull())
            .groupBy(col)
            .agg(F.count_distinct("id").alias("docf"))
            .where(F.col("docf") >= min_doc_freq)
            .select(col, F.lit(1).alias(f"{col}_m"))
        )

    hit = base.join(mined("pre"), "pre", "left").join(mined("suf"), "suf", "left")
    pre_hit = F.coalesce("pre_m", F.lit(0))
    suf_hit = F.when(
        (F.coalesce("suf_m", F.lit(0)) == 1)
        & ((pre_hit == 0) | (F.col("n") >= 2 * k + 1)),
        1,
    ).otherwise(0)
    out = hit.select(
        "id",
        "toks",
        "n",
        pre_hit.alias("pre_hit"),
        suf_hit.alias("suf_hit"),
    )
    start = 1 + F.lit(k) * F.col("pre_hit")
    length = F.col("n") - F.lit(k) * (F.col("pre_hit") + F.col("suf_hit"))
    return out.select(
        F.col("id").alias(id_col),
        F.concat_ws(" ", F.slice("toks", start, length)).alias("stripped_text"),
        F.col("n").cast("long").alias("n_tokens"),
        "pre_hit",
        "suf_hit",
    )


def line_dedup(
    df: DataFrame,
    min_doc_freq: int = 2,
    text: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Line-level (sentence-level) deduplication: drop every line that occurs
    in ``min_doc_freq`` or more distinct documents, keep the rest in original
    order — the CCNet / RefinedWeb boilerplate-removal pass (Wenzek et al.
    2020 dedup paragraphs by hash across shards; headers/footers/navigation
    chrome repeat across pages while real content does not).

    Returns (id, kept_text, n_lines, n_removed) with ``kept_text`` the
    surviving lines re-joined by ``sep`` in their original positions.

    Scale shape: posexplode → line-keyed count-distinct → semi-join back →
    per-document re-aggregation. Shuffle keys are the line value then the
    document id; partial aggregation bounds the count-distinct, and a hot
    (boilerplate) line costs one reduce key, not a pair explosion. At corpus
    scale the line key would be ``xxhash64(line)`` (64-bit, collision-safe at
    10^12 lines) to cut shuffle width — kept as the raw string here so the
    decision algebra stays engine-independent for the oracle.
    """
    parts = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text), sep, -1)).alias("pos", "line"),
    )
    freq = parts.groupBy("line").agg(F.count_distinct("id").alias("docf"))
    kept = parts.join(freq.where(F.col("docf") < min_doc_freq).select("line"), "line")
    agg = kept.groupBy("id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("kept_text"),
        F.count("*").alias("n_kept"),
    )
    totals = parts.groupBy("id").agg(F.count("*").alias("n_lines"))
    return totals.join(agg, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
    )


def decontaminate_spans(
    docs: DataFrame,
    evals: DataFrame,
    ngram: int = 8,
    mask: str = "<MASK>",
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level benchmark decontamination: mask every token covered by a
    word ``ngram``-gram that also appears in the eval set, keeping the rest
    of the document (the surgical alternative to contamination_pairs'
    drop-the-whole-doc policy — PaLM/Llama-style n-gram scrubbing).

    Plan: eval grams are a distinct, bounded set (broadcast); training docs
    explode to one row per window start, equi-join the gram set, and each hit
    marks positions ``p..p+n-1``. Rebuild = left-join mask positions +
    ordered re-aggregation (same shape as line_dedup's reassembly). All JVM
    (slice/array_join/explode); output adds ``masked_text`` and ``n_masked``.
    """
    from pyspark.sql import functions as F

    toks = F.split(F.lower(F.col(text)), " ")
    empty = F.array().cast("array<int>")
    starts_of = lambda arr: F.when(
        F.size(arr) >= ngram, F.sequence(F.lit(0), F.size(arr) - ngram)
    ).otherwise(empty)
    egrams = (
        evals.select(F.explode(
            F.transform(
                starts_of(toks),
                lambda p: F.array_join(F.slice(toks, p + 1, ngram), " "),
            )
        ).alias("gram")).distinct()
    )
    base = docs.select(id_col, toks.alias("toks"))
    starts = base.select(
        id_col,
        F.explode(starts_of(F.col("toks"))).alias("p"),
        F.col("toks"),
    ).select(
        id_col, "p", F.array_join(F.slice("toks", F.col("p") + 1, ngram), " ").alias("gram")
    )
    hits = starts.join(F.broadcast(egrams), "gram").select(id_col, "p")
    masked_pos = hits.select(
        id_col, F.explode(F.sequence("p", F.col("p") + ngram - 1)).alias("i")
    ).distinct()
    tok_rows = base.select(id_col, F.posexplode("toks").alias("i", "tok"))
    rebuilt = (
        tok_rows.join(masked_pos.withColumn("m", F.lit(1)), [id_col, "i"], "left")
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", F.when(F.col("m") == 1, mask)
                                                .otherwise(F.col("tok")).alias("t")))
                    ),
                    lambda s: s["t"],
                ),
                " ",
            ).alias("masked_text"),
            F.sum(F.when(F.col("m") == 1, 1).otherwise(0)).cast("long").alias("n_masked"),
        )
    )
    return docs.join(rebuilt, id_col, "left")


def domain_quality_gate(
    df: DataFrame,
    domain_col: str = "domain",
    quality_col: str = "quality",
    min_docs: int = 2,
    min_quality: float = 0.5,
    blocklist: DataFrame | None = None,
) -> DataFrame:
    """Domain-level curation gate — the UT1-blocklist + domain-reputation step
    of C4/RefinedWeb (Penedo et al. 2023 §3.1): a registered domain survives
    only if it (a) is not on the blocklist, (b) has at least ``min_docs``
    documents, and (c) its mean per-document quality clears ``min_quality``.
    Returns ONE row per domain: ``n_docs``, ``avg_quality`` (rounded to 4
    decimals so the float never decides a hash comparison by an ulp), and the
    ``kept`` decision — join it back to the corpus to apply the gate.

    The decision compares the ROUNDED mean against the threshold, so any
    engine that replays the same round() reproduces the decision bit-for-bit.

    Scale shape: one groupBy(domain) with map-side partial aggregation
    (#domains ~ 10^8 at web scale — a fine shuffle key, no hot rows since the
    agg collapses per-domain volume), plus one broadcast anti-join against the
    blocklist (blocklists are ~10^6 rows, always broadcastable)."""
    stats = df.groupBy(domain_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg(quality_col), 4).alias("avg_quality"),
    )
    if blocklist is not None:
        stats = stats.join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("_blk")).distinct()),
            stats[domain_col] == F.col("_blk"),
            "left",
        ).withColumn("_blocked", F.col("_blk").isNotNull()).drop("_blk")
    else:
        stats = stats.withColumn("_blocked", F.lit(False))
    return stats.select(
        domain_col,
        "n_docs",
        "avg_quality",
        (
            (~F.col("_blocked"))
            & (F.col("n_docs") >= min_docs)
            & (F.col("avg_quality") >= min_quality)
        ).alias("kept"),
    )


def corpus_drift(
    v1: DataFrame,
    v2: DataFrame,
    text: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Token-distribution drift between two corpus builds — the release-gate
    metric a training-data pipeline checks before swapping corpus versions
    (did the new crawl/filters shift the language?): exact total-variation
    distance ``TV = ½ Σ_t |p1(t) − p2(t)|`` plus the top-k drifting tokens.

    Shares are never formed as floats: the per-token term is the cross-
    multiplied ``|n1·N2 − n2·N1|`` in DECIMAL(38,0) — exact at 10^13-token
    corpora where an int64 product would overflow — and only the final
    report columns divide (deterministically, double ÷ double) and round.
    Scale shape: one explode + one groupBy per version (partial-agg token
    counts), a full-outer equi-join on token, two scalar totals, and a
    global top-k (TakeOrdered) — no windows, no driver data beyond k rows
    and two longs. Complements ``plans/checkpoint.snapshot_diff`` (row-level
    CDC) with distribution-level CDC."""
    from lmw_tree_spark.functions.text import tokens_col

    def counts(df: DataFrame) -> DataFrame:
        return (
            df.select(F.explode(tokens_col(text)).alias("tok"))
            .where(F.length("tok") > 0)
            .groupBy("tok")
            .agg(F.count("*").alias("n"))
        )

    # each count table feeds both its total and the join — persist the
    # vocabulary-sized aggregates instead of re-exploding the corpus
    c1 = counts(v1).withColumnRenamed("n", "n1").persist()
    c2 = counts(v2).withColumnRenamed("n", "n2").persist()
    t1 = int(c1.agg(F.sum("n1")).first()[0] or 0)
    t2 = int(c2.agg(F.sum("n2")).first()[0] or 0)
    j = (
        c1.join(c2, "tok", "full")
        .select(
            "tok",
            F.coalesce("n1", F.lit(0)).cast("long").alias("n1"),
            F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
        )
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("n1").cast(dec) * F.lit(t2).cast(dec)
        - F.col("n2").cast(dec) * F.lit(t1).cast(dec)
    )
    scored = j.withColumn("drift_num", num)
    tv_num = scored.agg(F.sum("drift_num")).first()[0]
    denom = float(t1) * float(t2)
    # final rounding happens in Spark (HALF_UP == DuckDB's away-from-zero for
    # positive values); Python round() is banker's and would diverge at ties
    tv_raw = (float(tv_num) / (2.0 * denom)) if denom else 0.0
    return (
        scored.orderBy(F.desc("drift_num"), F.asc("tok"))
        .limit(top_k)
        .select(
            "tok",
            "n1",
            "n2",
            F.round(F.col("drift_num").cast("double") / F.lit(denom), 8).alias(
                "share_drift"
            ),
            F.round(F.lit(tv_raw), 8).alias("tv_total"),
        )
    )


def curation_funnel(
    docs: DataFrame,
    blocklist: list[str],
    text: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 20,
) -> DataFrame:
    """Composed corpus-curation funnel: exact-dedup survivor -> blocklist
    safety gate -> quality-score floor -> minimum-length gate, reported as one
    row per stage with (stage_ord, stage, n_in, n_kept).

    This is the report every training-data pipeline publishes with a release
    (C4 / RefinedWeb / Gopher each document per-filter removal counts). Each
    stage reuses the exact algebra of its standalone operator (fingerprint_col,
    blocklist_hits_col, quality_score_col, token_count_col), so the funnel is
    consistent with the per-document queries and the whole thing is one
    fingerprint groupBy plus map-side flags — a single shuffle at any corpus
    size, then a 4-row aggregate.
    """
    from pyspark.sql import Window

    from lmw_tree_spark.functions.text import (
        blocklist_hits_col,
        fingerprint_col,
        quality_score_col,
        token_count_col,
    )

    flags = docs.select(
        F.col(id_col),
        fingerprint_col(text).alias("fp"),
        (blocklist_hits_col(blocklist, text) == 0).cast("int").alias("safe"),
        (quality_score_col(text) >= min_quality).cast("int").alias("hq"),
        (token_count_col(text) >= min_tokens).cast("int").alias("lenok"),
    )
    # survivor = lowest id per fingerprint group (exact_dedup's canonical rule)
    w = Window.partitionBy("fp")
    k = flags.select(
        (F.col(id_col) == F.min(id_col).over(w)).cast("int").alias("k1"),
        "safe",
        "hq",
        "lenok",
    ).select(
        "k1",
        (F.col("k1") * F.col("safe")).alias("k2"),
        (F.col("k1") * F.col("safe") * F.col("hq")).alias("k3"),
        (F.col("k1") * F.col("safe") * F.col("hq") * F.col("lenok")).alias("k4"),
    )
    agg = k.agg(
        F.count("*").cast("long").alias("n0"),
        F.sum("k1").cast("long").alias("n1"),
        F.sum("k2").cast("long").alias("n2"),
        F.sum("k3").cast("long").alias("n3"),
        F.sum("k4").cast("long").alias("n4"),
    )
    # one aggregate row -> 4 stage rows via inline(): the scan+shuffle runs
    # ONCE (a unionAll of four selects over agg would re-run the whole plan
    # per branch)
    stages = [
        (1, "exact_dedup", "n0", "n1"),
        (2, "safety", "n1", "n2"),
        (3, "quality", "n2", "n3"),
        (4, "length", "n3", "n4"),
    ]
    structs = F.array(
        *[
            F.struct(
                F.lit(ord_).cast("long").alias("stage_ord"),
                F.lit(name).alias("stage"),
                F.col(nin).alias("n_in"),
                F.col(nkept).alias("n_kept"),
            )
            for ord_, name, nin, nkept in stages
        ]
    )
    return agg.select(F.inline(structs))
