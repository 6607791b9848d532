"""Deterministic stratified sampling — corpus shaping by per-stratum quota.

The standard step between dedup and training-set assembly: downsample each
source/language/quality stratum to a target fraction. Unlike ``df.sample`` /
``df.sampleBy`` (partition-RNG-based: results change with partitioning, task
retries, and cluster size), selection here is a pure function of
``(id, salt)`` — a cryptographic-hash threshold test. That determinism is what
makes a 100-TB corpus build reproducible and lets resumable/incremental shards
(operators/dedup.minhash_dedup_against_corpus) sample consistently with the
base corpus.

Mechanism: keep a row iff the first 8 hex digits of ``md5(id:salt)`` compare
below the stratum's threshold ``hex(floor(fraction * 16^8))``. Fixed-width
lowercase-hex string comparison equals the numeric comparison, and both Spark
and any SQL engine with ``md5`` reproduce it bit-for-bit — no float rounding,
no RNG. Pure map stage: no shuffle, predicate-pushdown-friendly, scales
embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16**8


def _thresholds(fractions: dict[str, float]) -> dict[str, str]:
    """Per-stratum 8-hex-digit keep thresholds (clamped to [0, 1])."""
    out = {}
    for k, frac in fractions.items():
        n = int(max(0.0, min(1.0, frac)) * _HEX_SPACE)
        out[k] = format(min(n, _HEX_SPACE - 1), "08x") if n < _HEX_SPACE else "g"
        # "g" > "f..." lexicographically -> fraction 1.0 keeps everything
    return out


def sample_hash_col(id_col: Column, salt: int = 0) -> Column:
    """The 8-hex-digit deterministic sampling key for a row id."""
    return F.substring(
        F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(str(salt)))), 1, 8
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``fractions[s]``,
    deterministically in ``(id, salt)``. Strata absent from ``fractions``
    are dropped (quota 0)."""
    thr = _thresholds(fractions)
    mapping = F.create_map(
        *[lit for k, v in sorted(thr.items()) for lit in (F.lit(k), F.lit(v))]
    )
    keep = sample_hash_col(F.col(id_col), salt) < mapping[F.col(strata_col)]
    return df.where(F.coalesce(keep, F.lit(False)))


def stratified_sample_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
) -> str:
    """The equivalent ANSI-SQL predicate (DuckDB oracle parity helper)."""
    thr = _thresholds(fractions)
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN '{v}'" for k, v in sorted(thr.items())
    )
    return (
        f"SELECT * FROM {table} WHERE "
        f"substr(md5({id_col}::VARCHAR || ':{salt}'), 1, 8) "
        f"< (CASE {cases} ELSE '' END)"
    )


def domain_cap(
    df: DataFrame,
    domain_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Per-domain fairness cap — the crawl-pipeline step that stops one hot
    host from dominating the corpus (C4 and RefinedWeb both cap documents per
    registered domain after URL canonicalization). Keeps at most ``cap`` rows
    per domain, chosen by deterministic (md5 hash, id) rank so membership is
    reproducible across partitioning/retries/cluster size — the same rank
    kernel as ``stratified_sample``/``mixture_sample``, with a FIXED per-
    stratum quota instead of a fraction or data-dependent share.

    Scale shape: one window partitioned by domain — skew equals domain skew,
    which is exactly the distribution being capped; a domain with 10^9 rows
    is the pathological case, so above ``cap * 4096`` rows pre-thin with
    ``stratified_sample`` on the hot domains first."""
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            sample_hash_col(F.col(id_col), salt), F.col(id_col)
        )
    )
    return df.withColumn("_rn", rank).where(F.col("_rn") <= cap).drop("_rn")


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    total: int,
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Temperature-rebalanced corpus mixing (the Llama/mC4-style step that
    upsamples low-resource strata): per-stratum quotas proportional to
    ``sqrt(n_s)`` (temperature alpha = 0.5), filled by deterministic hash
    rank — reproducible across partitioning/retries/cluster size like
    ``stratified_sample``, but with DATA-DEPENDENT quotas.

    All quota algebra is integer so any engine reproduces the exact row set:
    ``w_s = floor(sqrt(n_s))`` (IEEE sqrt is correctly rounded, so floor is
    engine-stable), ``quota_s = (total * w_s) div (sum_s w_s)``, and each
    stratum keeps its ``quota_s`` lowest ``(md5 hash, id)`` rows. No float
    crosses a comparison. Scale shape: one bounded groupBy (#strata rows),
    one broadcast join, one per-stratum window — the window partitions by
    stratum, so skew equals stratum skew; at extreme per-stratum row counts
    pre-filter with ``stratified_sample`` first."""
    from pyspark.sql import Window

    w = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("n_s"))
        .withColumn("wt", F.floor(F.sqrt(F.col("n_s"))).cast("long"))
    )
    tot = w.agg(F.sum("wt").alias("big_w"))
    quotas = w.crossJoin(F.broadcast(tot)).select(
        strata_col,
        F.expr(f"({total} * wt) div big_w").alias("quota"),
    )
    rank = F.row_number().over(
        Window.partitionBy(strata_col).orderBy(
            sample_hash_col(F.col(id_col), salt), F.col(id_col)
        )
    )
    return (
        df.join(F.broadcast(quotas), strata_col)
        .withColumn("_rn", rank)
        .where(F.col("_rn") <= F.col("quota"))
        .drop("_rn", "quota")
    )


def epoch_repeat(
    df: DataFrame,
    epochs_col: str,
    id_col: str = "doc_id",
    shard_chars: int = 1,
    salt: str = "epoch",
) -> DataFrame:
    """Quality-weighted epoch repetition — the data-recipe step (DoReMi /
    Llama-style) that shows high-value documents to the model more than once
    per pass: each doc expands into ``epochs`` training instances
    (``epoch_idx`` 0..epochs-1), every instance gets a deterministic shard and
    a within-shard position, so the emitted training ORDER is reproducible
    across partitioning, retries, and cluster size (the same property as
    ``pack_sequences``/``stratified_sample``).

    The caller supplies the integer ``epochs_col`` (the policy — e.g.
    ``1 + (n_tokens >= t1) + (n_tokens >= t2)`` — stays outside so any
    weighting scheme plugs in); rows with epochs <= 0 are dropped. Instance
    order: ``shard = substr(md5(salt:id:epoch_idx), 1, shard_chars)``, position
    = rank of (md5-8, id, epoch_idx) within the shard — md5-8 collisions are
    broken by the id columns, so the order is total.

    Scale shape: explode is map-side (no shuffle); the only shuffle is the
    hash partition by shard, and ``shard_chars`` sets the parallelism
    (16**shard_chars shards) so no window ever sees more than ~1/16**k of the
    instances."""
    from pyspark.sql import Window

    inst = (
        df.where(F.col(epochs_col) > 0)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(0), F.col(epochs_col).cast("int") - 1)
            ).alias("epoch_idx"),
        )
    )
    key = F.substring(
        F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.col(id_col).cast("string"),
                F.col("epoch_idx").cast("string"),
            )
        ),
        1,
        8,
    )
    keyed = inst.withColumn("ekey", key).withColumn(
        "shard", F.substring("ekey", 1, shard_chars)
    )
    w = Window.partitionBy("shard").orderBy("ekey", id_col, "epoch_idx")
    return keyed.select(
        id_col,
        F.col("epoch_idx").cast("int").alias("epoch_idx"),
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def es_key_col(
    id_col: Column, weight_col: Column, salt: int = 0, max_weight: int = 64
) -> Column:
    """The Efraimidis–Spirakis weighted-sampling key as EXACT integer algebra.

    ES (Efraimidis & Spirakis, IPL 2006) samples k items without replacement
    with inclusion proportional to weight by ranking items on
    ``key_i = u_i^(1/w_i)``. Computing that key needs ``pow``/``ln`` — floats
    whose last ulp differs between libm implementations, so a cross-engine
    hash check could flip on a boundary row. This uses the max-stability
    identity instead: for integer ``w``, ``max(u_1..u_w)`` has CDF
    ``t^w = P(u^(1/w) <= t)`` — the SAME distribution as the ES key — so
    ranking by the max of ``w`` independent hash-uniforms IS the ES scheme,
    with every comparison on 52-bit integers. No float ever crosses an
    engine boundary; Spark and any SQL engine with ``md5`` agree bit-for-bit.

    Per-row cost is ``w`` md5 calls, capped at ``max_weight``; real-valued or
    unbounded weights should be quantized to <= ``max_weight`` levels first
    (the cap bounds the RESOLUTION of the weighting, not correctness). The
    column is a pure map — no shuffle, no UDF (``transform`` over
    ``sequence`` runs inside whole-stage codegen)."""
    w = F.greatest(F.least(weight_col.cast("int"), F.lit(max_weight)), F.lit(1))
    return F.array_max(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(f"es{salt}"),
                            id_col.cast("string"),
                            j.cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: int = 0,
    max_weight: int = 64,
) -> DataFrame:
    """Quality-weighted sampling WITHOUT replacement — the data-recipe step
    that draws a fixed-size training subset biased toward high-quality
    documents (weights from a quality classifier / heuristic score), where
    ``stratified_sample``'s per-stratum fractions are too coarse.

    Exact Efraimidis–Spirakis top-k (see ``es_key_col``): keep the k rows
    with the largest integer ES keys, ties broken by id. Deterministic in
    ``(id, weight, salt)`` — reproducible across partitioning, retries, and
    cluster size, and replayable bit-for-bit in SQL.

    Scale shape: key is a pure map stage; the selection is
    ``orderBy(...).limit(k)`` = TakeOrderedAndProject, a distributed
    per-partition top-k + driver merge of k-row heaps — no global sort, no
    full shuffle, driver memory O(k)."""
    key = es_key_col(F.col(id_col), F.col(weight_col), salt, max_weight)
    return (
        df.withColumn("es_key", key)
        .orderBy(F.desc("es_key"), F.col(id_col))
        .limit(k)
    )


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    budget_tokens: int,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Per-stratum TOKEN-budget sampling — the data-recipe step that fills
    each domain/language's slice of a training run by token count, not
    document count (what "200B tokens of web, 30B of code" actually means;
    a doc-count quota like ``domain_cap`` over-weights long documents).

    Keeps documents in deterministic (md5 hash, id) order while the RUNNING
    token total stays ≤ ``budget_tokens`` — i.e. keep iff
    ``cumsum(n_tokens) ≤ budget`` including the current row. All-integer
    algebra over a caller-supplied token count column (compose with
    ``functions.text.token_count_col`` or ``bpe.bpe_encode`` for the real
    cost model), so membership is reproducible across partitioning/retries/
    cluster size and replayable in SQL.

    Scale shape: one cumulative-sum window partitioned by stratum ordered by
    the hash rank — same skew bound as ``domain_cap``: the window's work is
    the stratum's row count, so pre-thin pathological strata (e.g.
    ``domain_cap`` at ``budget // min_doc_tokens`` rows) before the cumsum.
    Output: the kept rows plus ``cum_tokens``."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy(sample_hash_col(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("long"))
        .where(F.col("cum_tokens") <= budget_tokens)
    )
