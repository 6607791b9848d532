"""fastText-shape linear text-classifier inference (hashed bag-of-ngrams).

Model-based quality filtering — the step AFTER the heuristic gates in the
GPT-3 / CCNet / LLaMA-recipe pipelines (Brown et al. 2020 appendix A: a
classifier scores documents against a high-quality reference corpus; Wenzek
et al. 2020 §4.4; Joulin et al. 2017 for the fastText model shape): a linear
model over hashed n-gram features scores every document and the corpus keeps
documents above a threshold. The reference engine has no equivalent (its text
handling stops at signature extraction, cf.
/root/reference/src/lmw/StdIncludes.h) — this is training-data-pipeline
surface layered on its dedup/clustering core.

This implements the INFERENCE side Spark-first. The model arrives as a
``(bucket, weight)`` DataFrame — in production the exported weights of a
trained fastText / logistic model hashed into ``n_buckets``; tests and the
driver query use :func:`synthetic_weight_table` (deterministic integer
Knuth-multiplicative weights) so correctness is checkable without shipping a
trained artifact.

The decision thresholds the LINEAR score: ``keep = 1`` iff
``total_weight > tau · n_features``. Sigmoid is monotonic, so thresholding
the logit is the same decision as thresholding the probability — and it keeps
the algebra exact BIGINT end-to-end (weights are integers), so no float ulp
can ever flip a decision and the DuckDB oracle reproduces the output
bit-for-bit.

Scale notes (100 TB design):
  * featurize (tokens + bigrams) is a pure map — array higher-order
    functions, whole-stage codegen, zero shuffle.
  * the weight-table join is map-side broadcast (``n_buckets`` rows — a few
    MB even at fastText's default 2M buckets).
  * ONE data-sized shuffle: the per-document sum, keyed by ``id_col`` with
    map-side partial aggregation; key cardinality = document count, so no
    hot keys at any corpus skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lmw_tree_spark.functions.text import token_hash32_col

# Knuth multiplicative constant; weight(bucket) = (bucket·K) % 1001 − 500,
# i.e. pseudo-random integers in [−500, 500] — replayed verbatim by the oracle.
_KNUTH = 2654435761
_WEIGHT_MOD = 1001
_WEIGHT_SHIFT = 500


def synthetic_weight_table(spark: SparkSession, n_buckets: int = 4096) -> DataFrame:
    """Deterministic stand-in for exported model weights: ``(bucket int,
    weight int)`` with weight = (bucket·2654435761) % 1001 − 500."""
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * F.lit(_KNUTH)) % _WEIGHT_MOD - _WEIGHT_SHIFT)
        .cast("int")
        .alias("weight"),
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """(id_col, bucket) bag — one row per unigram AND word-bigram occurrence,
    bucket = md5-32(token or ``a_b``) % n_buckets. Duplicates kept (bag
    semantics, like fastText's input). Pure map + explode; the md5 hash is the
    engine-portable contract shared with the MinHash/SimHash SQL twins."""
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "").alias("toks"),
    )
    # bigrams via transform over 1..size-1; sequence(1, 0) would DESCEND, so
    # guard the single-token case with an empty array
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.col("toks"),
                F.when(
                    F.size("toks") >= 2,
                    F.expr("transform(sequence(1, size(toks)-1), i -> concat(toks[i-1], '_', toks[i]))"),
                ).otherwise(F.array().cast("array<string>")),
            )
        ).alias("gram"),
    )
    return grams.select(
        F.col(id_col),
        (token_hash32_col(F.col("gram")) % n_buckets).cast("int").alias("bucket"),
    )


def nb_train_weights(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """TRAIN the linear model: multinomial Naive Bayes log-likelihood-ratio
    weights over the same hashed uni+bigram buckets (the classic fastText-era
    baseline trainer — NB weights ARE a linear model over bag features, and
    training is nothing but two grouped counts, so it distributes as a single
    aggregation pass; cf. Wang & Manning 2012, NBSVM).

    ``label_col`` is 1 for the high-quality seed corpus, 0 for the rest.
    Output: ``(bucket int, pos_cnt bigint, neg_cnt bigint, weight double)``
    for EVERY bucket in [0, n_buckets) (dense — unseen buckets get the
    smoothed prior ratio), where::

        weight = round( ln((pos_cnt+1)/(pos_tot+D)) −
                        ln((neg_cnt+1)/(neg_tot+D)), 4 )

    Counts are exact BIGINTs; the one float (ln) is rounded to 4 digits —
    the repo's standard float-parity contract with the DuckDB oracle.

    Scale notes: one data-sized shuffle (groupBy bucket, map-side partial
    counts, key cardinality = n_buckets so partials are tiny); the class
    totals and the dense bucket spine live on D-row model-sized frames —
    the unpartitioned window runs over D rows, never over data.
    """
    feats = hashed_ngram_features(df, text_col=text_col, id_col=id_col, n_buckets=n_buckets)
    labeled = feats.join(
        F.broadcast(df.select(F.col(id_col), F.col(label_col).cast("int").alias("_y"))),
        id_col,
    )
    counts = labeled.groupBy("bucket").agg(
        F.sum("_y").cast("long").alias("pos_cnt"),
        F.sum(1 - F.col("_y")).cast("long").alias("neg_cnt"),
    )
    spine = df.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    dense = (
        # counts is ≤ n_buckets rows (model-sized) — broadcast it so the dense
        # spine fill never shuffles
        spine.join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("pos_cnt", F.lit(0)).cast("long").alias("pos_cnt"),
            F.coalesce("neg_cnt", F.lit(0)).cast("long").alias("neg_cnt"),
        )
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()  # D model rows, not data rows — bounded
    dense = dense.withColumn("_pos_tot", F.sum("pos_cnt").over(w_all)).withColumn(
        "_neg_tot", F.sum("neg_cnt").over(w_all)
    )
    d = F.lit(float(n_buckets))
    return dense.select(
        "bucket",
        "pos_cnt",
        "neg_cnt",
        F.round(
            F.log((F.col("pos_cnt") + 1) / (F.col("_pos_tot") + d))
            - F.log((F.col("neg_cnt") + 1) / (F.col("_neg_tot") + d)),
            4,
        ).alias("weight"),
    )


def classifier_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    tau: int = 0,
) -> DataFrame:
    """Score every document with the linear model and decide keep/drop.

    Output: ``(id_col, n_feats bigint, total_weight bigint, keep int)`` with
    ``keep = 1`` iff ``total_weight > tau · n_feats`` (exact integer compare).
    ``weights`` must cover every bucket in ``[0, n_buckets)`` (inner join —
    a missing bucket would silently drop features; ``synthetic_weight_table``
    and any exported hashed model are dense by construction).

    A document with no tokens yields no feature rows and is therefore ABSENT
    from the output (not scored keep=0) — compose after a length gate, or
    left-join back to the corpus if absent-means-drop isn't what you want.
    """
    feats = hashed_ngram_features(df, text_col=text_col, id_col=id_col, n_buckets=n_buckets)
    scored = feats.join(F.broadcast(weights), "bucket").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum("weight").cast("long").alias("total_weight"),
    )
    return scored.withColumn(
        "keep",
        (F.col("total_weight") > F.lit(int(tau)) * F.col("n_feats")).cast("int"),
    )


def rank_auc(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """Exact ROC-AUC of a score column against binary labels — the eval step
    that closes the classifier loop (train -> score -> measure) before a
    filter threshold is committed for a full-corpus run.

    Uses the tied-rank Mann-Whitney identity: with ranks averaged over tie
    groups, ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)``. All
    counting runs on the per-score aggregate, in doubled-rank integers so
    half-ranks never materialize: a tie group of ``cnt`` rows preceded by
    ``c`` rows has twice-average-rank ``2c + cnt + 1``, giving
    ``auc_num = sum(pos * (2c + cnt + 1)) - n_pos(n_pos+1)`` over
    ``auc_den = 2 * n_pos * n_neg`` — exact BIGINTs any engine reproduces;
    the single float division happens once, rounded to 6, for display.

    Scale shape: one data-sized groupBy(score) with map-side combine; the
    rank cumsum window runs over the per-score aggregate — bounded by the
    score codomain (integer logits here), never by the data — partitioned by
    a constant to make the deliberate single-partition explicit. Quantize
    near-continuous scores before calling (the aggregate IS the scalability
    contract).

    Output: one row ``(n_pos, n_neg, auc_num, auc_den, auc)``.
    """
    from pyspark.sql import Window

    per = scored.groupBy(score_col).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum(label_col).cast("long").alias("pos"),
    )
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per = per.withColumn("c", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    agg = per.agg(
        F.sum(F.col("pos") * (2 * F.col("c") + F.col("cnt") + 1))
        .cast("long")
        .alias("r2pos"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("long").alias("n_neg"),
    )
    num = F.col("r2pos") - F.col("n_pos") * (F.col("n_pos") + 1)
    den = 2 * F.col("n_pos") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        num.cast("long").alias("auc_num"),
        den.cast("long").alias("auc_den"),
        F.round(num.cast("double") / den, 6).alias("auc"),
    )
