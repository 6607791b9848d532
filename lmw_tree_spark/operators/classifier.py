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
