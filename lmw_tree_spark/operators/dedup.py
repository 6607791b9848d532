"""Document deduplication suite for the training-data pipeline: exact, token-set
Jaccard, MinHash+LSH, and SimHash near-dup detection over a text table.

These are the text-corpus counterparts of the image dedup layer (operators/lsh.py)
and reuse the same kernels. Everything that can stay JVM-side does; MinHash/SimHash
batch kernels run as Arrow ``mapInPandas``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmw_tree_spark.functions.bitops import popcount_u64
from lmw_tree_spark.functions.signatures import (
    band_hashes,
    char_shingle_hashes,
    hamming_band_keys,
    minhash_matrix,
    simhash_from_token_hashes,
    word_shingle_hashes,
)
from lmw_tree_spark.functions.text import fingerprint_col
from lmw_tree_spark.operators.lsh import edges_from_buckets


def exact_dedup_groups(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-content fingerprint: one row per group
    with size and canonical (min) id. Pure hash-groupBy — the cheap first pass of
    any corpus dedup."""
    return (
        df.select(F.col(id_col), fingerprint_col(text).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("group_size"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def token_jaccard_pairs(
    df: DataFrame,
    min_jaccard: float = 0.5,
    text: str = "text",
    id_col: str = "doc_id",
    left_filter=None,
    max_token_df: int | None = None,
    ngram: int = 1,
) -> DataFrame:
    """Token-set Jaccard between document pairs sharing ≥1 token.

    Classic inverted-index join: tokens → equi-join → |A∩B| per pair → Jaccard from
    per-doc distinct counts. ``left_filter`` (a Column predicate on the left side)
    bounds the query side.

    ``ngram > 1`` computes Jaccard over word n-gram sets (shingles) instead of
    unigrams — much sharper for near-dup detection since shared vocabulary no
    longer collides; the df guard then bites on boilerplate PHRASES. All JVM
    (split → transform/slice → explode), no Python.

    ``max_token_df`` is the SCALE guard: tokens whose document frequency exceeds it
    (stopwords, boilerplate) are dropped from the token universe BEFORE the
    self-join — a hot token otherwise produces O(df²) pairs, which is the join's
    failure mode at corpus scale. The Jaccard is then defined over the df-capped
    token universe (sizes computed after the same filter), so the measure stays
    internally consistent; high-df tokens carry no dedup signal anyway. Tokens with
    df = 1 are additionally excluded from the join sides only (they cannot
    intersect), which changes nothing about the result but halves join volume on
    long-tail vocabulary.
    """
    if ngram == 1:
        tok_col = F.explode(F.split(F.lower(text), " "))
    else:
        n = int(ngram)
        grams = (
            f"transform(sequence(1, size(_arr) - {n - 1}), "
            f"i -> concat_ws(' ', slice(_arr, i, {n})))"
        )
        # short docs yield an empty (typed) array — sequence() must not see a
        # descending range, and array() alone would type as array<void>
        tok_col = F.explode(
            F.expr(f"IF(size(_arr) >= {n}, {grams}, slice(_arr, 1, 0))")
        )
        df = df.withColumn("_arr", F.split(F.lower(text), " "))
    toks = df.select(F.col(id_col).alias("id"), tok_col.alias("tok")).distinct()
    if max_token_df is not None:
        keep = (
            toks.groupBy("tok")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_token_df)
        )
        toks = toks.join(keep.select("tok"), "tok")
        joinable = keep.where(F.col("df") >= 2).select("tok")
    else:
        joinable = None
    sizes = toks.groupBy("id").agg(F.count("*").alias("sz"))
    join_toks = toks if joinable is None else toks.join(joinable, "tok")
    left = join_toks if left_filter is None else join_toks.where(left_filter)
    inter = (
        left.alias("a")
        .join(join_toks.alias("b"), "tok")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "src").withColumnRenamed("sz", "sa"), "src")
        .join(sizes.withColumnRenamed("id", "dst").withColumnRenamed("sz", "sb"), "dst")
        .select(
            "src",
            "dst",
            (F.col("inter").cast("double") / (F.col("sa") + F.col("sb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


DOC_MINHASH_SCHEMA = "doc_id long, minhash array<long>"
DOC_SIMHASH_SCHEMA = "doc_id long, simhash long"


def doc_minhash(
    df: DataFrame, k: int = 5, n_perm: int = 64, seed: int = 42,
    text: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature over k-char shingles (Arrow-vectorized)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h, m = char_shingle_hashes(pdf[text], k)
            mh = minhash_matrix(h, m, n_perm, seed)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "minhash": list(mh.view(np.int64))}
            )

    return df.select(id_col, text).mapInPandas(run, DOC_MINHASH_SCHEMA)


def minhash_lsh_dedup(
    df: DataFrame, n_bands: int = 16, k: int = 5, n_perm: int = 64,
    min_sim: float = 0.6, pair_cap: int = 64,
    text: str = "text", id_col: str = "doc_id",
    mh: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → minhash → band → bucket join → verify
    by signature agreement. Output (src, dst, est_jaccard).

    ``mh`` optionally injects a precomputed ``doc_minhash`` DataFrame (e.g. one
    the caller also materializes for an external oracle) so the signatures are
    computed once. With ``pair_cap`` ≥ the largest band-bucket size every bucket
    emits its full clique, making the candidate set EXACTLY "pairs sharing ≥ 1
    band" — the SQL-replayable configuration; smaller caps trade completeness
    for bounded volume (chains)."""
    if mh is None:
        mh = doc_minhash(df, k, n_perm, text=text, id_col=id_col)
    mh = mh.persist()

    def bucketer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array(list(pdf["minhash"]), dtype=np.int64).view(np.uint64)
            bands = band_hashes(m, n_bands)
            yield pd.DataFrame(
                {
                    "bucket": bands.ravel(),
                    "image_id": np.repeat(pdf["doc_id"].astype(str).to_numpy(), n_bands),
                }
            )

    buckets = mh.mapInPandas(bucketer, "bucket long, image_id string")
    # bucket ids chain in STRING order; re-normalize src < dst numerically
    cast_edges = edges_from_buckets(buckets, pair_cap).select(
        F.col("src").cast("long").alias("s"), F.col("dst").cast("long").alias("d")
    )
    edges = cast_edges.select(
        F.least("s", "d").alias("src"), F.greatest("s", "d").alias("dst")
    )
    a = mh.select(F.col("doc_id").alias("src"), F.col("minhash").alias("a_mh"))
    b = mh.select(F.col("doc_id").alias("dst"), F.col("minhash").alias("b_mh"))
    sim = (
        F.aggregate(
            F.zip_with("a_mh", "b_mh", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.size("a_mh")
    ).cast("double")
    return (
        edges.join(a, "src").join(b, "dst")
        .select("src", "dst", sim.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= min_sim)
    )


def doc_simhash(
    df: DataFrame, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit token SimHash per document (majority vote over token-hash bits)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            h, m = word_shingle_hashes(pdf[text], n=1)
            s = simhash_from_token_hashes(h, m)
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].to_numpy(), "simhash": s.view(np.int64)}
            )

    return df.select(id_col, text).mapInPandas(run, DOC_SIMHASH_SCHEMA)


def simhash_dedup(
    df: DataFrame, max_dist: int = 6, n_bands: int = 4,
    text: str = "text", id_col: str = "doc_id", pair_cap: int = 256,
    sh: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole band buckets + exact Hamming verify.
    Output (src, dst, dist). ``sh`` optionally injects a precomputed
    ``doc_simhash`` DataFrame; ``pair_cap`` ≥ the largest bucket makes the
    candidate set exactly "pairs sharing ≥ 1 bit-slice band" (SQL-replayable)."""
    if sh is None:
        sh = doc_simhash(df, text, id_col)
    sh = sh.persist()

    def bucketer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
            keys = hamming_band_keys(vals, n_bands)
            yield pd.DataFrame(
                {
                    "bucket": keys.ravel(),
                    "image_id": np.repeat(pdf["doc_id"].astype(str).to_numpy(), n_bands),
                }
            )

    buckets = sh.mapInPandas(bucketer, "bucket long, image_id string")
    cast_edges = edges_from_buckets(buckets, pair_cap).select(
        F.col("src").cast("long").alias("s"), F.col("dst").cast("long").alias("d")
    )
    edges = cast_edges.select(
        F.least("s", "d").alias("src"), F.greatest("s", "d").alias("dst")
    )
    a = sh.select(F.col("doc_id").alias("src"), F.col("simhash").alias("a_sh"))
    b = sh.select(F.col("doc_id").alias("dst"), F.col("simhash").alias("b_sh"))
    return (
        edges.join(a, "src").join(b, "dst")
        .select(
            "src", "dst",
            F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def _np_popcount_probe() -> None:  # pragma: no cover — keeps import referenced
    popcount_u64(np.array([1], dtype=np.uint64))
