"""Sign-random-projection (SRP / hyperplane) LSH near-dup over embeddings —
the LSH-bucketed scale path for embedding-cosine near-duplicate detection.

Charikar, "Similarity Estimation Techniques from Rounding Algorithms" (STOC
2002): bit r of a vector's signature is ``sign(v · h_r)`` for a fixed random
hyperplane ``h_r``; P[bits agree] = 1 − θ/π, so cosine-similar vectors collide.
Banding the 64 bits into 16-bit pigeonhole slices (the same Manku WWW'07
multi-index machinery the caption SimHash dedup uses,
``operators/dedup.simhash_dedup``) gives candidate pairs by band equality;
candidates are then verified with the exact JVM cosine expression.

This complements the other two embedding near-dup paths:

- ``similarity.cosine_neardup_pairs_bounded`` — exact ball-cover (equals brute
  force, prunes by triangle inequality): the *exactness* path.
- ``__spark_entry__.q_semantic_dedup`` — SemDeDup cluster-bounded pairs.
- SRP-LSH (here) — constant work per row (64 dots), candidates by hash bucket
  only: the cheapest path at 10^12 rows, recall tunable via bands/bits.

Scale design: hyperplanes are a (64 × D) broadcast constant; signature
computation is a single GEMM per Arrow batch (pure map, no shuffle); candidate
generation reuses ``lsh.edges_from_buckets`` (skew-bounded chains+cliques —
a 10M-row degenerate bucket still parallelizes); verification is an equi-join
on vec_id + a JVM ``zip_with``/``aggregate`` cosine. Nothing in the plan is
all-pairs.

The whole decision algebra (dot signs → band keys → bucket pairs → cosine
verify) is SQL-replayable; the driver query materializes the hyperplanes and
embeddings and DuckDB re-derives the pairs independently.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmw_tree_spark.functions.signatures import hamming_band_keys
from lmw_tree_spark.operators.lsh import edges_from_buckets
from lmw_tree_spark.operators.similarity import cosine_sim_col

SRP_SIG_SCHEMA = "vec_id long, srp long"


def srp_hyperplanes(d: int, n_bits: int = 64, seed: int = 7) -> np.ndarray:
    """Deterministic (n_bits, d) float64 Gaussian hyperplanes."""
    return np.random.default_rng([seed, d, n_bits]).standard_normal((n_bits, d))


def srp_signatures(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """64-bit SRP signature per row: bit r = 1 iff v · h_r ≥ 0 (bit r of the
    packed long, matching the engine-wide bit-j-of-word convention,
    functions/bitops.py). One GEMM per Arrow batch; pure map."""
    h = np.ascontiguousarray(planes, dtype=np.float64)
    if h.shape[0] != 64:
        raise ValueError(f"srp_signatures packs exactly 64 bits, got {h.shape[0]}")
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (x @ h.T) >= 0.0  # (N, 64)
            sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "srp": sig.view(np.int64)}
            )

    return df.select(id_col, vec_col).mapInPandas(run, SRP_SIG_SCHEMA)


def srp_neardup_pairs(
    df: DataFrame,
    min_cosine: float = 0.8,
    n_bands: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_cap: int = 256,
    sigs: DataFrame | None = None,
    planes: np.ndarray | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via SRP-LSH: band-bucket candidates + exact
    cosine verify. Output (src, dst, cosine_sim), src < dst.

    ``pair_cap`` ≥ the largest bucket makes the candidate set exactly "pairs
    sharing ≥ 1 band" (SQL-replayable); the production setting keeps hot
    buckets chain-bounded (see ``edges_from_buckets``). ``sigs``/``planes``
    inject precomputed state so a caller (or oracle) can materialize it.
    """
    if planes is None:
        d = len(df.select(vec_col).first()[0])
        planes = srp_hyperplanes(d, seed=seed)
    if sigs is None:
        sigs = srp_signatures(df, planes, id_col, vec_col)
    sigs = sigs.persist()

    def bucketer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf["srp"].to_numpy(dtype=np.int64).view(np.uint64)
            keys = hamming_band_keys(vals, n_bands)
            yield pd.DataFrame(
                {
                    "bucket": keys.ravel(),
                    "image_id": np.repeat(pdf["vec_id"].astype(str).to_numpy(), n_bands),
                }
            )

    buckets = sigs.mapInPandas(bucketer, "bucket long, image_id string")
    cast_edges = edges_from_buckets(buckets, pair_cap).select(
        F.col("src").cast("long").alias("s"), F.col("dst").cast("long").alias("d")
    )
    edges = cast_edges.select(
        F.least("s", "d").alias("src"), F.greatest("s", "d").alias("dst")
    )
    a = df.select(
        F.col(id_col).alias("src"), F.col(vec_col).cast("array<double>").alias("a_vec")
    )
    b = df.select(
        F.col(id_col).alias("dst"), F.col(vec_col).cast("array<double>").alias("b_vec")
    )
    return (
        edges.join(a, "src").join(b, "dst")
        .select("src", "dst", F.round(cosine_sim_col("a_vec", "b_vec"), 4).alias("cosine_sim"))
        .where(F.col("cosine_sim") >= min_cosine)
    )
