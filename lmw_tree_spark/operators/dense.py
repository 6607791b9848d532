"""Distributed dense-vector k-means — the float twin of the packed-bit clustering.

Re-expresses the reference's dense-prototype path as Spark dataflow:
``meanPrototype`` (weighted arithmetic mean of dense vectors,
/root/reference/src/lmw/Prototype.h:34-52) becomes a per-partition partial-sum
``mapInPandas`` + driver combine; ``euclideanDistance``
(/root/reference/src/lmw/Distance.h:42-71) drives the broadcast-argmin assignment
exactly as ``KMeans::cluster`` (/root/reference/src/lmw/KMeans.h:14-256) does for
bit vectors.

Scale shape (identical to the bit pipeline): the centroid matrix is the tiny
broadcast side (k × d floats); assignment is a pure map; the only traffic per
iteration is O(partitions × k × d) partial sums — independent of row count. The
driver never sees data rows.

Deterministic algebra (pinned so a SQL oracle can replay it exactly):
- ties in the argmin break to the LOWEST centroid index;
- an empty cluster keeps its previous centroid (Lloyd's convention);
- seeding is by data order: ``init='lowest_ids'`` takes the k rows with the
  smallest ids (fully SQL-expressible), ``init='hash'`` takes the first k in
  xxhash64(id, seed) order (deterministic at any partitioning, the same trick as
  ``emtree.sample_signatures``).

This replaces the driver-side 2048-row-sample IVF trainer for large cell counts:
``similarity.train_ivf_centroids`` fits on a bounded sample, this fits on ALL
rows distributed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DENSE_ASSIGN_SCHEMA = "vec_id long, cluster int, dist double"
_PARTIAL_SCHEMA = "cluster int, n long, sums array<double>"


def _to_matrix(col: pd.Series) -> np.ndarray:
    return np.array(list(col), dtype=np.float64)


def _assign_rows(x: np.ndarray, cmat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(N, d) rows vs (k, d) centroids → (cluster idx, L2 dist). np.argmin takes
    the first minimum, i.e. ties break to the lowest centroid index."""
    d2 = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    return a, np.sqrt(d2[np.arange(len(a)), a])


def seed_centroids(
    df: DataFrame,
    k: int,
    init: str = "lowest_ids",
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic (k, d) seed matrix; see module doc for the two modes."""
    base = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    if init == "lowest_ids":
        rows = base.orderBy(id_col).limit(k).collect()  # TakeOrderedAndProject
    elif init == "hash":
        rows = (
            base.withColumn("h", F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
            .orderBy("h", id_col)
            .limit(k)
            .collect()
        )
    else:
        raise ValueError(f"unknown init {init!r}")
    return np.array([r["v"] for r in rows], dtype=np.float64)


def kmeans_dense(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_ids",
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means over ``array<float>`` rows, fully distributed.

    Each iteration: broadcast centroids → per-partition assignment + per-cluster
    (count, vector-sum) partials (one mapInPandas, no shuffle of data rows) →
    driver combines O(partitions × k) partial rows → new means. Returns the
    final (k, d) centroid matrix; get labels with ``assign_dense``.
    """
    spark = df.sparkSession
    cents = seed_centroids(df, k, init, seed, id_col, vec_col)
    data = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cmat = bc.value
            sums = np.zeros_like(cmat)
            counts = np.zeros(len(cmat), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _to_matrix(pdf["v"])
                a, _ = _assign_rows(x, cmat)
                np.add.at(sums, a, x)
                counts += np.bincount(a, minlength=len(cmat))
            touched = np.where(counts > 0)[0]
            if not len(touched):
                return
            yield pd.DataFrame(
                {
                    "cluster": touched.astype(np.int32),
                    "n": counts[touched],
                    "sums": list(sums[touched]),
                }
            )

        pdf = data.mapInPandas(partial, _PARTIAL_SCHEMA).toPandas()
        bc.unpersist()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        for _, row in pdf.iterrows():
            sums[int(row["cluster"])] += np.asarray(row["sums"], dtype=np.float64)
            counts[int(row["cluster"])] += int(row["n"])
        nonempty = counts > 0
        new_cents = cents.copy()  # empty cluster keeps its previous centroid
        new_cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new_cents
    return cents


def assign_dense(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Broadcast-argmin labeling pass: (vec_id, cluster, dist). Pure map."""
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = _to_matrix(pdf[vec_col])
            a, d = _assign_rows(x, cmat)
            if round_digits is not None:
                d = np.round(d, round_digits)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "dist": d,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(run, DENSE_ASSIGN_SCHEMA)
