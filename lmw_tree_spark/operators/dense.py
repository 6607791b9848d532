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

_PARTIAL_SCHEMA = "cluster int, merge_key int, n long, sums array<double>"
_MERGED_SCHEMA = "cluster int, n long, sums array<double>"


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


def _merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reduce one (cluster, merge_key) group of partial rows to a single row."""
    s = np.array(list(pdf["sums"]), dtype=np.float64).sum(axis=0)
    return pd.DataFrame(
        {
            "cluster": [int(pdf["cluster"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "sums": [list(s)],
        }
    )


def kmeans_dense(
    df: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest_ids",
    seed: int = 42,
    combine_threshold: int = 64,
    combine_keys: int = 32,
) -> np.ndarray:
    """Lloyd's k-means over ``array<float>`` rows, fully distributed.

    Each iteration: broadcast centroids → per-partition assignment + per-cluster
    (count, vector-sum) partials (one mapInPandas, no shuffle of data rows) →
    driver combines the partials → new means. Returns the final (k, d)
    centroid matrix; get labels with ``assign_dense``.

    Two-level combine (same shape as the bit pipeline's distributed
    ``gatherAccumulators``, emtree._accumulate_pass / reference
    StreamingEMTree.h:253-268): above ``combine_threshold`` input partitions an
    intermediate ``groupBy(cluster, partition_id % combine_keys)`` stage merges
    partial rows executor-side, so the driver gather is O(k × combine_keys)
    rows at ANY partition count (10^5-10^6 partitions at 100 TB), never
    O(partitions × k); each merge group holds ≤ partitions/combine_keys rows.
    Below the threshold the direct gather skips the (tiny) extra shuffle.
    """
    spark = df.sparkSession
    cents = seed_centroids(df, k, init, seed, id_col, vec_col)
    data = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    n_parts = data.rdd.getNumPartitions()  # plan inspection, no job
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cents)

        def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

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
            ctx = TaskContext.get()
            key = (ctx.partitionId() if ctx is not None else 0) % combine_keys
            yield pd.DataFrame(
                {
                    "cluster": touched.astype(np.int32),
                    "merge_key": np.full(len(touched), key, dtype=np.int32),
                    "n": counts[touched],
                    "sums": list(sums[touched]),
                }
            )

        partials = data.mapInPandas(partial, _PARTIAL_SCHEMA)
        if n_parts > combine_threshold:
            partials = partials.groupBy("cluster", "merge_key").applyInPandas(
                _merge_partials, _MERGED_SCHEMA
            )
            pdf = partials.toPandas()  # ≤ k × combine_keys rows
        else:
            pdf = partials.drop("merge_key").toPandas()  # ≤ n_parts × k rows
        bc.unpersist()
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        if len(pdf):
            cl = pdf["cluster"].to_numpy(dtype=np.int64)
            np.add.at(sums, cl, np.array(list(pdf["sums"]), dtype=np.float64))
            np.add.at(counts, cl, pdf["n"].to_numpy(dtype=np.int64))
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
    """Broadcast-argmin labeling pass: (id_col, cluster, dist). Pure map."""
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
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "dist": d,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, cluster int, dist double"
    )


def silhouette_dense(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-point simplified (centroid-based) silhouette: a = distance to the
    assigned centroid, b = distance to the nearest OTHER centroid,
    sil = (b − a) / max(a, b). The medoid-free variant of Rousseeuw (1987) —
    O(n·k) instead of the O(n²) pairwise form, which is the only shape that
    survives corpus scale. Pure broadcast map like :func:`assign_dense`:
    (id, cluster, a_dist, b_dist, sil), no shuffle.

    Assignment ties break to the lowest centroid index (matching
    ``_assign_rows`` and the reference's first-wins argmin,
    /root/reference/src/lmw/KMeans.h:14-256); a point equidistant from two
    centroids therefore gets sil = 0. Degenerate a = b = 0 (point on two
    identical centroids) is defined as 0. Requires k ≥ 2.
    """
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)
    if len(cmat) < 2:
        raise ValueError("silhouette requires k >= 2 centroids")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = _to_matrix(pdf[vec_col])
            d2 = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            d = np.sqrt(d2)
            rows = np.arange(len(a))
            da = d[rows, a]
            d[rows, a] = np.inf
            db = d.min(axis=1)
            denom = np.maximum(da, db)
            sil = (db - da) / np.maximum(denom, 1e-300)
            sil[denom == 0.0] = 0.0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": a.astype(np.int32),
                    "a_dist": da,
                    "b_dist": db,
                    "sil": sil,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, cluster int, a_dist double, b_dist double, sil double"
    )
