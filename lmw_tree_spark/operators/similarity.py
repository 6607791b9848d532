"""Similarity search over an embedding column (array<float>): brute-force cosine
top-k as the exact baseline, and an IVF-bucketed approximate variant as the scale
path (coarse-quantize → probe nearest cells only).

Design for 10^12 rows: brute force is the verification oracle (restricted query
sets); IVF turns the cross join into a cell-equi-join — candidates shrink by
n_cells/n_probe, the classic inverted-file ANN trade (Jégou et al., PAMI 2011).
All distance math on the data side runs vectorized inside Arrow batches or as
JVM ``zip_with``/``aggregate`` expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def cosine_sim_col(a: str, b: str):
    """Cosine similarity between two array<double> columns (JVM-side)."""
    return (_dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))).cast("double")


def cosine_topk(
    df: DataFrame,
    k: int = 3,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors for each query row.

    ``query_pred`` restricts the query side (e.g. ``F.col('vec_id') % 50 == 0``) —
    the data side is never restricted. Ties break on neighbor id ascending, so
    results are deterministic. Output (query_id, neighbor_id, cosine_sim, rank).
    """
    base = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("b_vec"),
    )
    queries = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("a_vec"),
    )
    if query_pred is not None:
        queries = queries.where(query_pred)
    sim = cosine_sim_col("a_vec", "b_vec")
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("int"))
    )


def ivf_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse quantization: assign each vector to its nearest (L2) centroid cell —
    vectorized argmin over the broadcast centroid matrix. Output columns are
    keyed by ``id_col`` so callers with non-default id columns compose."""
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cell": d.argmin(axis=1).astype(np.int32)}
            )

    return df.select(id_col, vec_col).mapInPandas(run, f"{id_col} long, cell int")


def train_ivf_centroids(
    df: DataFrame, n_cells: int, sample: int = 2048, iters: int = 5, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Driver-side mini k-means on a deterministic sample → (n_cells, D) centroids."""
    rows = (
        df.select(vec_col, F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.permutation(len(x))[:n_cells]].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(n_cells):
            m = x[a == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def ivf_cosine_topk(
    df: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    trainer: str = "sample",
    train_iters: int = 5,
    centroids: np.ndarray | None = None,
    exclude_groups: DataFrame | None = None,
    group_col: str = "grp",
) -> DataFrame:
    """Approximate cosine top-k: IVF coarse quantization + multi-probe.

    Each query joins only rows in its ``n_probe`` nearest cells (cell-equi-join, no
    cross join). Output schema matches ``cosine_topk``.

    ``exclude_groups`` (a ``(id_col, group_col)`` frame, e.g. dedup components)
    drops candidates whose query and neighbor share a group BEFORE ranking —
    hard-negative mining for contrastive training: the nearest neighbors that
    are NOT near-duplicates of the anchor. Rows absent from the frame are never
    excluded. Plain equi-joins on the id (the groups frame is corpus-sized at
    scale, so no broadcast is forced; AQE picks the strategy).

    ``trainer='sample'`` fits the coarse quantizer with the driver-side mini
    k-means on a bounded sample (fine for n_cells ≲ 1k); ``'distributed'`` fits
    it on ALL rows with ``dense.kmeans_dense`` (hash-seeded, deterministic at any
    partitioning) — the path for large cell counts where a 2048-row sample can't
    populate every cell. ``centroids`` injects a pre-fitted matrix (e.g. one the
    caller also materializes for an external oracle), skipping training. With
    ``n_probe == n_cells`` the search probes every cell and the result equals
    exact brute force (the candidate set is total).
    """
    if centroids is not None:
        cents = np.ascontiguousarray(centroids, dtype=np.float64)
    elif trainer == "distributed":
        from lmw_tree_spark.operators.dense import kmeans_dense

        cents = kmeans_dense(
            df, k=n_cells, iters=train_iters, id_col=id_col, vec_col=vec_col,
            init="hash", seed=seed,
        )
    else:
        cents = train_ivf_centroids(df, n_cells, seed=seed, id_col=id_col, vec_col=vec_col)
    cells = ivf_cells(df, cents, id_col, vec_col).withColumnRenamed(id_col, "_cell_id")
    base = df.join(cells, df[id_col] == F.col("_cell_id")).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("b_vec"),
        "cell",
    )

    # query → its n_probe nearest cells
    cmat = np.ascontiguousarray(cents, dtype=np.float64)
    nprobe = n_probe

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            # stable sort: equal distances keep ascending cell order, matching
            # the SQL oracle's ORDER BY dist ASC, cell ASC tie rule
            top = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {"query_id": np.repeat(ids, nprobe), "cell": top.ravel()}
            )

    queries = df if query_pred is None else df.where(query_pred)
    q_cells = queries.select(id_col, vec_col).mapInPandas(
        probes, "query_id long, cell int"
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("a_vec"),
    )
    cand = (
        q_cells.join(base, "cell")
        .join(F.broadcast(q_vecs), "query_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_groups is not None:
        gq = exclude_groups.select(
            F.col(id_col).alias("query_id"), F.col(group_col).alias("_g_q")
        )
        gn = exclude_groups.select(
            F.col(id_col).alias("neighbor_id"), F.col(group_col).alias("_g_n")
        )
        cand = (
            cand.join(gq, "query_id", "left")
            .join(gn, "neighbor_id", "left")
            .where(
                F.col("_g_q").isNull()
                | F.col("_g_n").isNull()
                | (F.col("_g_q") != F.col("_g_n"))
            )
            .drop("_g_q", "_g_n")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        cand.select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim_col("a_vec", "b_vec"), 4).alias("cosine_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("int"))
    )


def mutual_knn_edges(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    trainer: str = "sample",
    train_iters: int = 5,
    centroids: np.ndarray | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Mutual k-NN graph over the whole corpus: every vector is a query, and an
    undirected edge (src < dst) survives only if BOTH endpoints rank each other
    inside their cosine top-k. The symmetrized graph that feeds label
    propagation, graph clustering, and manifold methods — mutuality prunes the
    hub edges that plain directed kNN drags in.

    Scale shape: unlike :func:`ivf_cosine_topk` (whose query side is bounded by
    ``query_pred`` and rides a broadcast), BOTH roles here are corpus-sized, so
    no broadcast anywhere — vectors meet in a shuffle equi-join on the IVF cell
    key, the query's own vector arrives by a second shuffle equi-join on
    ``query_id``, and the mutual filter is an equi-join of the directed top-k
    list with itself on the reversed pair. Per-query candidates are bounded by
    its ``n_probe`` cells, so the rank window is skew-bounded by cell size. A
    (query, neighbor) pair cannot repeat before ranking: each neighbor lives in
    exactly one cell, so the probe join emits it at most once. With
    ``n_probe == n_cells`` the candidate set is total and the result is the
    EXACT mutual kNN graph (how the driver query stays SQL-oracle-able);
    production uses ``n_probe < n_cells`` for the approximate graph.

    Ranking uses the ROUNDED cosine (ties → lowest neighbor id), pinning the
    order across engines. Output: (src, dst, cosine_sim).
    """
    if centroids is not None:
        cents = np.ascontiguousarray(centroids, dtype=np.float64)
    elif trainer == "distributed":
        from lmw_tree_spark.operators.dense import kmeans_dense

        cents = kmeans_dense(
            df, k=n_cells, iters=train_iters, id_col=id_col, vec_col=vec_col,
            init="hash", seed=seed,
        )
    else:
        cents = train_ivf_centroids(df, n_cells, seed=seed, id_col=id_col, vec_col=vec_col)
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    members = vecs.join(ivf_cells(df, cents, id_col, vec_col), id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("b_vec"), "cell"
    )

    cmat = np.ascontiguousarray(cents, dtype=np.float64)
    nprobe = n_probe

    def probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            top = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {"query_id": np.repeat(ids, nprobe), "cell": top.ravel()}
            )

    q_cells = df.select(id_col, vec_col).mapInPandas(probes, "query_id long, cell int")
    q_vecs = vecs.select(
        F.col(id_col).alias("query_id"), F.col("_v").alias("a_vec")
    )
    # attach the query vector to the (query, probe-cell) table BEFORE the cell
    # join: the probe table is n·n_probe narrow rows, so a_vec ships n_probe
    # times per query — joining it after the cell join instead would shuffle
    # every EXPLODED candidate row (≈ n·n_probe·cell_size, each dragging the
    # neighbor vector along) a second time by query_id, the stage's dominant
    # byte mover. Same joins' algebra, same per-pair arithmetic, same result.
    q_probes = q_cells.join(q_vecs, "query_id")
    directed = (
        q_probes.join(members, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim_col("a_vec", "b_vec"), round_digits).alias("cosine_sim"),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .where(F.col("rank") <= k)
    )
    fwd = directed.select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        "cosine_sim",
    )
    rev = directed.select(
        F.col("neighbor_id").alias("src"), F.col("query_id").alias("dst")
    )
    return (
        fwd.join(rev, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "cosine_sim")
    )


def _cells_with_dist(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment that also emits the L2 distance to the chosen
    centroid (needed for per-cell radii). ``normalize=True`` projects rows onto
    the unit sphere first (the cosine-as-Euclidean trick). Output columns are
    keyed by ``id_col`` so callers with non-default id columns compose."""
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            if normalize:
                x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
            d = ((x[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": a.astype(np.int32),
                    "cdist": np.sqrt(d[np.arange(len(a)), a]),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        run, f"{id_col} long, cell int, cdist double"
    )


def cosine_neardup_pairs_bounded(
    df: DataFrame,
    min_cosine: float,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    seed: int = 42,
    chunk_rows: int = 2048,
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs through a bounded ball-cover join —
    the scale path that replaces ``cosine_neardup_pairs``'s all-pairs cross join.

    On unit-normalized vectors, ``cos(a,b) ≥ t ⟺ ‖â−b̂‖ ≤ √(2−2t)``, so the
    threshold predicate is a Euclidean radius search. Rows are coarse-quantized
    into ``n_cells`` balls (IVF cells over normalized vectors); each cell carries
    its radius ``r_c = max ‖x̂−c‖``. By the triangle inequality a qualifying pair
    can only span cells with ``‖c_i−c_j‖ ≤ r_i + r_j + √(2−2t)`` — every other
    cell pair is pruned. Candidates flow through a broadcast equi-join on the
    admitted (cell_a, cell_b) list (never CartesianProduct /
    BroadcastNestedLoopJoin), then the IDENTICAL scoring expression as the
    brute-force oracle decides. Result therefore equals brute force exactly
    (a rounding slack of 0.5·10^-round_digits is folded into the radius bound).

    Pruning selectivity grows with the threshold: at near-dup thresholds
    (t ≈ 0.99 → radius 0.14) almost all of the n_cells² pairs drop; at loose
    thresholds the plan shape is unchanged and only degrades toward all cell
    pairs — never beyond O(n²/n_cells) candidate volume per admitted pair.

    Row-size bound: a cell never packs to one row. Each cell is sub-split into
    ``ceil(count / chunk_rows)`` fixed-size hash chunks keyed ``(cell, chunk)``,
    and admitted cell pairs expand to chunk-pair equi-joins — so the largest
    shuffled row is ~``chunk_rows × d × 8`` bytes (≈0.5 MB at the defaults) and
    the largest scorer temp is the ``chunk_rows²`` sim block, BOTH independent
    of data volume and skew. The plan shape (broadcast equi-join on the
    admitted-pair list, no CartesianProduct) is unchanged.
    """
    dfe = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    # zero-norm guard: an unguarded x/0 would make the whole cell's radius NaN
    # and silently drop qualifying pairs of OTHER vectors in that cell
    norm = F.greatest(F.sqrt(_dot(vec_col, vec_col)), F.lit(1e-30))
    df_norm = dfe.select(
        id_col, F.transform(vec_col, lambda x: x / norm).alias(vec_col)
    )
    cents = train_ivf_centroids(
        df_norm, n_cells, seed=seed, id_col=id_col, vec_col=vec_col
    )
    cells = _cells_with_dist(df_norm, cents, id_col, vec_col).persist()
    stats = (
        cells.groupBy("cell")
        .agg(F.max("cdist").alias("r"), F.count("*").alias("cnt"))
        .collect()
    )
    radii = np.zeros(len(cents), dtype=np.float64)
    n_chunks = np.ones(len(cents), dtype=np.int64)
    for row in stats:
        radii[row["cell"]] = row["r"]
        n_chunks[row["cell"]] = max(1, -(-int(row["cnt"]) // chunk_rows))

    t_eff = min_cosine - 0.5 * 10.0 ** (-round_digits)  # absorb output rounding
    thresh_d = float(np.sqrt(max(0.0, 2.0 - 2.0 * t_eff))) + 1e-9
    cd = np.sqrt(
        ((cents[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    )
    admit = cd <= radii[:, None] + radii[None, :] + thresh_d
    # admitted unordered cell pairs (ca <= cb) expanded to chunk pairs; for the
    # same (cell, chunk) on both sides the scorer takes the triangle, so each
    # unordered row pair is scored exactly once
    pairs = [
        (int(i), int(ci), int(j), int(cj))
        for i in range(len(cents))
        for j in range(i, len(cents))
        if admit[i, j]
        for ci in range(n_chunks[i])
        for cj in range(n_chunks[j])
        if i < j or ci <= cj
    ]
    spark = df.sparkSession
    cellpairs = spark.createDataFrame(pairs, "ca int, cha int, cb int, chb int")

    # Score per admitted CHUNK PAIR with one NumPy GEMM over the two chunks'
    # matrices — never materialize candidate row pairs in the shuffle. The
    # join moves O(admitted_chunk_pairs × chunk_bytes), and the scorer emits
    # only qualifying pairs.
    # single collect of (id, vec) structs — two parallel collect_lists would
    # rely on undocumented cross-aggregate ordering alignment
    chunk_map = spark.createDataFrame(
        [(int(c), int(n)) for c, n in enumerate(n_chunks)], "cell int, nch int"
    )
    packed = (
        dfe.join(cells.select(id_col, "cell"), id_col)
        .join(F.broadcast(chunk_map), "cell")
        .withColumn(
            "chunk",
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.col("nch")).cast("int"),
        )
        .groupBy("cell", "chunk")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
            ).alias("members")
        )
    )
    cand = (
        cellpairs.join(
            packed.select(
                F.col("cell").alias("ca"),
                F.col("chunk").alias("cha"),
                F.col("members").alias("a_members"),
            ),
            ["ca", "cha"],
        )
        .join(
            packed.select(
                F.col("cell").alias("cb"),
                F.col("chunk").alias("chb"),
                F.col("members").alias("b_members"),
            ),
            ["cb", "chb"],
        )
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples():
                a_ids = np.array([m["id"] for m in row.a_members], dtype=np.int64)
                b_ids = np.array([m["id"] for m in row.b_members], dtype=np.int64)
                xa = np.array([m["vec"] for m in row.a_members], dtype=np.float64)
                xb = np.array([m["vec"] for m in row.b_members], dtype=np.float64)
                na = xa / np.maximum(np.linalg.norm(xa, axis=1, keepdims=True), 1e-30)
                nb = xb / np.maximum(np.linalg.norm(xb, axis=1, keepdims=True), 1e-30)
                sim = np.round(na @ nb.T, round_digits)
                ii, jj = np.where(sim >= min_cosine)
                if not len(ii):
                    continue
                if row.ca == row.cb and row.cha == row.chb:
                    tri = ii < jj  # same chunk: score each unordered pair once
                    ii, jj = ii[tri], jj[tri]
                    if not len(ii):
                        continue
                src = np.minimum(a_ids[ii], b_ids[jj])
                dst = np.maximum(a_ids[ii], b_ids[jj])
                keep = src < dst  # drops degenerate self-pairs only
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {
                        "src": src[keep],
                        "dst": dst[keep],
                        "cosine_sim": sim[ii, jj][keep],
                    }
                )

    scored = cand.mapInPandas(score, "src long, dst long, cosine_sim double")
    # a pair can appear under one (cell, chunk) pair only (each row has exactly
    # one cell and one chunk), so no cross-bucket duplicates arise
    return scored


def cosine_neardup_pairs(
    df: DataFrame,
    min_cosine: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs: all (src < dst) with
    cosine ≥ min_cosine — the embedding modality of the dedup layer.

    Brute-force all-pairs is the exact baseline (verification oracle); at scale
    the same threshold predicate runs over IVF/LSH-bucketed candidates instead of
    the full cross product (see ``ivf_cosine_topk`` — identical scoring
    expression, cell-equi-join candidate generation)."""
    a = df.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).cast("array<double>").alias("a_vec"),
    )
    b = df.select(
        F.col(id_col).alias("dst"),
        F.col(vec_col).cast("array<double>").alias("b_vec"),
    )
    sim = F.round(cosine_sim_col("a_vec", "b_vec"), round_digits)
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", sim.alias("cosine_sim"))
        .where(F.col("cosine_sim") >= min_cosine)
    )


def centroid_assign(
    df: DataFrame,
    centroid_pred,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """One k-means assignment step with a deterministic centroid subset
    (``centroid_pred`` selects centroid rows, e.g. vec_id < 10): each vector →
    nearest centroid by L2. Output (vec_id, cluster, dist). Fully JVM-side
    (broadcast + min_by), SQL-expressible for the oracle."""
    cents = df.where(centroid_pred).select(
        F.col(id_col).alias("cluster"),
        F.col(vec_col).cast("array<double>").alias("c_vec"),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("v_vec", "c_vec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x,
        )
    )
    scored = (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).cast("array<double>").alias("v_vec"),
        )
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cluster", F.round(dist, round_digits).alias("dist"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cluster"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("vec_id", "cluster", "dist")
    )


def centroid_outlier_filter(
    df: DataFrame,
    centroids,
    mult: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space curation gate: drop rows that sit far from their own
    cluster's centroid — the "remove embedding outliers" step (mislabeled /
    off-distribution / corrupted samples land in low-density space) that
    DataComp-style pipelines run after clustering.

    EXACT integer algebra end-to-end so the whole gate is SQL-replayable
    with only the fitted centroids trusted: embeddings and centroids both
    quantize to fixed point (``floor(x·2^20)`` — IEEE power-of-two scale),
    the squared L2 to each centroid is an int64 sum (≤ 2^52 at d=32), the
    assignment is a column-literal ``array_min`` argmin (ties → lowest cell,
    the `ar_bucket` shape — zero Python, zero shuffle for the assign), and
    the keep rule compares against the FLOOR mean: keep iff
    ``dist2 ≤ mult · (sum_dist2_cell // n_cell)`` — integer division instead
    of a ratio, so no product ever exceeds int64 at any cell size.

    Scale shape: one pure-map projection per row + one k-row broadcast stats
    join; the only shuffle is the groupBy over ≤ k cells. The argmin is
    k column-literal expressions — right for coarse gates (k ≤ ~64); for
    fine-grained cell counts quantize ``dense.assign_dense``'s GEMM argmin
    instead. Output: every row with (cell, dist2, keep).
    """
    import numpy as np

    cmat = np.floor(np.asarray(centroids, dtype=np.float64) * float(1 << 20)).astype(
        np.int64
    )
    f = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(1 << 20))).cast("long"),
    )
    rows = df.select(F.col(id_col), f.alias("fvec"))
    cells = []
    for ci in range(len(cmat)):
        lit_c = F.array(*[F.lit(int(v)) for v in cmat[ci]])
        d2 = F.aggregate(
            F.zip_with("fvec", lit_c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        cells.append(F.struct(d2.alias("dist2"), F.lit(ci).alias("cell")))
    best = F.array_min(F.array(*cells))
    assigned = rows.select(id_col, best.alias("best")).select(
        id_col,
        F.col("best.cell").alias("cell"),
        F.col("best.dist2").alias("dist2"),
    )
    stats = assigned.groupBy("cell").agg(
        F.count("*").alias("n_cell"),
        F.sum("dist2").alias("sum_dist2"),
    )
    # integer floor mean via (sum - sum % n) / n — all-int64, exact division
    floor_mean = (
        (F.col("sum_dist2") - F.col("sum_dist2") % F.col("n_cell"))
        / F.col("n_cell")
    ).cast("long")
    return (
        assigned.join(F.broadcast(stats), "cell")
        .select(
            id_col,
            "cell",
            "dist2",
            (F.col("dist2") <= F.lit(int(mult)) * floor_mean).alias("keep"),
        )
    )
