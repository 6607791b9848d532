"""Product-quantization (PQ) ANN — the compressed-domain scale path for
similarity search over embeddings.

Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor Search"
(IEEE PAMI 2011): split a D-dim vector into M subvectors, vector-quantize each
subspace against its own ``ksub``-entry codebook, and score queries against the
M-byte codes via an asymmetric distance computation (ADC) — a per-query
(M × ksub) lookup table of exact query-to-centroid squared distances, summed by
code. This is the float-vector analogue of the reference engine's compact
bitwise signatures (TopSig vectors scanned with XOR+POPCNT,
/root/reference/src/lmw/SVector.h:297-364): both replace full-precision rows
with a fixed small per-row payload so the scan is memory-bandwidth-, not
compute-, bound.

Scale design (10^12 rows): the codebook is tiny (M·ksub·(D/M) = D·ksub floats —
it rides every closure), encoding is a pure map stage (no shuffle), and the
codes table is M bytes/row instead of 4·D — a 32-dim float64 row compresses 32×
at M=8, ksub=16. The ADC scan is a cogrouped scan of the codes table against a
distributed query side — per-query LUTs are built INSIDE each scoring group
from the query vectors it carries, so the query set is never materialized on
the driver and may be corpus-sized; compose with ``similarity.ivf_cells`` to
restrict the scan to probed cells (IVF-ADC, the paper's IVFADC variant) when
even the compressed scan is too large.

Every decision step (encode argmin with first-wins ties, LUT build, ADC sum,
top-k rank) is deterministic and SQL-replayable — the driver query materializes
embeddings + codebook and DuckDB independently replays encode+ADC end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _subspace_views(x: np.ndarray, m: int) -> np.ndarray:
    """(N, D) → (M, N, D/M) contiguous subspace slices."""
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.ascontiguousarray(x.reshape(n, m, dsub).transpose(1, 0, 2))


def train_pq(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample: int = 2048,
    iters: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit per-subspace codebooks on a deterministic hash-ordered sample →
    (m, ksub, dsub) float64.

    Mirrors ``similarity.train_ivf_centroids``: the sample is ordered by
    ``xxhash64(id)`` so the fit is identical at any partitioning/parallelism —
    the codebook is trusted state for the oracle (like IVF centroids), while
    encode + ADC are independently replayed.
    """
    rows = (
        df.select(vec_col, F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    x = np.array([r[vec_col] for r in rows], dtype=np.float64)
    subs = _subspace_views(x, m)
    rng = np.random.default_rng(seed)
    books = []
    for mm in range(m):
        xs = subs[mm]
        cents = xs[rng.permutation(len(xs))[:ksub]].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # first-wins ties, reference Optimizer.h:91-104 rule
            for c in range(ksub):
                sel = xs[a == c]
                if len(sel):
                    cents[c] = sel.mean(axis=0)
        books.append(cents)
    return np.ascontiguousarray(np.stack(books))


PQ_CODES_SCHEMA = "vec_id long, codes array<int>"


def pq_encode(
    df: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every row to M codes: per subspace, argmin squared L2 against that
    subspace's codebook (first-wins = lowest code on exact ties). Pure map stage
    — codebook rides the task closure (broadcast-sized), no shuffle."""
    cb = np.ascontiguousarray(codebook, dtype=np.float64)
    m = cb.shape[0]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            subs = _subspace_views(x, m)
            codes = np.empty((len(x), m), dtype=np.int32)
            for mm in range(m):
                d2 = ((subs[mm][:, None, :] - cb[mm][None, :, :]) ** 2).sum(axis=2)
                codes[:, mm] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            ).rename(columns={id_col: "vec_id"})

    return df.select(id_col, vec_col).mapInPandas(run, PQ_CODES_SCHEMA)


def _empty_scored() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": np.empty(0, np.int64),
            "neighbor_id": np.empty(0, np.int64),
            "adc_dist": np.empty(0, np.float64),
        }
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Global (adc asc, neighbor asc) top-k window over the map-side-combined
    per-group shortlists, self-matches removed."""
    scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", F.col("rank").cast("int"))
    )


def pq_adc_topk(
    df: DataFrame,
    codebook: np.ndarray,
    k: int = 3,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    round_digits: int = 6,
    chunk_rows: int = 65536,
    n_rows: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: exact queries vs PQ-encoded database.

    Per query, an (M × ksub) LUT of exact squared subspace distances is built
    once; each database row's approximate distance is the sum of M LUT gathers
    on its codes — the ADC scan (PAMI 2011 §IV.A). Ranking: adc ascending,
    ties → neighbor_id ascending. Output (query_id, neighbor_id, adc_dist,
    rank).

    Distributed shape (no driver materialization anywhere): the codes table is
    hash-partitioned into ``ceil(n / chunk_rows)`` chunks, queries are
    replicated to every chunk (explode over the chunk sequence), and a
    cogrouped ``applyInPandas`` scores each (chunk-of-codes × queries) group —
    the LUT is built INSIDE the group from the query vectors it carries, with
    only the tiny codebook riding the closure. Each group emits its per-query
    top-(k+1) shortlist under the exact global (adc, neighbor_id) order
    (lossless map-side combine), so the final window shuffles
    O(queries × chunks × k) rows. The full scan is inherently O(Q·n) compute —
    queries-times-everything is the eval shape; compose with IVF
    (:func:`ivfadc_topk`) when even the compressed full scan is too large."""
    cb = np.ascontiguousarray(codebook, dtype=np.float64)
    m, ksub, _ = cb.shape
    if codes is None:
        codes = pq_encode(df, codebook, id_col, vec_col)
    if n_rows is None:
        n_rows = df.count()
    n_chunks = max(1, -(-int(n_rows) // chunk_rows))
    offs = (np.arange(m, dtype=np.int64) * ksub)[None, :]

    codes_c = codes.withColumn(
        "chunk",
        F.pmod(F.xxhash64(F.col("vec_id").cast("string"), F.lit(7)), F.lit(n_chunks)).cast("int"),
    )
    queries = df if query_pred is None else df.where(query_pred)
    qrep = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qvec"),
        )
        .withColumn("chunk", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))))
        .withColumn("chunk", F.col("chunk").cast("int"))
    )

    def score(codes_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(codes_pdf) or not len(q_pdf):
            return _empty_scored()
        c = np.array(list(codes_pdf["codes"]), dtype=np.int64)  # (B, m)
        nids = codes_pdf["vec_id"].to_numpy()
        qx = np.array(list(q_pdf["qvec"]), dtype=np.float64)
        qids = q_pdf["query_id"].to_numpy()
        lut2 = _build_lut(qx, cb)  # LUT[q, m·ksub] — exact float64, per group
        adc = np.round(lut2[:, c + offs].sum(axis=2), round_digits)  # (Q, B)
        return _batch_topk(qids, nids, adc, k)

    scored = (
        codes_c.groupby("chunk")
        .cogroup(qrep.groupby("chunk"))
        .applyInPandas(score, "query_id long, neighbor_id long, adc_dist double")
    )
    return _rank_topk(scored, k)


def _batch_topk(qids: np.ndarray, nids: np.ndarray, adc: np.ndarray, k: int) -> pd.DataFrame:
    """Per-query top-(k+1) rows of one scored batch under (adc, neighbor_id)
    ascending — k+1 so the self-match a query may contain is survivable; the
    global window applies the exact same order, so this is a lossless map-side
    combine."""
    q, b = adc.shape
    kk = min(k + 1, b)
    # full (adc, neighbor_id) lexsort, NOT an adc-only argpartition: under mass
    # ties (identical vectors → identical codes → equal adc, routine in dedup
    # corpora) a partition on adc alone could shortlist a higher-id tie while
    # dropping a lower-id one, silently breaking the id-ascending tie rule
    order = np.lexsort((np.broadcast_to(nids, (q, b)), adc), axis=1)[:, :kk]
    padc = np.take_along_axis(adc, order, axis=1)
    pnid = nids[order]
    return pd.DataFrame(
        {
            "query_id": np.repeat(qids, kk),
            "neighbor_id": pnid.ravel(),
            "adc_dist": padc.ravel(),
        }
    )


def _build_lut(qx: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(Q, D) queries × (m, ksub, dsub) codebook → (Q, m*ksub) flat LUT of
    exact squared subspace distances."""
    m, ksub, _ = cb.shape
    qsubs = _subspace_views(qx, m)
    return np.ascontiguousarray(
        ((qsubs[:, :, None, :] - cb[:, None, :, :]) ** 2).sum(axis=3).transpose(1, 0, 2)
    ).reshape(len(qx), m * ksub)


def ivfadc_topk(
    df: DataFrame,
    coarse: np.ndarray,
    codebook: np.ndarray,
    k: int = 3,
    n_probe: int = 4,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF + ADC: the compressed scan restricted to each query's ``n_probe``
    nearest coarse cells (Jégou et al. PAMI 2011 §V — the ``by_residual=False``
    variant: codes quantize the raw vectors, not cell residuals, so the ADC
    algebra is identical to ``pq_adc_topk`` and fully SQL-replayable).

    Plan shape: cell assignment and encoding are pure maps; the scan is a
    cell-cogroup (probes × candidate codes — no cross join) followed by an
    Arrow-batched LUT gather and the top-k window. At 10^12 rows the per-query
    work is ~n/n_cells·n_probe code lookups of M bytes each.

    Distributed shape (no driver materialization anywhere): cell assignment,
    encoding, and query→probe-cell expansion are all pure Arrow-batched maps
    (only the small coarse matrix + codebook ride closures); a cogrouped
    ``applyInPandas`` on ``cell`` pairs each cell's codes with the queries
    probing it, builds the per-query LUTs inside the group from the query
    vectors the probe rows carry, and emits per-query top-(k+1) shortlists
    under the exact global (adc, neighbor_id) order — the final window
    shuffles O(queries × n_probe × k) rows."""
    from lmw_tree_spark.operators.similarity import ivf_cells

    cb = np.ascontiguousarray(codebook, dtype=np.float64)
    m, ksub, _ = cb.shape
    cmat = np.ascontiguousarray(coarse, dtype=np.float64)
    cells = ivf_cells(df, cmat, id_col, vec_col).withColumnRenamed(id_col, "vec_id")
    codes = pq_encode(df, cb, id_col, vec_col)
    base = codes.join(cells, "vec_id")
    offs = (np.arange(m, dtype=np.int64) * ksub)[None, :]

    queries = df if query_pred is None else df.where(query_pred)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # query → its n_probe nearest cells (stable sort = cell-asc ties,
        # matching the oracle's ORDER BY dist ASC, cell ASC); the query vector
        # rides along so the scoring group can build its LUT locally
        for pdf in batches:
            if not len(pdf):
                continue
            qx = np.array(list(pdf[vec_col]), dtype=np.float64)
            qd = ((qx[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            top = np.argsort(qd, axis=1, kind="stable")[:, :n_probe].astype(np.int32)
            p = top.shape[1]
            vecs = [list(v) for v in qx for _ in range(p)]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf[id_col].to_numpy(), p),
                    "qvec": vecs,
                    "cell": top.ravel(),
                }
            )

    q_probes = queries.select(id_col, vec_col).mapInPandas(
        probe, "query_id long, qvec array<double>, cell int"
    )

    def score(codes_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(codes_pdf) or not len(q_pdf):
            return _empty_scored()
        c = np.array(list(codes_pdf["codes"]), dtype=np.int64)
        nids = codes_pdf["vec_id"].to_numpy()
        qx = np.array(list(q_pdf["qvec"]), dtype=np.float64)
        qids = q_pdf["query_id"].to_numpy()
        lut2 = _build_lut(qx, cb)
        adc = np.round(lut2[:, c + offs].sum(axis=2), round_digits)
        return _batch_topk(qids, nids, adc, k)

    scored = (
        base.groupby("cell")
        .cogroup(q_probes.groupby("cell"))
        .applyInPandas(score, "query_id long, neighbor_id long, adc_dist double")
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# SQ8 — per-vector symmetric int8 scalar quantization
# ---------------------------------------------------------------------------

SQ8_FP_BITS = 20
_SQ8_FP = float(1 << SQ8_FP_BITS)


def _fixed_point(vec_col: str):
    """array<float|double> → array<long> fixed-point: floor(x · 2^20).

    Multiplying a double by a power of two is EXACT in IEEE-754 (exponent
    shift, no mantissa rounding), and floor of a double is deterministic — so
    any engine reading the same parquet derives bit-identical integers, which
    is what makes the whole SQ8 family SQL-replayable with no trusted state.
    """
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(_SQ8_FP)).cast("long"),
    )


def sq8_encode(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (SQ8) — the 4-8×
    cheaper, lower-fidelity sibling of PQ: each dimension collapses to one
    byte against the vector's own max-abs scale. Faiss's
    ``ScalarQuantizer(QT_8bit)`` shape, re-expressed as exact integer algebra:

      f_i    = floor(x_i · 2^20)                       (fixed point)
      scale  = max(1, max_i |f_i|)
      q_i    = ((f_i + scale) · 127) div (2·scale)     ∈ [0, 127]
      qc_i   = 2·q_i − 127                             ∈ [−127, 127]

    The shifted-non-negative floor division makes the rounding rule portable
    (floor == trunc for non-negative operands), so DuckDB replays every code
    bit-for-bit. Zero Python: one whole-stage-codegen projection per row —
    at 10^12 rows this is a pure map with output 1 byte/dim + one long.

    Output: (id_col, scale long, qcode array<int>).
    """
    out = df.select(F.col(id_col), _fixed_point(vec_col).alias("f")).select(
        id_col,
        "f",
        F.greatest(
            F.aggregate(
                "f",
                F.lit(0).cast("long"),
                lambda a, x: F.greatest(a, F.abs(x)),
            ),
            F.lit(1).cast("long"),
        ).alias("scale"),
    )
    return out.select(
        id_col,
        "scale",
        F.expr(
            "transform(f, x -> CAST(2 * (((x + scale) * 127) div (2 * scale)) "
            "- 127 AS INT))"
        ).alias("qcode"),
    )


def _int_dot(a: str, b: str):
    """Exact integer dot product of two array<int|long> columns (JVM)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _int_topk(
    vecs: DataFrame,
    k: int,
    query_pred,
    code_col: str,
    id_col: str,
    chunk_rows: int = 65536,
) -> DataFrame:
    """Integer-dot top-k with deterministic ties (score desc, neighbor id asc).

    Two plans, one result algebra:

    * bounded query set (``query_pred`` given) — broadcast the predicate-
      selected queries and score with the whole-stage-codegen integer dot
      (zero Python), the eval-scoped shape of ``similarity.cosine_topk``;
    * ``query_pred=None`` (everything-vs-everything, the dedup shape) — no
      broadcast and no driver materialization: hash-chunk the base table,
      replicate queries across chunks, and score each cogroup with one exact
      int64 NumPy matmul, emitting per-query top-(k+1) shortlists under the
      global (−score, neighbor_id) order (lossless map-side combine).
    """
    if query_pred is not None:
        base = vecs.select(
            F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("b_code")
        )
        queries = vecs.where(query_pred).select(
            F.col(id_col).alias("query_id"), F.col(code_col).alias("a_code")
        )
        scored = (
            F.broadcast(queries)
            .crossJoin(base)
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                _int_dot("a_code", "b_code").alias("score"),
            )
        )
    else:
        n_rows = vecs.count()
        n_chunks = max(1, -(-int(n_rows) // chunk_rows))
        base_c = vecs.select(
            F.col(id_col).alias("neighbor_id"), F.col(code_col).alias("b_code")
        ).withColumn(
            "chunk",
            F.pmod(
                F.xxhash64(F.col("neighbor_id").cast("string"), F.lit(7)),
                F.lit(n_chunks),
            ).cast("int"),
        )
        qrep = (
            vecs.select(
                F.col(id_col).alias("query_id"), F.col(code_col).alias("a_code")
            )
            .withColumn("chunk", F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))))
            .withColumn("chunk", F.col("chunk").cast("int"))
        )

        def score_group(b_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
            if not len(b_pdf) or not len(q_pdf):
                return pd.DataFrame(
                    {
                        "query_id": np.empty(0, np.int64),
                        "neighbor_id": np.empty(0, np.int64),
                        "score": np.empty(0, np.int64),
                    }
                )
            b = np.array(list(b_pdf["b_code"]), dtype=np.int64)  # (B, D)
            a = np.array(list(q_pdf["a_code"]), dtype=np.int64)  # (Q, D)
            s = a @ b.T  # exact int64 — codes are bounded, no overflow
            nids = b_pdf["neighbor_id"].to_numpy()
            qids = q_pdf["query_id"].to_numpy()
            qn, bn = s.shape
            kk = min(k + 1, bn)
            order = np.lexsort((np.broadcast_to(nids, (qn, bn)), -s), axis=1)[:, :kk]
            return pd.DataFrame(
                {
                    "query_id": np.repeat(qids, kk),
                    "neighbor_id": nids[order].ravel(),
                    "score": np.take_along_axis(s, order, axis=1).ravel(),
                }
            )

        scored = (
            base_c.groupby("chunk")
            .cogroup(qrep.groupby("chunk"))
            .applyInPandas(score_group, "query_id long, neighbor_id long, score long")
            .where(F.col("query_id") != F.col("neighbor_id"))
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("int"))
    )


def sq8_topk(
    df: DataFrame,
    k: int = 3,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors under the SQ8 integer dot product (centered codes).

    Output (query_id, neighbor_id, score, rank); ties → neighbor id asc."""
    return _int_topk(sq8_encode(df, id_col, vec_col), k, query_pred, "qcode", id_col)


def fixedpoint_topk(
    df: DataFrame,
    k: int = 3,
    query_pred=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors under the EXACT fixed-point dot product — the full-
    precision baseline SQ8 is measured against. All-integer (floor(x·2^20)),
    so both rankings of the recall eval live in the same exact algebra and
    the whole eval is replayable with zero trusted state."""
    vecs = df.select(F.col(id_col), _fixed_point(vec_col).alias("fcode"))
    return _int_topk(vecs, k, query_pred, "fcode", id_col)
