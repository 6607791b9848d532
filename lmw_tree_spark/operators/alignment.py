"""Cross-modal image–caption alignment gate — the CLIP-score filtering step of
LAION-style curation (Schuhmann et al., NeurIPS'22 Datasets: drop pairs whose
image and caption embeddings disagree). The reference engine clusters a single
modality's signatures (EMTree.h, KTree.h); a web-scale image+caption pipeline
additionally needs the *pairing* of the two modalities scored and gated before
dedup/clustering, so this is a target add alongside the sharpness and
corrupt-quarantine gates.

Real pipelines score alignment with a trained joint embedding (CLIP). This
container has no model weights, so the scorer is a deterministic stand-in with
the SAME plan shape and cost profile:

- image side: an integer sign-random-projection of the image embedding —
  md5-derived integer hyperplane coefficients in [-8, 7], one GEMM per Arrow
  batch (pure map, no shuffle), packed to an n_bits signature;
- caption side: the engine's 32-bit token SimHash (portable md5 token hash,
  all-JVM relational aggregation);
- score: Hamming agreement between the two signatures; gate keeps pairs with
  ``hamming <= max_hamming``.

Every arithmetic step is integer (embeddings are truncated to fixed-point at
2^10 — exact, because a float32 times a power of two is exact in double), so
projection, signature, distance, and keep decision replay in portable SQL with
zero float-comparison hazard. Swapping the stand-in for a real CLIP scorer
changes one Arrow kernel; the join/gate plan is unchanged.

Scale design: the hyperplane matrix is an (n_bits × d) broadcast constant; the
projection is one integer GEMM per Arrow batch (map-only); the caption SimHash
is whole-stage-codegen JVM; the modalities meet in ONE equi-join on the pair
id. Nothing shuffles except that join — at 10^12 rows it is the minimum
possible movement (the two signature columns).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1024  # fixed-point scale: exact for float32 inputs (power of two)


def int_hyperplanes(d: int, n_bits: int = 32, seed: int = 11) -> np.ndarray:
    """(n_bits, d) integer hyperplane coefficients in [-8, 7], each derived
    from the first hex digit of md5("{seed}:{r}:{j}") — the same algebra a SQL
    oracle can replay with substr(md5(...), 1, 1)."""
    c = np.empty((n_bits, d), dtype=np.int64)
    for r in range(n_bits):
        for j in range(d):
            h = hashlib.md5(f"{seed}:{r}:{j}".encode()).hexdigest()
            c[r, j] = int(h[0], 16) - 8
    return c


def srp_int_signatures(
    df: DataFrame,
    planes: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "srp_sig",
) -> DataFrame:
    """Integer SRP signature per row: quantize the vector to fixed-point
    (trunc(x * 1024), toward zero — matches SQL trunc()), one integer GEMM
    against the broadcast planes, bit r = 1 iff dot_r > 0 (strict, so the
    replay has no >=-vs-> ambiguity). Pure map, one Arrow batch at a time."""
    h = np.ascontiguousarray(planes, dtype=np.int64)
    n_bits = h.shape[0]
    if n_bits > 63:
        raise ValueError(f"srp_int_signatures packs <= 63 bits, got {n_bits}")
    weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)
    schema = f"{id_col} long, {out_col} long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = np.trunc(x * QUANT).astype(np.int64)
            bits = (q @ h.T) > 0  # (N, n_bits), strict
            sig = (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), out_col: sig})

    return df.select(id_col, vec_col).mapInPandas(run, schema)


def crossmodal_alignment(
    docs: DataFrame,
    embs: DataFrame,
    max_hamming: int = 12,
    n_bits: int = 32,
    seed: int = 11,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score and gate image+caption pairs: returns one row per pair with
    ``img_sig`` (integer SRP of the image embedding), ``cap_sig`` (32-bit
    caption token SimHash), ``hamming`` between them over the low ``n_bits``
    bits, and ``aligned`` (the keep decision, hamming <= max_hamming).

    ``docs`` carries (doc_id, text); ``embs`` carries (vec_id, embedding);
    pairs join on doc_id == vec_id. Plan: two independent map-side signature
    stages meeting in one equi-join."""
    from lmw_tree_spark.functions.text import token_simhash32

    d = len(embs.select(vec_col).first()[0])
    planes = int_hyperplanes(d, n_bits=n_bits, seed=seed)
    img = srp_int_signatures(embs, planes, vec_id, vec_col, out_col="img_sig")
    cap = token_simhash32(docs, text_col=text_col, id_col=doc_id, out_col="cap_sig")
    mask = (1 << n_bits) - 1
    joined = cap.join(img, cap[doc_id] == img[vec_id]).drop(vec_id)
    return joined.select(
        doc_id,
        "img_sig",
        "cap_sig",
        F.bit_count(
            F.col("img_sig").bitwiseXOR(F.col("cap_sig")).bitwiseAND(F.lit(mask))
        )
        .cast("int")
        .alias("hamming"),
    ).withColumn("aligned", (F.col("hamming") <= F.lit(max_hamming)).cast("boolean"))


def interleave_assembly(
    docs: DataFrame,
    embs: DataFrame,
    per_doc_cap: int = 3,
    bucket_chars: int = 1,
    n_bits: int = 32,
    seed: int = 11,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MMC4-style interleaved-document assembly (Zhu et al., NeurIPS'23
    Datasets: place each image at its best-aligned text position, bounded per
    document): every image is assigned to the best-scoring document in its
    LOCALITY BUCKET, then each document keeps at most ``per_doc_cap`` images,
    best first. Output: (doc_id, vec_id, hamming, slot) — slot is the image's
    1-based position among the document's kept images.

    Locality: candidates are (image, doc) pairs sharing the first
    ``bucket_chars`` hex chars of md5(id) — the deterministic stand-in for
    MMC4's same-web-page constraint. Per-image candidate volume is
    ``n_docs / 16^bucket_chars``: at test scale 1 char (16 buckets) suffices;
    a 10^12-row corpus raises ``bucket_chars`` like ``shard_chars`` in the
    shard planner, keeping candidate sets page-sized — the knob IS the scale
    guard, and the bucket join is a plain equi-join AQE can split.

    Scoring reuses the integer cross-modal scorer (``srp_int_signatures`` vs
    the caption token SimHash — swap one Arrow kernel for a real CLIP model).
    The per-image argmin is ``min(struct(hamming, doc_id))`` — a partial
    aggregation, skew-immune, NOT a window; ties break to the lowest doc_id.
    The capacity pass ranks each document's won images by (hamming, vec_id) —
    a window whose partitions hold only the images a single document WON
    (bounded by the bucket's image count)."""
    from pyspark.sql import Window

    from lmw_tree_spark.functions.text import token_simhash32

    d = len(embs.select(vec_col).first()[0])
    planes = int_hyperplanes(d, n_bits=n_bits, seed=seed)
    img = srp_int_signatures(embs, planes, vec_id, vec_col, out_col="img_sig")
    cap = token_simhash32(docs, text_col=text_col, id_col=doc_id, out_col="cap_sig")
    bucket = lambda c: F.substring(F.md5(F.col(c).cast("string")), 1, bucket_chars)
    mask = (1 << n_bits) - 1
    cand = img.withColumn("b", bucket(vec_id)).join(
        cap.withColumn("b", bucket(doc_id)), "b"
    )
    scored = cand.select(
        vec_id,
        doc_id,
        F.bit_count(
            F.col("img_sig").bitwiseXOR(F.col("cap_sig")).bitwiseAND(F.lit(mask))
        )
        .cast("int")
        .alias("hamming"),
    )
    best = (
        scored.groupBy(vec_id)
        .agg(F.min(F.struct("hamming", doc_id)).alias("w"))
        .select(vec_id, F.col(f"w.{doc_id}").alias(doc_id), F.col("w.hamming").alias("hamming"))
    )
    w = Window.partitionBy(doc_id).orderBy(F.asc("hamming"), F.asc(vec_id))
    return (
        best.withColumn("slot", F.row_number().over(w))
        .where(F.col("slot") <= per_doc_cap)
        .select(doc_id, vec_id, "hamming", "slot")
    )


def crossmodal_retrieval_eval(
    docs: DataFrame,
    embs: DataFrame,
    query_pred=None,
    k: int = 3,
    n_bits: int = 32,
    seed: int = 11,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CLIP-style cross-modal retrieval eval — the number an alignment scorer
    (and its threshold) gets tuned against: for each query image, rank EVERY
    caption by signature Hamming (ties → doc_id ascending) and report where
    the image's OWN caption lands (own_rank, hit_at_1, hit_at_k).

    Same integer scorer as ``crossmodal_alignment`` (integer-hyperplane SRP
    of the embedding vs the caption's 32-bit token SimHash), so the whole
    eval — both signature stages, the ranking, the tie rule, the hits — is
    exact integer algebra with no materialized state. Eval-scoped like
    ``similarity.cosine_topk``: ``query_pred`` bounds the broadcast query
    side; the caption side is never restricted."""
    from pyspark.sql import Window

    from lmw_tree_spark.functions.text import token_simhash32

    d = len(embs.select(vec_col).first()[0])
    planes = int_hyperplanes(d, n_bits=n_bits, seed=seed)
    queries = embs if query_pred is None else embs.where(query_pred)
    img = srp_int_signatures(queries, planes, vec_id, vec_col, out_col="img_sig")
    cap = token_simhash32(docs, text_col=text_col, id_col=doc_id, out_col="cap_sig")
    mask = (1 << n_bits) - 1
    scored = F.broadcast(img).crossJoin(cap).select(
        vec_id,
        doc_id,
        F.bit_count(
            F.col("img_sig").bitwiseXOR(F.col("cap_sig")).bitwiseAND(F.lit(mask))
        )
        .cast("int")
        .alias("hamming"),
    )
    w = Window.partitionBy(vec_id).orderBy(F.asc("hamming"), F.asc(doc_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col(doc_id) == F.col(vec_id))
        .select(
            vec_id,
            F.col("rnk").cast("int").alias("own_rank"),
            (F.col("rnk") == 1).alias("hit_at_1"),
            (F.col("rnk") <= k).alias(f"hit_at_{k}"),
        )
    )
