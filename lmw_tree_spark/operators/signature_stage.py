"""Signature extraction stage: one ``mapInPandas`` pass over the input table that
decodes each image ONCE and emits every signature the pipeline needs.

Output schema (bytes column is dropped — downstream stages never read pixels again, so
Parquet column pruning keeps iteration passes narrow; see SURVEY.md §4):

    image_id, w, h, fmt, caption, phash,
    simhash  long         -- 64-bit random-hyperplane SimHash of 8x8 luma block means
    sig      array<long>  -- cfg.sig_bits-wide hyperplane signature of 32x32 luma
                             (TopSig-style dense→binary projection; the clustering
                              signature, analogous to the reference's 4096-bit inputs)
    minhash  array<long>  -- cfg.minhash_perms MinHash values over caption k-shingles

This is the UDF-heavy stage by design: decode + DCT + projections are genuinely
non-relational. Everything is batch-vectorized NumPy over Arrow batches; the only
per-row Python is the codec call (zlib — C speed), the documented stub boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lmw_tree_spark.config import PipelineConfig
from lmw_tree_spark.functions.bitops import pack_bits, u64_to_longs
from lmw_tree_spark.functions.signatures import (
    char_shingle_hashes,
    minhash_matrix,
    phash_from_luma32,
)
from lmw_tree_spark.sources import codecs

SIGNATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, phash long, "
    "simhash long, sig array<long>, minhash array<long>"
)

_PLANES_CACHE: dict[tuple[int, int, int], np.ndarray] = {}


def _planes(dims: int, bits: int, seed: int) -> np.ndarray:
    """Executor-cached hyperplane matrix (dims x bits), pinned seed → identical on
    every executor, every run."""
    key = (dims, bits, seed)
    if key not in _PLANES_CACHE:
        rng = np.random.default_rng(seed)
        # float32: halves the matmul cost; hyperplane SIGNS are insensitive to the
        # precision (margins are O(sqrt(dims)) while fp32 error is O(1e-5))
        _PLANES_CACHE[key] = rng.standard_normal((dims, bits)).astype(np.float32)
    return _PLANES_CACHE[key]


def _luma32_batch(byte_col, fmt_col) -> tuple[np.ndarray, np.ndarray]:
    """Decode a batch → ((N, 32, 32) float luma via nearest-neighbor resize,
    (N, 2) original (h, w))."""
    out = np.empty((len(byte_col), 32, 32), dtype=np.float64)
    dims = np.empty((len(byte_col), 2), dtype=np.int32)
    for i, (data, fmt) in enumerate(zip(byte_col, fmt_col)):
        px = codecs.decode_image(bytes(data), fmt)
        dims[i] = px.shape[:2]
        out[i] = codecs.resize_nn(codecs.luma(px), 32, 32)
    return out, dims


def _project_bits(feats: np.ndarray, bits: int, seed: int) -> np.ndarray:
    """Mean-centered hyperplane projection → (N, bits//64) packed uint64."""
    feats = np.asarray(feats, dtype=np.float32)
    feats = feats - feats.mean(axis=1, keepdims=True)
    proj = feats @ _planes(feats.shape[1], bits, seed)
    return pack_bits((proj > 0).astype(np.uint8))


def compute_signature_batch(pdf: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    from lmw_tree_spark.functions.signatures import _dct_matrix

    luma, dims = _luma32_batch(pdf["bytes"], pdf["fmt"])
    n = len(pdf)
    # 64-bit SimHash from 8x8 block-mean features of the 32x32 luma
    blocks = luma.reshape(n, 8, 4, 8, 4).mean(axis=(2, 4)).reshape(n, 64)
    simhash = _project_bits(blocks, 64, cfg.simhash_seed)[:, 0]
    # wide clustering signature from the 256 low-frequency DCT coefficients (the
    # perceptually meaningful subspace — same transform pHash uses; 4x cheaper to
    # project than raw 1024-dim luma and more robust to pixel noise)
    m = _dct_matrix(32).astype(np.float32)
    coeffs = np.matmul(np.matmul(m, luma.astype(np.float32)), m.T)
    sig = _project_bits(coeffs[:, :16, :16].reshape(n, 256), cfg.sig_bits, cfg.simhash_seed + 1)
    # caption MinHash
    sh, mask = char_shingle_hashes(pdf["caption"], cfg.shingle_k)
    mh = minhash_matrix(sh, mask, cfg.minhash_perms, cfg.minhash_seed)
    # keep the stored phash where present (it was computed from the same decoded
    # bytes at generation); COMPUTE it from the decoded pixels where the input
    # column is null — adapted sources (tar shards, sampled video frames) supply
    # no phash, and a placeholder constant would put every row in one pigeonhole
    # bucket AND verify every candidate pair as distance-0 dup
    out = pdf[["image_id", "w", "h", "fmt", "caption", "phash"]].copy()
    if out["phash"].isna().any():
        # recompute for the whole batch: Arrow→pandas turns a null-bearing int64
        # column into float64, so per-row mixing would read stored 64-bit values
        # through a 53-bit mantissa — all-or-nothing keeps them exact
        out["phash"] = phash_from_luma32(luma).view(np.int64)
        out["w"] = dims[:, 1]
        out["h"] = dims[:, 0]
    out["simhash"] = simhash.view(np.int64)
    out["sig"] = list(u64_to_longs(sig))
    out["minhash"] = list(mh.view(np.int64))
    return out


def extract_signatures(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """images (input_hint schema) → signatures DataFrame (SIGNATURES_SCHEMA)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield compute_signature_batch(pdf, cfg)

    return images.mapInPandas(run, SIGNATURES_SCHEMA)
