"""Batched pixel-level image operators over the opaque ``binary`` column —
the decode / resize / feature-extract trio of the multimodal layer (frame-sample
lives in sources/multimodal.py), each as an Arrow ``mapInPandas`` stage.

Decode happens once per image per pass inside the batch kernel; codecs come
from sources/codecs.py (real PNG, documented FJPG stand-in for lossy — swap for
libjpeg bindings in production, these operators do not change). The reference
has no image machinery (it consumes precomputed signatures,
/root/reference/src/CreateSignatures.h:26-60); this layer is specified by the
target's image+caption table.

Scale shape: pure map stages — no shuffle, no driver data; output rows carry
re-encoded payloads (resize) or fixed-width feature rows (stats), so the
pipeline composes: resize → signature stage → dedup runs end-to-end batched.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lmw_tree_spark.sources import codecs

RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"
STATS_SCHEMA = (
    "image_id string, w int, h int, mean_luma double, std_luma double, "
    "mean_r double, mean_g double, mean_b double"
)


def resize_images(
    images: DataFrame, out_h: int, out_w: int, out_fmt: str = "png"
) -> DataFrame:
    """(image_id, bytes, fmt) → same rows resized to (out_h, out_w) and
    re-encoded. Nearest-neighbor resampling per channel (codecs.resize_nn —
    the same kernel the generator's variant-2 near-dups use, so resized copies
    stay within the dedup layer's perceptual radius)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                pixels = codecs.decode_image(bytes(r.bytes), r.fmt)
                chans = [
                    codecs.resize_nn(pixels[..., c].astype(np.float64), out_h, out_w)
                    for c in range(pixels.shape[-1])
                ]
                out = np.stack(chans, axis=-1).clip(0, 255).astype(np.uint8)
                if out_fmt == "png":
                    data, fmt = codecs.encode_png(out), "png"
                else:
                    data, fmt = codecs.encode_lossy(out), "jpeg"
                rows.append((r.image_id, data, out_w, out_h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, RESIZED_SCHEMA)


def image_stats(images: DataFrame) -> DataFrame:
    """Per-image pixel statistics (decode + feature-extract): luma mean/std and
    per-channel means — the cheap quality/filter features of an image-corpus
    pipeline (e.g. drop near-black or near-constant images before signatures)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                pixels = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                lum = codecs.luma(pixels)
                rows.append(
                    (
                        r.image_id,
                        pixels.shape[1],
                        pixels.shape[0],
                        float(lum.mean()),
                        float(lum.std()),
                        float(pixels[..., 0].mean()),
                        float(pixels[..., 1].mean()),
                        float(pixels[..., 2].mean()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "mean_luma", "std_luma",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, STATS_SCHEMA)

FIDELITY_SCHEMA = (
    "image_id string, fmt string, npx bigint, sse double, psnr_db double, "
    "fidelity_pass boolean"
)


def transcode_fidelity(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Per-row decoded-pixel fidelity of a transcode to the lossy codec — the
    target spec's per-row invariant (decoded-pixel allclose, PSNR >= 40 dB for
    lossy formats) as a pure map stage.

    Each image is decoded, re-encoded through the lossy codec, decoded again,
    and compared pixel-for-pixel against the original decode: ``sse`` is the
    summed squared error over all ``npx`` channel values, ``psnr_db`` the
    peak-signal-to-noise ratio (NULL when the round trip is bit-exact — PSNR is
    infinite), and ``fidelity_pass`` requires exactness OR psnr >= min_psnr_db.
    Already-lossy sources round-trip exactly (quantization is idempotent:
    requantizing q*step yields q), so they assert the exactness branch while
    lossless sources measure the real quantization PSNR (~43 dB at step 6)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                rt = codecs.decode_lossy(codecs.encode_lossy(px))
                diff = px.astype(np.float64) - rt.astype(np.float64)
                sse = float(np.sum(diff * diff))
                npx = int(px.size)
                if sse == 0.0:
                    psnr_db, ok = None, True
                else:
                    psnr_db = float(
                        20.0 * np.log10(255.0) - 10.0 * np.log10(sse / npx)
                    )
                    ok = psnr_db >= min_psnr_db
                rows.append((r.image_id, r.fmt, npx, sse, psnr_db, ok))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "npx", "sse", "psnr_db", "fidelity_pass"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, FIDELITY_SCHEMA)

DHASH_SCHEMA = "image_id string, dhash bigint"


def dhash_images(images: DataFrame) -> DataFrame:
    """Difference-hash (dHash) perceptual signature: decode → BT.601 luma →
    8x9 nearest-neighbor downsample → horizontal gradient sign → 64-bit hash
    (bit ``i*8+j`` set iff ``small[i][j+1] > small[i][j]``).

    The classic cheap perceptual hash (Krawetz's dHash): gradient DIRECTION
    survives brightness/contrast shifts and small noise, so near-identical
    renders collide while distinct images don't. Pure map stage; every step
    (NN index map, luma weights, strict > comparison, bit packing) is integer/
    IEEE-deterministic, so an oracle can re-derive the hash from raw pixels.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(64, dtype=np.uint64).reshape(8, 8)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                small = codecs.resize_nn(codecs.luma(px), 8, 9)
                bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64)
                h64 = np.uint64((bits << k).sum(dtype=np.uint64))
                rows.append((r.image_id, int(np.int64(h64))))
            yield pd.DataFrame(rows, columns=["image_id", "dhash"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, DHASH_SCHEMA)


PATCH_SCHEMA = (
    "image_id string, py int, px int, n_px long, "
    "mean_r double, mean_g double, mean_b double"
)


def patch_extract(images: DataFrame, patch: int = 16) -> DataFrame:
    """Non-overlapping ``patch x patch`` tiling — the ViT-style image→token
    step of a multimodal training pipeline. One fixed-width row per patch:
    grid position ``(py, px)``, pixel count (edge patches of non-multiple
    images are smaller), and per-channel means (the 3-value patch embedding
    stand-in; a production projector consumes the same rows).

    Pure map stage over Arrow batches: decode once, one vectorized
    ``np.add.at`` accumulation per image — no shuffle, no driver data. The
    whole tiling algebra is SQL-replayable from decoded pixels:
    ``GROUP BY image_id, y // patch, x // patch``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for r in pdf.itertuples():
                pixels = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.float64)
                h, w, _ = pixels.shape
                gy, gx = (h + patch - 1) // patch, (w + patch - 1) // patch
                yy, xx = np.meshgrid(np.arange(h) // patch, np.arange(w) // patch,
                                     indexing="ij")
                flat = (yy * gx + xx).ravel()
                n = np.bincount(flat, minlength=gy * gx)
                sums = [
                    np.bincount(flat, weights=pixels[..., c].ravel(),
                                minlength=gy * gx)
                    for c in range(3)
                ]
                pidx = np.arange(gy * gx)
                out.append(pd.DataFrame({
                    "image_id": r.image_id,
                    "py": (pidx // gx).astype(np.int32),
                    "px": (pidx % gx).astype(np.int32),
                    "n_px": n.astype(np.int64),
                    "mean_r": sums[0] / n,
                    "mean_g": sums[1] / n,
                    "mean_b": sums[2] / n,
                }))
            yield pd.concat(out, ignore_index=True)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, PATCH_SCHEMA)


# Header-level validation — the corrupt-sample quarantine every binary-payload
# ingest needs (truncated downloads, mislabeled formats). Decision algebra is
# pure JVM column expressions over the binary prefix, so it runs inside the
# scan's codegen stage with zero Python and is exactly replayable in SQL from
# (fmt, header hex, byte length, declared dims).
PNG_MAGIC_HEX = "89504E47"
FJPG_MAGIC_HEX = "464A5047"
_MIN_LEN = {"png": 16, "jpeg": 10}  # 8B magic+IHDR start / 4B magic + 5B dims
MAX_DIM = 1 << 16


def validate_images(images: DataFrame) -> DataFrame:
    """Add ``head_hex``, ``blen``, and ``valid`` (magic matches the declared
    fmt, payload long enough to hold the header, dims sane)."""
    from pyspark.sql import functions as F

    head = F.upper(F.hex(F.expr("substring(bytes, 1, 4)")))
    blen = F.length("bytes").cast("long")
    magic_ok = (
        ((F.col("fmt") == "png") & (head == PNG_MAGIC_HEX))
        | (F.col("fmt").isin("jpeg", "jpg") & (head == FJPG_MAGIC_HEX))
    )
    len_ok = blen >= F.when(F.col("fmt") == "png", _MIN_LEN["png"]).otherwise(
        _MIN_LEN["jpeg"]
    )
    dims_ok = (
        (F.col("w") > 0) & (F.col("h") > 0)
        & (F.col("w") <= MAX_DIM) & (F.col("h") <= MAX_DIM)
    )
    return images.withColumn("head_hex", head).withColumn("blen", blen).withColumn(
        "valid", magic_ok & len_ok & dims_ok
    )


# The 8 dihedral (D4) index maps on a square array with c = n-1:
# output (y, x) samples source (sy, sx). Order: identity, rot90, rot180,
# rot270, flip-horizontal, flip-vertical, transpose, anti-transpose.
_DIHEDRAL = (
    lambda y, x, c: (y, x),
    lambda y, x, c: (x, c - y),
    lambda y, x, c: (c - y, c - x),
    lambda y, x, c: (c - x, y),
    lambda y, x, c: (y, c - x),
    lambda y, x, c: (c - y, x),
    lambda y, x, c: (x, y),
    lambda y, x, c: (c - x, c - y),
)

DHASH_MIN_SCHEMA = "image_id string, dhash_min long"


def dhash_dihedral(images: DataFrame) -> DataFrame:
    """Flip/rotation-invariant dHash: the min (as uint64) of the plain dHash
    over all 8 dihedral transforms of the SQUARE source image — so a mirrored
    or rotated re-post collides EXACTLY with its original (the D4 orbit of a
    transformed copy is the same set, hence the same min; plain dHash misses
    all of these).

    Transforms are applied BEFORE the 9x9 downsample by composing the NN
    index map with the dihedral index map (resize-then-flip differs from
    flip-then-resize by floor asymmetry, which would break exactness).
    Gradient bits use rows 0..7 x col-pairs 0..7 of each 9x9 grid. Pure map
    stage; integer index algebra end-to-end, so an oracle re-derives every
    canonical hash from raw pixels.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(64, dtype=np.uint64).reshape(8, 8)
        oi, oj = np.meshgrid(np.arange(9), np.arange(9), indexing="ij")
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                h, w = px.shape[:2]
                if h != w:
                    raise ValueError("dhash_dihedral requires square images")
                lum = codecs.luma(px)
                sy, sx = oi * h // 9, oj * w // 9  # NN grid in transform space
                best = None
                for t in _DIHEDRAL:
                    gy, gx = t(sy, sx, h - 1)
                    g = lum[gy, gx]
                    bits = (g[:8, 1:] > g[:8, :-1]).astype(np.uint64)
                    h64 = np.uint64((bits << k).sum(dtype=np.uint64))
                    best = h64 if best is None else min(best, h64)
                rows.append((r.image_id, int(np.int64(best))))
            yield pd.DataFrame(rows, columns=["image_id", "dhash_min"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, DHASH_MIN_SCHEMA)


TILE_HASH_SCHEMA = "image_id string, ty int, tx int, tile_hash long"


def tile_ahash(images: DataFrame, tile: int = 16) -> DataFrame:
    """Per-tile average-hash grid — the CROP-robust perceptual signature the
    whole-image families (phash/dhash/dihedral) structurally lack: a crop
    shifts every pixel the global hashes see, but tiles aligned to the same
    ``tile``-pixel lattice are bit-identical between an image and its crop, so
    any crop that preserves >= 2 whole tiles still collides.

    One row per whole tile: decode → integer BT.601 luma ``299r+587g+114b``
    (scaled x1000; exact int64 in any engine) → 8x8 NN subsample of the tile
    (stride ``tile//8``) → bit ``k=oi*8+oj`` set iff ``64*lum > sum(lum)``
    (the average-hash test as pure integer algebra — no float mean whose
    summation order could flip a borderline bit). Partial edge tiles are
    skipped (they cannot match across differently-sized crops anyway).
    Constant tiles hash to 0 (strict ``>`` never fires); callers must drop
    ``tile_hash = 0`` before any self-join — it is the degenerate hot bucket
    (flat sky/background tiles), the same guard as dedup.py's ``max_token_df``.

    Pure map stage; integer index algebra end-to-end, so an oracle re-derives
    every tile hash from raw pixels. Requires ``tile`` divisible by 8."""
    if tile % 8:
        raise ValueError("tile must be divisible by 8")
    step = tile // 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(64, dtype=np.uint64)  # bit index for (oi, oj) = oi*8+oj
        for pdf in batches:
            if not len(pdf):
                continue
            ids, tys, txs, hashes = [], [], [], []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w = px.shape[:2]
                gy, gx = h // tile, w // tile
                if not gy or not gx:
                    continue
                ilum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                # all tiles at once: (gy, gx, 8, 8) of NN-subsampled luma
                g = (
                    ilum[: gy * tile : step, : gx * tile : step]
                    .reshape(gy, 8, gx, 8)
                    .transpose(0, 2, 1, 3)
                )
                s = g.sum(axis=(2, 3), keepdims=True)
                bits = (64 * g > s).reshape(gy * gx, 64).astype(np.uint64)
                h64 = (bits << k).sum(axis=1, dtype=np.uint64)
                n = gy * gx
                ids.extend([r.image_id] * n)
                tidx = np.arange(n)
                tys.append(tidx // gx)
                txs.append(tidx % gx)
                hashes.append(h64.astype(np.int64))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "ty": np.concatenate(tys).astype(np.int32) if tys else [],
                    "tx": np.concatenate(txs).astype(np.int32) if txs else [],
                    "tile_hash": np.concatenate(hashes) if hashes else [],
                }
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, TILE_HASH_SCHEMA)


def tile_match_pairs(
    tiles: DataFrame, min_shared: int = 2, bucket_cap: int = 256
) -> DataFrame:
    """Crop-robust candidate pairs from a ``tile_ahash`` grid: images sharing
    >= ``min_shared`` DISTINCT tile-hash values (at ANY grid position — crops
    translate tile coordinates) → ``(src, dst, shared_tiles)``.

    All-JVM: distinct (image, hash) → hash-bucket self-join → pair rollup.
    Scale guards: ``tile_hash = 0`` (constant tiles) is dropped, and buckets
    larger than ``bucket_cap`` images (boilerplate tiles — logo corners,
    letterboxing) are dropped whole, the standard df-cap move: a tile shared
    by thousands of images identifies a TEMPLATE, not a duplicate."""
    from pyspark.sql import functions as F

    # persist the distinct (image, hash) set: it feeds THREE consumers (the
    # df-cap filter and both self-join sides) — without this the decode+hash
    # lineage runs three times (3x decode at 100 TB)
    th = (
        tiles.where(F.col("tile_hash") != 0)
        .select("image_id", "tile_hash")
        .distinct()
        .persist()
    )
    small = (
        th.groupBy("tile_hash")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= bucket_cap)
        .select("tile_hash")
    )
    th = th.join(small, "tile_hash")
    a, b = th.alias("a"), th.alias("b")
    return (
        a.join(b, "tile_hash")
        .where(F.col("a.image_id") < F.col("b.image_id"))
        .groupBy(
            F.col("a.image_id").alias("src"), F.col("b.image_id").alias("dst")
        )
        .agg(F.count_distinct("tile_hash").cast("long").alias("shared_tiles"))
        .where(F.col("shared_tiles") >= min_shared)
    )


def overlay_flags(tiles: DataFrame, min_images: int = 8) -> DataFrame:
    """Watermark / logo-overlay detection by template-tile mining — the
    model-free curation gate for stamped corpora: a tile hash recurring at the
    SAME grid position across ``min_images`` DISTINCT images identifies a
    template (logo stamp, watermark bar, UI chrome), exactly the boilerplate
    signal ``tile_match_pairs``' df-cap DROPS for dedup — this operator mines
    it instead. Opaque overlays only by construction (an alpha-blended mark
    mixes with per-image background, so its tile hashes differ — that case
    needs a learned detector, out of scope and documented here).

    Input is a ``tile_ahash`` grid; output one row per image: the number of
    template tiles it contains and the flag. Scale shape: one groupBy over
    tile rows (the exact-dedup plan), the template table is tiny by
    construction (≤ total_tiles / min_images rows, and in practice the few
    true stamps) so AQE broadcasts the join back; per-image rollup bounded by
    image count. Constant tiles (hash 0) are excluded — flat bars are
    letterbox_crop's job, not a logo."""
    th = tiles.where(F.col("tile_hash") != 0)
    templates = (
        th.groupBy("ty", "tx", "tile_hash")
        .agg(F.count_distinct("image_id").alias("n_images"))
        .where(F.col("n_images") >= min_images)
        .select("ty", "tx", "tile_hash")
    )
    per_img = (
        th.join(templates, ["ty", "tx", "tile_hash"])
        .groupBy("image_id")
        .agg(F.count("*").cast("long").alias("wm_tiles"))
    )
    universe = tiles.select("image_id").distinct()
    return universe.join(per_img, "image_id", "left").select(
        "image_id",
        F.coalesce("wm_tiles", F.lit(0)).alias("wm_tiles"),
        (F.coalesce("wm_tiles", F.lit(0)) > 0).cast("int").alias("watermarked"),
    )


def tile_self_similarity(tiles: DataFrame, min_repeats: int = 4) -> DataFrame:
    """Within-image template repetition — the collage / sprite-sheet /
    tiled-texture junk gate: an image whose OWN tiles repeat (the same
    non-constant tile hash at ``min_repeats``+ grid positions) is mosaic
    chrome, not a photograph — the within-image counterpart of
    ``overlay_flags``' cross-image template mining. Constant tiles (hash 0)
    are counted separately as ``n_flat`` (flat expanses are letterbox_crop's
    and entropy_gate's signal, not repetition).

    Input is a ``tile_ahash`` grid; output one row per image:
    (image_id, n_tiles, n_flat, n_repeated, max_repeat, tiled). Scale shape:
    two groupBys keyed (image, hash) then (image) — per-image cardinality is
    the tile-grid size, so both are bounded partial aggregations; no joins
    except the tiny universe patch."""
    th = tiles.where(F.col("tile_hash") != 0)
    per = th.groupBy("image_id", "tile_hash").agg(F.count("*").alias("c"))
    roll = per.groupBy("image_id").agg(
        F.sum("c").cast("long").alias("nz"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_repeated"),
        F.max("c").cast("long").alias("max_repeat"),
    )
    universe = tiles.groupBy("image_id").agg(
        F.count("*").cast("long").alias("n_tiles"),
        F.sum((F.col("tile_hash") == 0).cast("long")).alias("n_flat"),
    )
    return universe.join(roll, "image_id", "left").select(
        "image_id",
        "n_tiles",
        "n_flat",
        F.coalesce("n_repeated", F.lit(0)).alias("n_repeated"),
        F.coalesce("max_repeat", F.lit(0)).alias("max_repeat"),
        (F.coalesce("max_repeat", F.lit(0)) >= min_repeats)
        .cast("int")
        .alias("tiled"),
    )


TEXT_OVERLAY_SCHEMA = (
    "image_id string, n_px bigint, n_band_px bigint, "
    "flips bigint, band_flips bigint"
)


def text_overlay_stats(
    images: DataFrame, band_frac: int = 3, grad_min: int = 30_000
) -> DataFrame:
    """Burned-in text / meme-caption detector, model-free stand-in for the
    OCR-density filters of LAION-style curation (a real detector drops into
    the same fixed-width feature row): glyph strokes produce dense
    ALTERNATING strong horizontal gradients, so per image this counts
    adjacent-pixel gradient sign flips — positions x where
    ``g[x]·g[x+1] < 0`` with both ``|g| > grad_min`` on the x1000 integer
    luma — over the whole frame and over the bottom ``1/band_frac`` band
    (where caption bars live). All integer algebra from the decode, one
    fixed-width row per image; the gate itself (:func:`text_overlay_gate`)
    is a JVM projection. Pure map stage, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
                h = px.shape[0]
                ilum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                g = ilum[:, 1:] - ilum[:, :-1]
                strong = np.abs(g) > grad_min
                flip = (
                    (g[:, 1:] * g[:, :-1] < 0) & strong[:, 1:] & strong[:, :-1]
                )
                band0 = h - h // band_frac
                rows.append(
                    (
                        r.image_id,
                        int(ilum.size),
                        int(ilum[band0:].size),
                        int(flip.sum()),
                        int(flip[band0:].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_px", "n_band_px", "flips", "band_flips",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, TEXT_OVERLAY_SCHEMA
    )


def text_overlay_gate(
    stats: DataFrame, min_band_density: float = 0.05, band_ratio: float = 2.0
) -> DataFrame:
    """Decision over :func:`text_overlay_stats`: flag when the bottom band's
    flip density (flips per band pixel, rounded 4) is at least
    ``min_band_density`` AND at least ``band_ratio``× the whole-frame
    density — a caption bar is locally stroke-dense relative to its photo.
    Cross-multiplied ratio test (no division by a possibly-zero whole-frame
    density); densities on ROUNDED values per the parity contract."""
    band_d = F.round(
        F.col("band_flips").cast("double")
        / F.greatest(F.col("n_band_px"), F.lit(1)),  # h < band_frac → empty band
        4,
    )
    whole_d = F.round(F.col("flips").cast("double") / F.col("n_px"), 4)
    flagged = (band_d >= F.lit(min_band_density)) & (
        band_d >= F.lit(band_ratio) * whole_d
    )
    return stats.select(
        "image_id",
        band_d.alias("band_density"),
        whole_d.alias("frame_density"),
        flagged.cast("int").alias("text_overlay"),
    )


GATE_FEATURES_SCHEMA = (
    "image_id string, n_px bigint, ent_s double, "
    "n_interior bigint, sum_lap2 bigint, n_over bigint, n_under bigint, "
    "sum_rg bigint, sum_rg2 bigint, sum_yb2 bigint, sum_yb2sq bigint, "
    "max_dev int, n_colored bigint, max_repeat bigint"
)


def gate_features(
    images: DataFrame, tile: int = 16, spread_min: int = 16
) -> DataFrame:
    """ONE decode pass → every curation-gate feature. At 100 TB the decode is
    the dominant cost of the image-gate family (entropy, sharpness/exposure,
    grayscale/colorfulness, collage); running each gate as its own operator
    decodes the corpus once PER GATE. This kernel fuses them: a single Arrow
    map stage decodes each image once and emits one fixed-width row carrying
    the exact-integer (and one float) features of all four — the luma-
    histogram entropy sum, interior Laplacian energy + clip counts, opponent-
    axis color sums, and the within-image max tile-hash repeat. The gate
    decisions themselves stay in :func:`image_gates` (pure JVM projection),
    so thresholds re-tune without re-decoding. Feature semantics are
    bit-identical to the standalone operators (same luma scales, same strict
    inequalities, same hash-0 exclusion)."""
    if tile % 8:
        raise ValueError("tile must be divisible by 8")
    step = tile // 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(64, dtype=np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
                h, w = px.shape[:2]
                ilum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                n_px = int(ilum.size)
                # entropy: 256-bin histogram of //1000 luma (luma_histogram)
                cnts = np.bincount((ilum // 1000).ravel(), minlength=256)
                nz = cnts[cnts > 0].astype(np.float64)
                ent_s = float((nz * np.log2(nz)).sum())
                # sharpness/exposure (sharpness_stats)
                lap = (
                    4 * ilum[1:-1, 1:-1]
                    - ilum[:-2, 1:-1]
                    - ilum[2:, 1:-1]
                    - ilum[1:-1, :-2]
                    - ilum[1:-1, 2:]
                )
                # color opponent axes (color_stats)
                r_, g_, b_ = px[..., 0], px[..., 1], px[..., 2]
                rg = r_ - g_
                yb2 = r_ + g_ - 2 * b_
                dev = np.maximum(
                    np.abs(rg), np.maximum(np.abs(g_ - b_), np.abs(r_ - b_))
                )
                spread = px.max(axis=2) - px.min(axis=2)
                # within-image tile repeats (tile_ahash + tile_self_similarity)
                gy, gx = h // tile, w // tile
                max_repeat = 0
                if gy and gx:
                    g = (
                        ilum[: gy * tile : step, : gx * tile : step]
                        .reshape(gy, 8, gx, 8)
                        .transpose(0, 2, 1, 3)
                    )
                    s = g.sum(axis=(2, 3), keepdims=True)
                    bits = (64 * g > s).reshape(gy * gx, 64).astype(np.uint64)
                    h64 = (bits << k).sum(axis=1, dtype=np.uint64)
                    h64 = h64[h64 != 0]
                    if len(h64):
                        max_repeat = int(np.unique(h64, return_counts=True)[1].max())
                rows.append(
                    (
                        r.image_id, n_px, ent_s,
                        int(lap.size), int((lap * lap).sum()),
                        int((ilum > 240_000).sum()), int((ilum < 15_000).sum()),
                        int(rg.sum()), int((rg * rg).sum()),
                        int(yb2.sum()), int((yb2 * yb2).sum()),
                        int(dev.max()), int((spread > spread_min).sum()),
                        max_repeat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_px", "ent_s",
                    "n_interior", "sum_lap2", "n_over", "n_under",
                    "sum_rg", "sum_rg2", "sum_yb2", "sum_yb2sq",
                    "max_dev", "n_colored", "max_repeat",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, GATE_FEATURES_SCHEMA
    )


def image_gates(
    feats: DataFrame,
    min_bits: float = 3.0,
    gray_tol: int = 2,
    min_colorfulness: float = 10.0,
    min_lap2_mean: int = 1000,
    max_clip_frac: float = 0.5,
    min_repeats: int = 4,
) -> DataFrame:
    """Gate decisions over :func:`gate_features` — the composed image
    curation funnel in one whole-stage-codegen projection (no shuffle, no
    joins): per image the four keep flags with EXACTLY the standalone
    operators' decision algebra (entropy_gate, color_gate, sharpness_stats,
    tile_self_similarity) and the composite ``keep``. Float comparisons are
    on 4-digit-ROUNDED values (the repo's parity contract)."""
    n = F.col("n_px").cast("double")
    ent = F.round(F.log2("n_px") - F.col("ent_s") / n, 4)
    keep_entropy = (ent >= F.lit(min_bits)).cast("int")

    mean_rg = F.col("sum_rg").cast("double") / n
    mean_yb = F.col("sum_yb2").cast("double") / (F.lit(2.0) * n)
    var_rg = F.greatest(
        F.col("sum_rg2").cast("double") / n - mean_rg * mean_rg, F.lit(0.0)
    )
    var_yb = F.greatest(
        F.col("sum_yb2sq").cast("double") / (F.lit(4.0) * n) - mean_yb * mean_yb,
        F.lit(0.0),
    )
    cf = F.round(
        F.sqrt(var_rg + var_yb)
        + F.lit(0.3) * F.sqrt(mean_rg * mean_rg + mean_yb * mean_yb),
        4,
    )
    keep_color = (
        (F.col("max_dev") > F.lit(gray_tol)) & (cf >= F.lit(min_colorfulness))
    ).cast("int")

    keep_sharp = (
        (F.col("sum_lap2") >= F.lit(min_lap2_mean) * F.col("n_interior"))
        & (F.col("n_over") <= F.lit(max_clip_frac) * F.col("n_px"))
        & (F.col("n_under") <= F.lit(max_clip_frac) * F.col("n_px"))
    ).cast("int")

    keep_collage = (F.col("max_repeat") < F.lit(min_repeats)).cast("int")

    return feats.select(
        "image_id",
        keep_entropy.alias("keep_entropy"),
        keep_color.alias("keep_color"),
        keep_sharp.alias("keep_sharp"),
        keep_collage.alias("keep_collage"),
        (
            (keep_entropy == 1) & (keep_color == 1)
            & (keep_sharp == 1) & (keep_collage == 1)
        ).cast("int").alias("keep"),
    )


SHARPNESS_SCHEMA = (
    "image_id string, n_px long, n_interior long, sum_lap2 bigint, "
    "n_over long, n_under long, keep boolean"
)


def sharpness_stats(
    images: DataFrame,
    min_lap2_mean: int = 1000,
    max_clip_frac: float = 0.5,
    over_luma: int = 240_000,
    under_luma: int = 15_000,
) -> DataFrame:
    """Sharpness + exposure quality gate — the LAION-style image-curation
    filter (drop flat/blurry renders, drop blown-out or black frames) as a
    pure map stage with an integer decision algebra.

    Per image, over integer luma ``L = 299r+587g+114b`` (x1000 scale):
    ``sum_lap2`` = sum over interior pixels of the squared 4-neighbor
    Laplacian ``(4L[y,x] - L[y-1,x] - L[y+1,x] - L[y,x-1] - L[y,x+1])²``
    (the classic variance-of-Laplacian sharpness proxy, here a raw integer
    sum so any engine reproduces it bit-exactly); ``n_over``/``n_under`` =
    clipped-exposure pixel counts. ``keep`` iff
    ``sum_lap2 >= min_lap2_mean * n_interior`` (mean Laplacian energy
    threshold, cross-multiplied — no float division) AND neither clip count
    exceeds ``max_clip_frac`` of the pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
                ilum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                lap = (
                    4 * ilum[1:-1, 1:-1]
                    - ilum[:-2, 1:-1]
                    - ilum[2:, 1:-1]
                    - ilum[1:-1, :-2]
                    - ilum[1:-1, 2:]
                )
                n_px = int(ilum.size)
                n_int = int(lap.size)
                sum_lap2 = int((lap * lap).sum())
                n_over = int((ilum > over_luma).sum())
                n_under = int((ilum < under_luma).sum())
                keep = (
                    sum_lap2 >= min_lap2_mean * n_int
                    and n_over <= max_clip_frac * n_px
                    and n_under <= max_clip_frac * n_px
                )
                rows.append(
                    (r.image_id, n_px, n_int, sum_lap2, n_over, n_under, keep)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_px", "n_interior", "sum_lap2",
                    "n_over", "n_under", "keep",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, SHARPNESS_SCHEMA
    )


# SDXL-style multi-aspect bucket table: (bucket_id, bw, bh) around a ~1024²
# pixel budget. Fixed and small — it broadcasts as a column-literal array.
DEFAULT_AR_BUCKETS: tuple[tuple[int, int, int], ...] = (
    (0, 1024, 1024),
    (1, 1152, 896),
    (2, 896, 1152),
    (3, 1216, 832),
    (4, 832, 1216),
    (5, 1344, 768),
    (6, 768, 1344),
    (7, 1536, 640),
    (8, 640, 1536),
)


def assign_ar_buckets(
    df: DataFrame,
    buckets: tuple[tuple[int, int, int], ...] = DEFAULT_AR_BUCKETS,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing — the SDXL/multi-aspect training-prep step:
    assign every image the bucket whose aspect ratio is closest to its own,
    then emit the resize-then-center-crop geometry that maps it into the
    bucket. The reference has no image geometry (it consumes precomputed
    signatures); this step is specified by the target's image+caption table
    and is what a diffusion/vision training pipeline runs between curation
    and shard export.

    Exactness (so any engine reproduces the same assignment bit-for-bit):
    closest bucket = argmin over buckets of ``|w/h - bw/bh|``. Comparing the
    rationals directly, ``|w/h - bw_i/bh_i| < |w/h - bw_j/bh_j|`` ⟺
    ``|w*bh_i - h*bw_i| * (L/bh_i) < |w*bh_j - h*bw_j| * (L/bh_j)`` where
    ``L = lcm(all bh)`` — the shared factor ``h`` cancels and ``L/bh_i`` is
    an exact integer, so ``score_i = |w*bh_i - h*bw_i| * (L//bh_i)`` is a
    total integer key. Ties break to the lowest bucket_id. Resize geometry is
    cover-then-center-crop with ceiling division: if ``w*bh >= h*bw`` the
    height binds (``r_h = bh``, ``r_w = ceil(w*bh/h) >= bw``), else the width
    binds; crop offsets are floor-halved slack.

    Scale shape: a single projection — the bucket table is a column-literal
    array folded with ``array_min`` over (score, bucket_id) structs, so the
    stage is pure map, zero shuffle, whole-stage-codegen'd; no join, no
    window, no driver data at any row count.
    """
    import math

    from pyspark.sql import functions as F

    L = math.lcm(*[bh for _, _, bh in buckets])
    cands = F.array(
        *[
            F.struct(
                (
                    F.abs(
                        F.col(w_col).cast("long") * F.lit(int(bh))
                        - F.col(h_col).cast("long") * F.lit(int(bw))
                    )
                    * F.lit(L // bh)
                ).alias("score"),
                F.lit(int(bid)).alias("bucket_id"),
                F.lit(int(bw)).alias("bw"),
                F.lit(int(bh)).alias("bh"),
            )
            for bid, bw, bh in buckets
        ]
    )
    best = F.array_min(cands)
    out = df.select(
        id_col,
        F.col(w_col).cast("long").alias(w_col),
        F.col(h_col).cast("long").alias(h_col),
        best.getField("bucket_id").alias("bucket_id"),
        best.getField("bw").alias("bw"),
        best.getField("bh").alias("bh"),
    )
    w, h, bw, bh = (F.col(c) for c in (w_col, h_col, "bw", "bh"))
    height_binds = w * bh >= h * bw

    def ceil_div(num, den):  # exact: a ceil b = (a + b - 1 - (a + b - 1) % b) / b
        a = num + den - 1
        return ((a - a % den) / den).cast("long")

    r_w = F.when(height_binds, ceil_div(w * bh, h)).otherwise(bw).cast("long")
    r_h = F.when(height_binds, bh).otherwise(ceil_div(h * bw, w)).cast("long")
    out = out.select("*", r_w.alias("r_w"), r_h.alias("r_h"))
    slack_x, slack_y = F.col("r_w") - bw, F.col("r_h") - bh
    return out.select(
        "*",
        ((slack_x - slack_x % 2) / 2).cast("long").alias("off_x"),
        ((slack_y - slack_y % 2) / 2).cast("long").alias("off_y"),
    )


# ---------------------------------------------------------------------------
# pHash — DCT perceptual hash, exact-integer formulation
# ---------------------------------------------------------------------------

PHASH_FBITS = 12  # cos table scale 2^12: min |frac - 0.5| margin ≈ 0.022
PHASH_SCHEMA = "image_id string, phash bigint"


def _dct_table(n: int = 32) -> np.ndarray:
    """Fixed-point DCT-II basis: T[k][m] = round(cos(π(2m+1)k / 2n) · 2^12)
    as int64. The table is the ONLY float-derived constant in the pHash and
    it is engine-portable by margin: the nearest .5 rounding boundary sits
    ≈0.022 away at this scale (measured over all 1024 entries), ~14 orders of
    magnitude beyond any libm cos ulp disagreement — so DuckDB's cos()
    rebuilds the identical integer table and the whole hash replays in SQL.
    """
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return np.round(
        np.cos(np.pi * (2 * m + 1) * k / (2 * n)) * (1 << PHASH_FBITS)
    ).astype(np.int64)


def _phash_of(px: np.ndarray, t: np.ndarray, kbit: np.ndarray) -> int:
    """The shared exact-integer DCT hash kernel: int64 luma → 32×32 NN →
    fixed-point 2-D DCT-II → top-left 8×8 → bits vs the 32nd-smallest coef."""
    ilum = (
        299 * px[..., 0].astype(np.int64)
        + 587 * px[..., 1].astype(np.int64)
        + 114 * px[..., 2].astype(np.int64)
    )
    small = codecs.resize_nn(ilum, 32, 32)
    block = (t @ small @ t.T)[:8, :8]
    med = np.sort(block.ravel())[31]
    bits = (block > med).astype(np.uint64)
    return int(np.int64(np.uint64((bits << kbit).sum(dtype=np.uint64))))


def phash_images(images: DataFrame) -> DataFrame:
    """DCT perceptual hash (pHash, Krawetz/Zauner) derived END-TO-END from
    raw pixels in exact integer algebra: decode → integer luma
    (299r+587g+114b) → 32×32 NN downsample → fixed-point 2-D DCT-II
    (T·L·Tᵀ, int64 — max |coef| < 2^62, no overflow) → top-left 8×8 block →
    bit u·8+v set iff coef > the block's 32nd-smallest value (a deterministic
    order statistic instead of the conventional mean-of-two median, so the
    tie rule is engine-portable).

    pHash completes the perceptual family: dHash (gradients) is cheap but
    alias-prone, tile-aHash handles crops, the dihedral orbit handles
    flips/rotations — DCT low-frequency structure survives blur/re-encode/
    resize, the transformations re-posts actually undergo. Pure map stage;
    the input table's stored ``phash`` column (input_hint) is what this
    operator produces upstream. Reference anchor: TopSig-style dense
    bit-signature generation (/root/reference/src/lmw/SVector.h:258-263) —
    same sign-threshold-pack shape, DCT energies instead of random
    projections."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = _dct_table(32)
        kbit = np.arange(64, dtype=np.uint64).reshape(8, 8)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                rows.append((r.image_id, _phash_of(px, t, kbit)))
            yield pd.DataFrame(rows, columns=["image_id", "phash"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, PHASH_SCHEMA)


HIST_SCHEMA = "image_id string, bin int, cnt long"


def luma_histogram(images: DataFrame) -> DataFrame:
    """Per-image 256-bin integer-luma histogram — the feature under the
    low-information gate (and any palette/contrast analysis): decode →
    integer BT.601 luma ``(299r + 587g + 114b) div 1000`` → exact bin counts.
    One fixed-width long-format row per occupied bin, all integers, so any
    SQL engine rebuilds the histogram from raw pixels bit-for-bit.

    Pure Arrow map stage: no shuffle, output ≤256 rows per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt).astype(np.int64)
                lum = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
                bins, cnts = np.unique(lum.ravel(), return_counts=True)
                out.append(
                    pd.DataFrame(
                        {
                            "image_id": r.image_id,
                            "bin": bins.astype(np.int32),
                            "cnt": cnts.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, HIST_SCHEMA)


def entropy_gate(hist: DataFrame, min_bits: float = 3.0) -> DataFrame:
    """Low-information image gate — drop near-constant / flat-gradient images
    (solid placeholders, blank thumbnails) before they pollute signatures:
    keep iff the luma-histogram Shannon entropy is at least ``min_bits``
    (8-bit luma caps at 8 bits; solid color = 0).

    Entropy from exact counts via ``H = log2(n) − (Σ c·log2 c)/n`` — one log
    per occupied bin, rounded to 4 digits (the repo's float-parity contract;
    the keep decision compares the ROUNDED value so no ulp flips it). Scale
    shape: one groupBy(image_id) over ≤256-row groups, all JVM built-ins."""
    g = hist.groupBy("image_id").agg(
        F.sum("cnt").cast("long").alias("n_px"),
        F.sum(F.col("cnt") * F.log2("cnt")).alias("_s"),
    )
    ent = F.round(F.log2("n_px") - F.col("_s") / F.col("n_px"), 4)
    return g.select(
        "image_id",
        "n_px",
        ent.alias("entropy"),
        (ent >= F.lit(min_bits)).cast("int").alias("keep"),
    )


COLOR_SCHEMA = (
    "image_id string, n_px bigint, sum_rg bigint, sum_rg2 bigint, "
    "sum_yb2 bigint, sum_yb2sq bigint, max_dev int, n_colored bigint"
)


def color_stats(images: DataFrame, spread_min: int = 16) -> DataFrame:
    """Per-image exact integer color aggregates — the feature stage under the
    grayscale / colorfulness curation gate (LAION-style color filtering before
    aesthetic subsetting). Per pixel the two opponent axes of Hasler &
    Süsstrunk's colorfulness metric (SPIE 2003), kept integral by doubling the
    yellow-blue axis: ``RG = R − G`` and ``YB2 = R + G − 2B`` (= 2·yb), plus
    the channel deviation ``max(|R−G|, |G−B|, |R−B|)`` (grayscale iff every
    pixel's deviation is ~0) and the count of saturated pixels (channel spread
    > ``spread_min``). Sums of integers only, so any SQL engine rebuilds every
    aggregate from raw pixels bit-for-bit.

    Pure Arrow map stage: no shuffle, one fixed-width row per image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for rec in pdf.itertuples():
                px = codecs.decode_image(bytes(rec.bytes), rec.fmt).astype(np.int64)
                r, g, b = px[..., 0], px[..., 1], px[..., 2]
                rg = r - g
                yb2 = r + g - 2 * b
                dev = np.maximum(np.abs(rg), np.maximum(np.abs(g - b), np.abs(r - b)))
                spread = px.max(axis=2) - px.min(axis=2)
                rows.append(
                    (
                        rec.image_id,
                        int(rg.size),
                        int(rg.sum()),
                        int((rg * rg).sum()),
                        int(yb2.sum()),
                        int((yb2 * yb2).sum()),
                        int(dev.max()),
                        int((spread > spread_min).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "n_px", "sum_rg", "sum_rg2",
                    "sum_yb2", "sum_yb2sq", "max_dev", "n_colored",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, COLOR_SCHEMA)


def color_gate(
    stats: DataFrame, gray_tol: int = 2, min_colorfulness: float = 10.0
) -> DataFrame:
    """Grayscale / low-colorfulness curation gate over ``color_stats`` output:
    flag grayscale images (every pixel's channel deviation ≤ ``gray_tol`` —
    the tolerance absorbs lossy-codec chroma noise) and compute Hasler &
    Süsstrunk colorfulness ``sqrt(σ²_rg + σ²_yb) + 0.3·sqrt(μ²_rg + μ²_yb)``
    from the exact integer sums (yb recovered from the doubled axis by /2).
    keep iff not grayscale AND colorfulness ≥ threshold; both float outputs
    are rounded to 4 digits and the decision compares the ROUNDED value so no
    ulp ever flips it (the repo's float-parity contract). Variances clamp at
    0 before sqrt (an exactly-constant axis can float to −ulp).

    Scale shape: pure projection over one row per image — no shuffle, whole-
    stage codegen end-to-end."""
    n = F.col("n_px").cast("double")
    mean_rg = F.col("sum_rg").cast("double") / n
    mean_yb = F.col("sum_yb2").cast("double") / (F.lit(2.0) * n)
    var_rg = F.greatest(
        F.col("sum_rg2").cast("double") / n - mean_rg * mean_rg, F.lit(0.0)
    )
    var_yb = F.greatest(
        F.col("sum_yb2sq").cast("double") / (F.lit(4.0) * n) - mean_yb * mean_yb,
        F.lit(0.0),
    )
    cf = F.round(
        F.sqrt(var_rg + var_yb)
        + F.lit(0.3) * F.sqrt(mean_rg * mean_rg + mean_yb * mean_yb),
        4,
    )
    gray = (F.col("max_dev") <= F.lit(gray_tol)).cast("int")
    return stats.select(
        "image_id",
        gray.alias("grayscale"),
        F.round(F.col("n_colored").cast("double") / n, 4).alias("colored_frac"),
        cf.alias("colorfulness"),
        ((gray == 0) & (cf >= F.lit(min_colorfulness))).cast("int").alias("keep"),
    )


LETTERBOX_SCHEMA = (
    "image_id string, w int, h int, crop_top int, crop_bottom int, "
    "crop_left int, crop_right int, inner_w int, inner_h int, has_letterbox int"
)


def letterbox_crop(images: DataFrame) -> DataFrame:
    """Letterbox / pillarbox margin detection — the crop-normalization step
    before perceptual hashing (a padded re-upload of an image must dedup
    against the original, so bars come off before pHash; same pre-step video
    pipelines run on frames). A row (column) is FLAT iff every channel is
    constant across it; each crop is the run length of flat rows/columns from
    that edge. All-exact integer comparisons — no tolerance knob, no float:
    synthetic bars are exactly constant, and a real-codec deployment would
    quantize before this test rather than loosen it.

    Output per image: the four crop widths, the inner content box
    (``inner_w/h`` = 0 for an entirely flat image), and ``has_letterbox``.
    Pure Arrow map stage — no shuffle, fixed-width output rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def runlen(flat: np.ndarray) -> tuple[int, int]:
            if flat.all():
                return len(flat), 0
            nz = np.flatnonzero(~flat)
            return int(nz[0]), int(len(flat) - 1 - nz[-1])

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                row_flat = (px == px[:, :1, :]).all(axis=(1, 2))
                col_flat = (px == px[:1, :, :]).all(axis=(0, 2))
                top, bottom = runlen(row_flat)
                left, right = runlen(col_flat)
                iw, ih = max(w - left - right, 0), max(h - top - bottom, 0)
                rows.append(
                    (r.image_id, w, h, top, bottom, left, right, iw, ih,
                     int(top + bottom + left + right > 0))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "crop_top", "crop_bottom",
                    "crop_left", "crop_right", "inner_w", "inner_h",
                    "has_letterbox",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, LETTERBOX_SCHEMA)


CROPPED_PHASH_SCHEMA = (
    "image_id string, phash bigint, crop_top int, crop_bottom int, "
    "crop_left int, crop_right int"
)


def phash_cropped(images: DataFrame) -> DataFrame:
    """Crop-normalized perceptual hash — the composition ``letterbox_crop →
    phash``: bars come off, THEN the DCT hash runs on the inner content box,
    so a padded re-upload hashes IDENTICALLY to its original (the raw pHash of
    a padded copy differs: the bars shift the 32×32 sample grid and the DCT
    energy). Fully-flat images (inner box 0×0) fall back to the full-frame
    hash — there is no content to normalize, and the exact-dup path already
    groups them. One decode per image, pure Arrow map stage, fixed-width
    output rows; the same exact-integer algebra as ``phash_images`` so the
    whole composition replays in SQL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = _dct_table(32)
        kbit = np.arange(64, dtype=np.uint64).reshape(8, 8)

        def runlen(flat: np.ndarray) -> tuple[int, int]:
            if flat.all():
                return len(flat), 0
            nz = np.flatnonzero(~flat)
            return int(nz[0]), int(len(flat) - 1 - nz[-1])

        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for r in pdf.itertuples():
                px = codecs.decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                row_flat = (px == px[:, :1, :]).all(axis=(1, 2))
                col_flat = (px == px[:1, :, :]).all(axis=(0, 2))
                top, bottom = runlen(row_flat)
                left, right = runlen(col_flat)
                if h - top - bottom <= 0 or w - left - right <= 0:
                    top = bottom = left = right = 0
                inner = px[top:h - bottom, left:w - right]
                rows.append(
                    (r.image_id, _phash_of(inner, t, kbit),
                     top, bottom, left, right)
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "phash", "crop_top", "crop_bottom",
                         "crop_left", "crop_right"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, CROPPED_PHASH_SCHEMA
    )
