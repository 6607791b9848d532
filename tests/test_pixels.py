"""Pixel operators: resize round-trip, composition with the signature stage,
and stats vs NumPy."""

import numpy as np

from lmw_tree_spark.sources import codecs
from lmw_tree_spark.sources.images import generate_images


def test_resize_images_roundtrip_and_composes_with_signatures(spark):
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators.pixels import resize_images
    from lmw_tree_spark.operators.signature_stage import extract_signatures
    from pyspark.sql import functions as F

    images = generate_images(spark, 24)
    resized = resize_images(images, 16, 16)
    pdf = resized.toPandas()
    assert len(pdf) == 24
    assert (pdf["w"] == 16).all() and (pdf["h"] == 16).all()
    px = codecs.decode_image(bytes(pdf["bytes"].iloc[0]), pdf["fmt"].iloc[0])
    assert px.shape == (16, 16, 3)

    # resized rows flow straight back into the signature stage
    as_input = resized.join(
        images.select("image_id", "caption"), "image_id"
    ).withColumn("phash", F.lit(None).cast("long"))
    sigs = extract_signatures(as_input, SMALL)
    assert sigs.count() == 24

    # nearest-neighbor resize of a resized copy is perceptually close: the
    # phash of original vs resized stays within the dedup verify radius
    orig_sigs = extract_signatures(images, SMALL).select("image_id", "phash")
    res_sigs = sigs.select(
        F.col("image_id").alias("image_id"), F.col("phash").alias("phash_r")
    )
    joined = orig_sigs.join(res_sigs, "image_id").select(
        F.bit_count(
            F.col("phash").bitwiseXOR(F.col("phash_r"))
        ).alias("d")
    )
    dists = [r["d"] for r in joined.collect()]
    assert np.median(dists) <= 12  # perceptually close for most images


def test_image_stats_match_numpy(spark):
    from lmw_tree_spark.operators.pixels import image_stats

    images = generate_images(spark, 6)
    src = {r["image_id"]: (bytes(r["bytes"]), r["fmt"]) for r in images.collect()}
    got = image_stats(images).toPandas().set_index("image_id")
    for iid, (data, fmt) in src.items():
        px = codecs.decode_image(data, fmt).astype(np.float64)
        lum = codecs.luma(px)
        assert abs(got.loc[iid, "mean_luma"] - lum.mean()) < 1e-9
        assert abs(got.loc[iid, "std_luma"] - lum.std()) < 1e-9
        assert abs(got.loc[iid, "mean_g"] - px[..., 1].mean()) < 1e-9
        assert got.loc[iid, "w"] == px.shape[1] and got.loc[iid, "h"] == px.shape[0]


def test_transcode_fidelity_psnr_invariant(spark):
    """Lossless sources measure the real quantization PSNR (~43 dB, above the
    40 dB target-spec floor); already-lossy sources round-trip bit-exactly
    (idempotent quantization → sse 0, psnr NULL). Spark rows must match a
    NumPy recomputation per image."""
    from lmw_tree_spark.operators.pixels import transcode_fidelity

    images = generate_images(spark, 60).persist()
    rows = {r["image_id"]: r for r in transcode_fidelity(images).collect()}
    src = {r["image_id"]: r for r in images.collect()}
    assert len(rows) == 60
    for iid, r in rows.items():
        assert r["fidelity_pass"], iid
        px = codecs.decode_image(bytes(src[iid]["bytes"]), src[iid]["fmt"])
        rt = codecs.decode_lossy(codecs.encode_lossy(px))
        sse = float(((px.astype(np.float64) - rt.astype(np.float64)) ** 2).sum())
        assert r["sse"] == sse and r["npx"] == px.size
        if src[iid]["fmt"] == "jpeg":
            assert sse == 0.0 and r["psnr_db"] is None
        else:
            assert sse > 0.0 and 40.0 <= r["psnr_db"] <= 50.0
    assert any(v["fmt"] == "png" for v in src.values())
    assert any(v["fmt"] == "jpeg" for v in src.values())


def test_dhash_matches_numpy_and_separates_groups(spark):
    """dHash equals a direct NumPy recompute per image; planted ±1-noise
    copies (variant 1) stay within a small Hamming radius of their base while
    unrelated bases differ widely."""
    from lmw_tree_spark.operators.pixels import dhash_images
    from lmw_tree_spark.sources.images import base_index

    images = generate_images(spark, 60).persist()
    got = {r["image_id"]: r["dhash"] for r in dhash_images(images).collect()}
    src = {r["image_id"]: r for r in images.collect()}
    k = np.arange(64, dtype=np.uint64).reshape(8, 8)
    for iid, r in src.items():
        px = codecs.decode_image(bytes(r["bytes"]), r["fmt"])
        small = codecs.resize_nn(codecs.luma(px), 8, 9)
        bits = (small[:, 1:] > small[:, :-1]).astype(np.uint64)
        want = int(np.int64(np.uint64((bits << k).sum(dtype=np.uint64))))
        assert got[iid] == want, iid

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")

    ids = sorted(src)
    near, far = [], []
    for iid in ids:
        i = int(iid[3:])
        b = base_index(i)
        if i != b and i - b == 1:  # noise variant vs its base
            near.append(ham(got[iid], got[f"img{b:010d}"]))
    bases = [got[i] for i in ids if int(i[3:]) == base_index(int(i[3:]))]
    for x in range(0, len(bases) - 1, 2):
        far.append(ham(bases[x], bases[x + 1]))
    assert near and max(near) <= 10
    assert far and min(far) >= 12


def test_patch_extract_matches_numpy_tiling(spark):
    """Exact per-patch means vs a NumPy reshape reference, including ragged
    edge patches when the image size is not a multiple of the patch."""
    from lmw_tree_spark.operators.pixels import patch_extract

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (20, 36, 3), dtype=np.uint8)
    row = [("im0", codecs.encode_png(px), 36, 20, "png")]
    df = spark.createDataFrame(
        row, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {
        (r["py"], r["px"]): r
        for r in patch_extract(df, patch=16).collect()
    }
    # 20x36 with 16 -> grid 2x3; edge patches are 4 tall / 4 wide
    assert set(got) == {(i, j) for i in range(2) for j in range(3)}
    for (i, j), r in got.items():
        block = px[i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16].astype(np.float64)
        assert r["n_px"] == block.shape[0] * block.shape[1]
        for ci, c in enumerate(("mean_r", "mean_g", "mean_b")):
            assert abs(r[c] - block[..., ci].mean()) < 1e-9, (i, j, c)


def test_patch_counts_conserve_pixels(spark):
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import patch_extract

    images = generate_images(spark, 30)
    patches = patch_extract(images, patch=16)
    per_img = patches.groupBy("image_id").agg(F.sum("n_px").alias("n"))
    joined = per_img.join(images.select("image_id", "w", "h"), "image_id")
    bad = joined.where(F.col("n") != F.col("w") * F.col("h")).count()
    assert bad == 0


def test_validate_images_flags_each_failure_mode(spark):
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import validate_images

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    png, lossy = codecs.encode_png(px), codecs.encode_lossy(px)
    rows = [
        ("ok_png", png, 8, 8, "png"),
        ("ok_jpeg", lossy, 8, 8, "jpeg"),
        ("truncated", png[:3], 8, 8, "png"),
        ("mislabeled", png, 8, 8, "jpeg"),  # png bytes declared jpeg
        ("bad_dims", png, 0, 8, "png"),
        ("huge_dims", png, 1 << 20, 8, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r["image_id"]: r["valid"] for r in validate_images(df).collect()}
    assert got == {
        "ok_png": True, "ok_jpeg": True, "truncated": False,
        "mislabeled": False, "bad_dims": False, "huge_dims": False,
    }
    # validation is pure JVM: no Python stage in the plan
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        validate_images(df).explain()
    assert "BatchEvalPython" not in buf.getvalue()


def test_dhash_dihedral_invariance(spark):
    """The canonical hash is EXACTLY invariant under all 8 dihedral
    transforms of the source image; the plain dHash is not (that's the
    point of the orbit-min)."""
    from lmw_tree_spark.operators.pixels import _DIHEDRAL, dhash_dihedral, dhash_images

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    yy, xx = np.meshgrid(np.arange(48), np.arange(48), indexing="ij")
    rows = []
    for t_idx, t in enumerate(_DIHEDRAL):
        sy, sx = t(yy, xx, 47)
        px = base[sy, sx]
        rows.append((f"t{t_idx}", codecs.encode_png(px), 48, 48, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    canon = {r["image_id"]: r["dhash_min"] for r in dhash_dihedral(df).collect()}
    assert len(set(canon.values())) == 1, canon
    plain = {r["image_id"]: r["dhash"] for r in dhash_images(df).collect()}
    assert len(set(plain.values())) > 1  # plain dHash splits the orbit


def test_tile_ahash_crop_invariance_and_matching(spark):
    """Tiles of a lattice-aligned crop are bit-identical to the original's
    tiles, so tile_match_pairs links the crop to its source — the modality
    whole-image hashes miss (their hash shifts with every cropped pixel)."""
    from lmw_tree_spark.operators.pixels import (
        dhash_images, tile_ahash, tile_match_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    crop = np.ascontiguousarray(base[:, :48])  # drop the last 16-px column
    rows = [
        ("orig", codecs.encode_png(base), 64, 64, "png"),
        ("crop", codecs.encode_png(crop), 48, 64, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    tiles = tile_ahash(df, tile=16).toPandas()
    assert len(tiles[tiles.image_id == "orig"]) == 16  # 4x4 grid
    assert len(tiles[tiles.image_id == "crop"]) == 12  # 4x3 grid
    o = tiles[tiles.image_id == "orig"].set_index(["ty", "tx"])["tile_hash"]
    c = tiles[tiles.image_id == "crop"].set_index(["ty", "tx"])["tile_hash"]
    for key, hv in c.items():
        assert o[key] == hv  # every surviving tile hash is unchanged

    pairs = tile_match_pairs(tile_ahash(df, tile=16)).toPandas()
    assert len(pairs) == 1
    assert pairs.iloc[0]["shared_tiles"] >= 12

    # the whole-image dHash does NOT survive the crop (the point of tiles)
    dh = {r["image_id"]: r["dhash"] for r in dhash_images(df).collect()}
    assert dh["orig"] != dh["crop"]


def test_tile_match_guards_degenerate_and_template_buckets(spark):
    """Constant tiles hash to 0 and are dropped; a tile shared by more images
    than bucket_cap is a template, dropped whole."""
    from lmw_tree_spark.operators.pixels import tile_ahash, tile_match_pairs

    flat = np.full((16, 16, 3), 77, dtype=np.uint8)
    rng = np.random.default_rng(3)
    shared = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [(f"f{i}", codecs.encode_png(flat), 16, 16, "png") for i in range(4)]
    rows += [(f"s{i}", codecs.encode_png(shared), 16, 16, "png") for i in range(4)]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    tiles = tile_ahash(df, tile=16)
    flat_hashes = tiles.where("image_id like 'f%'").toPandas()["tile_hash"]
    assert (flat_hashes == 0).all()  # constant tile → degenerate hash
    # flat images never pair (hash 0 dropped); shared-content images all pair
    pairs = tile_match_pairs(tiles, min_shared=1).toPandas()
    assert not pairs["src"].str.startswith("f").any()
    assert len(pairs) == 6  # C(4,2) among s0..s3
    # with bucket_cap below the bucket size the template bucket drops whole
    assert tile_match_pairs(tiles, min_shared=1, bucket_cap=3).count() == 0


def test_sharpness_stats_matches_numpy_and_gates(spark):
    """sum_lap2/clip counts match a NumPy replay exactly (integer algebra);
    flat frames are dropped, textured frames kept."""
    from lmw_tree_spark.operators.pixels import sharpness_stats

    rng = np.random.default_rng(5)
    tex = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    flat = np.full((32, 32, 3), 128, dtype=np.uint8)
    white = np.full((32, 32, 3), 252, dtype=np.uint8)
    rows = [
        ("tex", codecs.encode_png(tex), 32, 32, "png"),
        ("flat", codecs.encode_png(flat), 32, 32, "png"),
        ("white", codecs.encode_png(white), 32, 32, "png"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = sharpness_stats(df).toPandas().set_index("image_id")

    lum = (
        299 * tex[..., 0].astype(np.int64)
        + 587 * tex[..., 1].astype(np.int64)
        + 114 * tex[..., 2].astype(np.int64)
    )
    lap = (
        4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1] - lum[2:, 1:-1]
        - lum[1:-1, :-2] - lum[1:-1, 2:]
    )
    assert out.loc["tex", "sum_lap2"] == int((lap * lap).sum())
    assert out.loc["tex", "n_interior"] == 30 * 30
    assert bool(out.loc["tex", "keep"])

    assert out.loc["flat", "sum_lap2"] == 0
    assert not bool(out.loc["flat", "keep"])
    assert out.loc["white", "n_over"] == 32 * 32  # luma 252000 > 240000
    assert not bool(out.loc["white", "keep"])


def test_ar_bucket_assignment_matches_numpy_and_covers_geometry(spark):
    """assign_ar_buckets vs a NumPy argmin reference: bucket choice (exact
    rational comparison incl. ties), cover-resize ceil division, center-crop
    offsets; resized dims always cover the bucket."""
    import math

    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import DEFAULT_AR_BUCKETS, assign_ar_buckets

    df = spark.range(0, 300, 1, 4).select(
        F.col("id").alias("image_id"),
        (16 + F.pmod(F.col("id") * 97, F.lit(1009))).alias("w"),
        (16 + F.pmod(F.col("id") * 61 + 7, F.lit(1009))).alias("h"),
    )
    pdf = assign_ar_buckets(df, id_col="image_id").toPandas()
    L = math.lcm(*[bh for _, _, bh in DEFAULT_AR_BUCKETS])
    for r in pdf.itertuples():
        scores = [
            (abs(r.w * bh - r.h * bw) * (L // bh), bid)
            for bid, bw, bh in DEFAULT_AR_BUCKETS
        ]
        bid = min(scores)[1]
        assert r.bucket_id == bid
        _, bw, bh = DEFAULT_AR_BUCKETS[bid]
        if r.w * bh >= r.h * bw:
            rw, rh = -(-r.w * bh // r.h), bh
        else:
            rw, rh = bw, -(-r.h * bw // r.w)
        assert (r.r_w, r.r_h) == (rw, rh)
        assert rw >= bw and rh >= bh  # cover: crop never pads
        assert (r.off_x, r.off_y) == ((rw - bw) // 2, (rh - bh) // 2)


def test_ar_bucket_exact_ratio_and_ties(spark):
    """An image exactly at a bucket's ratio maps to that bucket with zero
    slack; a square image ties between no buckets (1024x1024 is unique) but
    the tie rule is pinned by two buckets equidistant from 1:1."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import assign_ar_buckets

    rows = [(0, 2304, 1792), (1, 512, 512), (2, 63, 63)]
    df = spark.createDataFrame(rows, "image_id long, w long, h long")
    pdf = (
        assign_ar_buckets(df, id_col="image_id")
        .orderBy("image_id")
        .toPandas()
    )
    # 2304/1792 == 1152/896 exactly → bucket 1, resize is exact, no crop
    assert pdf.loc[0, "bucket_id"] == 1
    assert (pdf.loc[0, "r_w"], pdf.loc[0, "r_h"]) == (1152, 896)
    assert (pdf.loc[0, "off_x"], pdf.loc[0, "off_y"]) == (0, 0)
    # squares → the square bucket, symmetric upscale
    assert (pdf.loc[1, "bucket_id"], pdf.loc[2, "bucket_id"]) == (0, 0)
    assert (pdf.loc[1, "r_w"], pdf.loc[1, "r_h"]) == (1024, 1024)


def test_phash_brightness_invariance_and_separation(spark):
    """phash_images: a mild global brightness shift moves only the DC
    coefficient, so the hash stays within a small Hamming radius; distinct
    images land far apart; and the kernel is deterministic across runs."""
    import pandas as pd

    from lmw_tree_spark.operators.pixels import phash_images

    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        base = rng.integers(0, 200, (40, 40, 3)).astype(np.int16)
        # smooth it so low-frequency structure dominates (photo-like)
        for _ in range(2):
            base = (
                base
                + np.roll(base, 1, 0)
                + np.roll(base, -1, 0)
                + np.roll(base, 1, 1)
                + np.roll(base, -1, 1)
            ) // 5
        img = base.clip(0, 255).astype(np.uint8)
        bright = (base + 6).clip(0, 255).astype(np.uint8)
        rows.append((f"img-{i}", codecs.encode_png(img), "png"))
        rows.append((f"img-{i}-b", codecs.encode_png(bright), "png"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])
    )
    got = {r["image_id"]: r["phash"] for r in phash_images(df).collect()}
    got2 = {r["image_id"]: r["phash"] for r in phash_images(df).collect()}
    assert got == got2  # deterministic

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for i in range(6):
        assert ham(got[f"img-{i}"], got[f"img-{i}-b"]) <= 8
    dists = [
        ham(got[f"img-{i}"], got[f"img-{j}"])
        for i in range(6)
        for j in range(i + 1, 6)
    ]
    assert min(dists) > 10  # distinct smooth images stay apart


# ---------------------------------------------------------------------------
# luma_histogram + entropy_gate (low-information image gate)
# ---------------------------------------------------------------------------


def test_entropy_gate_solid_stripes_and_noise(spark):
    import numpy as np
    import pandas as pd

    from lmw_tree_spark.operators.pixels import entropy_gate, luma_histogram
    from lmw_tree_spark.sources import codecs

    rng = np.random.default_rng(7)
    solid = np.full((16, 16, 3), 80, dtype=np.uint8)
    stripes = solid.copy()
    stripes[::2] = 200  # exactly two luma values, 50/50 -> H = 1 bit
    noise = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(np.uint8)
    rows = [
        ("solid", codecs.encode_png(solid), "png"),
        ("stripes", codecs.encode_png(stripes), "png"),
        ("noise", codecs.encode_png(noise), "png"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))
    out = entropy_gate(luma_histogram(df), min_bits=3.0).toPandas().set_index("image_id")
    assert out.loc["solid", "entropy"] == 0.0 and out.loc["solid", "keep"] == 0
    assert out.loc["stripes", "entropy"] == 1.0 and out.loc["stripes", "keep"] == 0
    assert out.loc["noise", "entropy"] > 5.0 and out.loc["noise", "keep"] == 1
    assert int(out["n_px"].iloc[0]) == 256


def test_luma_histogram_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from lmw_tree_spark.operators.pixels import luma_histogram
    from lmw_tree_spark.sources import codecs

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8).astype(np.uint8)
    df = spark.createDataFrame(
        pd.DataFrame([("a", codecs.encode_png(px), "png")],
                     columns=["image_id", "bytes", "fmt"])
    )
    got = {
        (r["bin"]): r["cnt"] for r in luma_histogram(df).collect()
    }
    lum = (299 * px[..., 0].astype(np.int64)
           + 587 * px[..., 1].astype(np.int64)
           + 114 * px[..., 2].astype(np.int64)) // 1000
    bins, cnts = np.unique(lum.ravel(), return_counts=True)
    assert got == dict(zip(bins.tolist(), cnts.tolist()))


def test_letterbox_crop_geometry(spark):
    import numpy as np
    import pandas as pd

    from lmw_tree_spark.operators.pixels import letterbox_crop
    from lmw_tree_spark.sources import codecs

    rng = np.random.default_rng(3)

    def frame(name, h, w, t, b, l, r):
        px = np.zeros((h, w, 3), dtype=np.uint8)
        if h - t - b > 0 and w - l - r > 0:
            px[t:h - b or None, l:w - r or None] = rng.integers(
                1, 256, size=(h - t - b, w - l - r, 3)
            ).astype(np.uint8)
        return (name, codecs.encode_png(px), "png")

    rows = [
        frame("tb", 20, 24, 3, 5, 0, 0),
        frame("lr", 20, 24, 0, 0, 4, 2),
        frame("all4", 16, 16, 1, 2, 3, 4),
        frame("none", 12, 12, 0, 0, 0, 0),
        frame("solid", 10, 14, 10, 0, 14, 0),  # fully flat
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))
    got = letterbox_crop(df).toPandas().set_index("image_id")
    assert tuple(got.loc["tb", ["crop_top", "crop_bottom", "crop_left", "crop_right"]]) == (3, 5, 0, 0)
    assert tuple(got.loc["lr", ["crop_top", "crop_bottom", "crop_left", "crop_right"]]) == (0, 0, 4, 2)
    assert tuple(got.loc["all4", ["crop_top", "crop_bottom", "crop_left", "crop_right"]]) == (1, 2, 3, 4)
    assert got.loc["all4", "inner_w"] == 9 and got.loc["all4", "inner_h"] == 13
    assert got.loc["none", "has_letterbox"] == 0
    assert got.loc["solid", "inner_w"] == 0 and got.loc["solid", "inner_h"] == 0
    assert got.loc["solid", "crop_top"] == 10 and got.loc["solid", "crop_left"] == 14


def test_phash_cropped_recovers_padded_duplicates(spark):
    import numpy as np
    import pandas as pd

    from lmw_tree_spark.operators.pixels import phash_cropped, phash_images
    from lmw_tree_spark.sources import codecs

    rng = np.random.default_rng(11)
    content = rng.integers(1, 256, size=(40, 48, 3)).astype(np.uint8)
    padded = np.full((40 + 4 + 2, 48 + 3 + 5, 3), 255, dtype=np.uint8)
    padded[4:44, 3:51] = content
    solid = np.full((16, 16, 3), 7, dtype=np.uint8)
    rows = [
        ("orig", codecs.encode_png(content), "png"),
        ("pad", codecs.encode_png(padded), "png"),
        ("solid", codecs.encode_png(solid), "png"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))

    got = phash_cropped(df).toPandas().set_index("image_id")
    raw = phash_images(df).toPandas().set_index("image_id")

    # crop-normalized: padded re-upload hashes identically to the original
    assert got.loc["pad", "phash"] == got.loc["orig", "phash"]
    assert tuple(got.loc["pad", ["crop_top", "crop_bottom", "crop_left", "crop_right"]]) == (4, 2, 3, 5)
    assert tuple(got.loc["orig", ["crop_top", "crop_bottom", "crop_left", "crop_right"]]) == (0, 0, 0, 0)
    # raw pHash of the padded copy differs (bars shift the grid + DCT energy)
    assert raw.loc["pad", "phash"] != raw.loc["orig", "phash"]
    # fully-flat fallback: full-frame hash, zero crops
    assert got.loc["solid", "phash"] == raw.loc["solid", "phash"]
    assert tuple(got.loc["solid", ["crop_top", "crop_left"]]) == (0, 0)


def test_overlay_flags_mines_recurring_template_tiles(spark):
    """A non-constant 16x16 stamp recurring at the SAME grid position across
    >= min_images distinct images is mined as a template; images carrying it
    flag watermarked, clean images don't, and raising min_images above the
    stamp's support un-flags everything."""
    from lmw_tree_spark.operators.pixels import overlay_flags, tile_ahash

    rng = np.random.default_rng(19)
    stamp = ((np.arange(16)[:, None] * 37 + np.arange(16)[None, :] * 101) % 197 + 30
             ).astype(np.uint8)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        if i < 9:  # stamp tile (0,0) on 9 of 12
            px[:16, :16, :] = stamp[..., None]
        if i < 2:  # constant tile at (1,1): must hash 0 and never template
            px[16:32, 16:32, :] = 55
        rows.append((f"i{i:02d}", codecs.encode_png(px), 32, 32, "png"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    tiles = tile_ahash(df, tile=16)
    flags = overlay_flags(tiles, min_images=8).toPandas().set_index("image_id")
    assert len(flags) == 12  # universe keeps clean images
    for i in range(12):
        expect = 1 if i < 9 else 0
        assert flags.loc[f"i{i:02d}", "watermarked"] == expect, i
        assert flags.loc[f"i{i:02d}", "wm_tiles"] == expect
    # support 9 < min_images=10: nothing is a template any more
    none = overlay_flags(tiles, min_images=10).toPandas()
    assert (none["watermarked"] == 0).all() and (none["wm_tiles"] == 0).all()


def test_color_gate_grayscale_and_colorfulness_branches(spark):
    """Grayscale (dev 0) and near-monochrome (low Hasler-Suesstrunk
    colorfulness) both drop; a colorful image keeps; the colorfulness value
    matches the NumPy formula on the same integer sums."""
    from lmw_tree_spark.operators.pixels import color_gate, color_stats

    rng = np.random.default_rng(23)
    colorful = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    lum = ((299 * colorful[..., 0].astype(np.int64)
            + 587 * colorful[..., 1] + 114 * colorful[..., 2]) // 1000)
    gray = np.repeat(lum[..., None], 3, axis=2).astype(np.uint8)
    desat = (lum[..., None] + (colorful.astype(np.int64) - lum[..., None]) // 16
             ).clip(0, 255).astype(np.uint8)
    rows = [
        ("colorful", codecs.encode_png(colorful), "png"),
        ("gray", codecs.encode_png(gray), "png"),
        ("desat", codecs.encode_png(desat), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = color_gate(color_stats(df)).toPandas().set_index("image_id")

    assert got.loc["gray", "grayscale"] == 1 and got.loc["gray", "keep"] == 0
    assert got.loc["gray", "colorfulness"] == 0.0
    assert got.loc["desat", "grayscale"] == 0 and got.loc["desat", "keep"] == 0
    assert got.loc["colorful", "grayscale"] == 0 and got.loc["colorful", "keep"] == 1

    r, g, b = (colorful[..., c].astype(np.float64) for c in range(3))
    rg, yb = r - g, (r + g) / 2.0 - b
    cf = np.sqrt(rg.var() + yb.var()) + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    assert abs(got.loc["colorful", "colorfulness"] - cf) < 1e-3
    # colored_frac: colorful image near 1, grayscale exactly 0
    assert got.loc["gray", "colored_frac"] == 0.0
    assert got.loc["colorful", "colored_frac"] > 0.9


def test_phash_brightness_shift_invariance(spark):
    """A pure luma offset leaves the pHash EXACTLY unchanged when no pixel
    clips (integer luma shifts exactly; DCT ACs are offset-invariant); with
    clipping the distance stays small — the tone_dedup modality."""
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators.pixels import phash_images

    rng = np.random.default_rng(31)
    safe = rng.integers(0, 232, (48, 48, 3), dtype=np.uint8)   # +24 never clips
    hot = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)    # +24 clips
    rows = []
    for name, px in (("safe", safe), ("hot", hot)):
        rows.append((name, codecs.encode_png(px), "png"))
        sh = np.clip(px.astype(np.int64) + 24, 0, 255).astype(np.uint8)
        rows.append((name + "_t", codecs.encode_png(sh), "png"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = phash_images(df).toPandas().set_index("image_id")["phash"]
    assert got["safe"] == got["safe_t"]  # exact invariance, no clipping
    d = bin(int(got["hot"]) ^ int(got["hot_t"])).count("1")
    assert 0 <= d <= 6, d  # clip perturbation stays inside the verify radius


def test_tile_self_similarity_collage_gate(spark):
    """A frame tiled from one block flags (every tile identical); a random
    photo doesn't; flat tiles count as n_flat, never as repetition."""
    from lmw_tree_spark.operators.pixels import tile_ahash, tile_self_similarity

    rng = np.random.default_rng(37)
    block = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    collage = np.tile(block, (3, 3, 1))             # 48x48 -> 9 equal tiles
    photo = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    half_flat = photo.copy()
    half_flat[:16, :, :] = 99                       # 3 flat tiles, 6 unique
    rows = [
        ("collage", codecs.encode_png(collage), "png"),
        ("photo", codecs.encode_png(photo), "png"),
        ("halfflat", codecs.encode_png(half_flat), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = (
        tile_self_similarity(tile_ahash(df, tile=16))
        .toPandas().set_index("image_id")
    )
    assert got.loc["collage", "tiled"] == 1
    assert got.loc["collage", "max_repeat"] == 9
    assert got.loc["photo", "tiled"] == 0 and got.loc["photo", "n_repeated"] == 0
    assert got.loc["halfflat", "n_flat"] == 3
    assert got.loc["halfflat", "tiled"] == 0  # flat never counts as repeats
    # threshold above the repeat count un-flags
    relaxed = tile_self_similarity(tile_ahash(df, tile=16), min_repeats=10)
    assert relaxed.where("tiled = 1").count() == 0


def test_gate_features_fused_matches_standalone_operators(spark):
    """The one-decode fused kernel reproduces every standalone gate decision
    bit-for-bit over a mixed corpus (flat, grayscale, collage, normal)."""
    import pandas as pd

    from lmw_tree_spark.operators.pixels import (
        color_gate, color_stats, entropy_gate, gate_features, image_gates,
        luma_histogram, sharpness_stats, tile_ahash, tile_self_similarity,
    )
    from lmw_tree_spark.sources.images import generate_images

    rng = np.random.default_rng(41)
    rows = []
    block = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows.append(("collage", codecs.encode_png(np.tile(block, (3, 3, 1))), "png"))
    rows.append(("flat", codecs.encode_png(np.full((48, 48, 3), 77, np.uint8)), "png"))
    lum = rng.integers(0, 256, (48, 48), dtype=np.uint8)
    rows.append(("gray", codecs.encode_png(np.repeat(lum[..., None], 3, 2)), "png"))
    rows.append(("normal", codecs.encode_png(
        rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)), "png"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")

    fused = (
        image_gates(gate_features(df))
        .toPandas().set_index("image_id").sort_index()
    )
    ent = entropy_gate(luma_histogram(df)).toPandas().set_index("image_id")
    col = color_gate(color_stats(df)).toPandas().set_index("image_id")
    shp = sharpness_stats(df).toPandas().set_index("image_id")
    tls = (
        tile_self_similarity(tile_ahash(df, tile=16))
        .toPandas().set_index("image_id")
    )
    for img in fused.index:
        assert fused.loc[img, "keep_entropy"] == ent.loc[img, "keep"], img
        assert fused.loc[img, "keep_color"] == col.loc[img, "keep"], img
        assert fused.loc[img, "keep_sharp"] == int(shp.loc[img, "keep"]), img
        assert fused.loc[img, "keep_collage"] == (1 - tls.loc[img, "tiled"]), img
    # the mixed corpus actually exercises each gate
    assert fused.loc["flat", "keep_entropy"] == 0
    assert fused.loc["gray", "keep_color"] == 0
    assert fused.loc["flat", "keep_sharp"] == 0
    assert fused.loc["collage", "keep_collage"] == 0
    assert fused.loc["normal", "keep"] == 1


def test_text_overlay_gate_flags_caption_bars(spark):
    """A 1-px-stripe caption bar in the bottom third flags; the same texture
    covering the WHOLE frame does not (no local density contrast); a smooth
    photo never flags."""
    from lmw_tree_spark.operators.pixels import (
        text_overlay_gate, text_overlay_stats,
    )

    rng = np.random.default_rng(43)
    w = h = 48
    cols = np.where(np.arange(w) % 2 == 0, 40, 220).astype(np.uint8)
    barred = rng.integers(90, 160, (h, w, 3), dtype=np.uint8)  # low contrast
    barred[h - h // 3:, :, :] = cols[None, :, None]
    fulltext = np.repeat(np.repeat(cols[None, :, None], h, 0), 3, 2)
    photo = rng.integers(90, 160, (h, w, 3), dtype=np.uint8)
    rows = [
        ("barred", codecs.encode_png(barred), "png"),
        ("fulltext", codecs.encode_png(fulltext), "png"),
        ("photo", codecs.encode_png(photo), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = (
        text_overlay_gate(text_overlay_stats(df))
        .toPandas().set_index("image_id")
    )
    assert got.loc["barred", "text_overlay"] == 1
    assert got.loc["barred", "band_density"] > 0.9
    # uniform texture: band density == frame density, ratio test rejects
    assert got.loc["fulltext", "text_overlay"] == 0
    assert got.loc["photo", "text_overlay"] == 0
    assert got.loc["photo", "band_density"] < 0.05
