"""Synthetic image source tests: schema, determinism, dup-group structure,
per-row fidelity invariant."""

import numpy as np

from lmw_tree_spark.functions.bitops import popcount_u64
from lmw_tree_spark.sources import codecs
from lmw_tree_spark.sources.images import (
    IMAGES_SCHEMA,
    base_index,
    generate_batch,
    generate_images,
)


def test_schema_matches_input_hint(spark):
    df = generate_images(spark, 30)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("image_id", "string"),
        ("bytes", "binary"),
        ("w", "int"),
        ("h", "int"),
        ("fmt", "string"),
        ("caption", "string"),
        ("phash", "bigint"),
    ]
    assert df.count() == 30


def test_generation_partition_independent(spark):
    a = generate_images(spark, 50, partitions=2).orderBy("image_id").collect()
    b = generate_images(spark, 50, partitions=7).orderBy("image_id").collect()
    for ra, rb in zip(a, b):
        assert ra == rb


def test_dup_groups_have_close_signatures():
    df = generate_batch(np.arange(0, 70), with_truth=True)
    for base, grp in df.groupby("dup_group"):
        ph = grp["phash"].to_numpy(dtype=np.int64).view(np.uint64)
        if len(ph) > 1:
            d = popcount_u64(ph[0] ^ ph[1:])
            assert (d <= 6).all(), f"group {base} phash dist {d}"


def test_cross_group_signatures_far():
    df = generate_batch(np.arange(0, 70), with_truth=True)
    bases = df[[base_index(i) == i for i in range(70)]]
    ph = bases["phash"].to_numpy(dtype=np.int64).view(np.uint64)
    d = popcount_u64(ph[:, None] ^ ph[None, :])
    off_diag = d[~np.eye(len(ph), dtype=bool)]
    assert off_diag.min() > 10


def test_per_row_fidelity_invariant():
    """North rule: decoded pixels allclose (PSNR ≥ 40 dB lossy, exact lossless) and
    caption byte-equality after a decode round trip."""
    df = generate_batch(np.arange(0, 21), with_truth=False)
    for _, row in df.iterrows():
        px = codecs.decode_image(row["bytes"], row["fmt"])
        assert px.shape == (row["h"], row["w"], 3)
        re_encoded = (
            codecs.encode_lossy(px) if row["fmt"] == "jpeg" else codecs.encode_png(px)
        )
        px2 = codecs.decode_image(re_encoded, row["fmt"])
        if row["fmt"] == "png":
            assert (px2 == px).all()
        else:
            assert codecs.psnr(px, px2) >= 40.0
        assert isinstance(row["caption"], str) and len(row["caption"].split()) >= 8


def test_caption_variant_structure():
    df = generate_batch(np.arange(0, 14), with_truth=True)
    g = df[df["dup_group"] == 0]
    cap0, cap1, cap2 = g["caption"].tolist()
    assert cap0 == cap1  # variant 1 copies caption verbatim
    t0, t2 = cap0.split(), cap2.split()
    assert len(t0) == len(t2)
    assert sum(a != b for a, b in zip(t0, t2)) == 1  # exactly one token substituted
