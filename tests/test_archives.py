"""TAR-shard and WARC sources (reference indexer readers, §2.1)."""

import gzip
import io
import os
import tarfile

import numpy as np

from lmw_tree_spark.sources import codecs
from lmw_tree_spark.sources.archives import (
    parse_warc_records,
    read_tar_shards,
    read_warc,
    tar_samples_to_images,
)


def _make_tar_shard(path: str, n: int, seed: int, gz: bool = False) -> None:
    buf = io.BytesIO()
    rng = np.random.default_rng(seed)
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(n):
            px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            png = codecs.encode_png(px)
            cap = f"caption for sample {seed}-{i}".encode()
            for name, data in ((f"s{i:04d}.png", png), (f"s{i:04d}.txt", cap)):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    if gz:
        raw = gzip.compress(raw)
    with open(path, "wb") as f:
        f.write(raw)


def test_tar_shards_group_members_into_samples(spark, tmpdir_ck):
    _make_tar_shard(os.path.join(tmpdir_ck, "shard-000.tar"), 5, seed=1)
    _make_tar_shard(os.path.join(tmpdir_ck, "shard-001.tar.gz"), 3, seed=2, gz=True)
    samples = read_tar_shards(spark, os.path.join(tmpdir_ck, "shard-*"))
    pdf = samples.toPandas()
    assert len(pdf) == 8
    assert set(pdf[pdf.shard == "shard-000.tar"]["sample_id"]) == {
        f"s{i:04d}" for i in range(5)
    }
    row = pdf[pdf.sample_id == "s0000"].iloc[0]
    assert set(row["files"].keys()) == {"png", "txt"}

    # → input_hint shape, decodable, caption preserved
    images = tar_samples_to_images(samples).toPandas()
    assert len(images) == 8
    first = images.sort_values("image_id").iloc[0]
    px = codecs.decode_png(bytes(first["bytes"]))
    assert px.shape == (8, 8, 3)
    assert first["caption"].startswith("caption for sample")


def test_warc_records_roundtrip(spark, tmpdir_ck):
    recs = []
    for i in range(4):
        body = f"<html>page {i}</html>".encode()
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:test:{i}>\r\n"
            f"BadHeaderWithoutColon\r\n"            # tolerated, like ClueWeb09
            f"Content-Length: {len(body)}\r\n"
            f"\r\n"
        ).encode()
        recs.append(hdr + body + b"\r\n\r\n")
    raw = b"".join(recs)
    parsed = parse_warc_records(raw)
    assert len(parsed) == 4
    assert parsed[2][0]["warc-record-id"] == "<urn:test:2>"
    assert parsed[2][1] == b"<html>page 2</html>"

    with open(os.path.join(tmpdir_ck, "test.warc.gz"), "wb") as f:
        f.write(gzip.compress(raw))
    df = read_warc(spark, os.path.join(tmpdir_ck, "*.warc.gz")).toPandas()
    assert len(df) == 4
    assert set(df["record_id"]) == {f"<urn:test:{i}>" for i in range(4)}
    assert df.iloc[0]["headers"]["warc-type"] == "response"


def test_tar_to_pipeline_signatures(spark, tmpdir_ck):
    """Tar shards feed the signature stage directly; null w/h/phash are derived
    from the decoded pixels (a placeholder constant would poison the phash
    pigeonhole buckets — every row would pair with every other)."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators.signature_stage import extract_signatures

    _make_tar_shard(os.path.join(tmpdir_ck, "shard-0.tar"), 4, seed=3)
    images = tar_samples_to_images(
        read_tar_shards(spark, os.path.join(tmpdir_ck, "shard-0.tar"))
    )
    assert images.schema["phash"].dataType.typeName() == "long"
    sigs = extract_signatures(images, SMALL).toPandas()
    assert len(sigs) == 4
    assert all(len(s) == SMALL.sig_bits // 64 for s in sigs["sig"])
    # derived from pixels, not placeholder: distinct phashes, real dimensions
    assert sigs["phash"].nunique() == 4
    assert (sigs["w"] == 8).all() and (sigs["h"] == 8).all()


def test_write_tar_shards_roundtrip_and_atomic_layout(spark, tmp_path):
    """Writer → reader closed loop: byte-identical payloads, caption members,
    deterministic md5-char shard routing, no leftover temp files, and
    re-export produces byte-identical shard files (deterministic bytes)."""
    import hashlib
    import os

    from lmw_tree_spark.sources.archives import (
        read_tar_shards,
        tar_samples_to_images,
        write_tar_shards,
    )
    from lmw_tree_spark.sources.images import generate_images

    images = generate_images(spark, 40).persist()
    out = str(tmp_path / "shards")
    man = {r["shard_file"]: r for r in write_tar_shards(images, out).collect()}
    assert sum(r["n_samples"] for r in man.values()) == 40
    assert all(r["n_members"] == 2 * r["n_samples"] for r in man.values())
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]

    rt = tar_samples_to_images(read_tar_shards(spark, out)).collect()
    src = {r["image_id"]: r for r in images.collect()}
    assert len(rt) == 40
    for r in rt:
        shard_file, _, stem = r["image_id"].partition("/")
        s = src[stem]
        assert bytes(r["bytes"]) == bytes(s["bytes"])
        assert r["caption"] == s["caption"]
        c = hashlib.md5(stem.encode()).hexdigest()[0]
        assert shard_file == f"shard-{c}.tar"

    digests = {f: hashlib.md5(open(os.path.join(out, f), "rb").read()).hexdigest()
               for f in os.listdir(out)}
    out2 = str(tmp_path / "shards2")
    write_tar_shards(images, out2).collect()
    digests2 = {f: hashlib.md5(open(os.path.join(out2, f), "rb").read()).hexdigest()
                for f in os.listdir(out2)}
    assert digests == digests2
