"""Archive sources: webdataset-style TAR shards and WARC files as DataFrames.

Parity with the reference's indexer readers, re-expressed Spark-first:

- ``CompressedTARReader`` (/root/reference/src/indexer/CompressedTARReader.h:33-135
  — USTAR header decode, octal fields; content read unfinished there) → a WORKING
  tar-shard source here. Tar shards of (image bytes + caption/metadata files) are
  the standard layout for multimodal training corpora (webdataset): members are
  grouped by basename stem, one output row per sample.
- ``CompressedWARCReader`` (/root/reference/src/indexer/CompressedWARCReader.h:27-81
  — header key:value fields until blank line, then Content-Length bytes) → a WARC
  record source with the same tolerant header parsing, including gzip archives
  (the reference's CompressedArchiveReader wraps gz/bz2 the same way,
  CompressedArchiveReader.h:28-67).

Spark shape: ``spark.read.format("binaryFile")`` lists and reads whole archive
files (one row per shard — shards are the parallelism unit, sized ~100s of MB in
practice), then ``mapInPandas`` parses records per shard. At 10^12 images the
shard listing is millions of rows, well within a DataFrame, and each shard parses
independently — no shared state, linear scale-out. Decompression and tar/WARC
framing are stdlib C speed (zlib/tarfile); the per-member loop is I/O framing,
not the hot analytics path.

Metadata rows mirror ``UnparsedFile``'s case-insensitive header map
(/root/reference/src/indexer/UnparsedFile.h:18-83) as a ``map<string,string>``
column with lower-cased keys.
"""

from __future__ import annotations

import gzip
import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TAR_SAMPLE_SCHEMA = (
    "shard string, sample_id string, files map<string,binary>"
)
WARC_RECORD_SCHEMA = (
    "shard string, record_id string, headers map<string,string>, content binary"
)


def _open_maybe_gzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def read_tar_shards(spark: SparkSession, path: str) -> DataFrame:
    """TAR shards (optionally .gz) → one row per sample.

    Members ``<stem>.<ext>`` are grouped by ``<stem>`` (webdataset convention):
    ``files`` maps extension → raw bytes, e.g. ``{"png": ..., "txt": ...}``.
    ``sample_id`` is the stem; ``shard`` the source file name.
    """
    shards = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                raw = _open_maybe_gzip(bytes(blob))
                samples: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(raw), mode="r:") as tf:
                    for member in tf:
                        if not member.isfile():
                            continue
                        name = member.name.rsplit("/", 1)[-1]
                        stem, _, ext = name.rpartition(".")
                        if not stem:
                            stem, ext = name, ""
                        data = tf.extractfile(member).read()
                        samples.setdefault(stem, {})[ext.lower()] = data
                if samples:
                    shard_name = str(shard_path).rsplit("/", 1)[-1]
                    yield pd.DataFrame(
                        {
                            "shard": shard_name,
                            "sample_id": list(samples.keys()),
                            "files": list(samples.values()),
                        }
                    )

    return shards.mapInPandas(parse, TAR_SAMPLE_SCHEMA)


def parse_warc_records(raw: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse WARC/0.x-1.x framing: ``WARC/…`` version line, ``key: value``
    headers until a blank line (malformed lines without ':' are tolerated,
    like the reference's ClueWeb09 workaround, CompressedWARCReader.h:44-63),
    then exactly Content-Length payload bytes."""
    out: list[tuple[dict[str, str], bytes]] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record newlines
        while pos < n and raw[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        headers: dict[str, str] = {}
        while pos < n:
            eol = raw.find(b"\n", pos)
            if eol < 0:
                pos = n
                break
            line = raw[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break
            if line.startswith(b"WARC/"):
                headers["warc-version"] = line.decode("ascii", "replace")
            elif b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("utf-8", "replace")
                )
            # else: tolerated malformed header line (reference behavior)
        length = int(headers.get("content-length", "0"))
        content = raw[pos : pos + length]
        pos += length
        if headers:
            out.append((headers, content))
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files (optionally .gz) → one row per record with the header map."""
    shards = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                records = parse_warc_records(_open_maybe_gzip(bytes(blob)))
                if not records:
                    continue
                shard_name = str(shard_path).rsplit("/", 1)[-1]
                yield pd.DataFrame(
                    {
                        "shard": shard_name,
                        "record_id": [
                            h.get("warc-record-id", f"{shard_name}#{i}")
                            for i, (h, _) in enumerate(records)
                        ],
                        "headers": [h for h, _ in records],
                        "content": [c for _, c in records],
                    }
                )

    return shards.mapInPandas(parse, WARC_RECORD_SCHEMA)


def tar_samples_to_images(samples: DataFrame) -> DataFrame:
    """(shard, sample_id, files) → input-schema rows for samples carrying an
    image payload + caption text: (image_id, bytes, w, h, fmt, caption, phash).
    Dimensions and phash are left NULL — the signature stage derives them from
    the decoded pixels (it decodes each image exactly once anyway); a placeholder
    constant would poison the phash pigeonhole buckets."""
    from pyspark.sql import functions as F

    img = F.coalesce(F.col("files")["png"], F.col("files")["jpg"], F.col("files")["jpeg"])
    fmt = (
        F.when(F.col("files")["png"].isNotNull(), F.lit("png"))
        .when(F.col("files")["jpg"].isNotNull(), F.lit("jpg"))
        .otherwise(F.lit("jpeg"))
    )
    caption = F.coalesce(F.col("files")["txt"], F.col("files")["caption"])
    return (
        samples.where(img.isNotNull())
        .select(
            F.concat_ws("/", "shard", "sample_id").alias("image_id"),
            img.alias("bytes"),
            F.lit(None).cast("int").alias("w"),
            F.lit(None).cast("int").alias("h"),
            fmt.alias("fmt"),
            caption.cast("string").alias("caption"),
            F.lit(None).cast("long").alias("phash"),
        )
    )


TAR_MANIFEST_SCHEMA = (
    "shard_file string, n_samples long, n_members long, data_bytes long"
)


def write_tar_shards(
    images: DataFrame, out_dir: str, id_col: str = "image_id"
) -> DataFrame:
    """WebDataset-style shard EXPORT — the inverse of :func:`read_tar_shards`.

    Each input row (input_hint schema) becomes two members ``<id>.<fmt>`` +
    ``<id>.txt`` in its shard; rows route to one of 16 shards by the first hex
    character of ``md5(id)`` (deterministic across partitioning, retries and
    cluster size — the same guarantee as operators/sampling.py), members are
    written in sorted id order with zeroed metadata so shard bytes are
    reproducible, and each TAR lands via write-to-temp + atomic rename (safe
    under speculative execution: replays produce identical bytes and the
    rename is idempotent). Returns the writer manifest, one row per shard.

    Scale shape: one groupBy shuffle keyed by the 16 shard ids (production
    would use ``substr(md5, 1, 3)`` → 4096 shards; the key-space constant is
    the only knob), then pure per-group streaming writes — no driver data.
    """

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = str(pdf["shard"].iloc[0])
        name = f"shard-{shard}.tar"
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        data_bytes = 0
        with tarfile.open(fileobj=buf, mode="w:") as tf:
            for r in pdf.itertuples():
                rid = getattr(r, id_col)
                payloads = (
                    (r.fmt, bytes(r.bytes)),
                    ("txt", str(r.caption).encode("utf-8")),
                )
                for ext, payload in payloads:
                    info = tarfile.TarInfo(f"{rid}.{ext}")
                    info.size = len(payload)
                    info.mtime = 0
                    tf.addfile(info, io.BytesIO(payload))
                    data_bytes += len(payload)
        tmp = os.path.join(out_dir, f".{name}.tmp")
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame(
            {
                "shard_file": [name],
                "n_samples": [len(pdf)],
                "n_members": [2 * len(pdf)],
                "data_bytes": [data_bytes],
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    assigned = images.select(
        F.col(id_col), "bytes", "fmt", "caption",
        F.substring(F.md5(id_col), 1, 1).alias("shard"),
    )
    return assigned.groupBy("shard").applyInPandas(write_shard, TAR_MANIFEST_SCHEMA)
