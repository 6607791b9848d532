"""Multimodal payload plumbing: video frame-sampling and audio feature extraction
over opaque ``binary`` columns.

Same contract as the image codecs (sources/codecs.py): the container has no
libav/ffmpeg/libsndfile, so REAL mp4/webm/mp3/wav decoding raises
``NotImplementedError`` at the clearly-marked codec boundary, while everything
Spark-side — schemas, Arrow batching, frame explosion, windowed features — is real
and tested against deterministic stand-in containers:

- ``FVID``: header (w, h, n_frames, fps_milli) + length-prefixed FJPG frames
  (the lossy image stub, ~43 dB PSNR per frame).
- ``FAUD``: header (sample_rate) + zlib'd int16 PCM mono.

Swap ``decode_video_frames`` / ``decode_audio_pcm`` for PyAV/soundfile bindings in
production; the operators (``sample_frames``, ``audio_features``) do not change.

Scale shape: one input row (video/audio blob) explodes to k frame rows / one
feature row inside ``mapInPandas`` — decode happens once per blob per pass, frames
flow straight into the image signature stage (operators/signature_stage.py), which
is how video dedup reduces to the image pipeline (per-frame signatures → per-video
aggregation).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lmw_tree_spark.sources.codecs import decode_lossy, encode_lossy

FVID_MAGIC = b"FVID"
FAUD_MAGIC = b"FAUD"

FRAMES_SCHEMA = (
    "video_id string, frame_idx int, ts_ms long, bytes binary, w int, h int, "
    "fmt string"
)
AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, duration_ms long, "
    "rms double, peak double, window_rms array<double>"
)


# ---------------------------------------------------------------------------
# stand-in containers (STUB boundary — see module docstring)
# ---------------------------------------------------------------------------


def encode_video(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """(n, h, w, 3) uint8 → FVID bytes (per-frame FJPG).

    The header stores fps as millifps in a 16-bit field, so fps > 65.535 cannot
    be represented — fail loudly instead of silently wrapping (a wrapped fps
    would corrupt every ts_ms that ``sample_frames`` derives)."""
    n, h, w, _ = frames.shape
    fps_milli = int(fps * 1000)
    if not 0 < fps_milli <= 0xFFFF:
        raise ValueError(
            f"fps {fps} out of range for the 16-bit millifps header field "
            "(supported: 0 < fps <= 65.535)"
        )
    parts = [FVID_MAGIC, struct.pack(">HHIH", w, h, n, fps_milli)]
    for i in range(n):
        blob = encode_lossy(frames[i])
        parts.append(struct.pack(">I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


def decode_video_frames(data: bytes, fmt: str, every_k: int = 1) -> tuple:
    """FVID bytes → (sampled frame blobs as FJPG bytes, indices, w, h, fps).

    Real video formats are NOT implemented (no libav in this environment)."""
    if fmt != "fvid" or data[:4] != FVID_MAGIC:
        raise NotImplementedError(
            f"real video decoding ({fmt!r}) requires libav, unavailable here; "
            "only the deterministic FVID stand-in is supported"
        )
    w, h, n, fps_milli = struct.unpack(">HHIH", data[4:14])
    pos = 14
    blobs, idxs = [], []
    for i in range(n):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if i % every_k == 0:
            blobs.append(data[pos : pos + length])
            idxs.append(i)
        pos += length
    return blobs, idxs, w, h, fps_milli / 1000.0


def encode_audio(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono PCM → FAUD bytes."""
    assert pcm.dtype == np.int16
    return FAUD_MAGIC + struct.pack(">I", sample_rate) + zlib.compress(pcm.tobytes(), 6)


def decode_audio_pcm(data: bytes, fmt: str) -> tuple[np.ndarray, int]:
    """FAUD bytes → (int16 PCM, sample_rate). Real audio formats raise."""
    if fmt != "faud" or data[:4] != FAUD_MAGIC:
        raise NotImplementedError(
            f"real audio decoding ({fmt!r}) requires libsndfile/ffmpeg, "
            "unavailable here; only the deterministic FAUD stand-in is supported"
        )
    (rate,) = struct.unpack(">I", data[4:8])
    pcm = np.frombuffer(zlib.decompress(data[8:]), dtype=np.int16)
    return pcm, rate


# ---------------------------------------------------------------------------
# Spark operators (real plumbing)
# ---------------------------------------------------------------------------


def sample_frames(
    videos: DataFrame,
    every_k: int = 1,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(video_id, bytes, fmt) → one row per sampled frame (FRAMES_SCHEMA).

    Frame rows carry FJPG payloads directly consumable by the image signature
    stage; ``ts_ms`` is derived from the container fps for event-time use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, ts, blobs, ws, hs = [], [], [], [], [], []
            for vid, blob, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                fb, fi, w, h, fps = decode_video_frames(bytes(blob), fmt, every_k)
                step_ms = 1000.0 / max(fps, 1e-6)
                ids += [vid] * len(fb)
                idxs += fi
                ts += [int(i * step_ms) for i in fi]
                blobs += fb
                ws += [w] * len(fb)
                hs += [h] * len(fb)
            yield pd.DataFrame(
                {
                    "video_id": ids,
                    "frame_idx": np.array(idxs, dtype=np.int32),
                    "ts_ms": np.array(ts, dtype=np.int64),
                    "bytes": blobs,
                    "w": np.array(ws, dtype=np.int32),
                    "h": np.array(hs, dtype=np.int32),
                    "fmt": "jpeg",  # FJPG payload — image codec dispatch handles it
                }
            )

    return videos.select(id_col, bytes_col, fmt_col).mapInPandas(run, FRAMES_SCHEMA)


def audio_neardup_groups(
    audio: DataFrame,
    window_ms: int = 250,
    quant_db: float = 3.0,
    id_col: str = "audio_id",
) -> DataFrame:
    """Audio near-duplicate groups via quantized energy-envelope fingerprints.

    The per-window RMS envelope (``audio_features``) is quantized to
    ``quant_db``-wide log-energy steps and hashed — clips whose loudness
    envelope matches at that resolution (same content re-encoded, volume-shifted
    by < quant_db/2) share a fingerprint. Exact hash-groupBy then yields groups:
    the audio analogue of the image pipeline's exact-dedup first pass (swap the
    envelope for chromaprint bindings in production; the dataflow is identical).
    Output (audio_id, dup_group, group_size).
    """
    from pyspark.sql import functions as F

    feats = audio_features(audio, window_ms, id_col=id_col)
    # log-energy quantization, volume-normalized by the clip's global RMS
    q = F.transform(
        "window_rms",
        lambda x: F.round(
            F.log10((x + F.lit(1e-9)) / (F.col("rms") + F.lit(1e-9)))
            * F.lit(20.0 / quant_db)
        ).cast("int"),
    )
    fps = feats.select(
        F.col(id_col),
        F.xxhash64(F.concat_ws(",", q), F.col("duration_ms") / 100).alias("fingerprint"),
    )
    w_group = fps.groupBy("fingerprint").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    return w_group.select(
        F.explode("ids").alias(id_col),
        F.col("ids")[0].alias("dup_group"),
        F.size("ids").alias("group_size"),
    )


def video_neardup_groups(
    videos: DataFrame,
    cfg,
    every_k: int = 2,
    min_frame_frac: float = 0.5,
    id_col: str = "video_id",
    frame_edges: DataFrame | None = None,
    frame_counts: DataFrame | None = None,
) -> DataFrame:
    """Video near-duplicate groups via frame-level reduction.

    The video modality reduces to the image pipeline: sample frames →
    per-frame signatures (null phash → computed from pixels) → LSH candidate
    pairs → verified frame near-dups → per-video evidence aggregation. Two
    videos are near-dups when their verified frame matches cover at least
    ``min_frame_frac`` of the smaller video's sampled frames; connected
    components over those video edges give the dup groups (video_id, dup_group).

    Scale shape: frame volume = rows × frames/every_k, all stages inherit the
    image pipeline's skew-bounded candidate generation; the per-video rollup is
    one partial-aggregated groupBy.

    The coverage criterion counts DISTINCT matched frames of the smaller video,
    not raw pairs: repeated frames (black/intro frames duplicated k times in each
    of two unrelated videos) produce k² verified pairs but still cover only ONE
    distinct frame, so they cannot falsely merge the videos.

    ``frame_edges`` / ``frame_counts`` accept a precomputed verified-edge list
    (src, dst as ``video#frame``) and per-video frame counts (video_id, nf) —
    a caller that already materialized the frame sub-pipeline (e.g. for an
    external audit) skips recomputing it; the rollup/threshold/CC stages are
    unchanged.
    """
    from pyspark.sql import functions as F

    from lmw_tree_spark.operators import lsh
    from lmw_tree_spark.operators.ccomp import connected_components
    from lmw_tree_spark.operators.signature_stage import extract_signatures

    if frame_edges is None or frame_counts is None:
        frames = sample_frames(videos, every_k, id_col=id_col)
        images = frames.select(
            F.concat_ws("#", id_col, "frame_idx").alias("image_id"),
            "bytes",
            "w",
            "h",
            "fmt",
            F.lit("").alias("caption"),
            F.lit(None).cast("long").alias("phash"),
        )
        sigs = extract_signatures(images, cfg)
        verified = (
            lsh.verify_edges(lsh.candidate_edges(sigs, cfg), sigs, cfg)
            .where("is_dup")
        )
        frame_counts = frames.groupBy(id_col).agg(F.count("*").alias("nf"))
    else:
        verified = frame_edges
    vsrc, fsrc = F.substring_index("src", "#", 1), F.substring_index("src", "#", -1)
    vdst, fdst = F.substring_index("dst", "#", 1), F.substring_index("dst", "#", -1)
    fwd = vsrc <= vdst  # orient each frame edge so a <= b at the video level
    pair_cov = (
        verified.select(
            F.when(fwd, vsrc).otherwise(vdst).alias("a"),
            F.when(fwd, fsrc).otherwise(fdst).alias("fa"),
            F.when(fwd, vdst).otherwise(vsrc).alias("b"),
            F.when(fwd, fdst).otherwise(fsrc).alias("fb"),
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.countDistinct("fa").alias("cov_a"),
            F.countDistinct("fb").alias("cov_b"),
        )
    )
    n_frames = frame_counts
    covered_small = F.when(F.col("na") <= F.col("nb"), F.col("cov_a")).otherwise(
        F.col("cov_b")
    )
    video_edges = (
        pair_cov.join(
            n_frames.select(F.col(id_col).alias("a"), F.col("nf").alias("na")), "a"
        )
        .join(n_frames.select(F.col(id_col).alias("b"), F.col("nf").alias("nb")), "b")
        .where(covered_small >= F.least("na", "nb") * F.lit(min_frame_frac))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    return connected_components(
        video_edges, vertices=videos.select(F.col(id_col).alias("image_id")),
        id_col="image_id", label_col="dup_group",
    ).select(F.col("image_id").alias(id_col), "dup_group")


def audio_features(
    audio: DataFrame,
    window_ms: int = 250,
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(audio_id, bytes, fmt) → one feature row per clip (AUDIO_FEATURES_SCHEMA):
    global RMS/peak (float in [-1, 1] domain) + per-window RMS vector — the
    fingerprint-ready energy envelope."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for aid, blob, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                pcm, rate = decode_audio_pcm(bytes(blob), fmt)
                x = pcm.astype(np.float64) / 32768.0
                win = max(1, rate * window_ms // 1000)
                n_win = len(x) // win
                wr = (
                    np.sqrt((x[: n_win * win].reshape(n_win, win) ** 2).mean(axis=1))
                    if n_win
                    else np.empty(0)
                )
                rows.append(
                    (
                        aid,
                        rate,
                        len(pcm),
                        int(len(pcm) * 1000 / rate),
                        float(np.sqrt((x**2).mean())) if len(x) else 0.0,
                        float(np.abs(x).max()) if len(x) else 0.0,
                        wr.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sample_rate", "n_samples", "duration_ms",
                    "rms", "peak", "window_rms",
                ],
            )

    return audio.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# shot-boundary detection (scene cuts) — frame histograms + JVM decision algebra
# ---------------------------------------------------------------------------

FRAME_HIST_SCHEMA = (
    "video_id string, frame_idx int, bin int, cnt long, n_px long"
)
SHOTS_SCHEMA = (
    "video_id string, shot_id int, start_frame int, end_frame int, n_frames long"
)


def frame_luma_histograms(
    videos: DataFrame,
    n_bins: int = 16,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """(video_id, bytes, fmt) → one row per (frame, luma bin): integer luma
    histogram counts, ALL ``n_bins`` bins emitted (zeros included) so the
    downstream delta join never needs an outer join.

    Integer luma ``L = 299r + 587g + 114b`` (x1000 scale, range [0, 254745]);
    ``bin = L * n_bins // 254746`` — pure integer algebra any engine replays
    bit-exactly. Pure map stage: decode + one vectorized bincount per frame
    inside the Arrow batch, no shuffle, no driver data."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vids, fidx, bins, cnts, npx = [], [], [], [], []
            for vid, blob, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                fb, fi, w, h, _ = decode_video_frames(bytes(blob), fmt, 1)
                for i, frame_blob in zip(fi, fb):
                    px = decode_lossy(frame_blob).astype(np.int64)
                    ilum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                    b = (ilum.ravel() * n_bins) // 254746
                    hist = np.bincount(b, minlength=n_bins)
                    vids += [vid] * n_bins
                    fidx += [i] * n_bins
                    bins += list(range(n_bins))
                    cnts += hist.tolist()
                    npx += [int(ilum.size)] * n_bins
            yield pd.DataFrame(
                {
                    "video_id": vids,
                    "frame_idx": np.array(fidx, dtype=np.int32),
                    "bin": np.array(bins, dtype=np.int32),
                    "cnt": np.array(cnts, dtype=np.int64),
                    "n_px": np.array(npx, dtype=np.int64),
                }
            )

    return videos.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, FRAME_HIST_SCHEMA
    )


def shot_boundaries(
    hist: DataFrame, thresh_num: int = 1, thresh_den: int = 2
) -> DataFrame:
    """Frame-histogram rows → shot segments (video_id, shot_id, start_frame,
    end_frame, n_frames) — the scene-cut detection step a video training
    pipeline runs before per-shot sampling/dedup.

    Decision algebra (all integer, exactly replayable): a frame is a boundary
    iff it is the video's first frame OR the L1 distance between its luma
    histogram and the previous frame's satisfies
    ``l1 * thresh_den > n_px * thresh_num`` (default: more than half the
    pixels changed bins; L1 of two equal-mass histograms is at most 2*n_px).
    ``shot_id`` = running count of boundaries minus 1; segments are the
    per-(video, shot) frame ranges.

    Scale shape: one equi-join on (video_id, bin) between consecutive frames
    (both sides partition identically), one partial-aggregating groupBy per
    frame, and windows partitioned by video_id (per-video frame counts are
    bounded) — no driver data, no cross join, no Python."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cur = hist.select("video_id", "frame_idx", "bin", "cnt", "n_px")
    prv = hist.select(
        "video_id",
        (F.col("frame_idx") + 1).alias("frame_idx"),
        "bin",
        F.col("cnt").alias("prev_cnt"),
    )
    delta = (
        cur.join(prv, ["video_id", "frame_idx", "bin"], "left")
        .groupBy("video_id", "frame_idx")
        .agg(
            F.sum(
                F.abs(F.col("cnt") - F.coalesce(F.col("prev_cnt"), F.lit(0)))
            ).alias("l1"),
            F.max(F.when(F.col("prev_cnt").isNotNull(), 1).otherwise(0)).alias(
                "has_prev"
            ),
            F.max("n_px").alias("n_px"),  # constant within the group
        )
        .withColumn(
            "is_boundary",
            (F.col("has_prev") == 0)
            | (F.col("l1") * F.lit(int(thresh_den)) > F.col("n_px") * F.lit(int(thresh_num))),
        )
    )
    w = (
        Window.partitionBy("video_id")
        .orderBy("frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    shots = delta.withColumn(
        "shot_id", (F.sum(F.col("is_boundary").cast("int")).over(w) - 1).cast("int")
    )
    return (
        shots.groupBy("video_id", "shot_id")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").alias("n_frames"),
        )
        .select(
            "video_id", "shot_id", "start_frame", "end_frame",
            F.col("n_frames").cast("long").alias("n_frames"),
        )
    )


def select_keyframes(hist: DataFrame, shots: DataFrame) -> DataFrame:
    """Per-shot representative frame (keyframe) selection — the step after
    shot-boundary detection in a video training pipeline: downstream
    image-side dedup/curation runs on ONE frame per shot instead of every
    frame, cutting the image stage by the mean shot length.

    The keyframe of a shot is the frame whose luma histogram is closest to
    the shot's MEAN histogram. To stay in exact integer algebra the mean is
    cross-multiplied away: minimize ``sum_bins |n_frames·cnt − sum_cnt|``
    (ties → lowest frame_idx). Every step is an equi-join or a partial
    aggregation; the argmin is ``min(struct(l1, frame_idx))`` — a map-side
    combinable agg, NOT a window — so the plan carries no per-video sort and
    no driver data. Reference anchor: the medoid selection in the reference's
    cluster writers (NodeVisitor.h:19-72 picks representatives per node); here
    the "node" is a shot segment.

    Scale shape: frame→shot map comes from exploding the bounded per-shot
    ranges (one row per frame, same key layout as ``hist``), then two
    (video_id, shot_id, bin)-keyed equi-joins and two groupBys whose key
    spaces are the frame table and the shot table — no window over frames,
    no cross join, no Python."""
    from pyspark.sql import functions as F

    fmap = shots.select(
        "video_id",
        "shot_id",
        "n_frames",
        F.explode(F.sequence("start_frame", "end_frame")).alias("frame_idx"),
    )
    h = hist.join(fmap, ["video_id", "frame_idx"])
    totals = h.groupBy("video_id", "shot_id", "bin").agg(
        F.sum("cnt").alias("sum_cnt")
    )
    scored = (
        h.join(totals, ["video_id", "shot_id", "bin"])
        .groupBy("video_id", "shot_id", "frame_idx")
        .agg(
            F.sum(
                F.abs(F.col("n_frames") * F.col("cnt") - F.col("sum_cnt"))
            ).alias("l1"),
            F.max("n_frames").alias("n_frames"),
        )
    )
    return (
        scored.groupBy("video_id", "shot_id")
        .agg(
            F.min(F.struct("l1", "frame_idx")).alias("best"),
            F.max("n_frames").alias("n_frames"),
        )
        .select(
            "video_id",
            "shot_id",
            F.col("best.frame_idx").alias("keyframe_idx"),
            F.col("best.l1").cast("long").alias("l1"),
            F.col("n_frames").cast("long").alias("n_frames"),
        )
    )
