"""Video frame-sampling + audio feature plumbing (deterministic stand-in codecs)."""

import numpy as np
import pytest

from lmw_tree_spark.sources import codecs
from lmw_tree_spark.sources.multimodal import (
    audio_features,
    decode_audio_pcm,
    decode_video_frames,
    encode_audio,
    encode_video,
    sample_frames,
)


def _video(n=12, h=16, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_fvid_roundtrip_psnr():
    frames = _video()
    blob = encode_video(frames, fps=10.0)
    fb, idxs, w, h, fps = decode_video_frames(blob, "fvid", every_k=1)
    assert (w, h, fps) == (16, 16, 10.0) and idxs == list(range(12))
    decoded = codecs.decode_lossy(fb[3])
    assert codecs.psnr(frames[3], decoded) >= 40.0  # lossy fidelity invariant


def test_real_video_formats_raise():
    with pytest.raises(NotImplementedError):
        decode_video_frames(b"\x00\x00\x00\x18ftypmp42", "mp4")
    with pytest.raises(NotImplementedError):
        decode_audio_pcm(b"ID3\x04", "mp3")


def test_encode_video_fps_overflow_raises():
    """fps beyond the 16-bit millifps header fails loudly instead of wrapping
    (a wrapped 120 fps would decode as 54.464 fps and corrupt every ts_ms)."""
    frames = _video(n=2)
    with pytest.raises(ValueError, match="fps"):
        encode_video(frames, fps=120.0)
    with pytest.raises(ValueError, match="fps"):
        encode_video(frames, fps=0.0)
    # boundary value still round-trips
    blob = encode_video(frames, fps=65.535)
    _, _, _, _, fps = decode_video_frames(blob, "fvid")
    assert fps == 65.535


def test_sample_frames_explodes_and_feeds_signature_stage(spark):
    from pyspark.sql import functions as F

    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.operators.signature_stage import extract_signatures

    rows = [
        (f"vid{i}", bytearray(encode_video(_video(seed=i), fps=5.0)), "fvid")
        for i in range(3)
    ]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    frames = sample_frames(videos, every_k=4)
    pdf = frames.toPandas()
    assert len(pdf) == 3 * 3  # 12 frames, every 4th
    assert set(pdf["frame_idx"]) == {0, 4, 8}
    assert list(pdf["ts_ms"].sort_values().unique()) == [0, 800, 1600]  # 5 fps

    # frame rows plug straight into the image signature stage (phash null →
    # computed per frame from decoded pixels)
    images = frames.select(
        F.concat_ws("#", "video_id", "frame_idx").alias("image_id"),
        "bytes", "w", "h", "fmt",
        F.concat_ws(" ", F.lit("frame of"), "video_id").alias("caption"),
        F.lit(None).cast("long").alias("phash"),
    )
    sigs = extract_signatures(images, SMALL).toPandas()
    assert len(sigs) == 9
    assert all(len(s) == SMALL.sig_bits // 64 for s in sigs["sig"])
    assert sigs["phash"].nunique() > 1  # real per-frame phashes, not placeholder


def test_video_neardup_groups(spark):
    """Video dedup via frame reduction: a noise-perturbed copy co-groups with
    its source; an unrelated video stays alone."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.sources.multimodal import video_neardup_groups

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)
    rows = [
        ("v0", bytearray(encode_video(base)), "fvid"),
        ("v1", bytearray(encode_video(other)), "fvid"),
        ("v2", bytearray(encode_video(noisy)), "fvid"),
    ]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    groups = {
        r["video_id"]: r["dup_group"]
        for r in video_neardup_groups(videos, SMALL, every_k=2).collect()
    }
    assert groups["v0"] == groups["v2"]
    assert groups["v1"] != groups["v0"]


def test_video_neardup_repeated_common_frame_no_false_merge(spark):
    """Two otherwise-unrelated videos each carrying k copies of one common frame
    (black/intro frames) must NOT merge: k copies yield k² verified frame PAIRS
    but cover only one DISTINCT frame of the smaller video — the coverage
    criterion counts distinct frames, so the k² inflation cannot pass
    min_frame_frac."""
    from lmw_tree_spark.config import SMALL
    from lmw_tree_spark.sources.multimodal import video_neardup_groups

    # 3 copies of the common frame in each 8-frame video: 3x3 = 9 verified
    # pairs >= threshold 8*0.5 = 4 (the old pair-count criterion merged), but
    # only 3 distinct covered frames < 4 (the coverage criterion does not).
    rng = np.random.default_rng(33)
    common = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    uniq_a = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    uniq_b = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    va = np.concatenate([np.repeat(common[None], 3, axis=0), uniq_a])
    vb = np.concatenate([np.repeat(common[None], 3, axis=0), uniq_b])
    rows = [
        ("v0", bytearray(encode_video(va)), "fvid"),
        ("v1", bytearray(encode_video(vb)), "fvid"),
    ]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    groups = {
        r["video_id"]: r["dup_group"]
        for r in video_neardup_groups(
            videos, SMALL, every_k=1, min_frame_frac=0.5
        ).collect()
    }
    assert groups["v0"] != groups["v1"]


def test_audio_neardup_groups(spark):
    """Same clip at different volume → same envelope fingerprint; different
    content → different group."""
    from lmw_tree_spark.sources.multimodal import audio_neardup_groups

    rate = 8000
    t = np.arange(rate)
    tone = np.sin(2 * np.pi * 440 * t / rate)
    env = np.where((t // (rate // 4)) % 2 == 0, 1.0, 0.25)  # on/off envelope
    a = (tone * env * 16000).astype(np.int16)
    a_quiet = (tone * env * 8000).astype(np.int16)          # same content, -6 dB
    rng = np.random.default_rng(3)
    b = (rng.standard_normal(rate) * 8000).clip(-32767, 32767).astype(np.int16)
    rows = [
        ("a0", bytearray(encode_audio(a, rate)), "faud"),
        ("a1", bytearray(encode_audio(a_quiet, rate)), "faud"),
        ("b0", bytearray(encode_audio(b, rate)), "faud"),
    ]
    audio = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    g = {r["audio_id"]: r["dup_group"] for r in audio_neardup_groups(audio).collect()}
    assert g["a0"] == g["a1"]
    assert g["b0"] != g["a0"]


def test_audio_features_match_numpy(spark):
    rate = 8000
    t = np.arange(rate)  # 1 second
    pcm = (np.sin(2 * np.pi * 440 * t / rate) * 16000).astype(np.int16)
    rows = [("a0", bytearray(encode_audio(pcm, rate)), "faud")]
    audio = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = audio_features(audio, window_ms=250).toPandas().iloc[0]
    x = pcm.astype(np.float64) / 32768.0
    assert got["sample_rate"] == rate and got["n_samples"] == rate
    assert got["duration_ms"] == 1000
    assert abs(got["rms"] - np.sqrt((x**2).mean())) < 1e-9
    assert len(got["window_rms"]) == 4  # 4 x 250ms windows
    # a pure tone has uniform energy per window
    assert np.allclose(got["window_rms"], got["rms"], rtol=1e-2)


def test_synthetic_fixtures_deterministic_with_planted_dups(spark):
    """The exchange-backed audio/video queries rely on the driver fixtures
    being byte-deterministic (oracle artifacts are committed) and carrying the
    documented near-dup structure (i%4==1 variants of the base)."""
    import numpy as np

    import __spark_entry__ as entry
    from lmw_tree_spark.sources.multimodal import decode_audio_pcm, decode_video_frames

    a1 = entry._synthetic_audio(spark, 16).toPandas().sort_values("audio_id")
    a2 = entry._synthetic_audio(spark, 16).toPandas().sort_values("audio_id")
    assert all(bytes(x) == bytes(y) for x, y in zip(a1["bytes"], a2["bytes"]))
    # i%4==1 is a +1 dB copy of the base: same length, samplewise proportional
    pcm0, _ = decode_audio_pcm(bytes(a1.iloc[0]["bytes"]), "faud")
    pcm1, _ = decode_audio_pcm(bytes(a1.iloc[1]["bytes"]), "faud")
    assert len(pcm0) == len(pcm1)
    scale = 10 ** (1.0 / 20)
    # int16 truncation of x*32767 vs (x*scale)*32767 differ by up to ~scale
    assert np.abs(pcm1.astype(np.float64) - pcm0.astype(np.float64) * scale).max() <= 1.5

    v1 = entry._synthetic_videos(spark, 8).toPandas().sort_values("video_id")
    v2 = entry._synthetic_videos(spark, 8).toPandas().sort_values("video_id")
    assert all(bytes(x) == bytes(y) for x, y in zip(v1["bytes"], v2["bytes"]))
    # i%4==1 re-encodes the base frames with +-1 noise: same geometry
    b0, i0, w0, h0, _ = decode_video_frames(bytes(v1.iloc[0]["bytes"]), "fvid")
    b1, i1, w1, h1, _ = decode_video_frames(bytes(v1.iloc[1]["bytes"]), "fvid")
    assert (len(b0), w0, h0) == (len(b1), w1, h1) == (8, 32, 32)


def test_shot_boundaries_recover_planted_cuts(spark):
    """frame_luma_histograms + shot_boundaries recover every planted scene cut
    and nothing else; frame counts conserve; single-scene clips yield exactly
    one shot."""
    import numpy as np

    from lmw_tree_spark.sources.multimodal import (
        encode_video,
        frame_luma_histograms,
        shot_boundaries,
    )

    LEVELS = (15, 85, 155, 225)

    def clip(seed, lens):
        frames = []
        for si, ln in enumerate(lens):
            rng = np.random.default_rng([99, seed, si])
            lvl = LEVELS[(seed + si) % 4]
            base = (
                rng.integers(lvl - 12, lvl + 13, (20, 20, 3))
                .clip(0, 255)
                .astype(np.int16)
            )
            for f in range(ln):
                jit = np.random.default_rng([99, seed, si, f]).integers(
                    -1, 2, base.shape
                )
                frames.append((base + jit).clip(0, 255).astype(np.uint8))
        return encode_video(np.stack(frames), fps=10.0)

    plans = {"a": [4, 3, 5], "b": [2, 6], "c": [7]}
    rows = [(k, clip(i, lens), "fvid") for i, (k, lens) in enumerate(plans.items())]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    shots = (
        shot_boundaries(frame_luma_histograms(videos))
        .orderBy("video_id", "shot_id")
        .toPandas()
    )
    for i, (k, lens) in enumerate(plans.items()):
        seg = shots[shots.video_id == k].sort_values("shot_id")
        starts = list(np.cumsum([0] + lens[:-1]))
        assert seg.start_frame.tolist() == starts, (k, seg)
        assert seg.n_frames.tolist() == lens
        assert seg.end_frame.tolist() == [s + l - 1 for s, l in zip(starts, lens)]


def test_select_keyframes_picks_mean_closest_frame(spark):
    """select_keyframes returns one row per shot; the keyframe is the frame
    whose histogram minimizes the cross-multiplied L1 to the shot mean, ties
    to the lowest frame_idx — checked against a NumPy replay."""
    import numpy as np
    import pandas as pd

    from lmw_tree_spark.sources.multimodal import (
        encode_video,
        frame_luma_histograms,
        select_keyframes,
        shot_boundaries,
    )

    def clip(seed, lens, levels=(15, 85, 155, 225)):
        frames = []
        for si, ln in enumerate(lens):
            rng = np.random.default_rng([99, seed, si])
            lvl = levels[(seed + si) % 4]
            base = (
                rng.integers(lvl - 12, lvl + 13, (20, 20, 3))
                .clip(0, 255)
                .astype(np.int16)
            )
            for f in range(ln):
                jit = np.random.default_rng([99, seed, si, f]).integers(
                    -1, 2, base.shape
                )
                frames.append((base + jit).clip(0, 255).astype(np.uint8))
        return encode_video(np.stack(frames), fps=10.0)

    plans = {"a": [4, 3, 5], "b": [2, 6], "c": [7]}
    rows = [(k, clip(i, lens), "fvid") for i, (k, lens) in enumerate(plans.items())]
    videos = spark.createDataFrame(rows, "video_id string, bytes binary, fmt string")
    hist = frame_luma_histograms(videos).persist()
    shots = shot_boundaries(hist)
    out = select_keyframes(hist, shots).toPandas()

    # one keyframe per shot, keyframe inside its segment
    shots_pd = shots.toPandas()
    assert len(out) == len(shots_pd)
    merged = out.merge(shots_pd, on=["video_id", "shot_id"], suffixes=("", "_s"))
    assert (merged.keyframe_idx >= merged.start_frame).all()
    assert (merged.keyframe_idx <= merged.end_frame).all()
    assert (merged.n_frames == merged.n_frames_s).all()

    # NumPy replay of the argmin over the raw histograms
    hp = hist.toPandas()
    for _, s in shots_pd.iterrows():
        seg = hp[
            (hp.video_id == s.video_id)
            & (hp.frame_idx >= s.start_frame)
            & (hp.frame_idx <= s.end_frame)
        ]
        mat = seg.pivot_table(
            index="frame_idx", columns="bin", values="cnt", aggfunc="sum"
        ).sort_index()
        tot = mat.to_numpy().sum(axis=0)
        l1 = np.abs(s.n_frames * mat.to_numpy() - tot).sum(axis=1)
        best = mat.index[np.lexsort((mat.index.to_numpy(), l1))[0]]
        got = out[
            (out.video_id == s.video_id) & (out.shot_id == s.shot_id)
        ].iloc[0]
        assert got.keyframe_idx == best
        assert got.l1 == int(l1.min())
