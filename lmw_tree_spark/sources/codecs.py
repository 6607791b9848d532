"""Image codecs for the opaque ``bytes`` column: a real (minimal) PNG encoder/decoder
and a deterministic fake lossy codec standing in for JPEG.

The container has no image libraries (no PIL/libjpeg/opencv), so:

- ``png``: REAL RFC-2083 PNG — signature + IHDR + IDAT (zlib, filter 0) + IEND with
  CRCs, 8-bit RGB. Decodable by any standards-compliant reader; our decoder handles
  the filter-0 subset we emit.
- ``jpeg``: STUB. Real JPEG decode is NOT implemented (no DCT codec library in this
  environment). We use a clearly-marked deterministic fake lossy codec ``FJPG``:
  per-channel quantization to step 6 + zlib. Quantization step 6 gives
  MSE ≈ 6²/12 = 3 → PSNR ≈ 43 dB, satisfying the ≥40 dB lossy-fidelity invariant
  while still exercising a lossy re-encode path. Swap ``encode_lossy``/
  ``decode_lossy`` for libjpeg-turbo bindings in production; all Spark-side
  plumbing (binary column, batch decode UDFs, schema) is real and tested.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"
LOSSY_STEP = 6  # quantization step → ~43 dB PSNR


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    idat = zlib.compress(raw, 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8. Supports the filter-0 RGB8 subset we emit."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("decoder supports 8-bit RGB only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("decoder supports filter 0 only")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_lossy(pixels: np.ndarray) -> bytes:
    """STUB lossy codec (see module docstring): quantize(step 6) + zlib."""
    h, w, _ = pixels.shape
    q = ((pixels.astype(np.int32) + LOSSY_STEP // 2) // LOSSY_STEP).clip(0, 255 // LOSSY_STEP)
    header = FJPG_MAGIC + struct.pack(">HHB", w, h, LOSSY_STEP)
    return header + zlib.compress(q.astype(np.uint8).tobytes(), 6)


def decode_lossy(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not an FJPG payload")
    w, h, step = struct.unpack(">HHB", data[4:9])
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    return (q.reshape(h, w, 3).astype(np.int32) * step).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on the ``fmt`` column. Real JPEG bytes would raise — documented stub."""
    if fmt == "png":
        return decode_png(data)
    if fmt in ("jpeg", "jpg"):
        if data[:4] == FJPG_MAGIC:
            return decode_lossy(data)
        raise NotImplementedError(
            "real JPEG decoding requires libjpeg, unavailable in this environment; "
            "only the deterministic FJPG stand-in is supported"
        )
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def luma(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → (h, w) float64 BT.601 luma."""
    p = pixels.astype(np.float64)
    return 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize of a 2-D array."""
    h, w = img.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]
