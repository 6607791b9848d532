"""Codec + fidelity-invariant tests (north rule: decoded-pixel allclose, PSNR ≥ 40 dB
for lossy formats, caption byte-equality)."""

import numpy as np
import pytest

from lmw_tree_spark.sources import codecs


def _img(h=48, w=32):
    rng = np.random.default_rng(77)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_png_roundtrip_lossless():
    px = _img()
    data = codecs.encode_png(px)
    assert data[:8] == codecs.PNG_SIG
    out = codecs.decode_png(data)
    assert (out == px).all()  # PNG is exact


def test_lossy_roundtrip_psnr_over_40db():
    px = _img()
    out = codecs.decode_lossy(codecs.encode_lossy(px))
    assert out.shape == px.shape
    assert codecs.psnr(px, out) >= 40.0


def test_decode_dispatch_and_errors():
    px = _img(32, 32)
    assert (codecs.decode_image(codecs.encode_png(px), "png") == px).all()
    with pytest.raises(NotImplementedError, match="libjpeg"):
        codecs.decode_image(b"\xff\xd8\xff\xe0", "jpeg")  # real JPEG magic
    with pytest.raises(ValueError):
        codecs.decode_image(b"x", "gif")


def test_luma_and_resize_deterministic():
    px = _img(64, 64)
    lum = codecs.luma(px)
    assert lum.shape == (64, 64)
    r = codecs.resize_nn(lum, 32, 32)
    assert r.shape == (32, 32)
    assert (codecs.resize_nn(lum, 32, 32) == r).all()


def test_psnr_identity_is_inf():
    px = _img()
    assert codecs.psnr(px, px) == float("inf")
