"""Pure-numpy baseline JPEG codec (functions/jpeg.py): round-trip PSNR
gates across subsampling modes, sizes, restart markers; unsupported-mode
errors; and the DecodeImage Ray-stage integration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions.jpeg import (
    UnsupportedJpeg,
    decode_jpeg,
    encode_jpeg,
)


def _test_image(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                xx * 255 / w,
                yy * 255 / h,
                128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def test_roundtrip_444():
    img = _test_image()
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert _psnr(dec, img) >= 40


def test_roundtrip_420_and_sizes():
    for h, w in [(48, 64), (17, 23), (9, 40), (15, 15), (16, 16)]:
        img = _test_image(h, w)
        dec = decode_jpeg(encode_jpeg(img, quality=92, subsampling="4:2:0"))
        assert dec.shape == img.shape
        assert _psnr(dec, img) >= 22, (h, w, _psnr(dec, img))


def test_roundtrip_grayscale_and_tiny():
    g = _test_image()[..., 0]
    dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert dec.shape == g.shape and dec.ndim == 2
    assert _psnr(dec, g) >= 45
    one = np.array([[200]], dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(one, 95)).shape == (1, 1)


def test_restart_markers():
    img = _test_image(40, 56)
    plain = decode_jpeg(encode_jpeg(img, 90, restart_interval=0))
    for ri in (1, 2, 5):
        rst = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
        np.testing.assert_array_equal(rst, plain)


def test_quality_monotone():
    img = _test_image()
    p = [
        _psnr(decode_jpeg(encode_jpeg(img, q)), img) for q in (30, 60, 90)
    ]
    assert p[0] < p[1] < p[2]
    assert len(encode_jpeg(img, 30)) < len(encode_jpeg(img, 90))


def test_unsupported_modes_raise():
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(b"not a jpeg")
    # forge a progressive (SOF2) header
    enc = bytearray(encode_jpeg(_test_image(8, 8), 90))
    sof = enc.find(b"\xff\xc0")
    enc[sof + 1] = 0xC2
    with pytest.raises(UnsupportedJpeg):
        decode_jpeg(bytes(enc))


def test_decode_image_stage_handles_jpeg():
    from ny_campaign_finance_dedupe_ray.stages import multimodal

    img = _test_image(32, 32)
    rows = [
        {
            "media_id": "jpg1",
            "kind": "image",
            "mime": "image/jpeg",
            "payload": encode_jpeg(img, 90),
        },
        {
            "media_id": "jpg2",
            "kind": "image",
            "mime": "image/jpeg",
            "payload": encode_jpeg(img, 90, subsampling="4:2:0"),
        },
    ]
    ds = rd.from_items(rows)
    out = (
        multimodal.decode_images(ds)
        .to_pandas()
        .set_index("media_id")
        .sort_index()
    )
    assert out.loc["jpg1", "width_in"] == 32
    assert out.loc["jpg1", "height_in"] == 32
    f1 = np.asarray(out.loc["jpg1", "feature"])
    f2 = np.asarray(out.loc["jpg2", "feature"])
    assert np.isfinite(f1).all() and np.isfinite(f2).all()
    # 4:4:4 and 4:2:0 encodings of the same image land close in feature
    # space (same decoder, real pixels)
    assert np.abs(f1 - f2).mean() < 5.0
    # capability flag now counts jpeg as native
    flags = (
        multimodal.annotate_decodable(ds).to_pandas()["codec_supported"]
    )
    assert flags.all()
