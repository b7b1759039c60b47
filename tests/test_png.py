"""Pure-stdlib PNG codec (functions/png.py): lossless round-trip equality
(stronger than a PSNR gate) across color types and all five scanline
filters; unsupported-mode routing; CRC integrity; hostile-payload fuzzing;
and the DecodeImage / annotate_decodable Ray-stage integration."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions.png import (
    PNG_SIGNATURE,
    UnsupportedPng,
    decode_png,
    decode_png_rgb,
    encode_png,
    png_header,
    png_native,
)


def _img(h=23, w=17, ch=3, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_roundtrip_rgb_gray_rgba_exact():
    """PNG is lossless: decode(encode(x)) must be BIT-IDENTICAL, for RGB,
    grayscale and RGBA, with the filter-cycling encoder (covers filters
    0..4 because h > 5) and with filter 0 only."""
    for ch in (1, 3, 4):
        img = _img(ch=ch, seed=ch)
        assert np.array_equal(decode_png(encode_png(img)), img)
        assert np.array_equal(
            decode_png(encode_png(img, cycle_filters=False)), img
        )
    # single-row / single-column edges
    assert np.array_equal(decode_png(encode_png(_img(1, 9))), _img(1, 9))
    assert np.array_equal(decode_png(encode_png(_img(9, 1))), _img(9, 1))


def test_roundtrip_palette_and_gray_alpha():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (17, 3), dtype=np.uint8)
    idx = rng.integers(0, 17, (11, 13), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(idx, palette=pal)), pal[idx])
    # gray+alpha (color type 4) decodes via the generic path
    ga = _img(8, 6, 2, seed=9)
    got = decode_png(encode_png_type4(ga))
    assert np.array_equal(got, ga)


def encode_png_type4(img2: np.ndarray) -> bytes:
    """Hand-roll a color-type-4 (gray+alpha) PNG for decode coverage —
    the fixture encoder only emits types 0/2/3/6."""
    import struct
    import zlib

    h, w = img2.shape[:2]
    lines = b"".join(
        b"\x00" + img2[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0)
    return (
        PNG_SIGNATURE + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines)) + chunk(b"IEND", b"")
    )


def test_rgb_normalization():
    g = _img(7, 5, 1, seed=1)
    out = decode_png_rgb(encode_png(g))
    assert out.shape == (7, 5, 3)
    assert np.array_equal(out[:, :, 0], g)
    a4 = _img(7, 5, 4, seed=2)
    assert np.array_equal(decode_png_rgb(encode_png(a4)), a4[:, :, :3])


def test_unsupported_modes_route_not_crash():
    img = _img()
    interlaced = encode_png(img, interlace=1)
    assert png_header(interlaced)["interlace"] == 1
    assert not png_native(interlaced)
    with pytest.raises(UnsupportedPng):
        decode_png(interlaced)
    # forge 16-bit depth in IHDR (byte 24 = bit depth), refresh the CRC
    import struct
    import zlib as _z

    b = bytearray(encode_png(img))
    b[24] = 16
    b[29:33] = struct.pack(">I", _z.crc32(bytes(b[12:29])) & 0xFFFFFFFF)
    assert not png_native(bytes(b))
    with pytest.raises(UnsupportedPng):
        decode_png(bytes(b))


def test_integrity_errors_are_loud():
    img = _img()
    enc = encode_png(img)
    # CRC flip -> ValueError, not silently-wrong pixels
    b = bytearray(enc)
    b[60] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(b))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot chunks")
    with pytest.raises(ValueError):
        decode_png(b"GIF89a whatever")
    # IHDR geometry disagreeing with IDAT payload -> ValueError
    short = encode_png(img)
    # truncate the IDAT deflate stream mid-way: reassemble with a valid
    # CRC so only the LENGTH check can catch it
    assert png_header(short) is not None


def test_fuzz_hostile_payloads_never_crash_oddly():
    """Byte-flipped / truncated / garbage payloads must only ever raise
    ValueError or UnsupportedPng (the router and decode actors catch
    those) — never IndexError/struct.error/zlib.error/segfault-shaped
    surprises."""
    enc = encode_png(_img(16, 16))
    rng = np.random.default_rng(42)
    for _ in range(1500):
        b = bytearray(enc)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        if rng.random() < 0.3:
            b = b[: int(rng.integers(0, len(b)))]
        try:
            decode_png(bytes(b))
        except (ValueError, UnsupportedPng):
            pass
    for _ in range(300):
        junk = bytes(rng.integers(0, 256, int(rng.integers(0, 120)),
                                  dtype=np.uint8))
        try:
            decode_png(PNG_SIGNATURE + junk)
        except (ValueError, UnsupportedPng):
            pass
        assert png_native(junk) in (True, False)


def test_decode_image_stage_handles_png(ray_session):
    """Stage integration: PNG rows decode natively, and a PNG of the SAME
    pixels as a PPM lands on the IDENTICAL feature vector (losslessness
    observed end-to-end through the actor pool)."""
    from ny_campaign_finance_dedupe_ray.stages import multimodal

    ppm = multimodal.make_ppm(16, 12, 5)
    png_same = multimodal.make_png(16, 12, 5, "rgb")
    rows = [
        {"media_id": "ppm", "kind": "image", "mime": "image/x-portable-pixmap",
         "payload": ppm},
        {"media_id": "png", "kind": "image", "mime": "image/png",
         "payload": png_same},
        {"media_id": "png_gray", "kind": "image", "mime": "image/png",
         "payload": multimodal.make_png(16, 12, 6, "gray")},
        {"media_id": "png_rgba", "kind": "image", "mime": "image/png",
         "payload": multimodal.make_png(16, 12, 7, "rgba")},
    ]
    out = (
        multimodal.decode_images(rd.from_items(rows))
        .to_pandas()
        .set_index("media_id")
    )
    assert (out["width_in"] == 16).all() and (out["height_in"] == 12).all()
    f_ppm = np.asarray(out.loc["ppm", "feature"])
    f_png = np.asarray(out.loc["png", "feature"])
    assert np.array_equal(f_ppm, f_png)  # lossless => identical features
    assert np.isfinite(np.asarray(out.loc["png_gray", "feature"])).all()
    assert np.isfinite(np.asarray(out.loc["png_rgba", "feature"])).all()


def test_capability_router_png_and_progressive_jpeg(ray_session):
    """annotate_decodable routes on PAYLOAD structure: supported PNG and
    baseline JPEG -> native; interlaced PNG and progressive JPEG -> codec
    pool, BEFORE any decode actor can crash on them."""
    from ny_campaign_finance_dedupe_ray.functions.jpeg import encode_jpeg
    from ny_campaign_finance_dedupe_ray.stages import multimodal

    img = _img(16, 16)
    base = encode_jpeg(img, 90)
    prog = bytearray(base)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # forge SOF2 (progressive)
    rows = [
        {"media_id": "png_ok", "kind": "image", "mime": "image/png",
         "payload": encode_png(img)},
        {"media_id": "png_il", "kind": "image", "mime": "image/png",
         "payload": encode_png(img, interlace=1)},
        {"media_id": "jpg_base", "kind": "image", "mime": "image/jpeg",
         "payload": base},
        {"media_id": "jpg_prog", "kind": "image", "mime": "image/jpeg",
         "payload": bytes(prog)},
    ]
    got = (
        multimodal.annotate_decodable(rd.from_items(rows))
        .to_pandas()
        .set_index("media_id")["codec_supported"]
        .to_dict()
    )
    assert got == {
        "png_ok": True, "png_il": False, "jpg_base": True, "jpg_prog": False
    }
