"""Pure-stdlib PNG codec (ISO/IEC 15948 / RFC 2083, public spec): zlib
inflate/deflate + the five scanline filters, numpy reconstruction.

Coverage — the formats a web-scraped image corpus mostly is:

- decode: 8-bit depth, color types 0 (grayscale), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA), non-interlaced.  16-bit and sub-byte depths
  and Adam7 interlace raise :class:`UnsupportedPng` so the capability
  router sends them to a codec-equipped pool instead of crashing a decode
  actor; structurally corrupt payloads raise ``ValueError``.
- encode (fixtures): 8-bit gray / RGB / RGBA / palette, one filter chosen
  per scanline (cycling 0..4 by default so every decode filter path is
  exercised by the synthesized corpora).

CRCs of all consumed chunks are verified (zlib.crc32) — a flipped byte is
a loud ValueError, not silently-wrong pixels.  Decompressed size is bounded
up front from IHDR (h x (1 + w*channels)) via ``zlib.decompressobj`` with
an explicit max_length, so a zip-bomb IDAT cannot balloon memory past the
declared geometry.

The reference engine has no media path at all (SURVEY §2: media columns
are an LLM-pipeline extension); parity target is the public spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# pixels cap: bounds filter-reconstruction cost and memory for hostile
# headers (a 1-byte IDAT can declare a 4-billion-pixel canvas)
MAX_PIXELS = 64_000_000

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class UnsupportedPng(NotImplementedError):
    """Valid PNG, but a mode outside the native-decode envelope
    (interlaced, 16-bit, sub-byte depth) — route to a codec pool."""


def _chunks(payload: bytes):
    """Yield (type, data) for each chunk, CRC-verified."""
    if not payload.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if length > 0x7FFFFFFF or end + 4 > n:
            raise ValueError("truncated or oversized PNG chunk")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack(">I", payload[end : end + 4])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


def png_header(payload: bytes) -> dict | None:
    """Parse just the IHDR: ``{width, height, bit_depth, color_type,
    interlace}`` or None when the payload is not a structurally-valid PNG
    opening.  Used by the capability router — cheap, no inflate."""
    try:
        for ctype, data in _chunks(payload):
            if ctype != b"IHDR" or len(data) != 13:
                return None
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                return None
            return {
                "width": w,
                "height": h,
                "bit_depth": depth,
                "color_type": color,
                "interlace": interlace,
            }
    except ValueError:
        return None
    return None


def png_native(payload: bytes) -> bool:
    """True when ``decode_png`` handles this payload's declared mode."""
    hdr = png_header(payload)
    return (
        hdr is not None
        and hdr["bit_depth"] == 8
        and hdr["color_type"] in _CHANNELS
        and hdr["interlace"] == 0
        and 0 < hdr["width"] * hdr["height"] <= MAX_PIXELS
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters -> (h, stride) uint8."""
    out = np.empty((h, stride), dtype=np.uint8)
    rowlen = stride + 1
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y * rowlen])
        line = raw[y * rowlen + 1 : (y + 1) * rowlen]
        if ftype == 0:  # None
            rec = line.copy()
        elif ftype == 1:  # Sub: + left — cumulative per bpp lane
            pad = (-stride) % bpp
            lanes = np.concatenate([line, np.zeros(pad, np.uint8)])
            lanes = lanes.reshape(-1, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8)
            rec = rec.reshape(-1)[:stride]
        elif ftype == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average: inherently sequential in x
            # (each byte depends on the just-reconstructed byte one pixel
            # left, so no numpy scan applies); plain-int lists run the
            # recurrence ~9x faster than numpy scalar indexing.
            li = line.tolist()
            pv = prev.tolist()
            rl = [0] * stride
            for x in range(stride):
                left = rl[x - bpp] if x >= bpp else 0
                rl[x] = (li[x] + ((left + pv[x]) >> 1)) & 0xFF
            rec = np.array(rl, dtype=np.uint8)
        elif ftype == 4:  # Paeth: inherently sequential in x (see above)
            li = line.tolist()
            pv = prev.tolist()
            rl = [0] * stride
            for x in range(stride):
                a = rl[x - bpp] if x >= bpp else 0
                b = pv[x]
                c = pv[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_ = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc_ = p - c if p >= c else c - p
                if pa_ <= pb and pa_ <= pc_:
                    pred = a
                elif pb <= pc_:
                    pred = b
                else:
                    pred = c
                rl[x] = (li[x] + pred) & 0xFF
            rec = np.array(rl, dtype=np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array: (h, w) for grayscale, (h, w, 2) gray+alpha,
    (h, w, 3) RGB (palette expanded), (h, w, 4) RGBA."""
    hdr = None
    plte: bytes | None = None
    idat: list[bytes] = []
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if hdr is not None or len(data) != 13:
                raise ValueError("bad or duplicate IHDR")
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
            if color not in _CHANNELS:
                raise ValueError(f"invalid PNG color type {color}")
            if interlace == 1:
                raise UnsupportedPng("Adam7 interlaced PNG")
            if interlace != 0:
                raise ValueError(f"invalid interlace method {interlace}")
            if depth != 8:
                raise UnsupportedPng(f"bit depth {depth} (only 8 native)")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension PNG")
            if w * h > MAX_PIXELS:
                raise ValueError("PNG dimensions exceed decode cap")
            hdr = (w, h, color)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    w, h, color = hdr
    ch = _CHANNELS[color]
    stride = w * ch
    expected = h * (stride + 1)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expected)
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    if len(raw) != expected:
        raise ValueError("IDAT length disagrees with IHDR geometry")
    arr = _unfilter(np.frombuffer(raw, dtype=np.uint8), h, stride, ch)
    if color == 0:
        return arr.reshape(h, w)
    if color == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise ValueError("palette PNG missing/invalid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    return arr.reshape(h, w, ch)


def decode_png_rgb(payload: bytes) -> np.ndarray:
    """decode_png normalized to (h, w, 3) uint8: grayscale replicated,
    alpha dropped (features only read color planes)."""
    img = decode_png(payload)
    if img.ndim == 2:
        return np.stack([img] * 3, axis=-1)
    if img.shape[2] == 2:  # gray + alpha
        return np.stack([img[:, :, 0]] * 3, axis=-1)
    if img.shape[2] == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def _filter_line(
    ftype: int, rec: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to reconstructed scanline ``rec``."""
    r = rec.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int32)
    upleft = np.zeros_like(r)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) >> 1)
    elif ftype == 4:
        p = left + up - upleft
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, upleft)
        )
        out = r - pred
    else:
        raise ValueError(f"invalid filter {ftype}")
    return (out & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray,
    palette: np.ndarray | None = None,
    cycle_filters: bool = True,
    interlace: int = 0,
) -> bytes:
    """uint8 image -> PNG bytes.  (h, w) -> grayscale, (h, w, 3) -> RGB,
    (h, w, 4) -> RGBA; with ``palette`` (n<=256, 3) the 2-D ``img`` holds
    palette indices (color type 3).  ``cycle_filters`` picks filter
    ``y % 5`` per scanline so decoders see all five paths; ``interlace=1``
    writes an Adam7 HEADER (for router tests) with sequential pixel data —
    only meaningful as an UnsupportedPng fixture."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette image must be 2-D index array")
        if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
            raise ValueError("palette must be (n<=256, 3)")
        if int(img.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        color, ch = 3, 1
    elif img.ndim == 2:
        color, ch = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    flat = img.reshape(h, w * ch)
    bpp = ch
    lines = []
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ftype = (y % 5) if cycle_filters else 0
        lines.append(bytes([ftype]))
        lines.append(_filter_line(ftype, flat[y], prev, bpp).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
    out = [PNG_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if palette is not None:
        out.append(_chunk(b"PLTE", palette.astype(np.uint8).tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(b"".join(lines), 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)
