"""Pure-numpy baseline JPEG codec (ITU-T T.81, public specification) —
no codec library.

Decoder (``decode_jpeg``): baseline sequential DCT, 8-bit, grayscale or
YCbCr with sampling factors 1 or 2 (4:4:4, 4:2:2, 4:2:0), restart
markers supported.  Huffman decoding is a Python loop over the destuffed
scan (inherent bit-serial dependency); everything after entropy decode —
dezigzag, dequantize, IDCT, level shift, chroma upsample, color convert —
is vectorized numpy over all blocks at once.  Progressive, arithmetic,
12-bit and hierarchical modes raise ``UnsupportedJpeg``.

Encoder (``encode_jpeg``): minimal baseline 4:4:4 with the Annex K
quantization and Huffman tables (quality-scaled per the public IJG
formula) — it exists so tests and fixtures can round-trip without any
external encoder; output is a strictly standard interchange-format
stream.

Reference: the public T.81 spec (zigzag order, Annex K tables, DC/AC
entropy coding model, byte stuffing).  No code from any codec library.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedJpeg(NotImplementedError):
    pass


# -- shared tables (T.81 Annex K) -------------------------------------------

ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.float64,
)

# standard Huffman tables (Annex K.3): (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# DCT-II orthonormal basis: block_dct = D @ block @ D.T
_D = np.array(
    [
        [
            (np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = np.floor((qt * s + 50) / 100)
    return np.clip(out, 1, 255)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _huff_codes(bits, values) -> dict:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes from an (h, w, 3) uint8 RGB array (or (h, w)
    grayscale).  subsampling: '4:4:4' or '4:2:0'; restart_interval > 0
    emits DRI + RSTn markers every that many MCUs."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = subsampling == "4:2:0" and not gray
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qts = [_quality_scale(QT_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(QT_CHROMA, quality))

    # sampling factors per component and the MCU grid
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp[: len(planes)])
    vmax = max(s[1] for s in samp[: len(planes)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component block grids (by, bx, 64) of zigzagged quantized ints
    grids = []
    for ci, p in enumerate(planes):
        ch, cv = samp[ci]
        if sub and ci > 0:
            # 2x2 mean downsample of the edge-padded-to-even plane
            pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
            p = (
                pe.reshape(pe.shape[0] // 2, 2, pe.shape[1] // 2, 2)
                .mean(axis=(1, 3))
            )
        by, bx = mcuy * cv, mcux * ch
        pp = np.pad(
            p,
            ((0, by * 8 - p.shape[0]), (0, bx * 8 - p.shape[1])),
            mode="edge",
        ) - 128.0
        bl = (
            pp.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        )
        dct = _D @ bl @ _D.T
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        q = np.round(dct / qt).astype(np.int64)
        grids.append(q.reshape(by, bx, 64)[:, :, ZIGZAG])

    dc_tabs = [_huff_codes(*HT_DC_LUMA)]
    ac_tabs = [_huff_codes(*HT_AC_LUMA)]
    if not gray:
        dc_tabs.append(_huff_codes(*HT_DC_CHROMA))
        ac_tabs.append(_huff_codes(*HT_AC_CHROMA))

    # MCU-interleaved emission order, with MCU boundaries for restarts
    order: list[tuple[int, int, int]] = []  # (comp, block_y, block_x)
    mcu_of_block: list[int] = []
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                ch, cv = samp[ci]
                for v in range(cv):
                    for hh in range(ch):
                        order.append((ci, my * cv + v, mx * ch + hh))
                        mcu_of_block.append(mcu_idx)
            mcu_idx += 1

    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    rst_no = 0
    last_mcu = 0
    for bi, (ci, byi, bxi) in enumerate(order):
        cur_mcu = mcu_of_block[bi]
        if (
            restart_interval
            and cur_mcu != last_mcu
            and cur_mcu % restart_interval == 0
        ):
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (rst_no % 8)])
            rst_no += 1
            prev_dc = [0] * len(planes)
        last_mcu = cur_mcu
        zz = grids[ci][byi, bxi]
        dct = dc_tabs[min(ci, len(dc_tabs) - 1)]
        act = ac_tabs[min(ci, len(ac_tabs) - 1)]
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        cat, bits = _magnitude(diff)
        code, length = dct[cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = act[0xF0]
                bw.write(code, length)
                run -= 16
            cat, bits = _magnitude(v)
            code, length = act[(run << 4) | cat]
            bw.write(code, length)
            bw.write(bits, cat)
            run = 0
        if last < 63:
            code, length = act[0x00]  # EOB
            bw.write(code, length)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for i, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i])
        out += bytes(int(x) for x in qt[ZIGZAG])
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        ch, cv = samp[ci]
        out += bytes([ci + 1, (ch << 4) | cv, min(ci, len(qts) - 1)])
    hts = [(0x00, HT_DC_LUMA), (0x10, HT_AC_LUMA)]
    if not gray:
        hts += [(0x01, HT_DC_CHROMA), (0x11, HT_AC_CHROMA)]
    for tclass, (bits, values) in hts:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values))
        out += bytes([tclass]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (baseline sequential; 4:4:4 / 4:2:2 / 4:2:0 / grayscale)
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode via (length-indexed) min/max code ranges —
    the T.81 DECODE procedure."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, bits, values):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise UnsupportedJpeg("truncated scan")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.read_bit()
        length = 1
        while code > table.maxcode[length]:
            if length >= 16:
                raise UnsupportedJpeg("bad Huffman code")
            code = (code << 1) | self.read_bit()
            length += 1
        return table.values[table.valptr[length] + code - table.mincode[length]]

    def align(self):
        self.nbits = 0


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB (or (h, w) for grayscale streams)."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise UnsupportedJpeg("not a JPEG stream")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if pos + 1 >= n:
            raise UnsupportedJpeg("truncated stream")
        if payload[pos] != 0xFF:
            raise UnsupportedJpeg("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise UnsupportedJpeg("truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > n:
            raise UnsupportedJpeg("corrupt segment length")
        seg = payload[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise UnsupportedJpeg("16-bit quant tables")
                if p + 65 > len(seg):
                    raise UnsupportedJpeg("truncated DQT")
                qtables[tq] = np.frombuffer(
                    seg[p + 1: p + 65], dtype=np.uint8
                ).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1: p + 17])
                nv = sum(bits)
                if len(bits) < 16 or p + 17 + nv > len(seg):
                    raise UnsupportedJpeg("truncated DHT")
                values = list(seg[p + 17: p + 17 + nv])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if len(seg) < 6:
                raise UnsupportedJpeg("truncated SOF")
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise UnsupportedJpeg("non-8-bit precision")
            if fh == 0 or fw == 0 or nc == 0 or len(seg) < 6 + 3 * nc:
                raise UnsupportedJpeg("corrupt SOF")
            # decompression-bomb guard: a 2-byte corrupt dim field can claim
            # 65535x65535 (~4G pixels -> tens of GB of plane buffers and ~67M
            # MCU loop iterations). Real payloads here are media-pipeline
            # frames; cap total pixels rather than trusting the header.
            if fh * fw > 100_000_000:
                raise UnsupportedJpeg("frame dimensions exceed pixel cap")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * ci)
                if (hv >> 4) == 0 or (hv & 0xF) == 0:
                    raise UnsupportedJpeg("corrupt sampling factors")
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpeg(
                f"non-baseline frame marker 0x{marker:02x} (progressive/"
                "arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise UnsupportedJpeg("truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not seg or seg[0] == 0 or len(seg) < 1 + 2 * seg[0]:
                # ns == 0 would reach max() over empty comps in the scan —
                # a bare ValueError, not UnsupportedJpeg — crash, not route
                raise UnsupportedJpeg("truncated SOS")
            ns = seg[0]
            scomps = []
            for ci in range(ns):
                cs, tdta = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scomps.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            scan_start = pos + seglen
            # corrupt entropy data / missing tables surface as index or key
            # misses deep in the scan loop — untrusted input must fail as
            # UnsupportedJpeg, not an internal IndexError
            try:
                return _decode_scan(
                    payload, scan_start, frame, scomps, qtables, htables,
                    restart_interval,
                )
            except (IndexError, KeyError, struct.error) as e:
                raise UnsupportedJpeg(f"corrupt scan data: {e!r}") from e
        pos += seglen
    raise UnsupportedJpeg("no scan found")


def _decode_scan(
    payload, pos, frame, scomps, qtables, htables, restart_interval
):
    if frame is None:
        raise UnsupportedJpeg("SOS before SOF")
    comps = frame["comps"]
    if len(scomps) != len(comps):
        raise UnsupportedJpeg("multi-scan streams")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise UnsupportedJpeg("sampling factors beyond 2")
    fh, fw = frame["h"], frame["w"]
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    # destuff scan bytes up to EOI, recording restart-marker cut points
    data = bytearray()
    cuts = []  # destuffed offsets where an RST marker sat
    n = len(payload)
    p = pos
    while p < n:
        b = payload[p]
        if b == 0xFF:
            m = payload[p + 1] if p + 1 < n else 0xD9
            if m == 0x00:
                data.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:
                cuts.append(len(data))
                p += 2
                continue
            break  # EOI or next marker
        data.append(b)
        p += 1

    reader = _BitReader(bytes(data))
    cut_iter = iter(cuts)
    next_cut = next(cut_iter, None)

    # per-component coefficient storage: (blocks_y, blocks_x, 64)
    planes_coef = []
    for c in comps:
        by, bx = mcuy * c["v"], mcux * c["h"]
        planes_coef.append(np.zeros((by, bx, 64), dtype=np.float64))

    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                if next_cut is not None:
                    if reader.pos != next_cut:
                        reader.pos = next_cut
                        reader.nbits = 0
                    next_cut = next(cut_iter, None)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td = htables.get((0, scomps[ci]["td"]))
                ta = htables.get((1, scomps[ci]["ta"]))
                if td is None or ta is None:
                    raise UnsupportedJpeg("missing Huffman table")
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        cat = reader.decode(td)
                        diff = _extend(reader.read_bits(cat), cat)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ta)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise UnsupportedJpeg("AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        planes_coef[ci][my * c["v"] + v, mx * c["h"] + hh] = zz
            mcu_count += 1

    # vectorized dezigzag + dequant + IDCT per component
    planes = []
    for ci, c in enumerate(comps):
        qt = qtables.get(c["tq"])
        if qt is None:
            raise UnsupportedJpeg("missing quant table")
        by, bx, _ = planes_coef[ci].shape
        coef = planes_coef[ci].reshape(-1, 64)
        blocks = (coef * qt[None, :])[:, UNZIGZAG].reshape(-1, 8, 8)
        spatial = _D.T @ blocks @ _D + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full MCU-grid resolution, then crop to frame dims
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def is_baseline(payload: bytes) -> bool:
    """Cheap header scan: True when the stream's frame marker is baseline
    (SOF0/SOF1) — what ``decode_jpeg`` handles.  Progressive (SOF2),
    arithmetic and hierarchical frames return False so the capability
    router sends them to a codec pool BEFORE a decode actor sees them.
    Malformed streams return False (they would not decode either)."""
    if not payload or payload[:2] != b"\xff\xd8":
        return False
    pos, n = 2, len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            return False
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return False
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xC0, 0xC1):
            return True
        if marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            return False
        if pos + 2 > n:
            return False
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > n:
            return False
        pos += seglen
    return False
