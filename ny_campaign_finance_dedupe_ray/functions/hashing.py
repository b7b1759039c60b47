"""Deterministic vectorized hashing: rolling k-gram shingles, MinHash,
LSH band keys, SimHash, and a stable 64-bit string hash.

This is the web-scale replacement for the reference's stateful canopy /
tf-idf index predicates (/root/reference/dedupe_extension/dedupe/dedupe/
tfidf.py:12-40, predicates.py:156-245): MinHash band keys are computed
statelessly per row, so blocking stays an embarrassingly-parallel flat-map
followed by one groupby shuffle — no corpus-wide index, no order dependence
(SURVEY.md §2.3 note).

Everything is numpy over concatenated byte buffers (no per-shingle Python
objects) and seeded by module constants — identical output on every worker,
any batch size (Python ``hash`` is never used; it is randomized per process).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)

# Fixed seeded odd multipliers/offsets for the minhash permutation family.
_PERM_SEED = 0x5EED_CAFE


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_PERM_SEED)
    a = rng.integers(1, 2**63, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=n_perm, dtype=np.uint64)
    return a, b


_SHORT_LEN = 64  # rows at or under this byte length take the FNV path


def _splitmix64(k: np.ndarray) -> np.ndarray:
    k = (k ^ (k >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    k = (k ^ (k >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return k ^ (k >> np.uint64(31))


def hash64_str(values: "pa.Array | list[str]") -> np.ndarray:
    """Stable 64-bit hash per string, vectorized over the concatenated
    utf-8 buffer.

    Hybrid by row length (deterministic per string — the path depends only
    on the string's own byte length): rows up to ``_SHORT_LEN`` bytes use
    FNV-1a via a per-position loop (bounded at 64 vectorized iterations);
    longer rows — full document text in ``exact_dedup`` can be 100 KB —
    use an O(total_bytes) polynomial hash (one power-table cumprod + one
    ``np.add.reduceat`` over byte contributions) finished with splitmix64,
    instead of an O(max_len) Python iteration count."""
    if not isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = pa.array(values, pa.string())
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    buf, offsets = _texts_to_buffer(values)
    n = len(values)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    lens = offsets[1:] - offsets[:-1]
    max_len = int(lens.max()) if n else 0

    short = lens <= _SHORT_LEN
    starts = offsets[:-1]
    if short.any():
        s_starts = starts[short]
        s_lens = lens[short]
        s_out = np.full(int(short.sum()), _FNV_OFFSET, dtype=np.uint64)
        for j in range(min(max_len, _SHORT_LEN)):
            mask = s_lens > j
            idx = s_starts[mask] + j
            s_out[mask] = (s_out[mask] ^ buf[idx].astype(np.uint64)) * _FNV_PRIME
        out[short] = s_out

    long = ~short
    if long.any():
        # h_row = sum_j byte_j * B^(len-1-j) mod 2^64.  Power table by
        # cumprod (wraps mod 2^64); exponent per byte from its row's end
        # offset.  Computed over CONSECUTIVE ROW CHUNKS of bounded byte
        # span: the per-byte temporaries (exp, w) are int64/uint64 — 16x
        # the input bytes — and GB-scale allocations stall hard on this
        # class of VM (khugepaged), so each chunk stays ~cache-sized.
        # Short rows inside a chunk are computed and discarded (<= 64 B
        # each, bounded waste) — chunking stays a simple offset split.
        pow_b = np.empty(max_len, dtype=np.uint64)
        pow_b[0] = 1
        np.cumprod(
            np.full(max_len - 1, _FNV_PRIME, dtype=np.uint64),
            out=pow_b[1:],
        )
        length_salt = lens.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        chunk_bytes = 1 << 22  # 4 MiB of input per chunk
        r0 = 0
        while r0 < n:
            # widest row range starting at r0 with span <= chunk_bytes
            # (always at least one row)
            r1 = int(
                np.searchsorted(
                    offsets, offsets[r0] + chunk_bytes, side="right"
                )
            ) - 1
            r1 = max(r1, r0 + 1)
            c_long = long[r0:r1]
            if not c_long.any():
                r0 = r1
                continue
            base = int(offsets[r0])
            span = int(offsets[r1]) - base
            exp = np.repeat(offsets[r0 + 1: r1 + 1], lens[r0:r1])
            exp -= 1 + base
            exp -= np.arange(span, dtype=np.int64)
            w = pow_b[exp]
            w *= buf[base: base + span]
            # reduceat boundary: an empty row at the chunk end has
            # start == span, which reduceat rejects — append a zero
            # sentinel so that segment sums harmlessly (middle empty rows
            # are fine: reduceat yields one element, discarded by the
            # [c_long] mask)
            red_starts = starts[r0:r1] - base
            if len(red_starts) and red_starts[-1] == span:
                w = np.append(w, np.uint64(0))
            h = np.add.reduceat(w, red_starts)[c_long]
            idx = np.nonzero(c_long)[0] + r0
            out[idx] = _splitmix64(h ^ length_salt[idx])
            r0 = r1
    return out


def _texts_to_buffer(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated utf-8 bytes + row offsets (handles slicing safely by
    re-encoding via pyarrow cast — cheap, one memcpy)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = texts.fill_null("")
    # normalize offsets by taking buffers directly
    offs_buf = texts.buffers()[1]
    data_buf = texts.buffers()[2]
    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    offsets = np.frombuffer(offs_buf, dtype=off_dtype)[
        texts.offset: texts.offset + len(texts) + 1
    ].astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    return data, offsets


def shingle_hashes(
    texts: "pa.Array | pa.ChunkedArray", k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling polynomial hashes of all char k-grams for every row.

    Returns (hashes, row_splits): hashes is uint64 of total shingle count;
    row i's shingles are hashes[row_splits[i]:row_splits[i+1]].  Fully
    vectorized: O(k) passes over the concatenated byte buffer.
    """
    data, offsets = _texts_to_buffer(texts)
    n_rows = len(offsets) - 1
    total = len(data)
    if total < k:
        return np.empty(0, np.uint64), np.zeros(n_rows + 1, np.int64)
    n_win = total - k + 1
    h = np.zeros(n_win, dtype=np.uint64)
    B = np.uint64(1099511628211)
    for j in range(k):
        h = h * B + data[j: j + n_win].astype(np.uint64)
    # valid windows: start at p where the whole k-gram is inside one row
    lens = offsets[1:] - offsets[:-1]
    counts = np.maximum(lens - k + 1, 0)
    row_splits = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=row_splits[1:])
    # gather valid window starts: for each row with count c, starts
    # offsets[i] .. offsets[i]+c-1
    starts = np.repeat(offsets[:-1], counts) + _ranges(counts)
    return h[starts], row_splits


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def minhash(
    shingles: np.ndarray, row_splits: np.ndarray, n_perm: int = 128
) -> np.ndarray:
    """(n_rows, n_perm) uint64 minhash signatures via the fixed permutation
    family; rows with zero shingles get all-max sentinel signatures."""
    n_rows = len(row_splits) - 1
    a, b = _perm_params(n_perm)
    sigs = np.full((n_rows, n_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(shingles) == 0:
        return sigs
    nonempty = row_splits[:-1] < row_splits[1:]
    starts = row_splits[:-1][nonempty]
    for p in range(n_perm):
        hv = shingles * a[p] + b[p]  # uint64 wraparound universal-ish hash
        mins = np.minimum.reduceat(hv, starts)
        sigs[nonempty, p] = mins
    return sigs


def lsh_band_keys(
    sigs: np.ndarray, n_bands: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Hash each band of the signature matrix -> (row_idx, band_key strings).

    band_key = 'mh{band}:{hex}' so keys from different bands never collide.
    Returns (row_indices, keys) flattened over bands — the flat-map shape
    blocking needs.
    """
    n_rows, n_perm = sigs.shape
    assert n_perm % n_bands == 0
    r = n_perm // n_bands
    row_idx = np.tile(np.arange(n_rows, dtype=np.int64), n_bands)
    keys = np.empty(n_rows * n_bands, dtype=object)
    for band in range(n_bands):
        chunk = sigs[:, band * r: (band + 1) * r]
        h = np.full(n_rows, _FNV_OFFSET, dtype=np.uint64)
        for col in range(r):
            h = (h ^ chunk[:, col]) * _FNV_PRIME
        prefix = "mh%d:" % band
        hx = np.char.mod("%016x", h.astype(np.uint64))
        keys[band * n_rows: (band + 1) * n_rows] = np.char.add(prefix, hx)
    return row_idx, keys


def simhash(shingles: np.ndarray, row_splits: np.ndarray) -> np.ndarray:
    """64-bit SimHash per row from shingle hashes (sign of per-bit sums)."""
    n_rows = len(row_splits) - 1
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(shingles) == 0:
        return out
    nonempty = row_splits[:-1] < row_splits[1:]
    starts = row_splits[:-1][nonempty]
    acc = np.zeros((int(nonempty.sum()), 64), dtype=np.int64)
    for bit in range(64):
        bits = ((shingles >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        acc[:, bit] = np.add.reduceat(bits * 2 - 1, starts)
    sig = np.zeros(len(acc), dtype=np.uint64)
    for bit in range(64):
        sig |= (acc[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
    out[nonempty] = sig
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance of two uint64 arrays."""
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def jaccard_shingles(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard of two strings (verification path)."""
    arr = pa.array([text_a or "", text_b or ""], pa.string())
    h, splits = shingle_hashes(arr, k)
    sa = set(h[splits[0]: splits[1]].tolist())
    sb = set(h[splits[1]: splits[2]].tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
