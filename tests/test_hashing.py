"""Vectorized hashing: shingles, minhash, LSH bands, simhash — determinism
and agreement with naive per-row computations."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ny_campaign_finance_dedupe_ray.functions import hashing as H


def _naive_shingle_set(text: str, k: int) -> set[int]:
    b = text.encode("utf-8")
    out = set()
    B = 1099511628211
    for i in range(len(b) - k + 1):
        h = 0
        for j in range(k):
            h = (h * B + b[i + j]) % (1 << 64)
        out.add(h)
    return out


def test_shingle_hashes_match_naive():
    texts = pa.array(["hello world", "ab", "", "hello world!", None])
    h, splits = H.shingle_hashes(texts, k=5)
    assert len(splits) == 6
    for i, t in enumerate(["hello world", "ab", "", "hello world!", ""]):
        got = set(h[splits[i]: splits[i + 1]].tolist())
        assert got == _naive_shingle_set(t, 5), (i, t)


def test_shingle_hashes_slice_offset():
    texts = pa.array(["aaaaaa", "hello world", "goodbye world"])
    full_h, full_s = H.shingle_hashes(texts, k=4)
    sliced = texts.slice(1, 2)
    h, s = H.shingle_hashes(sliced, k=4)
    want = set(full_h[full_s[1]: full_s[3]].tolist())
    assert set(h.tolist()) == want


def test_minhash_similarity_monotone():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river bend"
    c = "completely different text with no overlap whatsoever in content"
    texts = pa.array([a, b, c])
    h, s = H.shingle_hashes(texts, k=5)
    sigs = H.minhash(h, s, n_perm=128)
    sim_ab = (sigs[0] == sigs[1]).mean()
    sim_ac = (sigs[0] == sigs[2]).mean()
    assert sim_ab > 0.6
    assert sim_ac < 0.2
    # determinism across calls and batch splits
    h2, s2 = H.shingle_hashes(pa.array([b]), k=5)
    sigs2 = H.minhash(h2, s2, n_perm=128)
    assert (sigs2[0] == sigs[1]).all()


def test_lsh_band_keys_shape_and_collision():
    texts = pa.array(["abcdefghij" * 3, "abcdefghij" * 3, "zyxwvut" * 5])
    h, s = H.shingle_hashes(texts, k=5)
    sigs = H.minhash(h, s, n_perm=32)
    rows, keys = H.lsh_band_keys(sigs, n_bands=8)
    assert len(rows) == 3 * 8
    k0 = {k for r, k in zip(rows, keys) if r == 0}
    k1 = {k for r, k in zip(rows, keys) if r == 1}
    k2 = {k for r, k in zip(rows, keys) if r == 2}
    assert k0 == k1          # identical texts share all band keys
    assert not (k0 & k2)     # disjoint texts share none


def test_simhash_and_hamming():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river bend"
    c = "completely different text with no overlap whatsoever in content"
    texts = pa.array([a, b, c])
    h, s = H.shingle_hashes(texts, k=4)
    sh = H.simhash(h, s)
    d_ab = H.hamming64(sh[0:1], sh[1:2])[0]
    d_ac = H.hamming64(sh[0:1], sh[2:3])[0]
    assert d_ab < d_ac
    assert d_ab <= 12


def test_hash64_str_stability():
    v = H.hash64_str(["abc", "abd", "abc", ""])
    assert v[0] == v[2]
    assert v[0] != v[1]
    # FNV-1a of empty string is the offset basis
    assert v[3] == 14695981039346656037
    v2 = H.hash64_str(pa.chunked_array([["abc"], ["abd"]]))
    assert v2[0] == v[0] and v2[1] == v[1]


def test_hash64_str_long_path():
    """Rows over 64 bytes take the O(bytes) polynomial path; the hash must
    still be a pure function of the string — invariant to batch
    composition, slicing, and neighboring rows."""
    longs = [f"doc{i} " + ("lorem ipsum dolor sit amet " * 40) + str(i % 5)
             for i in range(50)]
    h = H.hash64_str(longs)
    assert len(set(h.tolist())) == 50
    # batch-composition invariance: mixed with shorts / empties / reordered
    mixed = ["", "tiny"] + longs[10:20] + ["x" * 64, "x" * 65]
    hm = H.hash64_str(mixed)
    assert (hm[2:12] == h[10:20]).all()
    # sliced arrow input, trailing empty row
    arr = pa.array(longs + ["", ""])
    assert (H.hash64_str(arr)[:50] == h).all()
    assert (H.hash64_str(arr.slice(5, 20)) == h[5:25]).all()
    # one-char difference in a 1KB string still separates
    a = "q" * 1000 + "a"
    b = "q" * 1000 + "b"
    ha, hb = H.hash64_str([a, b])
    assert ha != hb
    # short rows (<= 64 bytes) remain exact FNV-1a
    def scalar_fnv(s):
        h64 = 14695981039346656037
        for byte in s.encode("utf-8"):
            h64 = ((h64 ^ byte) * 1099511628211) % (1 << 64)
        return h64

    for s in ["", "a", "x" * 63, "x" * 64, "ünïcodé!"]:
        assert int(H.hash64_str([s])[0]) == scalar_fnv(s)


def test_jaccard_shingles():
    assert H.jaccard_shingles("hello world", "hello world") == 1.0
    assert H.jaccard_shingles("", "") == 1.0
    assert H.jaccard_shingles("hello", "") == 0.0
    j = H.jaccard_shingles("hello world", "hello worle")
    assert 0.0 < j < 1.0
