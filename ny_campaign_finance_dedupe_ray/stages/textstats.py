"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All stateless vectorized ``map_batches`` stages
over the documents table (doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions import hashing as H
from ..functions import langid_model as LM


class LangId:
    """Actor-pool language classifier: a trained hashed char-ngram
    multinomial logistic (functions/langid_model.py; 8 languages, 99.6%
    held-out on the seeded synthetic corpus, trained offline by
    tools/train_langid.py).  The ~130 KiB npz artifact (weights + a Bloom
    filter over training n-grams for the gibberish/unseen-script guard)
    loads once per actor in __init__; each batch is one W[buckets] gather
    + segment-sum over the first 256 chars of every row — O(bytes), no
    per-row Python."""

    def __init__(self, artifact_path: str = LM.ARTIFACT_PATH):
        self.W, self.b, self.langs, self.bloom = LM.load_artifact(
            artifact_path
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred = LM.predict(
            self.W, self.b, self.langs, batch.column("text"), self.bloom
        )
        return batch.append_column(
            "lang_pred", pa.array(pred.tolist(), pa.string())
        )


def lang_id(ds: "ray.data.Dataset", concurrency=(1, 4)) -> "ray.data.Dataset":
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


_STOPWORDS = (
    "the a an and or of to in is are was were be been with for on at by "
    "from as it this that these those"
).split()


def quality_score(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics, fully vectorized with pyarrow kernels.
    Output adds: n_chars_m, n_tokens, punct_ratio, stop_ratio, quality."""

    def score(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.fill_null("")
        n_chars = pc.utf8_length(text)
        n_punct = pc.utf8_length(pc.replace_substring_regex(text, r"[\w\s]", ""))
        tokens = pc.split_pattern_regex(pc.utf8_lower(text), r"\s+")
        n_tokens = pc.list_value_length(tokens)
        flat = pc.list_flatten(tokens)
        is_stop = pc.is_in(flat, value_set=pa.array(_STOPWORDS))
        # per-row stopword counts via reduceat over the flattened token list
        # (split always yields >= 1 token per row, so offsets are strictly
        # increasing and reduceat segments align with rows)
        offs = np.zeros(len(text) + 1, dtype=np.int64)
        np.cumsum(n_tokens.to_numpy(zero_copy_only=False), out=offs[1:])
        stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = (
            np.add.reduceat(stop_np, offs[:-1])
            if len(stop_np)
            else np.zeros(len(text), dtype=np.int64)
        )
        nt = np.maximum(n_tokens.to_numpy(zero_copy_only=False), 1)
        nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1)
        punct_ratio = n_punct.to_numpy(zero_copy_only=False) / nc
        stop_ratio = counts / nt
        mean_word_len = nc / nt
        quality = (
            np.clip(nc / 200.0, 0, 1) * 0.4
            + np.clip(stop_ratio * 5, 0, 1) * 0.3
            + (1 - np.clip(punct_ratio * 5, 0, 1)) * 0.2
            + np.clip((mean_word_len - 2) / 6, 0, 1) * 0.1
        )
        out = t
        out = out.append_column("n_chars_m", n_chars.cast(pa.int64()))
        out = out.append_column("n_tokens", n_tokens.cast(pa.int64()))
        out = out.append_column("punct_ratio", pa.array(punct_ratio))
        out = out.append_column("stop_ratio", pa.array(stop_ratio))
        out = out.append_column("quality", pa.array(quality))
        return out

    return ds.map_batches(score, batch_format="pyarrow")


def token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Whitespace tokens + a BPE-ish subword estimate (ceil(chars/4) bound
    blended with punctuation splits).  Output: (doc_id, n_ws_tokens,
    n_subword_est)."""

    def count(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = text.fill_null("")
        ws = pc.list_value_length(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        ).cast(pa.int64())
        pieces = pc.list_value_length(
            pc.split_pattern_regex(text, r"[\s\.,;:!\?\-]+")
        ).cast(pa.int64())
        chars = pc.utf8_length(text).cast(pa.int64())
        sub = pc.add(
            pieces,
            pc.divide(chars, 4).cast(pa.int64()),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_ws_tokens": ws,
                "n_subword_est": sub,
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def fingerprints(ds: "ray.data.Dataset", k: int = 8, window: int = 4) -> "ray.data.Dataset":
    """Winnowing-style document fingerprint: minimum rolling k-gram hash per
    sliding window, xor-folded to one int64 per document.
    Output: (doc_id, fingerprint)."""

    def fp(t: pa.Table) -> pa.Table:
        col = t.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h, splits = H.shingle_hashes(col, k=k)
        n = t.num_rows
        out = np.zeros(n, dtype=np.uint64)
        lens = np.diff(splits)
        if len(h):
            # batch-vectorized sliding-window minima that never cross rows:
            # pad (window-1) MAX sentinels between rows, run O(window)
            # shifted-minimum passes over the padded buffer, then gather the
            # first n_win positions of each row
            pad = window - 1
            padded = np.full(len(h) + n * pad, np.iinfo(np.uint64).max,
                             dtype=np.uint64)
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            dest = np.arange(len(h), dtype=np.int64) + row_ids * pad
            padded[dest] = h
            m = padded.copy()
            for w in range(1, window):
                np.minimum(m[:-w], padded[w:], out=m[:-w])
            n_win = np.where(lens > 0, np.maximum(lens - window + 1, 1), 0)
            seg_starts = (splits[:-1] + np.arange(n) * pad).astype(np.int64)
            gather = np.repeat(seg_starts, n_win) + H._ranges(n_win)
            mins = m[gather]
            # xor of UNIQUE minima per row
            mrows = np.repeat(np.arange(n, dtype=np.int64), n_win)
            order = np.lexsort((mins, mrows))
            sr, sm = mrows[order], mins[order]
            uniq = np.empty(len(sr), dtype=bool)
            if len(sr):
                uniq[0] = True
                uniq[1:] = (sr[1:] != sr[:-1]) | (sm[1:] != sm[:-1])
                ur, um = sr[uniq], sm[uniq]
                ucounts = np.bincount(ur, minlength=n)
                uoffs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(ucounts, out=uoffs[1:])
                nz = ucounts > 0
                out[nz] = np.bitwise_xor.reduceat(um, uoffs[:-1][nz])
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": pa.array(out.astype(np.int64)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
