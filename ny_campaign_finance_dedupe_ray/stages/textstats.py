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

# Tiny seeded character-trigram profiles for an n-gram language heuristic.
# Built from common function words — a deterministic, dependency-free
# stand-in for a real langid model (the Ray plumbing is the point).
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "he ", " th", "and", "nd ", "ing", "ng ", " an", "ed ", " of",
           "of ", "ion", " to", "to ", " in", "in ", "ent", "is "},
    "de": {"der", "er ", " de", "die", "ie ", "und", " un", "en ", "ein",
           "ich", "ch ", "sch", " ei", "das", "as ", "ung"},
    "fr": {"le ", " le", "les", "es ", "de ", " de", "des", "ent", "que",
           " qu", "ue ", "la ", " la", "ion", "eur", " et", "et "},
}


class LangId:
    """Actor-pool language classifier: profiles built once per actor
    (__init__), per-batch vectorized trigram voting."""

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        for t in texts:
            t = (t or "").lower()
            grams = {t[i: i + 3] for i in range(len(t) - 2)}
            best, best_n = "unknown", 0
            for lang, prof in self.profiles.items():
                n = len(grams & prof)
                if n > best_n:
                    best, best_n = lang, n
            langs.append(best if best_n >= 2 else "unknown")
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


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
        out = np.zeros(t.num_rows, dtype=np.uint64)
        for i in range(t.num_rows):
            row = h[splits[i]: splits[i + 1]]
            if len(row) == 0:
                continue
            n_win = max(len(row) - window + 1, 1)
            acc = np.uint64(0)
            mins = np.empty(n_win, dtype=np.uint64)
            for w in range(window):
                seg = row[w: w + n_win]
                if w == 0:
                    mins[: len(seg)] = seg
                else:
                    np.minimum(mins[: len(seg)], seg, out=mins[: len(seg)])
            for m in np.unique(mins):
                acc ^= np.uint64(m)
            out[i] = acc
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": pa.array(out.astype(np.int64)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
