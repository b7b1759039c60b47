"""Stateful index predicates: the broadcast-index actor-pool replacement for
the reference's corpus-wide canopy machinery (SURVEY.md §2.3).

- TfIdfIndex: cosine index with IDF log1p(N/df) and the stop-word rule
  "terms with df > max(1000, 0.05*N) removed"
  (/root/reference/dedupe_extension/dedupe/dedupe/tfidf.py:12-40,
  canopy_index.py:14-61).
- tfidf_canopy_blocks: Ray stage — the index is built once (driver pass
  over the field column), ``ray.put`` once, and an actor pool emits
  (block_key = matched center id, record_id) rows per record, the
  SearchPredicate shape (predicates.py:209-245).  The reference's
  sequential CanopyPredicate is order-dependent and not
  parallel-reproducible (predicates.py:156-206); emitting ALL neighbors
  within the threshold is its recall-superset — downstream scoring
  re-checks every pair, so cluster output is preserved (SURVEY.md §2.3
  note).
- levenshtein_within_blocks: LevenshteinIndex analogue — all corpus values
  within edit distance d, computed with DuckDB's native levenshtein against
  the broadcast corpus per actor (levenshtein.py:7-32; thresholds 1-4 per
  variables/string.py:39-42).

Scale note: both indexes are BROADCAST structures — right when the indexed
side fits in memory (gazetteer canonical lists, vocabulary tables).  For
corpus-scale blocking use the stateless MinHash/LSH keys in
stages/blocking.py instead.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import ray
import ray.data

_WORDS = re.compile(r"\w+").findall


class TfIdfIndex:
    """In-memory cosine index (tfidf.py:12-40 + canopy_index.py:14-61)."""

    def __init__(self, docs: dict):
        """docs: {doc_id: text}."""
        n = len(docs)
        df: Counter = Counter()
        tokenized: dict = {}
        for did, text in docs.items():
            toks = _WORDS((text or "").lower())
            tokenized[did] = toks
            df.update(set(toks))
        stop_cutoff = max(1000, 0.05 * n)
        self.stop_words = {t for t, c in df.items() if c > stop_cutoff}
        self.idf = {
            t: math.log1p(n / c)
            for t, c in df.items()
            if t not in self.stop_words
        }
        self.postings: dict = defaultdict(list)
        self.norms: dict = {}
        for did, toks in tokenized.items():
            tf = Counter(t for t in toks if t in self.idf)
            w = {t: c * self.idf[t] for t, c in tf.items()}
            norm = math.sqrt(sum(v * v for v in w.values()))
            self.norms[did] = norm
            for t, v in w.items():
                self.postings[t].append((did, v))

    def search(self, text: str, threshold: float = 0.0) -> list:
        toks = _WORDS((text or "").lower())
        tf = Counter(t for t in toks if t in self.idf)
        if not tf:
            return []
        w = {t: c * self.idf[t] for t, c in tf.items()}
        qnorm = math.sqrt(sum(v * v for v in w.values()))
        scores: dict = defaultdict(float)
        for t, qv in w.items():
            for did, dv in self.postings.get(t, ()):
                scores[did] += qv * dv
        out = []
        for did, s in scores.items():
            denom = qnorm * self.norms[did]
            if denom and s / denom >= threshold:
                out.append((did, s / denom))
        out.sort(key=lambda x: (-x[1], str(x[0])))
        return [did for did, _ in out]


class _TfIdfSearcher:
    """Actor: broadcast index loaded once in __init__."""

    def __init__(self, index_ref, field: str, threshold: float, id_column: str):
        self.index: TfIdfIndex = ray.get(index_ref)
        self.field = field
        self.threshold = threshold
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_column).to_pylist()
        texts = batch.column(self.field).to_pylist()
        out_keys, out_ids = [], []
        for rid, text in zip(ids, texts):
            if not text:
                continue
            for center in self.index.search(text, self.threshold):
                out_keys.append(f"tfidf:{center}")
                out_ids.append(rid)
        return pa.table(
            {
                "block_key": pa.array(out_keys, pa.string()),
                "record_id": pa.array([str(r) for r in out_ids], pa.string()),
            }
        )


def tfidf_canopy_blocks(
    records: "ray.data.Dataset",
    field: str,
    threshold: float = 0.6,
    id_column: str = "record_id",
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """(block_key='tfidf:<center>', record_id) rows: each record blocks with
    every indexed document within the cosine threshold."""
    small = records.select_columns([id_column, field]).to_pandas()
    index = TfIdfIndex(dict(zip(small[id_column].astype(str), small[field])))
    index_ref = ray.put(index)
    return records.map_batches(
        _TfIdfSearcher,
        fn_constructor_kwargs={
            "index_ref": index_ref,
            "field": field,
            "threshold": threshold,
            "id_column": id_column,
        },
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


class _LevSearcher:
    def __init__(self, corpus_ref, field: str, distance: int, id_column: str):
        import duckdb

        self.corpus = ray.get(corpus_ref)  # list[(id, value)]
        self.field = field
        self.distance = distance
        self.id_column = id_column
        self.con = duckdb.connect()
        self.con.execute("SET threads TO 1")
        self.con.execute(
            "CREATE TABLE corpus AS SELECT * FROM (VALUES %s) t(cid, cval)"
            % ",".join("(?, ?)" for _ in self.corpus),
            [x for pair in self.corpus for x in pair],
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.con.register("q", batch.select([self.id_column, self.field]))
        rows = self.con.execute(
            f'SELECT q."{self.id_column}" AS rid, corpus.cid AS center '
            f'FROM q JOIN corpus ON levenshtein(q."{self.field}", corpus.cval) '
            f"<= {int(self.distance)} WHERE q.\"{self.field}\" IS NOT NULL"
        ).fetch_arrow_table()
        self.con.unregister("q")
        centers = rows.column("center").to_pylist()
        rids = rows.column("rid").to_pylist()
        return pa.table(
            {
                "block_key": pa.array([f"lev:{c}" for c in centers], pa.string()),
                "record_id": pa.array([str(r) for r in rids], pa.string()),
            }
        )


def levenshtein_within_blocks(
    records: "ray.data.Dataset",
    field: str,
    distance: int = 2,
    id_column: str = "record_id",
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """(block_key='lev:<center>', record_id): records block with every
    indexed value within edit distance d (brute-force vectorized join
    against the broadcast corpus — the index side must be small)."""
    small = records.select_columns([id_column, field]).to_pandas()
    corpus = [
        (str(a), b)
        for a, b in zip(small[id_column].astype(str), small[field])
        if b
    ]
    corpus_ref = ray.put(corpus)
    return records.map_batches(
        _LevSearcher,
        fn_constructor_kwargs={
            "corpus_ref": corpus_ref,
            "field": field,
            "distance": distance,
            "id_column": id_column,
        },
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )
