"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k per query — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read in each task).
- lsh_topk: random-hyperplane-bucketed approximate variant — the scale
  path: queries only score candidates sharing a hyperplane bucket.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """(n, dim) float64 from a list<float>/fixed_size_list column — zero-copy
    reshape of the flat values buffer when row lengths are uniform (the
    parquet embedding layout), falling back to to_pylist otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(-1, dim)[col.offset: col.offset + len(col)].astype(
            np.float64, copy=False
        )
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offsets)
        if len(lens) and (lens == lens[0]).all():
            dim = int(lens[0])
            flat = col.values.to_numpy(zero_copy_only=False)
            start = int(offsets[0])
            return flat[start: start + len(col) * dim].reshape(-1, dim).astype(
                np.float64, copy=False
            )
    return np.stack(col.to_pylist()).astype(np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
) -> pd.DataFrame:
    """Exact cosine top-k of every query against the corpus.

    The query matrix is broadcast via ``ray.put`` once; each ``map_batches``
    task emits its local top-k per query (one small partial per batch); the
    driver merges partials with a heap — corpus never leaves the cluster.
    Output: (query_id, vec_id, cosine) rows, k per query, ties broken by id.
    """
    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q_unit)

    def local_topk(t: pa.Table) -> pa.Table:
        Q = ray.get(q_ref)
        V = _unit(_to_matrix(t.column(embedding_column)))
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        sims = Q @ V.T  # (n_q, n_batch)
        n_take = min(k, sims.shape[1])
        out_q, out_id, out_s = [], [], []
        part = np.argpartition(-sims, n_take - 1, axis=1)[:, :n_take]
        for qi in range(sims.shape[0]):
            sel = part[qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel].tolist())
            out_s.extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "q_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, sub in partials.groupby("q_idx"):
        top = heapq.nsmallest(
            k, sub.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id)
        )
        for r in top:
            rows.append((query_ids[qi], r.vec_id, r.cosine))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])


def lsh_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    n_planes: int = 6,
    n_probes: int = 4,
) -> pd.DataFrame:
    """Approximate top-k: corpus vectors hashed into random-hyperplane
    buckets (n_probes independent tables); each query scores only rows whose
    bucket matches in at least one table.  Same output shape as
    brute_force_topk; recall measured in tests."""
    dim = np.asarray(queries).shape[1]
    rng = np.random.default_rng(0xA11)
    tables = [rng.normal(size=(n_planes, dim)) for _ in range(n_probes)]
    q_unit = _unit(np.asarray(queries, dtype=np.float64))

    def codes(m: np.ndarray, P: np.ndarray) -> np.ndarray:
        bits = (m @ P.T > 0).astype(np.uint32)
        out = np.zeros(len(m), dtype=np.uint32)
        for b in range(P.shape[0]):
            out |= bits[:, b] << b
        return out

    q_codes = [codes(q_unit, P) for P in tables]
    q_ref = ray.put((q_unit, q_codes))

    def local_topk(t: pa.Table) -> pa.Table:
        Q, qc = ray.get(q_ref)
        V = _unit(_to_matrix(t.column(embedding_column)))
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        vc = [codes(V, P) for P in tables]
        out_q, out_id, out_s = [], [], []
        for qi in range(len(Q)):
            mask = np.zeros(len(V), dtype=bool)
            for p in range(len(tables)):
                mask |= vc[p] == qc[p][qi]
            if not mask.any():
                continue
            sims = V[mask] @ Q[qi]
            sel_ids = ids[mask]
            n_take = min(k, len(sims))
            part = np.argpartition(-sims, n_take - 1)[:n_take]
            out_q.extend([qi] * len(part))
            out_id.extend(sel_ids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "q_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, sub in partials.groupby("q_idx"):
        top = heapq.nsmallest(
            k, sub.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id)
        )
        for r in top:
            rows.append((query_ids[qi], r.vec_id, r.cosine))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])


def _kmeans(sample: np.ndarray, n_lists: int, iters: int = 15,
            seed: int = 0x1FF) -> np.ndarray:
    """Deterministic Lloyd k-means on UNIT vectors (spherical): returns
    (n_lists, dim) unit centroids.  Runs on a driver-side sample only."""
    rng = np.random.default_rng(seed)
    sample = _unit(np.asarray(sample, dtype=np.float64))
    n_lists = min(n_lists, len(sample))
    cent = sample[rng.choice(len(sample), size=n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_lists):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_topk(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    n_lists: int = 32,
    n_probe: int = 4,
    train_sample: int = 4096,
) -> pd.DataFrame:
    """IVF approximate top-k — the classic inverted-file scale path:

    1. train a spherical k-means coarse quantizer on a driver-side SAMPLE
       (``ds.limit(train_sample)`` — the only driver materialization, size
       bounded by the constant, never the corpus);
    2. broadcast (centroids, unit queries, per-query n_probe nearest lists)
       once via ``ray.put``;
    3. each ``map_batches`` task assigns its corpus rows to their nearest
       list and scores them ONLY against queries probing that list — a
       1/(n_lists/n_probe) compute fraction vs brute force;
    4. per-batch local top-k partials merge on the driver heap (same shape
       as brute_force_topk; the corpus never leaves the cluster).

    At multi-node scale, step 3's batch work can be preceded by a
    bucket-by-list shuffle so each task holds one list; with the default
    streaming shape no shuffle is needed at all."""
    sample_rows = ds.limit(train_sample).select_columns([embedding_column]).to_pandas()
    sample = np.stack(sample_rows[embedding_column].to_numpy())
    cent = _kmeans(sample, n_lists)

    q_unit = _unit(np.asarray(queries, dtype=np.float64))
    n_probe = min(n_probe, len(cent))
    q_lists = np.argsort(-(q_unit @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((cent, q_unit, q_lists))

    def local_topk(t: pa.Table) -> pa.Table:
        C, Q, QL = ray.get(ref)
        V = _unit(_to_matrix(t.column(embedding_column)))
        ids = t.column(id_column).to_numpy(zero_copy_only=False)
        v_list = np.argmax(V @ C.T, axis=1)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(Q)):
            mask = np.isin(v_list, QL[qi])
            if not mask.any():
                continue
            sims = V[mask] @ Q[qi]
            sel_ids = ids[mask]
            n_take = min(k, len(sims))
            part = np.argpartition(-sims, n_take - 1)[:n_take]
            out_q.extend([qi] * len(part))
            out_id.extend(sel_ids[part].tolist())
            out_s.extend(sims[part].tolist())
        return pa.table(
            {
                "q_idx": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    if len(partials):
        for qi, sub in partials.groupby("q_idx"):
            top = heapq.nsmallest(
                k, sub.itertuples(index=False),
                key=lambda r: (-r.cosine, r.vec_id),
            )
            for r in top:
                rows.append((query_ids[qi], r.vec_id, r.cosine))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "cosine"])


def cosine_similarity_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.4,
    embedding_column: str = "embedding",
    id_column: str = "vec_id",
    max_index_rows: int | None = None,
) -> "ray.data.Dataset":
    """EXACT all-pairs cosine >= threshold — the deterministic baseline for
    ``dedup.embedding_neardup_pairs`` (hyperplane-LSH, probabilistic
    recall), same split as brute_force_topk vs lsh_topk.

    The corpus (ids, unit-normalized matrix) is collected ONCE on the
    driver — hard-capped at ``max_index_rows`` (default
    index_predicates.MAX_INDEX_ROWS), raising ``IndexSideTooLarge`` beyond;
    the corpus-scale answer is the LSH path — and broadcast via
    ``ray.put``.  Each map_batches task scores its block against the
    broadcast matrix with BLAS matmuls over bounded column chunks (peak
    extra memory ~ batch x 8192 x 8 B) and emits only (id_a < id_b,
    cosine >= threshold) rows, so every pair is emitted exactly once with
    no shuffle at all.  Output: (id_a, id_b, cosine) rounded to 6.
    """
    from .index_predicates import MAX_INDEX_ROWS, IndexSideTooLarge

    cap = MAX_INDEX_ROWS if max_index_rows is None else max_index_rows
    # ONE upstream execution: materialize block refs, count rows remotely
    # (tiny ints to the driver, blocks stay in the object store), and only
    # concat to the driver once the cap check passed; the scoring pass
    # then maps over the already-materialized blocks
    slim = ds.select_columns([id_column, embedding_column])
    refs = slim.to_arrow_refs()
    _nrows = ray.remote(num_cpus=0)(lambda t: t.num_rows)
    n = sum(ray.get([_nrows.remote(r) for r in refs]))
    if n > cap:
        raise IndexSideTooLarge(
            f"cosine_similarity_pairs collects the corpus matrix on the "
            f"driver ({n} rows > cap {cap}); use "
            f"dedup.embedding_neardup_pairs for corpus-scale inputs"
        )
    tbl = pa.concat_tables(ray.get(refs), promote_options="default")
    all_ids = tbl.column(id_column).to_numpy(zero_copy_only=False)
    id_type = tbl.schema.field(id_column).type
    M = _unit(_to_matrix(tbl.column(embedding_column)))
    ref = ray.put((all_ids, M))

    def score_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids_all, Mu = ray.get(ref)
        V = _unit(_to_matrix(t.column(embedding_column)))
        bids = t.column(id_column).to_numpy(zero_copy_only=False)
        out_a, out_b, out_s = [], [], []
        chunk = 8192
        for c0 in range(0, Mu.shape[0], chunk):
            S = V @ Mu[c0: c0 + chunk].T
            bi, mj = np.nonzero(S >= threshold)
            if not len(bi):
                continue
            ia = bids[bi]
            ib = ids_all[c0 + mj]
            keep = ia < ib
            out_a.append(ia[keep])
            out_b.append(ib[keep])
            out_s.append(S[bi, mj][keep])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)).cast(id_type),
                "id_b": pa.array(np.concatenate(out_b)).cast(id_type),
                "cosine": pa.array(np.round(np.concatenate(out_s), 6)),
            }
        )

    return ray.data.from_arrow_refs(refs).map_batches(
        score_block, batch_format="pyarrow"
    )
