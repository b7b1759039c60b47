"""Pairwise scoring: a stateful actor-pool ``map_batches`` stage.

Replaces the reference's hand-rolled multiprocessing fan-out (ScoreDupes
workers + queue + memmap merge, /root/reference/dedupe_extension/dedupe/
dedupe/core.py:113-293) with
``map_batches(PairScorer, concurrency=N, batch_size=B, batch_format='pyarrow')``
— the streaming executor subsumes queues, chunking, poison pills and the
merge step; blocks stay distributed.

Feature comparators run inside an embedded DuckDB connection per actor
(native vectorized ``jaro_winkler_similarity`` / ``levenshtein`` /
``jaccard`` over the Arrow batch — zero-copy registration), standing in for
the reference's C comparators (affinegap; variables/string.py:60-66).  The
logistic scorer is numpy: sigma(X.w + b) (core.py:149-150).

``BlockingError`` (core.py:288-293 parity) is raised by the in-memory
``partition()`` entry point when blocking yields zero candidate pairs; the
streaming ``score_pairs`` stage itself cannot know the global pair count
without forcing execution, so empty streams simply produce empty output.

Edge-pruning note (intentional divergence from the reference): pairs with
score <= ``min_score`` (default ``model.threshold``) are DROPPED here, while
the reference's ``partition()`` clusters over the full scored edge list —
sub-threshold edges there still join connected components and contribute
distances to the centroid-linkage dendrogram.  At web scale the full edge
list is quadratic-ish junk; pruning at the threshold is the scale-driven
choice.  Pass ``min_score=0.0`` (or any value below the clustering
threshold) to reproduce the reference's exact dendrogram inputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..state.model import Model, default_model, sigmoid


class BlockingError(Exception):
    """No candidate pairs produced — predicates too restrictive
    (reference core.py:288-293)."""


_SQL_TEMPLATES = {
    "jaro_winkler": "jaro_winkler_similarity(coalesce({a},''), coalesce({b},''))",
    "levenshtein_ratio": (
        "1.0 - levenshtein(coalesce({a},''), coalesce({b},'')) "
        "/ greatest(length(coalesce({a},'')), length(coalesce({b},'')), 1)"
    ),
    "char_jaccard": "jaccard(coalesce({a},'x'), coalesce({b},'y'))",
    "exact": "cast({a} is not null and {b} is not null and {a} = {b} as double)",
    "prefix4": (
        "cast({a} is not null and {b} is not null "
        "and left({a},4) = left({b},4) as double)"
    ),
    "not_missing": "cast({a} is not null and {b} is not null as double)",
}


def feature_sql(model: Model) -> str:
    """SQL for the duckdb-computable features; interaction/custom features
    are computed afterwards in numpy/python (datamodel.py:74-115 derived
    columns)."""
    exprs = []
    for f in model.features:
        if f.kind in ("interaction", "custom"):
            continue
        tpl = _SQL_TEMPLATES[f.kind]
        exprs.append(
            tpl.format(a=f'"{f.field}_a"', b=f'"{f.field}_b"')
            + f' as "{f.name}"'
        )
    return "SELECT " + ", ".join(exprs) + " FROM batch_tbl"


class PairScorer:
    """Actor: model + DuckDB connection built once; per-batch vectorized
    feature matrix -> logistic score; emits pairs with score > min_score."""

    def __init__(self, model: Model | None = None, model_path: str | None = None,
                 min_score: float | None = None, custom_fns: dict | None = None):
        import duckdb

        from ..state.model import CUSTOM_COMPARATORS

        if model is None:
            model = Model.load(model_path) if model_path else default_model()
        self.model = model
        # custom comparators: registry snapshot at actor build time, plus
        # explicitly passed functions (cloudpickled into the actor — a
        # driver-side register_comparator() call after actor start would
        # not be visible here)
        self.custom_fns = {**CUSTOM_COMPARATORS, **(custom_fns or {})}
        self.weights = np.asarray(model.weights, dtype=np.float64)
        self.bias = float(model.bias)
        self.min_score = model.threshold if min_score is None else min_score
        self.con = duckdb.connect()
        # the actor reserves num_cpus=1 — an unpinned duckdb would spawn one
        # thread per host core and a 32-actor pool would run 32x32 threads
        self.con.execute("SET threads TO 1")
        self.sql = feature_sql(model)

    def features(self, batch: pa.Table) -> np.ndarray:
        self.con.register("batch_tbl", batch)
        out = self.con.execute(self.sql).fetch_arrow_table()
        self.con.unregister("batch_tbl")
        base: dict[str, np.ndarray] = {
            f.name: out.column(f.name).to_numpy(zero_copy_only=False)
            for f in self.model.features
            if f.kind not in ("interaction", "custom")
        }
        # derived columns (datamodel.py:74-115): custom comparators per
        # pair, then interactions as products of named features (NaN -> 0
        # before multiplying, matching the reference's Interaction rule)
        for f in self.model.features:
            if f.kind == "custom":
                fn = self.custom_fns[f.name]
                va = batch.column(f"{f.field}_a").to_pylist()
                vb = batch.column(f"{f.field}_b").to_pylist()
                base[f.name] = np.array(
                    [float(fn(a, b)) for a, b in zip(va, vb)]
                )
        for f in self.model.features:
            if f.kind == "interaction":
                f1, f2 = f.field.split("*", 1)
                base[f.name] = np.nan_to_num(base[f1]) * np.nan_to_num(base[f2])
        return np.column_stack(
            [np.nan_to_num(base[f.name]) for f in self.model.features]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "score": pa.array([], pa.float32()),
                }
            )
        X = self.features(batch)
        score = sigmoid(X @ self.weights + self.bias)
        keep = score > self.min_score
        return pa.table(
            {
                "id_a": batch.column("id_a").filter(pa.array(keep)),
                "id_b": batch.column("id_b").filter(pa.array(keep)),
                "score": pa.array(score[keep].astype(np.float32)),
            }
        )


def score_pairs(
    pairs: "ray.data.Dataset",
    model: Model | None = None,
    min_score: float | None = None,
    batch_size: int = 2048,
    concurrency: int | tuple[int, int] = (1, 8),
    custom_fns: dict | None = None,
) -> "ray.data.Dataset":
    """PAIRS(+payload) -> SCORES(id_a, id_b, score>threshold).

    The actor pool autoscale range keeps the stage from starving the
    blocking/pair stages upstream while still soaking idle CPUs."""
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={
            "model": model,
            "min_score": min_score,
            "custom_fns": custom_fns,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
