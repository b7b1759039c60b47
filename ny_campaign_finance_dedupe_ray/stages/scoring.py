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
import pyarrow.compute as pc
import ray.data

from ..state.model import Model, default_model, sigmoid


class BlockingError(Exception):
    """No candidate pairs produced — predicates too restrictive
    (reference core.py:288-293)."""


# kinds computed outside DuckDB: derived (interaction), registered python
# comparators (custom), and the numpy-path variable kinds
_PYTHON_KINDS = frozenset(
    {
        "interaction",
        "custom",
        "affine_gap",
        "crf_edit",
        "cosine_text",
        "cosine_set",
        "price",
        "latlong",
        "categorical_dummy",
        "exists_both",
        "exists_one",
    }
)

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


def feature_sql(model: Model) -> str | None:
    """SQL for the duckdb-computable features; _PYTHON_KINDS features are
    computed afterwards in numpy/python (datamodel.py:74-115 derived
    columns).  None when the model has no DuckDB-computable feature."""
    exprs = []
    for f in model.features:
        if f.kind in _PYTHON_KINDS:
            continue
        tpl = _SQL_TEMPLATES[f.kind]
        exprs.append(
            tpl.format(a=f'"{f.field}_a"', b=f'"{f.field}_b"')
            + f' as "{f.name}"'
        )
    if not exprs:
        return None
    return "SELECT " + ", ".join(exprs) + " FROM batch_tbl"


def _categorical_combos(categories: list) -> list[tuple[int, int]]:
    """Unordered category-index pairs in combinations_with_replacement
    order, minus the (0, 0) reference level — the dummy layout of the
    reference's CategoricalComparator (variables/categorical_type.py:18-34)."""
    import itertools

    return list(
        itertools.combinations_with_replacement(range(len(categories)), 2)
    )[1:]


def _truthy_mask(arr) -> np.ndarray:
    """Python-truthiness of an Arrow column as a bool mask, vectorized —
    matches ``bool(x)`` per value (null/''/0/[]/b'' are falsy), which is the
    contract the scalar exists_both/exists_one loops established."""
    t = arr.type
    valid = pc.is_valid(arr)
    try:
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            nz = pc.not_equal(pc.utf8_length(arr), 0)
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            nz = pc.not_equal(pc.binary_length(arr), 0)
        elif pa.types.is_boolean(t):
            nz = arr
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            nz = pc.not_equal(pc.list_value_length(arr), 0)
        elif pa.types.is_null(t):
            return np.zeros(len(arr), dtype=bool)
        else:
            nz = pc.not_equal(arr, pa.scalar(0).cast(t))
        mask = pc.fill_null(pc.and_kleene(valid, nz), False)
        return mask.to_numpy(zero_copy_only=False).astype(bool)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return np.array([bool(x) for x in arr.to_pylist()], dtype=bool)


def py_feature_values(f, batch: pa.Table) -> np.ndarray:
    """Numpy-path feature column for one python-kind feature over a pair
    batch (columns ``{field}_a`` / ``{field}_b``).  NaN marks missing,
    matching the reference's missing-data rule (datamodel.py:74-115) —
    callers zero-fill and pair with a ``not_missing`` dummy."""
    from ..functions import comparators as C
    from ..functions.affinegap import batch_normalized_affine_gap

    a = batch.column(f"{f.field}_a")
    b = batch.column(f"{f.field}_b")

    if f.kind == "price":
        va = a.cast(pa.float64()).to_numpy(zero_copy_only=False)
        vb = b.cast(pa.float64()).to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.abs(np.log10(va) - np.log10(vb))
        out[(~(va > 0)) | (~(vb > 0))] = np.nan  # non-positive or NaN
        return out

    if f.kind == "cosine_text":
        # lexsort-merge sparse cosine — no per-pair Python (VERDICT r2)
        return C.batch_cosine_text(a, b)
    if f.kind == "cosine_set":
        return C.batch_cosine_set(a, b)
    if f.kind == "exists_both":
        return (_truthy_mask(a) & _truthy_mask(b)).astype(np.float64)
    if f.kind == "exists_one":
        return (_truthy_mask(a) != _truthy_mask(b)).astype(np.float64)
    if f.kind == "categorical_dummy":
        cats = list(f.params["categories"])
        target = _categorical_combos(cats)[int(f.params["pair_index"])]
        # compare in the column's native type: a float 1.0 category rendered
        # '1' by an Arrow string cast but '1.0' by Python str() must still
        # match — fall back to the string path only when the cast fails
        try:
            if not a.type.equals(b.type):
                # record-link sides can carry different column types —
                # native-type compare is only sound when both sides share
                # the categories' cast target
                raise pa.ArrowTypeError("a/b type mismatch")
            cats_arr = pa.array(cats).cast(a.type)
            aa, bb = a, b
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            cats_arr = pa.array([str(c) for c in cats], pa.string())
            aa, bb = a.cast(pa.string()), b.cast(pa.string())
        ia = pc.index_in(aa, value_set=cats_arr)
        ib = pc.index_in(bb, value_set=cats_arr)
        van = ia.to_numpy(zero_copy_only=False).astype(np.float64)
        vbn = ib.to_numpy(zero_copy_only=False).astype(np.float64)
        lo = np.minimum(van, vbn)
        hi = np.maximum(van, vbn)
        out = ((lo == target[0]) & (hi == target[1])).astype(np.float64)
        out[np.isnan(van) | np.isnan(vbn)] = np.nan
        return out

    va, vb = a.to_pylist(), b.to_pylist()

    if f.kind == "latlong":
        return C.batch_haversine_sqrt(va, vb)
    if f.kind == "affine_gap":
        # batch Gotoh DP (functions/affinegap.py) — one vectorized chunk per
        # length class instead of one Python DP per pair; NaN for missing
        return batch_normalized_affine_gap(va, vb)
    if f.kind == "crf_edit":
        from ..functions.editcrf import DEFAULT_PARAMS, crf_edit_scores

        return crf_edit_scores(
            va, vb, tuple((f.params or {}).get("params", DEFAULT_PARAMS))
        )
    raise ValueError(f"not a python-path feature kind: {f.kind!r}")


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
        base: dict[str, np.ndarray] = {}
        if self.sql is not None:
            self.con.register("batch_tbl", batch)
            out = self.con.execute(self.sql).fetch_arrow_table()
            self.con.unregister("batch_tbl")
            base = {
                f.name: out.column(f.name).to_numpy(zero_copy_only=False)
                for f in self.model.features
                if f.kind not in _PYTHON_KINDS
            }
        # derived columns (datamodel.py:74-115): numpy-path variable kinds
        # and custom comparators per pair, then interactions as products of
        # named features (NaN -> 0 before multiplying, matching the
        # reference's Interaction rule)
        for f in self.model.features:
            if f.kind == "custom":
                fn = self.custom_fns[f.name]
                va = batch.column(f"{f.field}_a").to_pylist()
                vb = batch.column(f"{f.field}_b").to_pylist()
                base[f.name] = np.array(
                    [float(fn(a, b)) for a, b in zip(va, vb)]
                )
            elif f.kind in _PYTHON_KINDS and f.kind != "interaction":
                base[f.name] = py_feature_values(f, batch)
        # interactions may reference OTHER interactions (n-way products
        # chain through helper features, e.g. models converted from
        # reference settings pickles) — resolve in passes so the factors
        # need not precede their dependents in the feature list
        pending = [f for f in self.model.features if f.kind == "interaction"]
        while pending:
            rest = []
            for f in pending:
                f1, f2 = f.field.split("*", 1)
                if f1 in base and f2 in base:
                    base[f.name] = np.nan_to_num(base[f1]) * np.nan_to_num(
                        base[f2]
                    )
                else:
                    rest.append(f)
            if len(rest) == len(pending):
                raise KeyError(
                    "unresolvable interaction factors: "
                    f"{sorted({f.field for f in rest})}"
                )
            pending = rest
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
