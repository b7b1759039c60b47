"""Property-based tests (hypothesis) — invariants beyond the reference's
example-based suite: predicates are total, hashing approximates set
similarity, union-find agrees with a naive reachability oracle, affine gap
is symmetric, pair generation respects its contract on random inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from ny_campaign_finance_dedupe_ray.functions import hashing as H
from ny_campaign_finance_dedupe_ray.functions import predicates as P
from ny_campaign_finance_dedupe_ray.functions.affinegap import (
    affine_gap_distance,
    batch_affine_gap_distance,
    batch_normalized_affine_gap,
    normalized_affine_gap_distance,
)
from ny_campaign_finance_dedupe_ray.stages.clustering import UnionFind

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=60
)

STRING_PREDICATES = [
    P.whole_field, P.token_field, P.first_token, P.common_integer,
    P.alpha_numeric, P.near_integers, P.hundred_integer,
    P.hundred_integer_odd, P.first_integer, P.common_two_tokens,
    P.common_three_tokens, P.fingerprint, P.one_gram_fingerprint,
    P.two_gram_fingerprint, P.common_four_gram, P.common_six_gram,
    P.same_three_char_start, P.same_five_char_start,
    P.same_seven_char_start, P.sorted_acronym,
]


@given(TEXT)
@settings(max_examples=120, deadline=None)
def test_predicates_total_and_string_valued(text):
    """Every predicate returns an iterable of strings for any input text."""
    for fn in STRING_PREDICATES:
        out = fn(text)
        assert all(isinstance(k, str) for k in out), fn.__name__
    for k in P.suffix_array(text):
        assert isinstance(k, str) and len(k) >= 5


@given(TEXT, TEXT)
@settings(max_examples=60, deadline=None)
def test_affine_gap_symmetric_nonnegative(a, b):
    if len(a) + len(b) == 0:
        return
    d1 = normalized_affine_gap_distance(a, b)
    d2 = normalized_affine_gap_distance(b, a)
    assert abs(d1 - d2) < 1e-6
    assert d1 >= 0


@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=30))
@settings(max_examples=60, deadline=None)
def test_batch_affine_gap_matches_scalar(pairs):
    """The numpy batch Gotoh DP is exactly the scalar recurrence, pair by
    pair — including the abbreviation-discount region and the fast paths."""
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = batch_affine_gap_distance(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(got[i] - affine_gap_distance(x, y)) < 1e-9, (x, y)
    norm = batch_normalized_affine_gap(a, b)
    for i, (x, y) in enumerate(pairs):
        if not x or not y:
            assert np.isnan(norm[i])
        else:
            assert abs(norm[i] - normalized_affine_gap_distance(x, y)) < 1e-9


@given(st.text(alphabet="abcdef ", min_size=10, max_size=80),
       st.text(alphabet="abcdef ", min_size=10, max_size=80))
@settings(max_examples=40, deadline=None)
def test_minhash_estimates_jaccard(a, b):
    """Minhash signature agreement must be within 0.35 of true shingle
    jaccard (128 perms => se ~ 0.044; 8 sigma headroom)."""
    texts = pa.array([a, b], pa.string())
    h, s = H.shingle_hashes(texts, k=3)
    if s[1] - s[0] == 0 or s[2] - s[1] == 0:
        return
    sigs = H.minhash(h, s, n_perm=128)
    est = float((sigs[0] == sigs[1]).mean())
    true = H.jaccard_shingles(a, b, k=3)
    assert abs(est - true) <= 0.35


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_union_find_matches_reachability(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # naive reachability oracle
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def component(x):
        seen = {x}
        stack = [x]
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        return frozenset(seen)

    for a, b in edges:
        assert (uf.find(a) == uf.find(b)) == (b in component(a))


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=80, deadline=None)
def test_numpy_components_matches_union_find(edges):
    """The vectorized min-label CC produces exactly the union-find
    partition (labels may differ; the grouping may not)."""
    from ny_campaign_finance_dedupe_ray.stages.clustering import (
        numpy_components,
    )

    ids_a = np.array([f"n{a}" for a, _ in edges], dtype=object)
    ids_b = np.array([f"n{b}" for _, b in edges], dtype=object)
    comp = numpy_components(ids_a, ids_b)
    uf = UnionFind()
    for a, b in zip(ids_a, ids_b):
        uf.union(a, b)
    ref = [uf.find(a) for a in ids_a]
    # bijection between the two labelings over edge sources
    fwd: dict = {}
    bwd: dict = {}
    for c, r in zip(comp, ref):
        assert fwd.setdefault(c, r) == r
        assert bwd.setdefault(r, c) == c


def test_numpy_components_deep_chain():
    """A 200k-node path graph (worst-case diameter) collapses to one
    component in ~log rounds of pointer jumping."""
    from ny_campaign_finance_dedupe_ray.stages.clustering import (
        numpy_components,
    )

    k = 200_000
    ids_a = np.array([f"c{x:07d}" for x in range(k)], dtype=object)
    ids_b = np.array([f"c{x + 1:07d}" for x in range(k)], dtype=object)
    comp = numpy_components(ids_a, ids_b)
    assert len(set(comp.tolist())) == 1


@given(st.integers(2, 200), st.integers(1, 300), st.integers(0, 2**31 - 1))
@settings(max_examples=60, deadline=None)
def test_random_pairs_in_triangle(n, size, seed):
    from ny_campaign_finance_dedupe_ray.functions.sampling import random_pairs

    p = random_pairs(n, size, seed=seed)
    assert (p[:, 0] < p[:, 1]).all()
    assert p.min(initial=0) >= 0 and p.max(initial=0) < n
    assert len(set(map(tuple, p.tolist()))) == len(p)  # without replacement


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_double_metaphone_total(text):
    from ny_campaign_finance_dedupe_ray.functions.phonetic import doublemetaphone

    p, s = doublemetaphone(text)
    assert isinstance(p, str) and isinstance(s, str)
    assert len(p) <= 4 and len(s) <= 4


@given(st.lists(TEXT, min_size=1, max_size=12), st.lists(TEXT, min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_batch_jaccard_matches_set_oracle(xs, ys):
    """Vectorized sorted-hash jaccard == Python-set jaccard for any texts."""
    from ny_campaign_finance_dedupe_ray.stages.dedup import batch_jaccard

    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    got = batch_jaccard(pa.array(xs, pa.string()), pa.array(ys, pa.string()), k=3)
    for i, (a, b) in enumerate(zip(xs, ys)):
        A = {a[j: j + 3] for j in range(len(a.encode()) - 2) if len(a.encode()) >= 3}
        # build via the same rolling hash to avoid unicode byte/char mismatch
        exp = H.jaccard_shingles(a, b, k=3)
        if not A and len(b.encode()) < 3:
            exp = 1.0 if a == b else 0.0
        elif len(a.encode()) < 3 and len(b.encode()) < 3:
            exp = 1.0 if a == b else 0.0
        assert abs(got[i] - exp) < 1e-12, (a, b, got[i], exp)


@given(st.lists(TEXT, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_vector_predicate_parity_property(values):
    """vector_keys == scalar path for every kernel-backed predicate."""
    batch = pa.table({"f": pa.array(values, pa.string())})
    preds = [
        P.StringPredicate(P.first_token, "f"),
        P.StringPredicate(P.first_integer, "f"),
        P.StringPredicate(P.same_five_char_start, "f"),
        P.StringPredicate(P.sorted_acronym, "f"),
        P.FieldPredicate(P.whole_field, "f"),
    ]
    for pred in preds:
        vk = pred.vector_keys(batch)
        got = vk.to_pylist()
        for i, v in enumerate(values):
            exp = list(pred({"f": v}))
            assert got[i] == (exp[0] if exp else None), (pred.name, v)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user
            st.integers(min_value=0, max_value=20000),  # epoch seconds
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=6, deadline=None)  # each example runs 2 Dataset jobs
def test_windows_match_naive_oracle(rows):
    """Bucketed tumbling/session windows == a naive per-key pandas oracle."""
    import pandas as pd
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.windows import (
        session_window, tumbling_window,
    )

    df = pd.DataFrame(rows, columns=["user_id", "epoch", "value"])
    df["user_id"] = df["user_id"].map(lambda u: f"u{u}")
    df["ts"] = pd.to_datetime(df["epoch"], unit="s").astype("datetime64[us]")
    ds = rd.from_pandas(df[["user_id", "ts", "value"]]).repartition(3)

    got_t = (
        tumbling_window(ds, window_seconds=600)
        .to_pandas().sort_values(["user_id", "window_id"]).reset_index(drop=True)
    )
    exp_t = (
        df.assign(window_id=df["epoch"] // 600)
        .groupby(["user_id", "window_id"], as_index=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .sort_values(["user_id", "window_id"]).reset_index(drop=True)
    )
    exp_t["sum_value"] = exp_t["sum_value"].round(6)
    assert got_t["n_events"].tolist() == exp_t["n_events"].tolist()
    assert np.allclose(got_t["sum_value"], exp_t["sum_value"], atol=1e-6)

    got_s = (
        session_window(ds, gap_seconds=900)
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    exp_rows = []
    for uid, sub in df.sort_values("epoch").groupby("user_id"):
        sid = 0
        prev = None
        for e in sub["epoch"]:
            if prev is not None and e - prev > 900:
                sid += 1
            exp_rows.append((uid, sid, e))
            prev = e
    exp_s = (
        pd.DataFrame(exp_rows, columns=["user_id", "session_id", "epoch"])
        .groupby(["user_id", "session_id"], as_index=False)
        .agg(n_events=("epoch", "size"), start_epoch=("epoch", "min"),
             end_epoch=("epoch", "max"))
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    for c in ("n_events", "start_epoch", "end_epoch"):
        assert got_s[c].tolist() == exp_s[c].tolist(), c

    from ny_campaign_finance_dedupe_ray.stages.windows import hopping_window

    got_h = (
        hopping_window(ds, window_seconds=600, slide_seconds=300)
        .to_pandas().sort_values(["user_id", "window_id"]).reset_index(drop=True)
    )
    hop_rows = []
    for uid, e, v in zip(df["user_id"], df["epoch"], df["value"]):
        for w in range((e - 600) // 300 + 1, e // 300 + 1):
            hop_rows.append((uid, w, v))
    exp_h = (
        pd.DataFrame(hop_rows, columns=["user_id", "window_id", "value"])
        .groupby(["user_id", "window_id"], as_index=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .sort_values(["user_id", "window_id"]).reset_index(drop=True)
    )
    assert got_h["n_events"].tolist() == exp_h["n_events"].tolist()
    assert np.allclose(got_h["sum_value"], exp_h["sum_value"].round(6), atol=1e-6)
