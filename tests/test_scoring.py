"""Scorer actor: duckdb feature matrix + logistic score."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer, feature_sql
from ny_campaign_finance_dedupe_ray.state import model as M


def _batch(rows):
    cols = {
        "id_a": [], "id_b": [], "name_a": [], "name_b": [],
        "street_a": [], "street_b": [], "city_a": [], "city_b": [],
        "zip_a": [], "zip_b": [],
    }
    for i, (na, nb, sa, sb, ca, cb, za, zb) in enumerate(rows):
        cols["id_a"].append(f"a{i}")
        cols["id_b"].append(f"b{i}")
        cols["name_a"].append(na); cols["name_b"].append(nb)
        cols["street_a"].append(sa); cols["street_b"].append(sb)
        cols["city_a"].append(ca); cols["city_b"].append(cb)
        cols["zip_a"].append(za); cols["zip_b"].append(zb)
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def test_scorer_separates_matches():
    s = PairScorer()
    batch = _batch([
        ("mary smith", "mary smith", "1 main street", "1 main street", "albany", "albany", "10001", "10001"),
        ("mary smith", "mary smyth", "1 main street", "1 main street", "albany", "albany", "10001", "10001"),
        ("mary smith", "bob jones", "1 main street", "9 oak avenue", "albany", "buffalo", "10001", "14201"),
    ])
    X = s.features(batch)
    score = M.sigmoid(X @ s.weights + s.bias)
    assert score[0] > 0.95
    assert score[1] > 0.5
    assert score[2] < 0.05
    out = s(batch)
    assert out.column_names == ["id_a", "id_b", "score"]
    assert out.num_rows == 2  # third pair filtered by threshold


def test_scorer_null_handling():
    s = PairScorer()
    batch = _batch([(None, None, None, None, None, None, None, None)])
    out = s(batch)
    # all-missing pair must not crash and must not match
    assert out.num_rows == 0


def test_scorer_empty_batch():
    s = PairScorer()
    out = s(_batch([]))
    assert out.num_rows == 0


def test_feature_sql_contains_all_features():
    m = M.default_model()
    sql = feature_sql(m)
    for f in m.features:
        assert f'"{f.name}"' in sql


def test_fit_logistic_learns():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(500, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    w, b = M.fit_logistic(X, y)
    pred = (M.sigmoid(X @ w + b) > 0.5).astype(float)
    assert (pred == y).mean() > 0.95
    # deterministic
    w2, b2 = M.fit_logistic(X, y)
    assert np.allclose(w, w2) and b == b2


def test_model_json_roundtrip(tmp_path):
    m = M.default_model()
    p = str(tmp_path / "model.json")
    m.save(p)
    m2 = M.Model.load(p)
    assert m2.weights == m.weights
    assert [f.name for f in m2.features] == [f.name for f in m.features]


def test_python_kind_features():
    # VERDICT r1 #3/#4: the remaining reference variable comparators as
    # Model feature kinds, one pair-batch each.
    from ny_campaign_finance_dedupe_ray.functions.affinegap import (
        normalized_affine_gap_distance,
    )
    from ny_campaign_finance_dedupe_ray.stages.scoring import py_feature_values

    F = M.Feature

    # affine_gap — the reference's default String comparator
    batch = pa.table({
        "name_a": pa.array(["mary crane", "mary crane", None], pa.string()),
        "name_b": pa.array(["mary crane center", "mary crane", "x"], pa.string()),
    })
    got = py_feature_values(F("ag", "name", "affine_gap"), batch)
    exp0 = normalized_affine_gap_distance("mary crane", "mary crane center")
    assert abs(got[0] - exp0) < 1e-12
    assert abs(got[1] - normalized_affine_gap_distance("mary crane", "mary crane")) < 1e-12
    assert np.isnan(got[2])

    # price: |log10 a - log10 b|, NaN for non-positive/missing
    batch = pa.table({
        "p_a": pa.array([100.0, 10.0, -1.0, None], pa.float64()),
        "p_b": pa.array([1000.0, 10.0, 5.0, 2.0], pa.float64()),
    })
    got = py_feature_values(F("pd", "p", "price"), batch)
    assert abs(got[0] - 1.0) < 1e-12 and got[1] == 0.0
    assert np.isnan(got[2]) and np.isnan(got[3])

    # latlong: sqrt(haversine km)
    batch = pa.table({
        "ll_a": pa.array([[42.0, -73.0]], pa.list_(pa.float64())),
        "ll_b": pa.array([[43.0, -73.0]], pa.list_(pa.float64())),
    })
    got = py_feature_values(F("geo", "ll", "latlong"), batch)
    assert 10.0 < got[0] < 11.0

    # cosine_text / cosine_set
    batch = pa.table({
        "t_a": pa.array(["a b c", "a a"], pa.string()),
        "t_b": pa.array(["a b c", "b b"], pa.string()),
    })
    got = py_feature_values(F("ct", "t", "cosine_text"), batch)
    assert abs(got[0] - 1.0) < 1e-12 and got[1] == 0.0
    batch = pa.table({
        "s_a": pa.array([["x", "y"], ["x"]], pa.list_(pa.string())),
        "s_b": pa.array([["x", "y"], ["y"]], pa.list_(pa.string())),
    })
    got = py_feature_values(F("cs", "s", "cosine_set"), batch)
    assert abs(got[0] - 1.0) < 1e-12 and got[1] == 0.0

    # exists dummies
    batch = pa.table({
        "e_a": pa.array(["v", "v", None, ""], pa.string()),
        "e_b": pa.array(["w", None, None, "q"], pa.string()),
    })
    assert py_feature_values(F("eb", "e", "exists_both"), batch).tolist() == [1.0, 0.0, 0.0, 0.0]
    assert py_feature_values(F("eo", "e", "exists_one"), batch).tolist() == [0.0, 1.0, 0.0, 1.0]

    # categorical dummies: combos over ['lo','hi'] = [(0,0),(0,1),(1,1)],
    # reference level (0,0) dropped -> pair_index 0 = (lo,hi), 1 = (hi,hi)
    batch = pa.table({
        "c_a": pa.array(["lo", "hi", "hi", None, "zz"], pa.string()),
        "c_b": pa.array(["hi", "lo", "hi", "lo", "hi"], pa.string()),
    })
    p = {"categories": ["lo", "hi"]}
    d0 = py_feature_values(F("c0", "c", "categorical_dummy", {**p, "pair_index": 0}), batch)
    d1 = py_feature_values(F("c1", "c", "categorical_dummy", {**p, "pair_index": 1}), batch)
    assert d0[:3].tolist() == [1.0, 1.0, 0.0]
    assert d1[:3].tolist() == [0.0, 0.0, 1.0]
    assert np.isnan(d0[3]) and np.isnan(d0[4])


def test_model_json_roundtrip_all_kinds():
    feats = [
        M.Feature("ag", "name", "affine_gap"),
        M.Feature("pd", "price", "price"),
        M.Feature("geo", "loc", "latlong"),
        M.Feature("ct", "text", "cosine_text"),
        M.Feature("cs", "tags", "cosine_set"),
        M.Feature("eb", "phone", "exists_both"),
        M.Feature("cd", "tier", "categorical_dummy",
                  {"categories": ["a", "b"], "pair_index": 0}),
        M.Feature("nm", "name", "not_missing"),
        M.Feature("ix", "ag*nm", "interaction"),
    ]
    m = M.Model(features=feats, weights=[0.1] * len(feats), bias=-1.0)
    m2 = M.Model.from_json(m.to_json())
    assert m2 == m
    assert m2.features[6].params == {"categories": ["a", "b"], "pair_index": 0}


def test_scorer_all_python_model():
    # a model with NO duckdb feature must skip SQL entirely
    from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer

    # identical strings score normalized distance 0.5 (match weight 1 over
    # normalizer 2·len); dissimilar strings land well above 1.0
    m = M.Model(
        features=[M.Feature("ag", "name", "affine_gap")],
        weights=[-10.0], bias=6.0, threshold=0.5,
    )
    s = PairScorer(model=m)
    batch = pa.table({
        "id_a": pa.array(["x", "y"], pa.string()),
        "id_b": pa.array(["p", "q"], pa.string()),
        "name_a": pa.array(["mary crane", "mary crane"], pa.string()),
        "name_b": pa.array(["mary crane", "entirely unrelated name"], pa.string()),
    })
    out = s(batch)
    # identical names: affine gap ~0.5 (normalized match weight) -> high score
    assert out.num_rows == 1 and out.column("id_a")[0].as_py() == "x"


def test_batch_cosine_text_matches_scalar_fuzz():
    """Vectorized cosine_text == scalar per pair, including whitespace
    oddities (the RE2-vs-str.split parity class) and missing rows."""
    from hypothesis import given, settings, strategies as st

    from ny_campaign_finance_dedupe_ray.functions import comparators as C

    token_text = st.text(
        alphabet=st.characters(max_codepoint=0x2FFF), max_size=30
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), token_text),
                st.one_of(st.none(), token_text),
            ),
            max_size=12,
        )
    )
    def check(pairs):
        va = [p[0] for p in pairs]
        vb = [p[1] for p in pairs]
        got = C.batch_cosine_text(va, vb)
        exp = np.array(
            [C.cosine_text(x, y) for x, y in zip(va, vb)], dtype=np.float64
        )
        np.testing.assert_allclose(got, exp, atol=1e-12, equal_nan=True)

    check()


def test_batch_cosine_set_matches_scalar_fuzz():
    from hypothesis import given, settings, strategies as st

    from ny_campaign_finance_dedupe_ray.functions import comparators as C

    elem = st.text(
        alphabet=st.characters(max_codepoint=0x2FFF), max_size=8
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.lists(elem, max_size=8)),
                st.one_of(st.none(), st.lists(elem, max_size=8)),
            ),
            max_size=12,
        )
    )
    def check(pairs):
        va = [p[0] for p in pairs]
        vb = [p[1] for p in pairs]
        got = C.batch_cosine_set(va, vb)
        exp = np.array(
            [C.cosine_set(x, y) for x, y in zip(va, vb)], dtype=np.float64
        )
        np.testing.assert_allclose(got, exp, atol=1e-12, equal_nan=True)

    check()

def test_exists_kinds_match_scalar_truthiness():
    from ny_campaign_finance_dedupe_ray.stages.scoring import py_feature_values

    class F:
        def __init__(self, name, field, kind, params=None):
            self.name, self.field, self.kind, self.params = name, field, kind, params

    cases = [
        (pa.string(), ["v", "", None, "x", "", None]),
        (pa.int64(), [1, 0, None, 7, 0, None]),
        (pa.float64(), [1.5, 0.0, None, float("nan"), 0.0, None]),
        (pa.bool_(), [True, False, None, True, False, None]),
        (pa.binary(), [b"z", b"", None, b"q", b"", None]),
        (pa.list_(pa.int64()), [[1], [], None, [2, 3], [], None]),
    ]
    for typ, vals in cases:
        a = vals
        b = list(reversed(vals))
        batch = pa.table({"x_a": pa.array(a, typ), "x_b": pa.array(b, typ)})
        # scalar reference semantics: plain Python truthiness
        want_both = [1.0 if (x and y) else 0.0 for x, y in zip(a, b)]
        want_one = [1.0 if bool(x) != bool(y) else 0.0 for x, y in zip(a, b)]
        got_both = py_feature_values(F("eb", "x", "exists_both"), batch).tolist()
        got_one = py_feature_values(F("eo", "x", "exists_one"), batch).tolist()
        assert got_both == want_both, (typ, got_both, want_both)
        assert got_one == want_one, (typ, got_one, want_one)


def test_categorical_dummy_nonstring_categories():
    from ny_campaign_finance_dedupe_ray.stages.scoring import py_feature_values

    class F:
        def __init__(self, name, field, kind, params=None):
            self.name, self.field, self.kind, self.params = name, field, kind, params

    # float categories: str(1.0)='1.0' but Arrow cast renders '1' — the
    # native-type compare must still match (ADVICE r3)
    batch = pa.table({
        "c_a": pa.array([1.0, 2.0, 2.0, None], pa.float64()),
        "c_b": pa.array([2.0, 1.0, 2.0, 1.0], pa.float64()),
    })
    p = {"categories": [1.0, 2.0]}
    d0 = py_feature_values(F("c0", "c", "categorical_dummy", {**p, "pair_index": 0}), batch)
    d1 = py_feature_values(F("c1", "c", "categorical_dummy", {**p, "pair_index": 1}), batch)
    assert d0[:3].tolist() == [1.0, 1.0, 0.0]
    assert d1[:3].tolist() == [0.0, 0.0, 1.0]
    assert np.isnan(d0[3])

    # bool categories
    batch = pa.table({
        "c_a": pa.array([False, True, True], pa.bool_()),
        "c_b": pa.array([True, False, True], pa.bool_()),
    })
    p = {"categories": [False, True]}
    d0 = py_feature_values(F("c0", "c", "categorical_dummy", {**p, "pair_index": 0}), batch)
    d1 = py_feature_values(F("c1", "c", "categorical_dummy", {**p, "pair_index": 1}), batch)
    assert d0.tolist() == [1.0, 1.0, 0.0]
    assert d1.tolist() == [0.0, 0.0, 1.0]


def test_affine_gap_chunk_bound_tracks_running_max(monkeypatch):
    from ny_campaign_finance_dedupe_ray.functions import affinegap as AG

    seen = []
    real = AG._batch_affine_gap_chunk

    def spy(longs, shorts, *a, **k):
        seen.append((len(longs), max(len(s) for s in longs)))
        return real(longs, shorts, *a, **k)

    monkeypatch.setattr(AG, "_batch_affine_gap_chunk", spy)
    monkeypatch.setattr(AG, "_CHUNK_CELLS", 50_000)
    # one long string with a SMALL short side (lands early in (n2, n1)
    # order) followed by many short pairs: without the running-max bound the
    # long row's n1 inflates every later row's allocation in the same chunk
    a = ["x" * 20_000] + ["alpha beta"] * 400
    b = ["a"] + ["alpha betta"] * 400
    out = AG.batch_affine_gap_distance(a, b)
    assert len(out) == 401 and np.isfinite(out).all()
    for rows, max_n1 in seen:
        assert rows * max_n1 <= 50_000 or rows == 1, (rows, max_n1)


def test_interactions_resolve_out_of_order():
    """Interaction features may list a chained helper AFTER its dependent
    (converted 3-way reference interactions) — the scorer must resolve by
    dependency, not list order."""
    import numpy as np
    import pyarrow as pa

    from ny_campaign_finance_dedupe_ray.state.model import Feature, Model
    from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer

    feats = [
        Feature("A", "fa", "exact"),
        Feature("B", "fb", "exact"),
        Feature("C", "fc", "exact"),
        Feature("I", "I__chain1*C", "interaction"),      # dependent FIRST
        Feature("I__chain1", "A*B", "interaction"),      # helper LAST
    ]
    model = Model(
        features=feats, weights=[0.0, 0.0, 0.0, 5.0, 0.0], bias=-2.0,
        threshold=0.5,
    )
    batch = pa.table({
        "id_a": pa.array(["x"], pa.string()),
        "id_b": pa.array(["y"], pa.string()),
        "fa_a": pa.array(["s"]), "fa_b": pa.array(["s"]),
        "fb_a": pa.array(["t"]), "fb_b": pa.array(["t"]),
        "fc_a": pa.array(["u"]), "fc_b": pa.array(["u"]),
    })
    out = PairScorer(model=model, min_score=0.0)(batch)
    # all exact=1 -> I = 1 -> sigmoid(5 - 2) ~ 0.95
    assert abs(out.column("score").to_pylist()[0] - 0.9525741) < 1e-4
