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
