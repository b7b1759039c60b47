"""Canonicalization (reference golden fixture), carry-forward join,
stats stage, comparators, affine gap."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions import comparators as C
from ny_campaign_finance_dedupe_ray.functions.affinegap import (
    affine_gap_distance,
    normalized_affine_gap_distance,
)
from ny_campaign_finance_dedupe_ray.stages import canonical, carryforward, stats


MARY = [
    "mary crane center", "mary crane center north",
    "mary crane league - mary crane - west",
    "mary crane league mary crane center (east)",
    "mary crane league mary crane center (north)",
    "mary crane league mary crane center (west)",
    "mary crane league - mary crane - east",
    "mary crane family and day care center",
    "mary crane west", "mary crane center east",
    "mary crane league mary crane center (east)",
    "mary crane league mary crane center (north)",
    "mary crane league mary crane center (west)",
    "mary crane league", "mary crane", "mary crane east 0-3",
    "mary crane north", "mary crane north 0-3",
    "mary crane league - mary crane - west",
    "mary crane league - mary crane - north",
    "mary crane league - mary crane - east",
    "mary crane league - mary crane - west",
    "mary crane league - mary crane - north",
    "mary crane league - mary crane - east",
]


def test_affine_gap_basics():
    assert affine_gap_distance("abc", "abc") == 3.0  # match weight * len
    assert affine_gap_distance("", "abc") < affine_gap_distance("xyz", "abc")
    # symmetric
    a = normalized_affine_gap_distance("mary crane", "mary crane center")
    b = normalized_affine_gap_distance("mary crane center", "mary crane")
    assert abs(a - b) < 1e-9
    # abbreviation discount: trailing extension cheaper than internal mismatch
    ext = normalized_affine_gap_distance("mary crane", "mary crane center")
    sub = normalized_affine_gap_distance("mary crane", "mary brane centre")
    assert ext < sub
    with pytest.raises(ZeroDivisionError):
        normalized_affine_gap_distance("", "")


def test_get_centroid_mary_crane():
    # reference tests/test_canonical.py:6-35 expected centroid
    assert canonical.get_centroid(MARY) == "mary crane"


def test_get_canonical_rep():
    recs = [
        {"name": "mary crane", "address": "123 main st", "zip": "12345"},
        {"name": "mary crane east", "address": "123 main street", "zip": ""},
        {"name": "mary crane west", "address": "123 main", "zip": ""},
    ]
    rep = canonical.get_canonical_rep(recs)
    assert rep["name"] == "mary crane"
    assert rep["address"] == "123 main st"
    assert rep["zip"] == "12345"
    assert canonical.get_canonical_rep([{"x": ""}])["x"] == ""


def test_canonicalize_clusters_stage():
    records = rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array(["r1", "r2", "r3", "r4"], pa.string()),
                "name": pa.array(
                    ["mary crane", "mary crane east", "bob jones", "bob jones jr"],
                    pa.string(),
                ),
                "city": pa.array(["albany", "albany", "troy", "troy"], pa.string()),
            }
        )
    )
    clusters = rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array(["r1", "r2", "r3", "r4"], pa.string()),
                "cluster_id": pa.array(["r1", "r1", "r3", "r3"], pa.string()),
            }
        )
    )
    out = canonical.canonicalize_clusters(
        clusters, records, fields=("name", "city")
    ).to_pandas().sort_values("cluster_id").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "cluster_id"] == "r1"
    assert out.loc[0, "name"] == "mary crane"
    assert out.loc[0, "cluster_size"] == 2
    assert out.loc[1, "name"] == "bob jones"


def test_carry_forward():
    prev = rd.from_arrow(
        pa.table(
            {
                "name": pa.array(["Mary Crane", "bob jones"], pa.string()),
                "city": pa.array(["albany", "troy"], pa.string()),
                "cluster_id": pa.array(["c1", "c2"], pa.string()),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "name": pa.array(["mary crane", "alice wu", "BOB JONES"], pa.string()),
                "city": pa.array(["albany", "utica", "troy"], pa.string()),
            }
        )
    )
    out = carryforward.carry_forward(
        new, prev, key_fields=("name", "city"), carry_column="cluster_id"
    ).to_pandas().sort_values("name").reset_index(drop=True)
    got = dict(zip(out["name"], out["cluster_id"]))
    assert got["mary crane"] == "c1"       # case-insensitive key
    assert got["BOB JONES"] == "c2"
    assert got["alice wu"] is None


def test_cluster_run_metrics_and_top():
    clusters = rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array([f"r{i}" for i in range(6)], pa.string()),
                "cluster_id": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
            }
        )
    )
    m = stats.cluster_run_metrics(clusters, predicates=["p0"], run_seconds=1.5)
    assert m["total_clusters"] == 3
    assert m["biggest_cluster_size"] == 3
    assert m["total_records"] == 6
    assert abs(m["avg_cluster_size"] - 2.0) < 1e-9
    top = stats.top_clusters(clusters, k=2)
    assert top["cluster_id"].tolist() == ["a", "b"]
    assert top["cluster_size"].tolist() == [3, 2]


def test_comparators():
    assert C.cosine_text("a b c", "a b c") == pytest.approx(1.0)
    assert C.cosine_text("a b", "c d") == 0.0
    assert np.isnan(C.cosine_text("", "a"))
    assert C.cosine_set({"x", "y"}, {"x", "y"}) == pytest.approx(1.0)
    assert C.exact_compare("a", "a") == 1.0
    assert C.exact_compare("a", "b") == 0.0
    assert np.isnan(C.exact_compare(None, "b"))
    d = C.categorical_dummies("b", ["a", "b", "c"])
    assert d.tolist() == [1.0, 0.0]
    assert C.categorical_dummies("a", ["a", "b", "c"]).tolist() == [0.0, 0.0]
    assert np.isnan(C.categorical_dummies(None, ["a", "b"])).all()
    assert C.haversine_sqrt((0, 0), (0, 0)) == 0.0
    assert C.haversine_sqrt((42.0, -73.0), (42.1, -73.1)) > 0
    assert C.price_difference(10, 100) == pytest.approx(1.0)
    assert np.isnan(C.price_difference(0, 5))
    assert C.exists_dummies("x", "y").tolist() == [1.0, 0.0]
    assert C.exists_dummies("x", None).tolist() == [0.0, 1.0]
    assert C.exists_dummies(None, None).tolist() == [0.0, 0.0]


def test_haversine_km_scale():
    # ADVICE r1: reference LatLong comparator is sqrt(haversine-in-KM);
    # one degree of latitude is ~111 km, so sqrt ~ 10.5
    import math

    d = C.haversine_sqrt((42.0, -73.0), (43.0, -73.0))
    assert 10.0 < d < 11.0
    assert abs(d - math.sqrt(111.19)) < 0.1


def test_carry_forward_large_matches_broadcast():
    import pyarrow as pa
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.carryforward import (
        carry_forward, carry_forward_large,
    )

    prev = rd.from_arrow(pa.table({
        "name": pa.array(["mary smith", "bob jones", "mary smith"], pa.string()),
        "street": pa.array(["1 main st", "9 oak ave", "1 main st"], pa.string()),
        "cluster_id": pa.array(["c2", "c9", "c1"], pa.string()),
    })).repartition(2)
    new = rd.from_arrow(pa.table({
        "record_id": pa.array(["r1", "r2", "r3"], pa.string()),
        "name": pa.array(["mary smith", "carol white", "bob jones"], pa.string()),
        "street": pa.array(["1 main st", "5 elm rd", "9 oak ave"], pa.string()),
    })).repartition(2)

    out = (
        carry_forward_large(new, prev, ("name", "street"), "cluster_id",
                            out_column="prev_cluster")
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    # duplicate previous key resolves to the MIN value (c1 < c2)
    assert out["prev_cluster"].tolist() == ["c1", None, "c9"]
    assert list(out.columns) == ["record_id", "name", "street", "prev_cluster"]

    # broadcast variant agrees on unique keys
    b = (
        carry_forward(new, prev, ("name", "street"), "cluster_id",
                      out_column="prev_cluster")
        .to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    assert b.loc[1, "prev_cluster"] is None and b.loc[2, "prev_cluster"] == "c9"
