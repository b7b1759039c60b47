"""Blocking flat-map, hot-key cap, and candidate-pair contract."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions import predicates as P
from ny_campaign_finance_dedupe_ray.stages import blocking, pairs


def _records(rows):
    return rd.from_arrow(
        pa.table(
            {
                "record_id": pa.array([r[0] for r in rows], pa.string()),
                "name": pa.array([r[1] for r in rows], pa.string()),
                "street": pa.array([r[2] for r in rows], pa.string()),
                "city": pa.array([r[3] for r in rows], pa.string()),
                "state": pa.array(["ny"] * len(rows), pa.string()),
                "zip": pa.array(["10001"] * len(rows), pa.string()),
                "text_norm": pa.array([r[1] + " " + r[2] for r in rows], pa.string()),
            }
        )
    )


ROWS = [
    ("u1", "mary smith", "123 main street", "albany"),
    ("u2", "mary smith", "123 main street", "albany"),
    ("u3", "bob jones", "9 oak avenue", "buffalo"),
    ("u4", "mary smyth", "123 main street", "albany"),
]


def test_block_records_keys():
    cfg = blocking.BlockingConfig(
        predicates=[P.StringPredicate(P.first_token, "name")],
        minhash_column=None,
    )
    out = blocking.block_records(_records(ROWS), cfg).to_pandas()
    assert set(out.columns) >= {"block_key", "record_id", "name"}
    marys = out[out["block_key"] == "mary:0"]["record_id"].tolist()
    assert sorted(marys) == ["u1", "u2", "u4"]
    assert out[out["block_key"] == "bob:0"]["record_id"].tolist() == ["u3"]


def test_host_key():
    rows = [("https://a.com/x", "n", "s", "c"), ("https://b.com/y", "n", "s", "c")]
    cfg = blocking.BlockingConfig(predicates=[], minhash_column=None, host_key=True)
    out = blocking.block_records(_records(rows), cfg).to_pandas()
    assert set(out["block_key"]) == {"host:a.com", "host:b.com"}


def test_hot_keys_cap_and_drop():
    rows = [("u%d" % i, "common name", "street %d" % i, "city") for i in range(20)]
    cfg = blocking.BlockingConfig(
        predicates=[P.StringPredicate(P.first_token, "name")],
        minhash_column=None,
    )
    blocks = blocking.block_records(_records(rows), cfg)
    hot = blocking.hot_keys(blocks, max_block_size=10)
    assert hot == {"common:0"}
    kept = blocking.drop_hot_keys(blocks, hot)
    assert kept.count() == 0
    assert blocking.drop_hot_keys(blocks, set()).count() == 20


def test_candidate_pairs_contract():
    cfg = blocking.BlockingConfig(
        predicates=[
            P.StringPredicate(P.first_token, "name"),
            P.FieldPredicate(P.whole_field, "zip"),
        ],
        minhash_column=None,
    )
    blocks = blocking.block_records(_records(ROWS), cfg)
    out = pairs.candidate_pairs(blocks).to_pandas()
    # at-most-once despite u1,u2,u4 sharing TWO keys (name + zip)
    got = sorted(zip(out["id_a"], out["id_b"]))
    assert len(got) == len(set(got)), "duplicate pairs"
    assert (out["id_a"] < out["id_b"]).all()
    # zip key puts everyone in one block -> all 6 pairs exist exactly once
    assert got == [
        ("u1", "u2"), ("u1", "u3"), ("u1", "u4"),
        ("u2", "u3"), ("u2", "u4"), ("u3", "u4"),
    ]
    # payload carried for both sides
    row = out[(out["id_a"] == "u1") & (out["id_b"] == "u3")].iloc[0]
    assert row["name_a"] == "mary smith" and row["name_b"] == "bob jones"


def test_pairs_partition_invariance():
    cfg = blocking.BlockingConfig(
        predicates=[P.FieldPredicate(P.whole_field, "zip")], minhash_column=None
    )
    a = pairs.candidate_pairs(
        blocking.block_records(_records(ROWS).repartition(1), cfg)
    ).to_pandas()
    b = pairs.candidate_pairs(
        blocking.block_records(_records(ROWS).repartition(3), cfg)
    ).to_pandas()
    ka = sorted(zip(a["id_a"], a["id_b"]))
    kb = sorted(zip(b["id_a"], b["id_b"]))
    assert ka == kb


def test_bucketed_join():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.joins import bucketed_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
        "lv": pa.array(["a", "b", "c", "d", "e"], pa.string()),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 3, 4], pa.int64()),
        "rv": pa.array([20.0, 30.0, 31.0, 40.0], pa.float64()),
    })).repartition(2)

    inner = bucketed_join(left, right, on="k").to_pandas()
    inner = inner.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    exp = pd.DataFrame({
        "k": [2, 2, 3, 3],
        "lv": ["b", "c", "d", "d"],
        "rv": [20.0, 20.0, 30.0, 31.0],
    })
    assert inner.to_dict("list") == exp.to_dict("list")

    lj = bucketed_join(left, right, on="k", how="left").to_pandas()
    assert len(lj) == 6  # 4 matches + unmatched keys 1 and 5
    assert lj[lj["k"] == 1]["rv"].isna().all()

    import pytest

    with pytest.raises(ValueError):
        bucketed_join(left, left, on="k")  # column collision


def test_bucketed_join_outer_and_null_keys():
    """SQL null semantics: null keys never match; right/outer keep unmatched
    rows; int dtypes survive null-filling (no NaN float widening)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.joins import bucketed_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 5], pa.int64()),
        "lv": pa.array([10, 20, 30, 50], pa.int64()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, None, 4], pa.int64()),
        "rv": pa.array([200, 201, 999, 400], pa.int64()),
    })).repartition(2)

    inner = bucketed_join(left, right, on="k").to_pandas()
    assert sorted(inner["rv"].tolist()) == [200, 201]  # nulls never match

    lj = bucketed_join(left, right, on="k", how="left").to_pandas()
    assert len(lj) == 5  # 2 matches + unmatched 1, 5 and the null-key row
    assert lj[lj["k"].isna()]["rv"].isna().all()  # null did NOT match null

    rj = bucketed_join(left, right, on="k", how="right")
    assert [str(t) for t in rj.schema().types] == ["int64"] * 3  # dtype kept
    rj = rj.to_pandas()
    assert len(rj) == 4  # 2 matches + unmatched 4 and the null-key row
    assert rj[rj["rv"] == 400]["lv"].isna().all()

    oj = bucketed_join(left, right, on="k", how="outer").to_pandas()
    # 2 matches + left-unmatched {1, 5, null} + right-unmatched {4, null}
    assert len(oj) == 7
    assert oj["k"].isna().sum() == 2  # the two null-key rows stay distinct
    mask = oj["k"].isna()
    assert not (oj[mask]["lv"].notna() & oj[mask]["rv"].notna()).any()


def test_asof_join():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.joins import asof_join

    import numpy as np

    ts = pa.timestamp("us")
    def t(s): return np.datetime64(s, "s").astype("datetime64[us]")
    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "ts": pa.array([t(10), t(20), t(30), t(10)], ts),
        "lv": pa.array([1, 2, 3, 4], pa.int64()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "ts": pa.array([t(5), t(20), t(40)], ts),
        "rv": pa.array([100.0, 200.0, 300.0], pa.float64()),
    })).repartition(2)

    out = (
        asof_join(left, right, on_key="k", on_ts="ts")
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    # strict backward: ts=20 sees the ts=5 row, not the equal-ts one
    assert out["rv"].tolist()[:3] == [100.0, 100.0, 200.0]
    assert pd.isna(out["rv"].iloc[3])  # b has no earlier right row

    out2 = (
        asof_join(left, right, on_key="k", on_ts="ts", allow_exact_matches=True)
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert out2["rv"].tolist()[:3] == [100.0, 200.0, 200.0]

def test_dropped_work_counters_surface_caps(tmp_path):
    """Caps must be COUNTED, not silent (VERDICT r3 #6): a hot blocking key
    over max_block_size increments the dropped-work counters, and
    write_run_manifest folds them into the manifest."""
    import json

    from ny_campaign_finance_dedupe_ray.stages import stats
    from ny_campaign_finance_dedupe_ray.stages.pairs import candidate_pairs
    from ny_campaign_finance_dedupe_ray.state import counters

    counters.enable_counters()
    counters.dropped_totals(reset=True)

    n_hot = 10
    blocks = rd.from_arrow(pa.table({
        "block_key": pa.array(["hot"] * n_hot + ["ok", "ok"], pa.string()),
        "record_id": pa.array([f"r{i}" for i in range(n_hot + 2)], pa.string()),
    }))
    out = candidate_pairs(blocks, n_buckets=4, max_block_size=4).to_pandas()
    # the ok-block pair survives; the hot block is dropped entirely
    assert len(out) == 1
    manifest = tmp_path / "run.json"
    stats.write_run_manifest(str(manifest), {"total_clusters": 0})
    got = json.loads(manifest.read_text())
    assert got["dropped_work"]["hot_block_keys"] == 1
    assert got["dropped_work"]["hot_block_rows"] == n_hot
    # reset-on-write: a second manifest shows a clean slate
    stats.write_run_manifest(str(manifest), {})
    assert json.loads(manifest.read_text())["dropped_work"] == {}


def test_dropped_work_counters_link_and_disabled():
    import ray as _ray

    from ny_campaign_finance_dedupe_ray.stages.pairs import candidate_pairs_link
    from ny_campaign_finance_dedupe_ray.state import counters

    counters.enable_counters()
    counters.dropped_totals(reset=True)

    def side(prefix, n):
        return rd.from_arrow(pa.table({
            "block_key": pa.array(["k"] * n, pa.string()),
            "record_id": pa.array([f"{prefix}{i}" for i in range(n)], pa.string()),
        }))

    out = candidate_pairs_link(side("a", 5), side("b", 5),
                               n_buckets=4, max_block_size=2).to_pandas()
    assert len(out) == 0  # 5x5 > 2^2 -> capped
    got = counters.dropped_totals(reset=True)
    assert got["hot_link_blocks"] == 1
    assert got["hot_link_rows"] == 10

def test_host_key_vectorized_matches_urlparse():
    """The RE2 netloc extract must agree with urllib.parse.urlparse on a
    url-shaped corpus including the stdlib's unsafe-byte and C0-strip
    behaviors (every scalar->vector kernel port gets a parity fuzz)."""
    import dataclasses
    from urllib.parse import urlparse

    from ny_campaign_finance_dedupe_ray.stages.blocking import (
        _block_batch,
        doc_config,
    )

    urls = [
        "http://example.com/a/b",
        "https://Sub.Example.COM:8443/x?y#z",
        "ftp+ssh://h-1.example/x",
        "//scheme-relative.example/p",
        "http://",
        "no-scheme/path",
        "1http://not-a-scheme.example/",
        "-http://also-not.example/",
        " http://leading-space.example/",
        "http://trailing-space.example/ ",
        "htt\tp://tab-in-scheme.example/",
        "http://new\nline.example/",
        "http://h?only-query",
        "http://h#only-frag",
        "http://backs\\lash.example/p",
        "http://ünïcode.example/p",
        "mailto:user@example.com",
        "",
    ]
    cfg = dataclasses.replace(
        doc_config(), predicates=[], minhash_column=None, host_key=True
    )
    batch = pa.table({
        "record_id": pa.array(urls, pa.string()),
        "text_norm": pa.array(["x"] * len(urls), pa.string()),
    })
    out = _block_batch(batch, cfg).to_pandas()
    got = {}
    for rid, key in zip(out["record_id"], out["block_key"]):
        if key.startswith("host:"):
            got[rid] = key[5:]
    want = {}
    for u in urls:
        netloc = urlparse(u).netloc
        if netloc:
            want[u] = netloc
    assert got == want, (got, want)


def test_range_join_matches_bruteforce(ray_session):
    """range_join == brute-force BETWEEN filter: exactly-once matches (a
    left row's tile finds each containing interval once), no dups."""
    import numpy as np
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join

    rng = np.random.default_rng(1)
    L = pa.table({
        "x": pa.array(rng.uniform(0, 100, 400)),
        "lid": pa.array(range(400), pa.int64()),
    })
    lo = rng.uniform(0, 90, 30)
    R = pa.table({
        "lo": pa.array(lo),
        "hi": pa.array(lo + rng.uniform(0, 25, 30)),
        "rid": pa.array(range(30), pa.int64()),
    })
    out = range_join(
        rd.from_arrow(L).repartition(5), rd.from_arrow(R).repartition(3),
        "x", "lo", "hi", n_tiles=16,
    ).to_pandas()
    l, r = L.to_pandas(), R.to_pandas()
    exp = l.assign(k=1).merge(r.assign(k=1), on="k").query("lo <= x <= hi")
    es = set(zip(exp["lid"], exp["rid"]))
    gs = list(zip(out["lid"], out["rid"]))
    assert set(gs) == es and len(gs) == len(es)  # exact, at-most-once


def test_range_join_boundaries(ray_session):
    """BETWEEN is inclusive at both ends; point intervals (lo == hi) match
    exact values; a degenerate all-equal domain must not divide by zero."""
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join

    L = pa.table({
        "x": pa.array([1.0, 5.0, 5.0, 9.0, None]),
        "lid": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    R = pa.table({
        "lo": pa.array([5.0, 1.0, 9.0, None]),
        "hi": pa.array([5.0, 9.0, 9.0, 9.0]),
        "rid": pa.array([0, 1, 2, 3], pa.int64()),
    })
    out = range_join(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi", n_tiles=4
    ).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    # rid0 = [5,5] point: matches both 5.0 rows; rid1 = [1,9]: everything
    # non-null; rid2 = [9,9]: matches 9.0; rid3 null lo: matches nothing
    assert got == [(0, 1), (1, 0), (1, 1), (2, 0), (2, 1), (3, 1), (3, 2)]

    # all-equal domain: width guard, single tile takes everything
    L2 = pa.table({"x": pa.array([3.0, 3.0]), "lid": pa.array([0, 1], pa.int64())})
    R2 = pa.table({
        "lo": pa.array([3.0]), "hi": pa.array([3.0]),
        "rid": pa.array([0], pa.int64()),
    })
    out2 = range_join(
        rd.from_arrow(L2), rd.from_arrow(R2), "x", "lo", "hi", n_tiles=8
    ).to_pandas()
    assert sorted(zip(out2["lid"], out2["rid"])) == [(0, 0), (1, 0)]


def test_range_join_int64_exactness(ray_session):
    """Temporal/integer keys join in exact int64 arithmetic (a ns timestamp
    must not round through float64), big int64 payloads survive the pandas
    round-trip exactly, and an empty left side with domain=None is fine."""
    import numpy as np
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join

    base = 1_700_000_000_000_000_000  # ns epoch, >2^53
    ts = pa.array((base + np.arange(0, 50_000, 100)[:500]).astype("datetime64[ns]"))
    big = 2 ** 53 + 12345  # float64 would collapse this to 2^53
    lids = pa.array([big + i for i in range(500)], pa.int64())
    L = pa.table({"ts": ts, "lid": lids})
    R = pa.table({
        "lo": pa.array(np.array([base + 150], dtype="datetime64[ns]")),
        "hi": pa.array(np.array([base + 350], dtype="datetime64[ns]")),
        "rid": pa.array([0], pa.int64()),
    })
    out = range_join(
        rd.from_arrow(L).repartition(4), rd.from_arrow(R), "ts", "lo", "hi",
        n_tiles=8,
    ).to_pandas()
    # 100ns spacing: exactly ts offsets 200 and 300 are inside [150, 350]
    assert sorted(out["lid"].tolist()) == [big + 2, big + 3]

    empty = pa.table({"ts": pa.array([], pa.timestamp("ns")),
                      "lid": pa.array([], pa.int64())})
    oe = range_join(rd.from_arrow(empty), rd.from_arrow(R), "ts", "lo", "hi")
    assert oe.count() == 0


def test_range_join_hostile_types(ray_session):
    """date32 payload columns survive placeholder typing; a full-range
    int64 key domain (signed hash keys) must not wrap in tile arithmetic."""
    import datetime

    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join

    L = pa.table({
        "x": pa.array([1.0, 5.0]),
        "d": pa.array([datetime.date(2020, 1, 1)] * 2, pa.date32()),
        "lid": pa.array([0, 1], pa.int64()),
    })
    R = pa.table({
        "lo": pa.array([4.0]), "hi": pa.array([6.0]),
        "rid": pa.array([7], pa.int64()),
    })
    o = range_join(rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
                   n_tiles=4).to_pandas()
    assert o["lid"].tolist() == [1]
    assert o["d"].tolist() == [datetime.date(2020, 1, 1)]

    L2 = pa.table({
        "x": pa.array([-2**63 + 5, 0, 2**63 - 100], pa.int64()),
        "lid": pa.array([0, 1, 2], pa.int64()),
    })
    R2 = pa.table({
        "lo": pa.array([0], pa.int64()),
        "hi": pa.array([2**63 - 50], pa.int64()),
        "rid": pa.array([7], pa.int64()),
    })
    o2 = range_join(rd.from_arrow(L2), rd.from_arrow(R2), "x", "lo", "hi",
                    n_tiles=8).to_pandas()
    assert sorted(o2["lid"].tolist()) == [1, 2]


def test_range_join_count_matches_materialized(ray_session):
    """range_join_count == range_join + groupby().count() (the pushdown
    must not change the answer): grouped counts match brute force, and
    zero-match intervals are dropped (inner-join semantics)."""
    import numpy as np
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    rng = np.random.default_rng(7)
    L = pa.table({"x": pa.array(rng.uniform(0, 100, 400))})
    lo = rng.uniform(0, 90, 30)
    R = pa.table({
        "lo": pa.array(np.concatenate([lo, [200.0]])),          # rid 30: no match
        "hi": pa.array(np.concatenate([lo + rng.uniform(0, 25, 30), [300.0]])),
        "rid": pa.array(range(31), pa.int64()),
    })
    out = range_join_count(
        rd.from_arrow(L).repartition(5), rd.from_arrow(R).repartition(3),
        "x", "lo", "hi", count_by="rid", n_tiles=16,
    ).to_pandas()
    l, r = L.to_pandas(), R.to_pandas()
    exp = (
        l.assign(k=1).merge(r.assign(k=1), on="k")
        .query("lo <= x <= hi").groupby("rid").size()
    )
    got = dict(zip(out["rid"], out["n"]))
    assert got == exp.to_dict()
    assert 30 not in got  # zero-match interval dropped


def test_range_join_count_int64_and_nulls(ray_session):
    """count_by keys: big int64 (>2^53) survive exactly (zero-filled
    placeholders, not null-smeared floats); a NULL count_by value is one
    SQL GROUP BY group; null bounds never match."""
    import numpy as np
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    big = 2 ** 53 + 777
    L = pa.table({"x": pa.array([1.0, 2.0, 3.0, 50.0])})
    R = pa.table({
        "lo": pa.array([0.0, 0.0, None]),
        "hi": pa.array([10.0, 2.5, 10.0]),
        "uid": pa.array([big, None, big + 1], pa.int64()),
    })
    ds = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
        count_by="uid", n_tiles=4,
    )
    # assert in Arrow: pandas would widen the nullable int64 uid to float64
    # and smear >2^53 values IN THE TEST, masking what the operator emits
    out = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert out.schema.field("uid").type == pa.int64()
    rows = dict(zip(out.column("uid").to_pylist(), out.column("n").to_pylist()))
    # big: [0,10] -> 3 events; null uid: [0,2.5] -> 2; big+1: null lo -> dropped
    assert rows == {big: 3, None: 2}


def test_range_join_count_global_and_multicol(ray_session):
    """count_by=None gives one global count (and requires a payload-free
    right side); multi-column count_by groups like SQL."""
    import pytest
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    L = pa.table({"x": pa.array([1.0, 2.0, 3.0])})
    R = pa.table({"lo": pa.array([0.0, 2.5]), "hi": pa.array([10.0, 10.0])})
    out = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi", n_tiles=4
    ).to_pandas()
    assert out["n"].tolist() == [4]  # 3 + 1

    R2 = pa.table({
        "lo": pa.array([0.0, 0.0, 2.5]),
        "hi": pa.array([10.0, 10.0, 10.0]),
        "a": pa.array(["g1", "g1", "g2"]),
        "b": pa.array([1, 1, 2], pa.int64()),
    })
    with pytest.raises(ValueError, match="payload columns"):
        range_join_count(rd.from_arrow(L), rd.from_arrow(R2), "x", "lo", "hi")
    out2 = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R2), "x", "lo", "hi",
        count_by=["a", "b"], n_tiles=4,
    ).to_pandas()
    got = {(a, int(b)): int(n)
           for a, b, n in zip(out2["a"], out2["b"], out2["n"])}
    assert got == {("g1", 1): 6, ("g2", 2): 1}


def test_range_join_count_adversarial_composite_keys(ray_session):
    """Composite count_by values crafted so a naive separator-join would
    merge distinct groups: ('a\\x1f', 'b') vs ('a', '\\x1fb'), and values
    that mimic the length-prefixed encoding itself ('N', '1:x')."""
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    L = pa.table({"x": pa.array([1.0])})
    R = pa.table({
        "lo": pa.array([0.0] * 5),
        "hi": pa.array([10.0] * 5),
        "a": pa.array(["a\x1f", "a", "N", "1:x", None]),
        "b": pa.array(["b", "\x1fb", "1:x", "N", None]),
    })
    out = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
        count_by=["a", "b"], n_tiles=2,
    ).to_pandas()
    got = {(a, b): int(n) for a, b, n in zip(out["a"], out["b"], out["n"])}
    assert got == {
        ("a\x1f", "b"): 1, ("a", "\x1fb"): 1,
        ("N", "1:x"): 1, ("1:x", "N"): 1, (None, None): 1,
    }


def test_range_join_count_sum_pushdown_bruteforce(ray_session):
    """sum_cols must equal the brute-force joined SUM per group — random
    values/intervals, null weights contributing 0, multiple sum columns,
    and summing the range column itself."""
    import random

    import pandas as pd
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    rng = random.Random(42)
    nl, nr = 300, 40
    x = [rng.uniform(0, 100) for _ in range(nl)]
    w = [rng.uniform(-5, 5) if rng.random() > 0.15 else None for _ in range(nl)]
    lo = [rng.uniform(0, 90) for _ in range(nr)]
    hi = [l + rng.uniform(0, 30) for l in lo]
    g = [rng.choice(["a", "b", "c"]) for _ in range(nr)]
    L = pa.table({"x": pa.array(x), "w": pa.array(w, pa.float64())})
    R = pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                  "g": pa.array(g, pa.string())})
    out = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
        count_by="g", sum_cols=["w", "x"], n_tiles=7,
    ).to_pandas().set_index("g").sort_index()

    rows = []
    for l, h, gg in zip(lo, hi, g):
        for xv, wv in zip(x, w):
            if l <= xv <= h:
                rows.append((gg, 0.0 if wv is None else wv, xv))
    bf = pd.DataFrame(rows, columns=["g", "w", "x"]).groupby("g").agg(
        n=("w", "size"), sum_w=("w", "sum"), sum_x=("x", "sum"))
    assert out["n"].to_dict() == bf["n"].to_dict()
    for col in ("sum_w", "sum_x"):
        for k in bf.index:
            assert abs(out[col][k] - bf[col][k]) < 1e-8, (col, k)


def test_range_join_count_min_max_bruteforce(ray_session):
    """min_max=True must equal the brute-force joined MIN/MAX per group
    across tile boundaries, and preserve the value column's type
    (timestamps stay timestamps)."""
    import datetime as dt
    import random

    import pandas as pd
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    rng = random.Random(11)
    base = dt.datetime(2021, 1, 1)
    ts = [base + dt.timedelta(minutes=rng.randint(0, 50_000)) for _ in range(250)]
    lo = [base + dt.timedelta(minutes=rng.randint(0, 45_000)) for _ in range(30)]
    hi = [l + dt.timedelta(minutes=rng.randint(0, 20_000)) for l in lo]
    g = [rng.choice(["a", "b", "c", "d"]) for _ in range(30)]
    L = pa.table({"t": pa.array(ts, pa.timestamp("us"))})
    R = pa.table({"lo": pa.array(lo, pa.timestamp("us")),
                  "hi": pa.array(hi, pa.timestamp("us")),
                  "g": pa.array(g, pa.string())})
    ds = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "t", "lo", "hi",
        count_by="g", min_max=True, n_tiles=5,
    )
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    assert t.schema.field("min_t").type == pa.timestamp("us")
    got = {r["g"]: (r["n"], r["min_t"], r["max_t"]) for r in t.to_pylist()}

    rows = []
    for l, h, gg in zip(lo, hi, g):
        rows += [(gg, x) for x in ts if l <= x <= h]
    bf = pd.DataFrame(rows, columns=["g", "t"]).groupby("g").agg(
        n=("t", "size"), mn=("t", "min"), mx=("t", "max"))
    want = {k: (int(r["n"]), r["mn"].to_pydatetime(), r["mx"].to_pydatetime())
            for k, r in bf.iterrows()}
    assert got == want


def test_range_join_count_sum_cols_validation(ray_session):
    import pytest
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    L = pa.table({"x": pa.array([1.0]), "s": pa.array(["str"])})
    R = pa.table({"lo": pa.array([0.0]), "hi": pa.array([2.0]),
                  "g": pa.array(["a"])})
    with pytest.raises(ValueError, match="not on the left side"):
        range_join_count(rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
                         count_by="g", sum_cols="nope")
    with pytest.raises(ValueError, match="not numeric"):
        range_join_count(rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
                         count_by="g", sum_cols="s")
    with pytest.raises(ValueError, match="duplicates"):
        range_join_count(rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
                         count_by="g", sum_cols=["x", "x"])


def test_range_join_count_weight_semantics(ray_session):
    """NaN weights contribute 0 (documented COALESCE-like semantics); ±inf
    weights raise instead of smearing through the tile's prefix sums into
    unrelated intervals."""
    import math

    import pytest
    import ray
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    L = pa.table({"x": pa.array([1.0, 2.0, 3.0]),
                  "w": pa.array([float("nan"), 4.0, 8.0])})
    R = pa.table({"lo": pa.array([0.0, 2.5]), "hi": pa.array([10.0, 10.0]),
                  "g": pa.array(["a", "b"])})
    out = range_join_count(rd.from_arrow(L), rd.from_arrow(R), "x", "lo",
                           "hi", count_by="g", sum_cols="w").to_pandas()
    got = dict(zip(out["g"], out["sum_w"]))
    assert got == {"a": 12.0, "b": 8.0}
    assert not any(math.isnan(v) for v in got.values())

    Linf = pa.table({"x": pa.array([1.0, 2.0]),
                     "w": pa.array([float("inf"), 1.0])})
    with pytest.raises(ray.exceptions.RayTaskError, match="inf"):
        range_join_count(rd.from_arrow(Linf), rd.from_arrow(R), "x", "lo",
                         "hi", count_by="g", sum_cols="w").materialize()


def test_range_join_count_min_max_float_path_types(ray_session):
    """min_max on the float64 path (timestamp values with float bounds)
    must still restore the value column's original type."""
    import datetime as dt

    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    base = dt.datetime(2022, 3, 1)
    ts = [base + dt.timedelta(hours=h) for h in (1, 5, 9)]
    L = pa.table({"t": pa.array(ts, pa.timestamp("us"))})
    epoch = [t.timestamp() * 1e6 for t in ts]
    R = pa.table({"lo": pa.array([epoch[0] - 1.0]),
                  "hi": pa.array([epoch[1] + 1.0]),
                  "g": pa.array(["a"])})  # float bounds -> float path
    t = pa.concat_tables(
        range_join_count(rd.from_arrow(L), rd.from_arrow(R), "t", "lo",
                         "hi", count_by="g", min_max=True, n_tiles=2)
        .iter_batches(batch_format="pyarrow"))
    assert t.schema.field("min_t").type == pa.timestamp("us")
    row = t.to_pylist()[0]
    assert row["n"] == 2 and row["min_t"] == ts[0] and row["max_t"] == ts[1]


def test_range_join_count_key_encoding_fuzz(ray_session):
    """Injectivity of the composite-key encoding, end-to-end: 400 rows of
    3-column keys drawn from an alphabet built to stress the length-prefix
    scheme (empty, ':', '\\x1f', 'N', digit-colon prefixes, multi-byte
    UTF-8, nulls) must group exactly like a pandas groupby."""
    import random

    import pandas as pd
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import range_join_count

    alphabet = ["", ":", "\x1f", "N", "1:", "0:", "2:N", "a", "aa",
                "é", "é:1", "N1:", "10:", None, "::", "1", "n"]
    rng = random.Random(20260819)
    n = 400
    a = [rng.choice(alphabet) for _ in range(n)]
    b = [rng.choice(alphabet) for _ in range(n)]
    c = [rng.choice(alphabet) for _ in range(n)]
    R = pa.table({
        "lo": pa.array([0.0] * n), "hi": pa.array([10.0] * n),
        "a": pa.array(a, pa.string()), "b": pa.array(b, pa.string()),
        "c": pa.array(c, pa.string()),
    })
    L = pa.table({"x": pa.array([1.0, 5.0])})  # 2 matches per interval
    out = range_join_count(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi",
        count_by=["a", "b", "c"], n_tiles=3,
    ).to_pandas()
    got = {(ka, kb, kc): int(v) for ka, kb, kc, v in
           zip(out["a"], out["b"], out["c"], out["n"])}
    exp = (pd.DataFrame({"a": a, "b": b, "c": c})
           .groupby(["a", "b", "c"], dropna=False).size())
    want = {tuple(None if pd.isna(p) else p for p in k): int(v) * 2
            for k, v in exp.items()}
    assert got == want


def test_bucketed_join_nested_payload_columns(ray_session):
    """Arrow's hash join rejects nested non-key columns; the row-index
    join + take() path must carry list payloads through every join type,
    with outer-null rows gathering as null lists."""
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import bucketed_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "emb": pa.array([[1.0, 2.0], [3.0], None], pa.list_(pa.float64())),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "tags": pa.array([["x"], [], ["y", "z"]], pa.list_(pa.string())),
    }))
    def _collect(ds):
        # ragged list columns break Ray's to_pandas TensorArray cast;
        # gather as Arrow and sort there
        t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
        t = t.sort_by("k")
        return {c: t.column(c).to_pylist() for c in t.column_names}

    inner = _collect(bucketed_join(left, right, on="k"))
    assert inner["k"] == [2, 3]
    assert inner["emb"] == [[3.0], None]
    assert inner["tags"] == [["x"], []]
    outer = _collect(bucketed_join(left, right, on="k", how="outer"))
    assert outer["k"] == [1, 2, 3, 4]
    assert outer["emb"] == [[1.0, 2.0], [3.0], None, None]
    assert outer["tags"] == [None, ["x"], [], ["y", "z"]]


def test_bucketed_join_nested_branch_parity(ray_session):
    """Adding an all-null list column (forcing the row-index/take path)
    must not change the flat columns' join result for any join type."""
    import ray.data as rd
    from ny_campaign_finance_dedupe_ray.stages.joins import bucketed_join

    import random
    rng = random.Random(7)
    keys_l = [rng.randint(0, 20) if rng.random() > 0.1 else None
              for _ in range(80)]
    keys_r = [rng.randint(0, 20) if rng.random() > 0.1 else None
              for _ in range(60)]
    flat_l = pa.table({
        "k": pa.array(keys_l, pa.int64()),
        "lv": pa.array(range(80), pa.int64()),
    })
    flat_r = pa.table({
        "k": pa.array(keys_r, pa.int64()),
        "rv": pa.array(range(60), pa.int64()),
    })
    nested_l = flat_l.append_column(
        "junk", pa.array([None] * 80, pa.list_(pa.int32())))

    for how in ("inner", "left", "right", "outer"):
        base = pa.concat_tables(
            bucketed_join(rd.from_arrow(flat_l), rd.from_arrow(flat_r),
                          on="k", how=how)
            .iter_batches(batch_format="pyarrow"))
        via = pa.concat_tables(
            bucketed_join(rd.from_arrow(nested_l), rd.from_arrow(flat_r),
                          on="k", how=how)
            .iter_batches(batch_format="pyarrow"))
        cols = ["k", "lv", "rv"]
        skey = lambda t: tuple((v is None, v if v is not None else 0) for v in t)
        a = sorted(map(tuple, zip(*[base.column(c).to_pylist() for c in cols])), key=skey)
        b = sorted(map(tuple, zip(*[via.column(c).to_pylist() for c in cols])), key=skey)
        assert a == b, how


def test_host_key_bracket_urls_skipped():
    """urlparse RAISES on mismatched-bracket netlocs — those rows must get
    no host key (the old scalar path skipped them); bracketed IPv6 hosts
    are skipped too (documented narrowing)."""
    rows = [
        ("http://[bad/x", "n", "s", "c"),
        ("http://ex]ample.com/x", "n", "s", "c"),
        ("http://[::1]/x", "n", "s", "c"),
        ("http://good.example.com/x", "n", "s", "c"),
    ]
    cfg = blocking.BlockingConfig(predicates=[], minhash_column=None, host_key=True)
    out = blocking.block_records(_records(rows), cfg).to_pandas()
    assert set(out["block_key"]) == {"host:good.example.com"}


def test_joins_nullable_int64_above_2_53_exact(ray_session):
    """The old KNOWN LIMIT is gone: a NULLS-CONTAINING int64 payload column
    with values above 2^53 survives range_join, bucketed_join and asof_join
    bit-exact (the merges are all-Arrow now — no pandas float round-trip)."""
    import ray.data as rd

    from ny_campaign_finance_dedupe_ray.stages.joins import (
        asof_join, bucketed_join, range_join,
    )

    big = 2 ** 53 + 987_654_321  # collapses under any float64 round-trip
    L = pa.table({
        "x": pa.array([1.0, 2.0, 3.0]),
        "payload": pa.array([big, None, big + 7], pa.int64()),
    })
    R = pa.table({
        "lo": pa.array([0.0, 2.5]),
        "hi": pa.array([1.5, 9.0]),
        "rbig": pa.array([None, big + 1], pa.int64()),
    })
    import ray as _ray

    def _collect(ds):
        # empty shuffle partitions yield zero-field placeholder blocks
        tabs = [_ray.get(r) for r in ds.to_arrow_refs()]
        return pa.concat_tables([t for t in tabs if t.num_columns > 0])

    t = _collect(range_join(
        rd.from_arrow(L), rd.from_arrow(R), "x", "lo", "hi", n_tiles=4
    ))
    got = sorted(
        (x, p, rb) for x, p, rb in zip(
            t["x"].to_pylist(), t["payload"].to_pylist(), t["rbig"].to_pylist()
        )
    )
    assert got == [(1.0, big, None), (3.0, big + 7, big + 1)]
    assert t.schema.field("payload").type == pa.int64()

    # bucketed outer join: null-filled int64 columns stay int64 and exact
    BL = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "lv": pa.array([big, None], pa.int64()),
    }))
    BR = rd.from_arrow(pa.table({
        "k": pa.array([2, 3], pa.int64()),
        "rv": pa.array([big + 3, big + 4], pa.int64()),
    }))
    tj = _collect(bucketed_join(BL, BR, on="k", how="outer"))
    assert tj.schema.field("lv").type == pa.int64()
    assert tj.schema.field("rv").type == pa.int64()
    rows = {r["k"]: (r["lv"], r["rv"]) for r in tj.to_pylist()}
    assert rows == {1: (big, None), 2: (None, big + 3), 3: (None, big + 4)}

    # asof: big int64 right payload gathered exactly; null key/ts semantics
    AL = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", None], pa.string()),
        "ts": pa.array([10, 20, 30], pa.int64()),
        "lv": pa.array([1, 2, 3], pa.int64()),
    }))
    AR = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a"], pa.string()),
        "ts": pa.array([5, 15, None], pa.int64()),
        "rv": pa.array([big + 10, big + 20, big + 30], pa.int64()),
    }))
    ta = _collect(asof_join(AL, AR, on_key="k", on_ts="ts"))
    assert ta.schema.field("rv").type == pa.int64()
    by_lv = {r["lv"]: r["rv"] for r in ta.to_pylist()}
    # ts=10 -> right ts=5; ts=20 -> right ts=15; null key -> unmatched;
    # the null-ts right row is never picked
    assert by_lv == {1: big + 10, 2: big + 20, 3: None}
