"""Text sources (positional CSV, bad-line split, truncation), samplers,
training IO, record-link pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ny_campaign_finance_dedupe_ray.functions import sampling as S
from ny_campaign_finance_dedupe_ray.sources import text_source as TS
from ny_campaign_finance_dedupe_ray.stages import blocking, pairs
from ny_campaign_finance_dedupe_ray.state import training_io as TIO


def test_read_positional_csv(tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("1,alice,ny\n2,bob,ca\n")
    ds = TS.read_positional_csv(p, ["id", "name", "state"])
    df = ds.to_pandas()
    assert list(df.columns) == ["id", "name", "state"]
    assert df["name"].tolist() == ["alice", "bob"]


def test_split_bad_lines(tmp_path):
    p = str(tmp_path / "raw.txt")
    with open(p, "w") as f:
        f.write("a,b,c\n")            # ok
        f.write("a,b\n")              # wrong field count
        f.write('a,"b,c\n')           # odd quotes (and 2 commas)
        f.write("(bad,row,x\n")       # reject prefix
        f.write("d,e,f\n")            # ok
    valid, rejected = TS.split_bad_lines(p, n_fields=3)
    v = sorted(valid.to_pandas()["text"])
    r = sorted(rejected.to_pandas()["text"])
    assert v == ["a,b,c", "d,e,f"]
    assert len(r) == 3


def test_truncate_and_trim(tmp_path):
    ds = rd.from_arrow(
        pa.table({"office": pa.array(["governor of ny"], pa.string()),
                  "d": pa.array(["2024-01-02T03:04:05"], pa.string())})
    )
    out = TS.trim_date_columns(
        TS.truncate_columns(ds, {"office": 8}), ["d"]
    ).to_pandas()
    assert out.loc[0, "office"] == "governor"
    assert out.loc[0, "d"] == "2024-01-02"


def test_random_pairs_triangular():
    p = S.random_pairs(10, 1000)  # >= full space -> all 45 pairs
    assert len(p) == 45
    assert (p[:, 0] < p[:, 1]).all()
    assert p.max() == 9 and p.min() == 0
    assert len(set(map(tuple, p.tolist()))) == 45
    # seeded subsample deterministic
    a = S.random_pairs(1000, 50, seed=3)
    b = S.random_pairs(1000, 50, seed=3)
    assert (a == b).all()
    assert (a[:, 0] < a[:, 1]).all() and a.max() < 1000
    assert S.random_pairs(1, 10).shape == (0, 2)


def test_random_pairs_match():
    p = S.random_pairs_match(3, 4, 100)
    assert len(p) == 12
    assert p[:, 0].max() == 2 and p[:, 1].max() == 3


def test_stratified_sample():
    tbl = pa.table(
        {
            "k": pa.array(["x"] * 40 + ["y"] * 20, pa.string()),
            "v": pa.array(list(range(60)), pa.int64()),
        }
    )
    out = S.stratified_sample(rd.from_arrow(tbl), "k", frac=0.25, seed=1).to_pandas()
    counts = out["k"].value_counts()
    assert counts["x"] == 10 and counts["y"] == 5
    out2 = S.stratified_sample(
        rd.from_arrow(tbl).repartition(5), "k", frac=0.25, seed=1
    ).to_pandas()
    assert sorted(out["v"]) == sorted(out2["v"])  # partition-independent


def test_training_io_roundtrip(tmp_path):
    recs = {
        "r1": {"name": "a", "unique_id": 1},
        "r2": {"name": "a2", "unique_id": 1},
        "r3": {"name": "b", "unique_id": 2},
        "r4": {"name": "c", "unique_id": 3},
    }
    match, distinct = TIO.training_pairs_from_golden(recs, n_distinct=5)
    assert ({"name": "a", "unique_id": 1}, {"name": "a2", "unique_id": 1}) in match
    assert all(a["unique_id"] != b["unique_id"] for a, b in distinct)
    p = str(tmp_path / "training.json")
    TIO.save_training(p, match, distinct)
    m2, d2 = TIO.load_training(p)
    assert m2 == match and d2 == distinct


def test_candidate_pairs_link():
    def side(prefix, names):
        return rd.from_arrow(
            pa.table(
                {
                    "record_id": pa.array(
                        [f"{prefix}{i}" for i in range(len(names))], pa.string()
                    ),
                    "name": pa.array(names, pa.string()),
                    "street": pa.array(["s"] * len(names), pa.string()),
                    "city": pa.array(["c"] * len(names), pa.string()),
                    "state": pa.array(["ny"] * len(names), pa.string()),
                    "zip": pa.array(["z"] * len(names), pa.string()),
                    "text_norm": pa.array(names, pa.string()),
                }
            )
        )

    from ny_campaign_finance_dedupe_ray.functions import predicates as P

    cfg = blocking.BlockingConfig(
        predicates=[P.StringPredicate(P.first_token, "name")],
        minhash_column=None,
    )
    a = blocking.block_records(side("a", ["mary smith", "bob jones"]), cfg)
    b = blocking.block_records(side("b", ["mary jones", "mary qu", "zed x"]), cfg)
    out = pairs.candidate_pairs_link(a, b).to_pandas()
    got = sorted(zip(out["id_a"], out["id_b"]))
    # only the 'mary' key collides: a0 x {b0, b1}
    assert got == [("a0", "b0"), ("a0", "b1")]
    row = out[(out["id_a"] == "a0") & (out["id_b"] == "b0")].iloc[0]
    assert row["name_a"] == "mary smith" and row["name_b"] == "mary jones"


def test_typo_variants():
    from ny_campaign_finance_dedupe_ray.functions.textnorm import typo_variants

    out = typo_variants("street")
    assert out[0] == "street"
    # adjacent transpositions present
    assert "tsreet" in out and "steret" in out
    # prefix truncations appear for i > 3
    assert "stre" in out and "stree" in out
    # deterministic
    assert out == typo_variants("street")
