"""Golden-snapshot hashes for the queries the driver cannot oracle-check
(no SQL equivalent): any output change — values, schema, row order after
canonical sort — fails loudly here instead of sliding by as "rows-only".

Regenerate after an INTENTIONAL semantic change with:
    python tests/test_queries_snapshot.py
which prints the new EXPECTED dict to paste in.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"

NO_ORACLE = [
    "dedupe_pages",
    "dedupe_profiles",
    "canonical_reps",
    "record_link",
    "gazette_distributed",
    "minhash_clusters",
    "simhash_signatures",
    "lang_id",
    "quality_score",
    "fingerprints",
    "embedding_neardup",
    "ann_ivf_topk",
    "media_features",
    "media_probe",
]

# sha256 of the canonicalized sf0.001 output (see _canonical_hash)
EXPECTED = {
    "canonical_reps": "ff157af9fb6017b78ef4ee337a7d15d5e59854536de7e56c8fb8e5697d4d1b7e",
    "record_link": "34d21986843601a511de7bc27f068a6da5b5090a59b4e93469cdb9acbf4751ae",
    "gazette_distributed": "f371a9bd564651363346858f68420afe468fc9241b73ac3a098ca89b7486b215",
    "dedupe_profiles": "9402983008e2564d9cbe43fb641790db27685baa346d4d02bb2e676b47d72e7f",
    "dedupe_pages": "bbd677bafcbc979661a849b237d4b50ac2e3682d4fa87ba6be77247d3a938d31",
    "minhash_clusters": "6de903d6aec1f5de32edc8f056eeffc84dbc2d35caa19fb064afc3e618a415ea",
    "simhash_signatures": "897a5adfee73c227d9a97f0005084f9bc77b32ebce89dd5c2c4eecce8e3565e7",
    "lang_id": "8691b1187534ba302292b196c35cf4938462e0662b60d447d69c3a9ac5edfedf",
    "quality_score": "aa888371a3e062e5ed7b345aef2a6dea09a914f994ccd06fecae2c15cf69586d",
    "fingerprints": "398e1bf5972368d931e143fd52250581e3357690e39d09f81c86581165c274ae",
    "embedding_neardup": "946c797c8cc62b9f9977f5f7e71642af9b0ea622682e247e8996db6f3a1d80c4",
    # r5: synth_media image slots alternate PPM / native-PNG (gray/rgb/rgba)
    "media_features": "9176962c5d6b28ca9f2f820d049ac830b1b79e35bfafcdfd18e5bc998e761a17",
    "ann_ivf_topk": "700cde34cc90b3a56c86eb8671d2bd42639f0fd2c4adb8a537123f047a4ec0b0",
    "media_probe": "e0670b63f88e2dc49aba542f1adcfed38c71ff8ff1ab7992d284f160b9e020c0",
}


def _canonical_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()


def _run_all() -> dict[str, str]:
    import ray.data

    import __ray_entry__ as e

    qs = e.queries()
    out = {}
    for name in NO_ORACLE:
        res = qs[name](SF_DIR)
        df = res.to_pandas() if isinstance(res, ray.data.Dataset) else pd.DataFrame(res)
        out[name] = _canonical_hash(df)
    return out


def test_no_oracle_query_snapshots():
    got = _run_all()
    for name in NO_ORACLE:
        assert got[name] == EXPECTED[name], (
            f"{name}: output changed (hash {got[name]}, expected "
            f"{EXPECTED[name]}); if intentional, regenerate with "
            f"`python tests/test_queries_snapshot.py`"
        )


if __name__ == "__main__":
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    print("EXPECTED = {")
    for k, v in _run_all().items():
        print(f'    "{k}": "{v}",')
    print("}")
    ray.shutdown()
