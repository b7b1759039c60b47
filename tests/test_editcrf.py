"""crf_edit comparator (functions/editcrf.py): monotonicity, missing
semantics, parameter fitting, and the scoring integration — the
CRFEditDistance registry gap from VERDICT r2."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ny_campaign_finance_dedupe_ray.functions.editcrf import (
    DEFAULT_PARAMS,
    crf_edit_scores,
    fit_crf_edit,
)


def _typo_corpus(n=300, seed=11):
    """(pairs, labels): positives are typo'd variants, negatives random."""
    rng = np.random.default_rng(seed)
    words = ["johnson", "martinez", "washington", "elizabeth", "broadway",
             "springfield", "alexander", "campbell", "mitchell", "harrison"]
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    pairs, labels = [], []
    for _ in range(n):
        w = words[int(rng.integers(len(words)))]
        s = list(w)
        for _ in range(int(rng.integers(1, 3))):
            op = rng.integers(3)
            i = int(rng.integers(len(s)))
            if op == 0:
                s[i] = alphabet[int(rng.integers(26))]
            elif op == 1 and len(s) > 3:
                del s[i]
            else:
                s.insert(i, alphabet[int(rng.integers(26))])
        pairs.append((w, "".join(s)))
        labels.append(True)
        a, b = rng.choice(words, 2, replace=False)
        pairs.append((str(a), str(b)))
        labels.append(False)
    return pairs, labels


def test_crf_edit_basic_semantics():
    s = crf_edit_scores(
        ["johnson", "johnson", "johnson", None, "", "johnson"],
        ["johnson", "jonhson", "xqzvwk", "johnson", "johnson", None],
    )
    assert s[0] == 1.0
    assert 0 < s[2] < s[1] < 1.0  # typo closer than random
    assert np.isnan(s[3]) and np.isnan(s[4]) and np.isnan(s[5])


def test_crf_edit_monotone_in_edits():
    base = "springfield"
    variants = ["springfield", "springfeld", "sprngfeld", "sprnfld", "xq"]
    s = crf_edit_scores([base] * len(variants), variants)
    assert all(s[i] > s[i + 1] for i in range(len(s) - 1)), s.tolist()


def test_fit_crf_edit_separates_typos():
    pairs, labels = _typo_corpus()
    params = fit_crf_edit(pairs, labels)
    assert len(params) == 3
    s = np.nan_to_num(crf_edit_scores(
        [p[0] for p in pairs], [p[1] for p in pairs], params
    ))
    y = np.asarray(labels)
    # fitted params must classify typos vs random well at a single cut
    cut = (s[y].mean() + s[~y].mean()) / 2
    acc = ((s >= cut) == y).mean()
    assert acc >= 0.95, (params, acc)
    # and at least match the defaults' separation
    s0 = np.nan_to_num(crf_edit_scores(
        [p[0] for p in pairs], [p[1] for p in pairs], DEFAULT_PARAMS
    ))
    sep = s[y].mean() - s[~y].mean()
    sep0 = s0[y].mean() - s0[~y].mean()
    assert sep >= sep0 - 1e-9


def test_crf_edit_through_scoring():
    from ny_campaign_finance_dedupe_ray.stages.scoring import py_feature_values
    from ny_campaign_finance_dedupe_ray.state.model import Feature

    batch = pa.table(
        {
            "name_a": pa.array(["johnson", "harrison", None]),
            "name_b": pa.array(["jonhson", "morrison", "x"]),
        }
    )
    f = Feature("crf_name", "name", "crf_edit")
    vals = py_feature_values(f, batch)
    direct = crf_edit_scores(["johnson", "harrison"], ["jonhson", "morrison"])
    np.testing.assert_allclose(vals[:2], direct)
    assert np.isnan(vals[2])
    # params override plumbs through
    f2 = Feature("crf_name", "name", "crf_edit", {"params": (4.5, 5.0, 2.0)})
    vals2 = py_feature_values(f2, batch)
    assert vals2[0] != vals[0]
