"""Learned edit-distance comparator — the engine's counterpart of the
reference's optional CRFEditDistance (String(crf=True),
/root/reference/dedupe_extension/dedupe/dedupe/variables/string.py:60-66,
which wraps the public ``highered``/``pyhacrf`` alignment-CRF packages).

Model family: a pair-HMM over the match/insert/delete alignment lattice,
scored by the Viterbi log-odds path — in log space that IS an affine-gap
min-plus DP, so the batched Gotoh kernel (functions/affinegap.py) is the
engine, with match cost 0 and learned mismatch / gap-open / gap-extend
log-odds costs (abbreviation discount off).  The similarity is the
per-character normalized path odds::

    crf_edit(a, b) = exp(-viterbi_cost(a, b) / (len(a) + len(b)))

in (0, 1], 1.0 for identical strings, NaN for missing — the comparator
contract scoring expects.  Parameters are fit by ``fit_crf_edit`` (a
deterministic grid search maximizing class separation on labeled pairs)
rather than copied from highered's shipped weights, which are not public
knowledge available here; the DEFAULTS below come from fitting on a
seeded synthetic typo corpus (tests/test_editcrf.py pins behavior).
"""

from __future__ import annotations

import numpy as np

from .affinegap import batch_affine_gap_distance

# (mismatch, gap_open, gap_extend) log-odds costs in nats — the
# fit_crf_edit grid optimum on the seeded 600-pair typo corpus
# (tests/test_editcrf.py::_typo_corpus, seed 11)
DEFAULT_PARAMS = (3.0, 1.5, 1.2)


def crf_edit_scores(
    strings_a, strings_b, params: tuple = DEFAULT_PARAMS
) -> np.ndarray:
    """Vectorized pair-HMM Viterbi similarity per pair; NaN where either
    side is missing/empty."""
    a = ["" if s is None else s for s in strings_a]
    b = ["" if s is None else s for s in strings_b]
    mismatch, gap_open, gap_extend = params
    d = batch_affine_gap_distance(
        a,
        b,
        match_weight=0.0,
        mismatch_weight=float(mismatch),
        gap_weight=float(gap_open),
        space_weight=float(gap_extend),
        abbreviation_scale=1.0,
    )
    la = np.array([len(s) for s in a], dtype=np.float64)
    lb = np.array([len(s) for s in b], dtype=np.float64)
    tot = la + lb
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.exp(-d / tot)
    out[(la == 0) | (lb == 0)] = np.nan
    return out


def fit_crf_edit(
    pairs: list[tuple], labels, grid: dict | None = None
) -> tuple:
    """Deterministic grid search for (mismatch, gap_open, gap_extend):
    maximize the separation (mean_pos - mean_neg) / pooled_std of
    crf_edit scores on labeled pairs.  The learned-parameter step that
    makes this the CRFEditDistance counterpart rather than a fixed
    metric."""
    y = np.asarray(labels, dtype=bool)
    if not (y.any() and (~y).any()):
        raise ValueError("fit_crf_edit needs both positive and negative labels")
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    grid = grid or {
        "mismatch": (1.5, 2.0, 3.0, 4.5),
        "gap_open": (1.5, 2.5, 3.5, 5.0),
        "gap_extend": (0.4, 0.8, 1.2, 2.0),
    }
    best, best_sep = DEFAULT_PARAMS, -np.inf
    for mm in grid["mismatch"]:
        for go in grid["gap_open"]:
            for ge in grid["gap_extend"]:
                if ge > go:  # extend dearer than open is degenerate
                    continue
                s = crf_edit_scores(a, b, (mm, go, ge))
                s = np.nan_to_num(s)
                pos, neg = s[y], s[~y]
                pooled = np.sqrt(
                    (pos.var() * len(pos) + neg.var() * len(neg))
                    / max(len(s), 1)
                )
                sep = (pos.mean() - neg.mean()) / max(pooled, 1e-9)
                if sep > best_sep:
                    best_sep, best = sep, (float(mm), float(go), float(ge))
    return best
