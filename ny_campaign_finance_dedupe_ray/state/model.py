"""Model artifact: (feature spec, logistic weights, predicate list, threshold).

Carries the same triple the reference's settings pickle carries —
DataModel + classifier + predicates
(/root/reference/dedupe_extension/dedupe/dedupe/api.py:1084-1086, read back
at api.py:928-945) — but as a portable JSON artifact loaded once per scoring
actor in ``__init__`` (never re-shipped per batch).

Also ships a deterministic offline trainer (``fit_logistic``: full-batch
gradient descent, fixed iterations/seed) replacing the reference's
rlr.RegularizedLogisticRegression fit (api.py:952, core.py:149-150) so users
can refit weights on their own labeled pairs without any non-public deps.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, asdict

import numpy as np

# feature kinds -> DuckDB SQL templates over (fa, fb); NULL handling mirrors
# the reference's missing-data rule: value 0 + a not-missing dummy
# (datamodel.py:74-115).
FEATURE_KINDS = (
    "jaro_winkler",      # jaro_winkler_similarity(fa, fb)
    "levenshtein_ratio",  # 1 - levenshtein/max(len)
    "char_jaccard",      # duckdb jaccard(fa, fb)
    "exact",             # fa == fb
    "prefix4",           # first-4-chars equality
    "not_missing",       # both present dummy
    "interaction",       # product of two other features (Interaction
                         # variable, variables/interaction.py:5-61);
                         # field = "feat1*feat2"
    "custom",            # registered python comparator (variables/base.py:
                         # 75-91); field = column, name must be registered
    # numpy/python-path kinds (reference variable registry parity):
    "affine_gap",        # normalizedAffineGapDistance — the reference's
                         # default String/ShortString comparator
                         # (variables/string.py:60-66, datamodel.py:74-115)
    "crf_edit",          # learned edit distance — counterpart of the
                         # optional CRFEditDistance (String(crf=True),
                         # variables/string.py:60-66): pair-HMM Viterbi
                         # log-odds on the batched Gotoh kernel with
                         # fit_crf_edit-learned costs (functions/editcrf.py);
                         # params = {"params": (mismatch, open, extend)}
    "cosine_text",       # TF cosine over tokens (Text w/ corpus,
                         # variables/string.py:78-93)
    "cosine_set",        # cosine over set elements (variables/set.py:21-27)
    "price",             # |log10 p1 - log10 p2| (variables/price.py:12-19)
    "latlong",           # sqrt(haversine km) (variables/latlong.py:13-15)
    "categorical_dummy",  # one dummy of the categorical pair expansion
                         # (variables/categorical_type.py:18-34); params =
                         # {"categories": [...], "pair_index": i} where
                         # dummies enumerate unordered category pairs
                         # (combinations_with_replacement order) minus the
                         # (cat0, cat0) reference level
    "exists_both",       # presence-pattern dummies (variables/exists.py:
    "exists_one",        # 25-35): both truthy / exactly one truthy
)

# registry for "custom" comparator functions: name -> f(a, b) -> float
CUSTOM_COMPARATORS: dict = {}


def register_comparator(name: str, fn) -> None:
    """Register a Custom-variable comparator (reference variables/base.py:
    75-91).  The function receives the two field values (possibly None) and
    returns a float; it runs per pair in the scorer's slow path."""
    CUSTOM_COMPARATORS[name] = fn


@dataclass
class Feature:
    name: str
    field: str
    kind: str
    params: dict | None = None

    def __post_init__(self):
        if self.kind not in FEATURE_KINDS:
            raise ValueError(f"unknown feature kind {self.kind!r}")
        if self.kind == "interaction" and "*" not in self.field:
            raise ValueError("interaction field must be 'feat1*feat2'")
        if self.kind == "categorical_dummy":
            p = self.params or {}
            if "categories" not in p or "pair_index" not in p:
                raise ValueError(
                    "categorical_dummy needs params={'categories': [...],"
                    " 'pair_index': i}"
                )


@dataclass
class Model:
    features: list[Feature]
    weights: list[float]
    bias: float
    threshold: float = 0.5
    predicate_names: list[str] = field(default_factory=list)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Model":
        d = json.loads(s)
        d["features"] = [Feature(**f) for f in d["features"]]
        return cls(**d)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "Model":
        with open(path) as f:
            return cls.from_json(f.read())


def default_model() -> Model:
    """Pre-fit flagship model over the normalized profile fields.

    Weights fit offline with ``fit_logistic`` on the seeded fixture's
    labeled pairs INCLUDING hard negatives from BOTH blocking axes —
    same-first-name-token pairs and same-zip pairs across entities.  Hard
    negatives matter operationally, not just for F1: a model that scores
    same-name or same-zip cross-entity pairs just above the threshold
    chains junk edges into giant connected components and the
    per-component hierarchical clustering (O(N^3)) eats the wall-clock
    (one missing negative class cost 3.1M junk edges at 250k pages)."""
    feats = [
        Feature("jw_name", "name", "jaro_winkler"),
        Feature("lev_name", "name", "levenshtein_ratio"),
        Feature("jw_street", "street", "jaro_winkler"),
        Feature("jw_city", "city", "jaro_winkler"),
        Feature("exact_zip", "zip", "exact"),
        Feature("nm_name", "name", "not_missing"),
    ]
    weights = [2.3387, 4.4085, 2.9304, 3.0836, 2.8818, -0.4778]
    bias = -11.0369
    return Model(features=feats, weights=weights, bias=bias, threshold=0.5)


def affine_model() -> Model:
    """Flagship model over the SAME feature space as the reference's default
    String variables — normalizedAffineGapDistance per field
    (variables/string.py:60-66, datamodel.py:74-115) — so clusters are
    comparable to a reference model artifact's.  Weights fit offline with
    ``fit_logistic`` on the seeded fixture's labeled pairs, hard negatives
    from both blocking axes (same-name-token and same-zip cross-entity
    pairs), plus all-missing zero rows so the missing-data zero-fill rule
    cannot push an empty pair over the threshold (train accuracy 1.0 on
    818 pos / 2116 neg; see tests/test_pipeline_f1.py::test_affine_gap_f1)."""
    feats = [
        Feature("ag_name", "name", "affine_gap"),
        Feature("ag_street", "street", "affine_gap"),
        Feature("ag_city", "city", "affine_gap"),
        Feature("exact_zip", "zip", "exact"),
        Feature("nm_name", "name", "not_missing"),
    ]
    return Model(
        features=feats,
        weights=[-0.5998, -0.9792, -0.7223, 4.1372, 3.393],
        bias=-2.1649,
        threshold=0.5,
    )


def doc_model() -> Model:
    """Pre-fit model for free-text document pages (the pages_from_documents
    shape): features over the normalized whole text.  Weights fit offline
    with ``fit_logistic`` on seeded positive (perturbed-copy) / negative
    (cross-document) pairs from the sf0.001 documents table — train accuracy
    1.0; see tests/test_pipeline_f1.py::test_doc_pages_f1."""
    feats = [
        Feature("jw_text", "text_norm", "jaro_winkler"),
        Feature("lev_text", "text_norm", "levenshtein_ratio"),
        Feature("nm_text", "text_norm", "not_missing"),
    ]
    return Model(
        features=feats,
        weights=[2.7623, 9.2671, -0.7326],
        bias=-7.6955,
        threshold=0.5,
    )


def sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x, dtype=np.float64)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def fit_logistic(
    X: np.ndarray,
    y: np.ndarray,
    l2: float = 1e-3,
    lr: float = 0.5,
    iters: int = 2000,
) -> tuple[np.ndarray, float]:
    """Deterministic full-batch logistic regression -> (weights, bias)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        p = sigmoid(X @ w + b)
        g = p - y
        gw = X.T @ g / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    return w, b
