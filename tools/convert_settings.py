"""Convert a reference dedupe settings pickle into this engine's Model JSON.

The reference persists trained matchers as three consecutive pickles —
DataModel, classifier, predicates
(/root/reference/dedupe_extension/dedupe/dedupe/api.py:1084-1086, read back
at api.py:928-945).  A migrating user holds such a file (e.g.
``settings_IND_2``) but not necessarily the reference's dependency stack
(dedupe C extensions, rlr, affinegap, highered, categorical...), so this
converter unpickles WITHOUT importing any of those packages: a restricted
Unpickler substitutes attribute-capturing stub classes for every reference /
third-party global, then walks the captured object graph and emits a
``state/model.py`` Model (feature spec + logistic weights + predicate names)
that scores pairs identically.

Column-order contract (datamodel.py:20-37,175-221): the reference feature
matrix is [primary field columns (categorical fields expand to their dummy
columns)] + [interaction columns] + [not-missing dummy columns for every
has_missing column, in column order].  The emitted Model lists features in
exactly that order so ``classifier.weights`` aligns 1:1.

Usage:
    python tools/convert_settings.py settings_IND_2 model.json
    # or
    from tools.convert_settings import convert_settings
    model = convert_settings("settings_IND_2")
"""

from __future__ import annotations


import pickle
import sys

import os as _os

# runnable as a script: put the repo root on sys.path
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

# Exact (module, name) globals that are SAFE to import for real during
# unpickling — the constructors numpy / collections / copyreg pickles
# actually emit.  A PREFIX allowlist ("anything under numpy.*") is not
# safe: numpy ships importable shell/eval gadgets
# (numpy.distutils.exec_command.exec_command, numpy.f2py.compile,
# numpy.load with allow_pickle), so everything outside this exact list is
# stubbed (reference/third-party modules) or refused (stdlib/numpy
# modules, where a stub could silently corrupt weights).
_SAFE_GLOBALS = {
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy.core.numeric", "_frombuffer"),
    # numpy 2.x pickles spell the private core package differently
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy._core.numeric", "_frombuffer"),
    ("collections", "OrderedDict"),
    ("collections", "defaultdict"),
    ("collections", "deque"),
    ("collections", "Counter"),
    ("copyreg", "_reconstructor"),
    ("functools", "partial"),
}

# module roots where an unknown global must be REFUSED rather than
# stubbed: a stub standing in for a real numpy/stdlib constructor would
# deserialize garbage weights instead of failing loudly
_REFUSE_ROOTS = {"numpy", "collections", "copyreg", "functools", "builtins"}


class ConversionError(ValueError):
    pass


class _StubBase:
    """Attribute-capturing placeholder for any reference/third-party class."""

    def __init__(self, *args, **kwargs):
        self._init_args = args
        self._init_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            if d:
                self.__dict__.update(d)
            if slots:
                self.__dict__.update(slots)
        else:
            self.__dict__["_state"] = state

    def __getattr__(self, item):  # tolerate copyreg getattr-based reduces
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        marker = _StubBase()
        marker.__dict__["_attr_of"] = (type(self).__name__, item)
        return marker


class _TupleStub(tuple):
    """For tuple subclasses (reference CompoundPredicate,
    predicates.py:325-342)."""

    @property
    def stub_items(self):
        return tuple(self)


_stub_cache: dict[tuple, type] = {}


def _stub_class(module: str, name: str) -> type:
    key = (module, name)
    if key not in _stub_cache:
        base = _TupleStub if name == "CompoundPredicate" else _StubBase
        cls = type(name, (base,), {"__module__": module, "stub_module": module})
        _stub_cache[key] = cls
    return _stub_cache[key]


# builtins is needed for container constructors in numpy/collections
# pickles, but importing it wholesale would hand a malicious settings
# file eval/exec/__import__/getattr — allow only plain constructors
_SAFE_BUILTINS = {
    "set", "frozenset", "list", "dict", "tuple", "object",
    "bytearray", "bytes", "complex", "slice", "range", "bool",
    "int", "float", "str",
}


def _stub_getattr(obj, name, *default):
    """Restricted surrogate for builtins.getattr: the reference registers
    copyreg.pickle(types.MethodType, reduce_method) (reference
    datamodel.py:228), so legitimate settings pickles reduce bound methods
    as GLOBAL builtins.getattr + REDUCE.  Real getattr would be an
    arbitrary-attribute-lookup gadget; this surrogate only performs the
    lookup when the receiver is one of our capture stubs (where
    _StubBase.__getattr__ fabricates an inert marker) and refuses any
    other receiver."""
    cls = obj if isinstance(obj, type) else type(obj)
    if not (isinstance(cls, type) and issubclass(cls, (_StubBase, _TupleStub))):
        raise pickle.UnpicklingError(
            "settings pickle calls getattr on a non-stub receiver "
            f"({type(obj).__name__}) — refused"
        )
    try:
        return getattr(obj, name)
    except AttributeError:
        if default:
            return default[0]
        raise


class _SettingsUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        root = module.split(".")[0]
        if root == "builtins":
            if name == "getattr":
                return _stub_getattr
            if name in _SAFE_BUILTINS:
                return getattr(__import__("builtins"), name)
            raise pickle.UnpicklingError(
                f"settings pickle requests builtins.{name} — refused "
                "(only plain constructors are allowed)"
            )
        if (module, name) in _SAFE_GLOBALS:
            __import__(module)
            return getattr(sys.modules[module], name)
        if root in _REFUSE_ROOTS:
            raise pickle.UnpicklingError(
                f"settings pickle requests {module}.{name} — refused "
                "(not in the exact constructor allowlist; extend "
                "_SAFE_GLOBALS if a legitimate settings file needs it)"
            )
        return _stub_class(module, name)


def _load_triple(fileobj) -> tuple:
    data_model = _SettingsUnpickler(fileobj).load()
    classifier = _SettingsUnpickler(fileobj).load()
    predicates = _SettingsUnpickler(fileobj).load()
    return data_model, classifier, predicates


# -- mapping -----------------------------------------------------------------

# reference variable class name -> engine feature kind (single-column kinds)
_SIMPLE_KINDS = {
    "TextType": "cosine_text",
    "SetType": "cosine_set",
    "PriceType": "price",
    "LatLongType": "latlong",
    "ExactType": "exact",
}
_STRING_TYPES = {"StringType", "ShortStringType", "BaseStringType"}

# CategoricalComparator state keys that may carry the category list
_CATEGORY_KEYS = ("categories", "cat_list", "category_names", "_categories")



def _get(obj, name, default=None):
    """Attribute access that ignores _StubBase's fabricating __getattr__:
    only real (pickled) instance state or class attributes count."""
    try:
        d = object.__getattribute__(obj, "__dict__")
    except AttributeError:
        d = {}
    if name in d:
        return d[name]
    for klass in type(obj).__mro__:
        if name in vars(klass):
            return vars(klass)[name]
    return default


def _comparator_kind(var) -> str:
    comp = _get(var, "comparator")
    cname = getattr(comp, "__name__", None) or type(comp).__name__
    if "CRFEditDistance" in str(cname):
        return "crf_edit"
    return "affine_gap"


def _categories_of(var, overrides: dict | None):
    if overrides and _get(var, "field") in overrides:
        return list(overrides[var.field])
    comp = _get(var, "comparator")
    if comp is not None:
        for k in _CATEGORY_KEYS:
            v = _get(comp, k)
            if isinstance(v, (list, tuple)):
                return list(v)
    raise ConversionError(
        f"cannot recover the category list of Categorical variable "
        f"{_get(var, 'name', '?')!r} from the pickled comparator state; "
        "pass categories={'<field>': [...]} to convert_settings()"
    )


def _predicate_name(p) -> str:
    """Reference-style predicate name string (SimplePredicate.__name__
    format, predicates.py:56-62; compound = '(p1, p2)')."""
    if isinstance(p, tuple):  # CompoundPredicate stub
        return "(%s)" % ", ".join(_predicate_name(q) for q in p)
    n = p.__dict__.get("__name__")
    if n:
        return str(n)
    func = _get(p, "func")
    fname = getattr(func, "__name__", None)
    field = _get(p, "field")
    if fname and field:
        return f"({fname}, {field})"
    thr = p.__dict__.get("threshold")
    if thr is not None and field:
        return f"({type(p).__name__}: ({thr}, {field}))"
    return f"({type(p).__name__}, {field})"


def convert_settings(
    path_or_file, categories: dict | None = None
):
    """Read a reference settings pickle -> engine Model (state/model.py).

    ``categories``: optional {field: [category, ...]} overrides for
    Categorical variables whose comparator state doesn't expose its list.
    """
    from ny_campaign_finance_dedupe_ray.state.model import Feature, Model

    if hasattr(path_or_file, "read"):
        dm, clf, preds = _load_triple(path_or_file)
    else:
        with open(path_or_file, "rb") as f:
            dm, clf, preds = _load_triple(f)

    variables = _get(dm, "_variables")
    primary = _get(dm, "primary_fields")
    derived_start = _get(dm, "_derived_start")
    missing_idx = list(_get(dm, "_missing_field_indices", []) or [])
    inter_idx = list(_get(dm, "_interaction_indices", []) or [])
    if variables is None or primary is None or derived_start is None:
        raise ConversionError(
            "first pickle does not look like a dedupe DataModel "
            "(missing _variables/primary_fields/_derived_start)"
        )

    features: list[Feature] = []        # column-aligned with weights
    extra_features: list[Feature] = []  # weight-0 helpers (chained products)
    col_field: list[str | None] = []    # column index -> source field
    col_factors: list[list[int] | None] = []  # interaction col -> factor cols

    # 1. primary field columns
    col = 0
    for var in primary:
        tname = type(var).__name__
        field = _get(var, "field")
        vname = _get(var, "name", f"({field}: {tname})")
        higher = _get(var, "higher_vars")
        if tname == "ExistsType":
            # CategoricalComparator([0,1]) dummies minus the (0,0) reference
            # level: column 0 = (0,1) exactly-one, column 1 = (1,1) both
            # (variables/exists.py:8-31)
            for kind, hv in zip(("exists_one", "exists_both"), higher):
                features.append(Feature(str(_get(hv, "name")), field, kind))
                col_field.append(field)
                col_factors.append(None)
                col += 1
        elif tname in ("CategoricalType", "FuzzyCategoricalType") or (
            higher is not None and tname not in ("InteractionType",)
        ):
            cats = _categories_of(var, categories)
            for i, hv in enumerate(higher):
                features.append(
                    Feature(
                        str(_get(hv, "name")),
                        field,
                        "categorical_dummy",
                        {"categories": cats, "pair_index": i},
                    )
                )
                col_field.append(field)
                col_factors.append(None)
                col += 1
        elif tname in _STRING_TYPES:
            features.append(Feature(str(vname), field, _comparator_kind(var)))
            col_field.append(field)
            col_factors.append(None)
            col += 1
        elif tname in _SIMPLE_KINDS:
            features.append(Feature(str(vname), field, _SIMPLE_KINDS[tname]))
            col_field.append(field)
            col_factors.append(None)
            col += 1
        elif tname == "CustomType":
            comp = _get(var, "comparator")
            cname = getattr(comp, "__name__", None) or type(comp).__name__
            features.append(Feature(str(vname), field, "custom"))
            col_field.append(field)
            col_factors.append(None)
            col += 1
            print(
                f"note: Custom variable {vname!r} converted; register its "
                f"comparator as register_comparator({str(vname)!r}, "
                f"<{cname}>) before scoring",
                file=sys.stderr,
            )
        else:
            raise ConversionError(
                f"unsupported variable class {tname!r} "
                f"({_get(var, 'name', '?')!r})"
            )
    if col != derived_start:
        raise ConversionError(
            f"primary column count {col} != _derived_start {derived_start}"
        )

    # 2. interaction columns: product of named factor columns.  The engine's
    # interaction kind is binary (field = 'f1*f2'), so n-way products chain
    # through weight-0 helper features (the scorer computes interactions in
    # feature-list order, stages/scoring.py).
    def _chain_product(names: list[str], out_name: str) -> Feature:
        assert len(names) >= 2
        left = names[0]
        for i, nxt in enumerate(names[1:-1], start=1):
            helper = f"{out_name}__chain{i}"
            extra_features.append(
                Feature(helper, f"{left}*{nxt}", "interaction")
            )
            left = helper
        return Feature(out_name, f"{left}*{names[-1]}", "interaction")

    for k, factor_cols in enumerate(inter_idx):
        var = variables[derived_start + k]
        vname = str(_get(var, "name", f"interaction_{k}"))
        names = [features[i].name for i in factor_cols]
        features.append(_chain_product(names, vname))
        col_field.append(None)
        col_factors.append(list(factor_cols))
        col += 1

    # 3. not-missing dummy columns, one per has_missing column in order
    nm_by_field: dict[str, str] = {}

    def _not_missing_feature(field: str, weight_zero: bool) -> str:
        if field in nm_by_field:
            return nm_by_field[field]
        name = f"({field}: Not Missing)"
        f = Feature(name, field, "not_missing")
        (extra_features if weight_zero else features).append(f)
        nm_by_field[field] = name
        return name

    for mi in missing_idx:
        if mi >= len(col_field):
            raise ConversionError(f"missing-field index {mi} out of range")
        src_field = col_field[mi]
        var_name = str(_get(variables[mi], "name", mi))
        if src_field is not None:
            name = f"({var_name}: Not Missing)"
            if src_field in nm_by_field:
                # a second has_missing column over the same field (e.g. two
                # categorical dummies): alias via a weight-carrying duplicate
                features.append(Feature(name, src_field, "not_missing"))
            else:
                features.append(Feature(name, src_field, "not_missing"))
                nm_by_field[src_field] = name
        else:
            # interaction column with has_missing: its reference dummy is
            # the product of the factors' not-missing indicators
            factor_fields = sorted(
                {col_field[c] for c in col_factors[mi] if col_field[c]}
            )
            if not factor_fields:
                raise ConversionError(
                    f"cannot derive not-missing dummy for column {mi}"
                )
            if len(factor_fields) == 1:
                features.append(
                    Feature(
                        f"({var_name}: Not Missing)",
                        factor_fields[0],
                        "not_missing",
                    )
                )
            else:
                nm_names = [
                    _not_missing_feature(f, weight_zero=True)
                    for f in factor_fields
                ]
                features.append(
                    _chain_product(nm_names, f"({var_name}: Not Missing)")
                )

    # 4. classifier weights
    import numpy as np

    weights = _get(clf, "weights")
    bias = _get(clf, "bias")
    if weights is None or isinstance(weights, _StubBase):
        raise ConversionError(
            "classifier pickle has no .weights (expected an "
            "rlr.RegularizedLogisticRegression)"
        )
    weights = np.asarray(weights, dtype=np.float64).ravel().tolist()
    if isinstance(bias, _StubBase) or bias is None:
        bias = 0.0
    bias = float(np.asarray(bias).ravel()[0]) if np.ndim(bias) else float(bias)
    if len(weights) != len(features):
        raise ConversionError(
            f"classifier has {len(weights)} weights but the DataModel "
            f"expands to {len(features)} feature columns"
        )

    all_features = features + extra_features
    all_weights = weights + [0.0] * len(extra_features)

    predicate_names = [_predicate_name(p) for p in preds]

    return Model(
        features=all_features,
        weights=all_weights,
        bias=bias,
        threshold=0.5,
        predicate_names=predicate_names,
    )


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(
            "usage: python tools/convert_settings.py <settings_pickle> "
            "<model_json_out>",
            file=sys.stderr,
        )
        return 2
    model = convert_settings(argv[1])
    model.save(argv[2])
    print(
        f"wrote {argv[2]}: {len(model.features)} features, "
        f"{len(model.predicate_names)} predicates"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
