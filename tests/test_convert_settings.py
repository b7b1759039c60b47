"""tools/convert_settings: reference settings pickle -> Model JSON.

The fixture pickle is generated with the REFERENCE's object layout
(dedupe/api.py:1084-1086: DataModel, classifier, predicates pickled in
sequence; datamodel.py:20-37 column order) by installing stub modules under
the reference import paths — the converter itself must unpickle WITHOUT any
of those packages importable."""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from tools.convert_settings import ConversionError, convert_settings

WEIGHTS = [1.1, -2.2, 0.7, 3.0, 0.25, -0.4, 0.9, 0.15, -1.3]
BIAS = -3.75


def _mk(cls, **attrs):
    obj = object.__new__(cls)
    obj.__dict__.update(attrs)
    return obj


@pytest.fixture()
def settings_file(tmp_path):
    """Build a reference-layout settings pickle: 4 string fields (3 with
    'has missing'), one 2-way interaction (itself has_missing), classifier
    weights, and a predicate tuple with a compound."""
    created = []

    def mod(name):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        sys.modules[name] = m
        created.append(name)
        return m

    try:
        dd = mod("dedupe")
        dm_mod = mod("dedupe.datamodel")
        var_base = mod("dedupe.variables.base")
        var_str = mod("dedupe.variables.string")
        var_inter = mod("dedupe.variables.interaction")
        preds_mod = mod("dedupe.predicates")
        ag_mod = mod("affinegap")
        rlr_mod = mod("rlr.lr")
        mod("dedupe.variables")
        mod("rlr")

        class DataModel:
            pass

        DataModel.__module__ = "dedupe.datamodel"
        DataModel.__qualname__ = "DataModel"
        dm_mod.DataModel = DataModel

        def _var_cls(name, module, m):
            c = type(name, (), {"__module__": module})
            setattr(m, name, c)
            return c

        StringType = _var_cls("StringType", "dedupe.variables.string", var_str)
        ShortStringType = _var_cls(
            "ShortStringType", "dedupe.variables.string", var_str
        )
        InteractionType = _var_cls(
            "InteractionType", "dedupe.variables.interaction", var_inter
        )
        MissingDataType = _var_cls(
            "MissingDataType", "dedupe.variables.base", var_base
        )

        def normalizedAffineGapDistance(a, b):  # pickled by reference only
            raise NotImplementedError

        normalizedAffineGapDistance.__module__ = "affinegap"
        normalizedAffineGapDistance.__qualname__ = "normalizedAffineGapDistance"
        ag_mod.normalizedAffineGapDistance = normalizedAffineGapDistance

        class RegularizedLogisticRegression:
            pass

        RegularizedLogisticRegression.__module__ = "rlr.lr"
        RegularizedLogisticRegression.__qualname__ = "RegularizedLogisticRegression"
        rlr_mod.RegularizedLogisticRegression = RegularizedLogisticRegression

        class SimplePredicate:
            pass

        class StringPredicate(SimplePredicate):
            pass

        class CompoundPredicate(tuple):
            pass

        for c in (SimplePredicate, StringPredicate, CompoundPredicate):
            c.__module__ = "dedupe.predicates"
            c.__qualname__ = c.__name__
            setattr(preds_mod, c.__name__, c)

        def _pred_fn(name):
            def f(v):
                raise NotImplementedError

            f.__module__ = "dedupe.predicates"
            f.__qualname__ = f.__name__ = name
            setattr(preds_mod, name, f)
            return f

        whole = _pred_fn("wholeFieldPredicate")
        first_tok = _pred_fn("firstTokenPredicate")

        def var(cls, field, has_missing):
            return _mk(
                cls,
                field=field,
                name=f"({field}: {cls.__name__.replace('Type', '')})",
                has_missing=has_missing,
                predicates=[],
                comparator=normalizedAffineGapDistance,
            )

        v_name = var(StringType, "name", False)
        v_street = var(StringType, "street", True)
        v_city = var(StringType, "city", True)
        v_zip = var(ShortStringType, "zip", True)
        inter = _mk(
            InteractionType,
            name="(Interaction: ['(name: String)', '(street: String)'])",
            has_missing=True,
            interactions=["(name: String)", "(street: String)"],
            interaction_fields=["(name: String)", "(street: String)"],
        )
        primary = [v_name, v_street, v_city, v_zip]
        variables = [v_name, v_street, v_city, v_zip, inter] + [
            _mk(MissingDataType, name=f"({v.name}: Not Missing)",
                has_missing=False)
            for v in (v_street, v_city, v_zip, inter)
        ]
        dm = _mk(
            DataModel,
            primary_fields=primary,
            _derived_start=4,
            _variables=variables,
            _missing_field_indices=[1, 2, 3, 4],
            _interaction_indices=[[0, 1]],
        )
        clf = _mk(
            RegularizedLogisticRegression,
            alpha=0.1,
            weights=np.array(WEIGHTS, dtype="f4"),
            bias=BIAS,
        )
        p1 = _mk(SimplePredicate, func=whole, field="zip",
                 __name__="(wholeFieldPredicate, zip)")
        p2 = _mk(StringPredicate, func=first_tok, field="name",
                 __name__="(firstTokenPredicate, name)")
        compound = CompoundPredicate((p1, p2))
        preds = (p1, compound)

        path = tmp_path / "settings_fixture"
        with open(path, "wb") as f:
            pickle.dump(dm, f)
            pickle.dump(clf, f)
            pickle.dump(preds, f)
        yield str(path)
    finally:
        for name in created:
            sys.modules.pop(name, None)


def test_convert_settings_feature_spec(settings_file):
    m = convert_settings(settings_file)
    # reference modules must NOT be importable during conversion
    assert "dedupe" not in sys.modules or not hasattr(
        sys.modules.get("dedupe"), "__file__"
    )
    kinds = [(f.kind, f.field) for f in m.features[:4]]
    assert kinds == [
        ("affine_gap", "name"),
        ("affine_gap", "street"),
        ("affine_gap", "city"),
        ("affine_gap", "zip"),
    ]
    # column 4: the interaction of the two primary features
    inter = m.features[4]
    assert inter.kind == "interaction"
    assert inter.field == "(name: String)*(street: String)"
    # columns 5-7: not-missing dummies for street/city/zip
    assert [(f.kind, f.field) for f in m.features[5:8]] == [
        ("not_missing", "street"),
        ("not_missing", "city"),
        ("not_missing", "zip"),
    ]
    # column 8: interaction missing dummy = product of factor not-missings
    nm_inter = m.features[8]
    assert nm_inter.kind == "interaction"
    # weight alignment: first 9 = classifier weights, helpers get 0.0
    assert np.allclose(m.weights[:9], np.array(WEIGHTS, dtype="f4"))
    assert all(w == 0.0 for w in m.weights[9:])
    assert m.bias == pytest.approx(BIAS)
    assert m.predicate_names == [
        "(wholeFieldPredicate, zip)",
        "((wholeFieldPredicate, zip), (firstTokenPredicate, name))",
    ]
    # round-trips through the JSON artifact
    from ny_campaign_finance_dedupe_ray.state.model import Model

    assert Model.from_json(m.to_json()) == m


def test_converted_model_scores_like_reference(settings_file):
    """End-to-end parity: PairScorer features over the converted model equal
    a hand-computed reference matrix (datamodel.py:80-115 rules: NaN for
    missing, interactions pre-zero-fill, zero-fill, 1-isnan dummies)."""
    from ny_campaign_finance_dedupe_ray.functions.affinegap import (
        normalized_affine_gap_distance,
    )
    from ny_campaign_finance_dedupe_ray.stages.scoring import PairScorer

    m = convert_settings(settings_file)
    rows = [
        # (name_a, name_b, street_a, street_b, city_a, city_b, zip_a, zip_b)
        ("mary smith", "mary smyth", "1 main st", "1 main street",
         "albany", "albany", "10001", "10001"),
        ("bob jones", "robert jones", None, "2 oak ave", "troy", None,
         "12180", "12180"),
        ("carol wu", "carol wu", None, None, None, None, None, "99999"),
    ]
    batch = pa.table({
        "id_a": pa.array([f"a{i}" for i in range(len(rows))]),
        "id_b": pa.array([f"b{i}" for i in range(len(rows))]),
        **{
            f"{f}_{s}": pa.array(
                [r[2 * j + (0 if s == 'a' else 1)] for r in rows], pa.string()
            )
            for j, f in enumerate(("name", "street", "city", "zip"))
            for s in ("a", "b")
        },
    })

    def ag(a, b):
        if a is None or b is None or a == "" or b == "":
            return np.nan
        return normalized_affine_gap_distance(a, b)

    X = np.zeros((len(rows), 9))
    for i, (na, nb, sa, sb, ca, cb, za, zb) in enumerate(rows):
        prim = [ag(na, nb), ag(sa, sb), ag(ca, cb), ag(za, zb)]
        inter = prim[0] * prim[1]  # NaN propagates pre-zero-fill
        cols = prim + [inter]
        nm = [0.0 if np.isnan(c) else 1.0 for c in cols[1:]]
        X[i] = [0.0 if np.isnan(c) else c for c in cols] + nm

    want = 1.0 / (1.0 + np.exp(-(X @ np.array(WEIGHTS, dtype="f4") + BIAS)))

    scorer = PairScorer(model=m, min_score=-1.0)
    got = scorer(batch).to_pandas().set_index("id_a")["score"]
    for i in range(len(rows)):
        assert got[f"a{i}"] == pytest.approx(want[i], abs=1e-6)


def test_combine_predicates(tmp_path, settings_file):
    """tools/combine_predicates: first model's spec + selected predicates of
    the second (reference matching_evaluation/combine_predicates.py:12-30);
    accepts a reference settings pickle as either input."""
    import subprocess
    import sys as _sys

    from ny_campaign_finance_dedupe_ray.state.model import Model
    from tools.combine_predicates import combine_predicates, load_model_any

    m1 = Model(
        features=[], weights=[], bias=0.0,
        predicate_names=["(a, f1)", "(b, f2)"],
    )
    m2 = Model(
        features=[], weights=[], bias=0.0,
        predicate_names=["(c, g1)", "(d, g2)", "(e, g3)"],
    )
    out = combine_predicates(m1, m2, [2, 0])
    assert out.predicate_names == ["(a, f1)", "(b, f2)", "(e, g3)", "(c, g1)"]
    assert out.features == m1.features and out.bias == m1.bias

    # pickle input path: combine the fixture settings with itself via CLI
    p1 = tmp_path / "m1.json"
    m1.save(str(p1))
    out_path = tmp_path / "comb.json"
    r = subprocess.run(
        [_sys.executable, "tools/combine_predicates.py", str(p1),
         settings_file, "1", str(out_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    comb = Model.load(str(out_path))
    assert comb.predicate_names == [
        "(a, f1)", "(b, f2)",
        "((wholeFieldPredicate, zip), (firstTokenPredicate, name))",
    ]
    assert load_model_any(str(out_path)).predicate_names == comb.predicate_names


def test_unpickler_refuses_dangerous_builtins(tmp_path):
    """A malicious settings pickle requesting builtins.eval must be
    refused, not executed."""
    import pickle

    import pytest

    from tools.convert_settings import _SettingsUnpickler

    class Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').getcwd()",))

    path = tmp_path / "evil.pickle"
    with open(path, "wb") as f:
        pickle.dump(Evil(), f)
    with open(path, "rb") as f:
        with pytest.raises(pickle.UnpicklingError, match="refused"):
            _SettingsUnpickler(f).load()

    # plain containers still unpickle
    blob = pickle.dumps({"a": {1, 2}, "b": (1.5, b"x")})
    import io
    assert _SettingsUnpickler(io.BytesIO(blob)).load()["a"] == {1, 2}


def test_unpickler_refuses_numpy_gadgets():
    """The allowlist is exact (module, name) pairs, not a numpy.* prefix:
    importable shell/eval gadgets inside numpy (distutils exec_command,
    f2py.compile, numpy.load with allow_pickle) must be refused."""
    import io
    import pickle
    import pickletools  # noqa: F401  (documentational)

    import pytest

    from tools.convert_settings import _SettingsUnpickler

    def global_pickle(module: str, name: str) -> bytes:
        # hand-build GLOBAL module name; REDUCE-free so the refusal is
        # the find_class gate itself, not a downstream call failure
        mod, nm = module.encode(), name.encode()
        return b"\x80\x02c" + mod + b"\n" + nm + b"\n."

    for module, name in [
        ("numpy.distutils.exec_command", "exec_command"),
        ("numpy.f2py", "compile"),
        ("numpy.lib.npyio", "load"),
        ("numpy", "load"),
        ("numpy.testing", "assert_equal"),
        ("functools", "reduce"),
        ("collections.abc", "Callable"),
    ]:
        with pytest.raises(pickle.UnpicklingError, match="refused"):
            _SettingsUnpickler(io.BytesIO(global_pickle(module, name))).load()

    # the real constructors numpy pickles need still resolve
    import numpy as np

    arr = np.arange(5, dtype=np.float64)
    out = _SettingsUnpickler(io.BytesIO(pickle.dumps(arr))).load()
    assert (out == arr).all() and out.dtype == np.float64
    sc = _SettingsUnpickler(io.BytesIO(pickle.dumps(np.float32(2.5)))).load()
    assert sc == np.float32(2.5)


def test_unpickler_getattr_surrogate():
    """copyreg method reduces (GLOBAL builtins.getattr + REDUCE over a
    stubbed receiver — the reference registers reduce_method for
    types.MethodType, datamodel.py:228) must unpickle into an inert stub
    marker; getattr over any NON-stub receiver stays refused."""
    import io
    import pickle

    import pytest

    from tools.convert_settings import _SettingsUnpickler, _stub_getattr

    # hand-built reference-shaped stream:
    #   getattr(dedupe.variables.string.Thing(), 'compare')
    # GLOBAL builtins getattr; GLOBAL Thing; EMPTY_TUPLE NEWOBJ (-> stub
    # instance); unicode 'compare'; TUPLE2; REDUCE
    raw = (
        b"\x80\x02cbuiltins\ngetattr\n"
        b"cdedupe.variables.string\nThing\n)\x81"
        b"X\x07\x00\x00\x00compare\x86R."
    )
    out = _SettingsUnpickler(io.BytesIO(raw)).load()
    # the stub's __getattr__ fabricated an inert attribute marker
    assert out.__dict__["_attr_of"] == ("Thing", "compare")

    # real (pickled) stub state is served before fabrication
    from tools.convert_settings import _stub_class

    inst = _stub_class("dedupe.x", "Y")()
    inst.__dict__["weights"] = [1.0]
    assert _stub_getattr(inst, "weights") == [1.0]
    # absent attrs on a stub fabricate a marker (never raise mid-unpickle)
    marker = _stub_getattr(inst, "absent")
    assert marker.__dict__["_attr_of"] == ("Y", "absent")

    # non-stub receivers: refused (getattr must not become a lookup gadget)
    for receiver in ({"a": 1}, object(), [], "s", int):
        with pytest.raises(pickle.UnpicklingError, match="non-stub"):
            _stub_getattr(receiver, "anything")
