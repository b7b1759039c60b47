"""Predicate correctness against the reference's documented expected outputs
(/root/reference/dedupe_extension/dedupe/tests/test_dedupe.py:231-281 and
tests/test_predicates.py:6-60)."""

from __future__ import annotations

from ny_campaign_finance_dedupe_ray.functions import predicates as P


FIELD = "123 16th st"


def test_reference_expected_keys():
    assert P.sorted_acronym(FIELD) == ("11s",)
    assert P.whole_field(FIELD) == ("123 16th st",)
    assert P.first_token(FIELD) == ("123",)
    assert P.first_token("") == ()
    assert P.first_token("123/") == ("123",)
    assert P.token_field(" ") == set()
    assert P.token_field(FIELD) == {"123", "16th", "st"}
    assert P.common_integer(FIELD) == {"123", "16"}
    assert P.common_integer("foo") == set()
    assert P.first_integer("foo") == ()
    assert P.first_integer("1foo") == ("1",)
    assert P.first_integer("f1oo") == ()
    assert P.same_three_char_start(FIELD) == ("123",)
    assert P.same_three_char_start("12") == ("12",)
    assert P.common_four_gram("12") == set()
    assert P.same_five_char_start(FIELD) == ("12316",)
    assert P.same_seven_char_start(FIELD) == ("12316th",)
    assert P.near_integers(FIELD) == {"15", "17", "16", "122", "123", "124"}
    assert P.common_four_gram(FIELD) == {
        "1231", "2316", "316t", "16th", "6ths", "thst"
    }
    assert P.common_six_gram(FIELD) == {"12316t", "2316th", "316ths", "16thst"}
    assert P.initials(FIELD, 12) == ("123 16th st",)
    assert P.initials(FIELD, 7) == ("123 16t",)
    assert P.ngrams(FIELD, 3) == [
        "123", "23 ", "3 1", " 16", "16t", "6th", "th ", "h s", " st"
    ]
    assert P.common_two_elements((1, 2, 3)) == {"1 2", "2 3"}
    assert P.common_two_elements((1,)) == set()
    assert P.common_three_elements((1, 2, 3)) == {"1 2 3"}
    assert P.common_three_elements((1,)) == set()
    assert P.fingerprint("time sandwich") == ("sandwichtime",)
    assert P.one_gram_fingerprint("sandwich time") == ("acdehimnstw",)
    assert P.two_gram_fingerprint("sandwich time") == (
        "anchdwhticimmendsatiwi",
    )
    assert P.two_gram_fingerprint("1") == ()
    assert P.common_two_tokens("foo bar") == {"foo bar"}
    assert P.common_two_tokens("foo") == set()


def test_numeric_and_set_predicates():
    assert P.hundred_integer(FIELD) == {"100", "00"}
    assert P.order_of_magnitude(250) == ("2",)
    assert P.order_of_magnitude(0) == ()
    assert P.round_to_1(1234) == ("1000",)
    assert P.round_to_1(-567) == ("-600",)
    s = {"red", "blue", "green"}
    assert P.whole_set(s) == (str(s),)
    assert set(P.common_set_element(s)) == {"red", "blue", "green"}
    assert P.last_set_element(s) == ("red",)
    assert P.first_set_element(s) == ("blue",)
    assert P.magnitude_of_cardinality(s) == ("0",)
    assert P.magnitude_of_cardinality(()) == ()
    assert P.lat_long_grid((42.33, -5.44)) == ("[42.3, -5.4]",)
    assert P.lat_long_grid((0, 0)) == ()
    assert P.suffix_array("abcde") is not None
    assert list(P.suffix_array("abcdef")) == ["abcdef", "bcdef"]
    assert list(P.suffix_array("abcd")) == []


def test_string_predicate_punctuation_equivalence():
    # StringPredicate strips punctuation first (reference test_predicates.py:7-12)
    s1 = P.StringPredicate(P.same_seven_char_start, "foo")
    assert s1({"foo": "fo,18v*1vaad80"}) == s1({"foo": "fo18v1vaad80"})
    # null / empty -> no keys
    assert s1({"foo": None}) == ()
    assert s1({"foo": ""}) == ()


def test_metaphone_token():
    # reference tests/test_predicates.py:19-22
    assert P.metaphone_token("9301 S. State St. ".strip()) == {"STT", "S", "ST"}


def test_double_metaphone_basics():
    from ny_campaign_finance_dedupe_ray.functions.phonetic import doublemetaphone

    assert doublemetaphone("smith")[0] == "SM0"
    assert doublemetaphone("schmidt")[0] == "XMT"
    assert doublemetaphone("")[0] == ""
    p, s = doublemetaphone("jones")
    assert p.startswith("JNS") or p.startswith("ANS")


def test_compound_predicate_product_and_escaping():
    p1 = P.StringPredicate(P.first_token, "name")
    p2 = P.StringPredicate(P.same_three_char_start, "city")
    cp = P.CompoundPredicate(p1, p2)
    rec = {"name": "mary smith", "city": "albany"}
    assert cp(rec) == ["mary:alb"]
    # ':' in member keys must be escaped
    pw = P.FieldPredicate(P.whole_field, "x")
    cp2 = P.CompoundPredicate(pw, pw)
    assert cp2({"x": "a:b"}) == ["a\\:b:a\\:b"]
    # one empty member key set -> no compound keys
    assert cp({"name": "", "city": "albany"}) == []


def test_exists_predicate():
    assert P.exists("x") == ("1",)
    assert P.exists(None) == ("0",)
    assert P.exists("") == ("0",)


def test_vector_keys_parity():
    # Arrow-kernel predicate path must agree with the scalar per-row path
    # on messy values (punctuation, multi-space, empties, null, unicode).
    import pyarrow as pa

    from ny_campaign_finance_dedupe_ray.functions import predicates as P

    values = [
        "mary smith", "  o'brien,  jr. ", "123 main st", "9th ave",
        "", None, "!!!", "josé garcía", "a", "x:y z",
    ]
    batch = pa.table({"f": pa.array(values, pa.string())})
    preds = [
        P.StringPredicate(P.first_token, "f"),
        P.StringPredicate(P.first_integer, "f"),
        P.StringPredicate(P.same_three_char_start, "f"),
        P.StringPredicate(P.same_five_char_start, "f"),
        P.StringPredicate(P.sorted_acronym, "f"),
        P.FieldPredicate(P.whole_field, "f"),
        P.CompoundPredicate(
            P.StringPredicate(P.first_token, "f"),
            P.StringPredicate(P.same_three_char_start, "f"),
        ),
    ]
    for pred in preds:
        vk = pred.vector_keys(batch)
        assert vk is not None, pred.name
        got = vk.to_pylist()
        for i, v in enumerate(values):
            exp = list(pred({"f": v}))
            assert len(exp) <= 1
            assert got[i] == (exp[0] if exp else None), (pred.name, v, got[i], exp)

    # a predicate without a kernel falls back (returns None)
    assert P.StringPredicate(P.token_field, "f").vector_keys(batch) is None


def test_vector_multi_keys_parity():
    # set-valued kernels (token_field, common_integer) must match the
    # scalar path as per-row SETS.
    import pyarrow as pa

    from ny_campaign_finance_dedupe_ray.functions import predicates as P

    values = [
        "mary smith smith", "12 main st apt 007", "", None, "!!!",
        "a b a c", "0 00 000 7", "x123y45 123",
    ]
    batch = pa.table({"f": pa.array(values, pa.string())})
    for pred in (
        P.StringPredicate(P.token_field, "f"),
        P.StringPredicate(P.common_integer, "f"),
        P.FieldPredicate(P.common_integer, "f"),
    ):
        mk = pred.vector_multi_keys(batch)
        assert mk is not None, pred.name
        rows, vals = mk
        got: dict[int, set] = {}
        for r, v in zip(rows, vals):
            got.setdefault(int(r), set()).add(v)
        for i, v in enumerate(values):
            exp = set(pred({"f": v}))
            assert got.get(i, set()) == exp, (pred.name, v, got.get(i), exp)

    # unicode digits force the scalar fallback for common_integer
    ub = pa.table({"f": pa.array(["٠٧ and 3"], pa.string())})
    assert P.StringPredicate(P.common_integer, "f").vector_multi_keys(ub) is None


def test_vector_token_ngrams_parity():
    import pyarrow as pa

    from ny_campaign_finance_dedupe_ray.functions import predicates as P

    values = ["mary smith jones lee", "a b", "one", "", None, "  x  y  z  "]
    batch = pa.table({"f": pa.array(values, pa.string())})
    for pred in (
        P.StringPredicate(P.common_two_tokens, "f"),
        P.FieldPredicate(P.common_two_tokens, "f"),
        P.StringPredicate(P.common_three_tokens, "f"),
    ):
        rows, kv = pred.vector_multi_keys(batch)
        got: dict[int, set] = {}
        for r, v in zip(rows, kv):
            got.setdefault(int(r), set()).add(v)
        for i, v in enumerate(values):
            assert got.get(i, set()) == set(pred({"f": v})), (pred.name, v)


def test_exists_predicate_emits_for_missing():
    # reference ExistsPredicate has no falsy guard: missing -> '0'
    import pyarrow as pa

    from ny_campaign_finance_dedupe_ray.functions import predicates as P

    p = P.ExistsPredicate("f")
    assert list(p({"f": "x"})) == ["1"]
    assert list(p({"f": ""})) == ["0"]
    assert list(p({"f": None})) == ["0"]
    batch = pa.table({"f": pa.array(["x", "", None], pa.string())})
    assert p.vector_keys(batch).to_pylist() == ["1", "0", "0"]
    # numeric columns fall back (string-cast truthiness would diverge)
    nb = pa.table({"f": pa.array([0, 1], pa.int64())})
    assert p.vector_keys(nb) is None
    assert list(p({"f": 0})) == ["0"] and list(p({"f": 1})) == ["1"]
