"""Blocking predicate library — fresh implementations matching the behavior
of the reference's stateless predicates
(/root/reference/dedupe_extension/dedupe/dedupe/predicates.py:345-548 and
cpredicates.pyx:3-43), verified against the expected outputs in the
reference's own tests (tests/test_dedupe.py:231-281, tests/test_predicates.py).

Each scalar predicate maps one field value -> an iterable of block-key
strings.  In the engine they run inside a blocking ``map_batches`` flat-map
(stages/blocking.py); the per-row loop is acceptable because fields are short
normalized strings and the web-scale hot path uses the vectorized MinHash/LSH
keys instead (functions/hashing.py).
"""

from __future__ import annotations

import math
import re
import string
from typing import Any, Callable, Iterable, Sequence

_WORDS = re.compile(r"[\w']+").findall
_INTEGERS = re.compile(r"\d+").findall
_START_WORD = re.compile(r"^([\w']+)").match
_START_INTEGER = re.compile(r"^(\d+)").match
_ALPHA_NUMERIC = re.compile(r"(?=\w*\d)[a-zA-Z\d]+").findall
_PUNCTABLE = str.maketrans("", "", string.punctuation)


def strip_punc(s: str) -> str:
    return s.translate(_PUNCTABLE)


def ngrams(field: str, n: int) -> list[str]:
    """All contiguous character n-grams, in order, duplicates kept."""
    return [field[i: i + n] for i in range(len(field) - n + 1)]


def initials(field: str, n: int) -> tuple[str]:
    """First n chars (shorter field returned whole)."""
    return (field[:n],)


# --- whole / token predicates -------------------------------------------------

def whole_field(field: Any) -> tuple[str]:
    return (str(field),)


def token_field(field: str) -> set[str]:
    return set(_WORDS(field))


def first_token(field: str) -> Sequence[str]:
    m = _START_WORD(field)
    return m.groups() if m else ()


def common_integer(field: str) -> set[str]:
    return {str(int(i)) for i in _INTEGERS(field)}


def alpha_numeric(field: str) -> set[str]:
    return set(_ALPHA_NUMERIC(field))


def near_integers(field: str) -> set[str]:
    out: set[str] = set()
    for tok in _INTEGERS(field):
        n = int(tok)
        out.update((str(n - 1), str(n), str(n + 1)))
    return out


def hundred_integer(field: str) -> set[str]:
    return {str(int(i))[:-2] + "00" for i in _INTEGERS(field)}


def hundred_integer_odd(field: str) -> set[str]:
    return {str(int(i))[:-2] + "0" + str(int(i) % 2) for i in _INTEGERS(field)}


def first_integer(field: str) -> Sequence[str]:
    m = _START_INTEGER(field)
    return m.groups() if m else ()


def _ngrams_tokens(seq: Sequence[Any], n: int) -> set[str]:
    return {
        " ".join(str(t) for t in seq[i: i + n])
        for i in range(len(seq) - n + 1)
    }


def common_two_tokens(field: str) -> set[str]:
    return _ngrams_tokens(field.split(), 2)


def common_three_tokens(field: str) -> set[str]:
    return _ngrams_tokens(field.split(), 3)


def fingerprint(field: str) -> tuple[str]:
    return ("".join(sorted(field.split())).strip(),)


def one_gram_fingerprint(field: str) -> tuple[str]:
    return ("".join(sorted(set(field.replace(" ", "")))).strip(),)


def two_gram_fingerprint(field: str) -> tuple[str, ...]:
    if len(field) > 1:
        squashed = field.replace(" ", "")
        return ("".join(sorted(g.strip() for g in set(ngrams(squashed, 2)))),)
    return ()


def common_four_gram(field: str) -> set[str]:
    return set(ngrams(field.replace(" ", ""), 4))


def common_six_gram(field: str) -> set[str]:
    return set(ngrams(field.replace(" ", ""), 6))


def same_three_char_start(field: str) -> tuple[str]:
    return initials(field.replace(" ", ""), 3)


def same_five_char_start(field: str) -> tuple[str]:
    return initials(field.replace(" ", ""), 5)


def same_seven_char_start(field: str) -> tuple[str]:
    return initials(field.replace(" ", ""), 7)


def suffix_array(field: str) -> Iterable[str]:
    """All suffixes of length >= 5 (including the field itself)."""
    n = len(field) - 4
    for i in range(max(0, n)):
        yield field[i:]


def sorted_acronym(field: str) -> tuple[str]:
    return ("".join(sorted(tok[0] for tok in field.split())),)


def double_metaphone(field: str) -> set[str]:
    from .phonetic import doublemetaphone

    return {m for m in doublemetaphone(field) if m}


def metaphone_token(field: str) -> set[str]:
    from .phonetic import doublemetaphone

    out: set[str] = set()
    for token in set(field.split()):
        out.update(m for m in doublemetaphone(token) if m)
    return out


# --- set predicates -----------------------------------------------------------

def whole_set(field_set) -> tuple[str]:
    return (str(field_set),)


def common_set_element(field_set) -> tuple[str, ...]:
    return tuple(str(e) for e in field_set)


def common_two_elements(field_set) -> set[str]:
    return _ngrams_tokens(sorted(field_set), 2)


def common_three_elements(field_set) -> set[str]:
    return _ngrams_tokens(sorted(field_set), 3)


def last_set_element(field_set) -> tuple[str]:
    return (str(max(field_set)),)


def first_set_element(field_set) -> tuple[str]:
    return (str(min(field_set)),)


def magnitude_of_cardinality(field_set) -> Sequence[str]:
    return order_of_magnitude(len(field_set))


# --- numeric / geo ------------------------------------------------------------

def lat_long_grid(field, digits: int = 1) -> Sequence[str]:
    if any(field):
        return (str([round(dim, digits) for dim in field]),)
    return ()


def order_of_magnitude(field) -> Sequence[str]:
    if field > 0:
        return (str(int(round(math.log10(field)))),)
    return ()


def round_to_1(field) -> tuple[str]:
    a = abs(field)
    order = int(math.floor(math.log10(a)))
    rounded = round(a, -order)
    return (str(int(math.copysign(rounded, field))),)


def exists(field) -> tuple[str]:
    return ("1",) if field else ("0",)


# --- vectorized kernels -------------------------------------------------------
#
# Arrow-kernel equivalents for the single-key predicates on the blocking hot
# path (stages/blocking.py): one call per BATCH instead of one Python
# dispatch per row.  Each returns a string array aligned with the input;
# null means "no key for this row".  Parity with the scalar functions is
# asserted in tests/test_predicates.py.

# string.punctuation is exactly ASCII 33-47, 58-64, 91-96, 123-126
_PUNCT_CLASS = r"[!-/:-@\[-`{-~]"


# Python str.split() whitespace = RE2 \s (ASCII) + Unicode separators \p{Z}
# + the control whitespace FS/GS/RS/US (1C-1F) and NEL (85)
_WS_CLASS = r"[\s\p{Z}\x{1c}-\x{1f}\x{85}]+"


def _vec_preprocess(col: "pa.Array") -> "pa.Array":
    """Vectorized StringPredicate preprocess:
    ' '.join(strip_punc(value).split())."""
    import pyarrow.compute as pc

    out = pc.replace_substring_regex(col, pattern=_PUNCT_CLASS, replacement="")
    out = pc.replace_substring_regex(out, pattern=_WS_CLASS, replacement=" ")
    # trim must match str.split()'s notion of whitespace too
    out = pc.replace_substring_regex(out, pattern=r"^ | $", replacement="")
    return out


def _vec_regex_first(pattern: str):
    def kern(col):
        import pyarrow.compute as pc

        m = pc.extract_regex(col, pattern=pattern)
        return pc.struct_field(m, "k")

    return kern


def _vec_initials(n: int):
    def kern(col):
        import pyarrow.compute as pc

        return pc.utf8_slice_codeunits(
            pc.replace_substring(col, " ", ""), 0, n
        )

    return kern


def _vec_sorted_acronym(col):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    firsts = pc.utf8_slice_codeunits(pc.list_flatten(toks), 0, 1).to_numpy(
        zero_copy_only=False
    )
    offs = toks.offsets.to_numpy(zero_copy_only=False)
    return pa.array(
        ["".join(sorted(firsts[s:e])) for s, e in zip(offs[:-1], offs[1:])],
        pa.string(),
    )


def _vec_whole_field(col):
    return col


def _flatten_rows(col_list) -> tuple:
    """ListArray -> (parent row indices, flat values) as numpy/pa."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col_list, pa.ChunkedArray):
        col_list = col_list.combine_chunks()
    offsets = col_list.offsets.to_numpy(zero_copy_only=False)
    lens = np.diff(offsets)
    rows = np.repeat(np.arange(len(col_list), dtype=np.int64), lens)
    return rows, col_list.values


def _dedup_per_row(rows, vals) -> tuple:
    """Per-row distinct (row, value) pairs via one lexsort (vals: numpy
    object array of strings)."""
    import numpy as np

    if len(rows) == 0:
        return rows, vals
    order = np.lexsort((vals, rows))
    sr, sv = rows[order], vals[order]
    uniq = np.empty(len(sr), dtype=bool)
    uniq[0] = True
    uniq[1:] = (sr[1:] != sr[:-1]) | (sv[1:] != sv[:-1])
    return sr[uniq], sv[uniq]


def _vec_token_field(col):
    """set(_WORDS(field)) — split on the \\w' complement, drop empties,
    per-row distinct."""
    import numpy as np
    import pyarrow.compute as pc

    toks = pc.split_pattern_regex(col, pattern=r"[^\p{L}\p{N}_']+")
    rows, flat = _flatten_rows(toks)
    vals = flat.to_numpy(zero_copy_only=False)
    keep = np.array([bool(v) for v in vals], dtype=bool)
    return _dedup_per_row(rows[keep], vals[keep])


def _vec_common_integer(col):
    """{str(int(x)) for x in \\d+ findall} — split on non-digits, strip
    leading zeros ('000' -> '0'), per-row distinct.  Bails to the scalar
    path on any non-ascii batch: str(int(x)) transliterates unicode digits
    to ascii, which ltrim cannot reproduce."""
    import numpy as np
    import pyarrow.compute as pc

    non_ascii = pc.any(
        pc.match_substring_regex(col, pattern=r"[^\x00-\x7F]")
    ).as_py()
    if non_ascii:
        return None
    toks = pc.split_pattern_regex(col, pattern=r"\P{Nd}+")
    rows, flat = _flatten_rows(toks)
    trimmed = pc.utf8_ltrim(flat, characters="0")
    vals = trimmed.to_numpy(zero_copy_only=False)
    raw = flat.to_numpy(zero_copy_only=False)
    keep = np.array([bool(r) for r in raw], dtype=bool)
    # all-zero tokens trim to '' -> canonical '0'
    vals = np.where([v == "" for v in vals], "0", vals)
    return _dedup_per_row(rows[keep], np.asarray(vals, dtype=object)[keep])


def _vec_token_ngrams(n: int):
    """_ngrams_tokens(field.split(), n): split on str.split() whitespace,
    drop empties, join n adjacent tokens with ' ', per-row distinct."""

    def kern(col):
        import numpy as np
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(col, pattern=_WS_CLASS)
        rows, flat = _flatten_rows(toks)
        vals = flat.to_numpy(zero_copy_only=False)
        keep = np.array([bool(v) for v in vals], dtype=bool)
        rows, vals = rows[keep], np.asarray(vals, dtype=object)[keep]
        if len(rows) < n:
            return rows[:0], vals[:0]
        # adjacent n-token windows entirely within one row
        ok = rows[: len(rows) - n + 1] == rows[n - 1:]
        grams = vals[: len(vals) - n + 1].copy()
        for j in range(1, n):
            grams = grams + " "
            grams = grams + vals[j: len(vals) - n + 1 + j]
        return _dedup_per_row(rows[: len(rows) - n + 1][ok], grams[ok])

    return kern


# set-valued predicates: name -> kernel(col) -> (row_indices, key_values)
VECTOR_MULTI_KERNELS: dict = {
    "token_field": _vec_token_field,
    "common_integer": _vec_common_integer,
    "common_two_tokens": _vec_token_ngrams(2),
    "common_three_tokens": _vec_token_ngrams(3),
}


# RE2 \p{L}\p{N}_ tracks Python's unicode \w for normalized profile text
VECTOR_KERNELS: dict = {
    "whole_field": _vec_whole_field,
    "first_token": _vec_regex_first(r"^(?P<k>[\p{L}\p{N}_']+)"),
    # \p{Nd} == Python re's unicode \d (decimal digits), unlike RE2's ASCII \d
    "first_integer": _vec_regex_first(r"^(?P<k>\p{Nd}+)"),
    "same_three_char_start": _vec_initials(3),
    "same_five_char_start": _vec_initials(5),
    "same_seven_char_start": _vec_initials(7),
    "sorted_acronym": _vec_sorted_acronym,
}


# --- wrappers -----------------------------------------------------------------

class FieldPredicate:
    """(func, field) applied to a record dict; null/empty -> no keys
    (SimplePredicate semantics, predicates.py:56-73)."""

    preprocess = False

    def __init__(self, func: Callable, field: str, name: str | None = None):
        self.func = func
        self.field = field
        self.name = name or f"({func.__name__}, {field})"

    def __repr__(self) -> str:
        return self.name

    def keys(self, value) -> Iterable[str]:
        if not value:
            return ()
        if self.preprocess:
            value = " ".join(strip_punc(value).split())
        return self.func(value)

    def __call__(self, record: dict) -> Iterable[str]:
        return self.keys(record.get(self.field))

    def vector_keys(self, batch) -> "pa.Array | None":
        """Batch-vectorized keys: string array aligned with the batch, null
        where the row emits no key.  None when this predicate has no Arrow
        kernel (callers fall back to the per-row path)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        kern = VECTOR_KERNELS.get(self.func.__name__)
        if kern is None or self.field not in batch.column_names:
            return None
        col = batch.column(self.field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.string())
        # raw-falsy values emit no keys (keys() checks BEFORE preprocess)
        no_key = pc.or_kleene(pc.is_null(col), pc.equal(col, ""))
        s = _vec_preprocess(col) if self.preprocess else col
        keys = kern(s)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return pc.if_else(no_key, pa.scalar(None, pa.string()), keys)

    def vector_multi_keys(self, batch):
        """Batch-vectorized SET-valued keys: (row_indices, key_values) with
        per-row duplicates removed, or None when no kernel applies (callers
        fall back to the per-row path).  Raw-falsy rows emit nothing."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        kern = VECTOR_MULTI_KERNELS.get(self.func.__name__)
        if kern is None or self.field not in batch.column_names:
            return None
        col = batch.column(self.field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.string())
        no_key = pc.or_kleene(
            pc.is_null(col), pc.equal(col, "")
        ).to_numpy(zero_copy_only=False)
        no_key = np.nan_to_num(no_key.astype(np.float64)).astype(bool)
        s = _vec_preprocess(col.fill_null("")) if self.preprocess else col.fill_null("")
        out = kern(s)
        if out is None:
            return None
        rows, vals = out
        keep = ~no_key[rows]
        return rows[keep], vals[keep]


class StringPredicate(FieldPredicate):
    """Punctuation-stripped, whitespace-collapsed variant
    (predicates.py:76-91)."""

    preprocess = True


class ExistsPredicate(FieldPredicate):
    """Presence predicate: '1'/'0' — emitted even for missing/falsy values
    (reference predicates.py:94-118 has NO falsy guard, unlike
    SimplePredicate; a generic FieldPredicate(exists, f) would wrongly
    emit nothing for null fields)."""

    def __init__(self, field: str, name: str | None = None):
        super().__init__(exists, field, name or f"(Exists, {field})")

    def keys(self, value) -> Iterable[str]:
        return exists(value)

    def vector_keys(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        if self.field not in batch.column_names:
            return None
        col = batch.column(self.field)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
            # numeric truthiness (0 -> '0') diverges from string casts
            return None
        truthy = pc.and_kleene(pc.is_valid(col), pc.not_equal(col, ""))
        truthy = pc.fill_null(truthy, False)
        return pc.if_else(truthy, pa.scalar("1"), pa.scalar("0"))


class CompoundPredicate:
    """Tuple of predicates; emits the cartesian product of member keys joined
    with ':' and member ':' escaped as '\\:' (predicates.py:325-342)."""

    def __init__(self, *predicates: FieldPredicate):
        self.predicates = predicates
        self.name = "(%s)" % ", ".join(p.name for p in predicates)

    def __repr__(self) -> str:
        return self.name

    def __call__(self, record: dict) -> list[str]:
        import itertools

        member_keys = [list(p(record)) for p in self.predicates]
        return [
            ":".join(k.replace(":", "\\:") for k in combo)
            for combo in itertools.product(*member_keys)
        ]

    def vector_keys(self, batch) -> "pa.Array | None":
        """Vectorized when every member is: members each emit <= 1 key, so
        the cartesian product is an element-wise ':' join (null — i.e. no
        key from any member — nulls the compound, matching the empty
        product)."""
        import pyarrow.compute as pc

        parts = []
        for p in self.predicates:
            k = p.vector_keys(batch)
            if k is None:
                return None
            parts.append(pc.replace_substring(k, ":", "\\:"))
        out = parts[0]
        for nxt in parts[1:]:
            out = pc.binary_join_element_wise(out, nxt, ":")
        return out


# Registry of scalar string predicates by reference-style name, for model
# artifacts that name their predicate set (api.py:1084-1086 analogue).
REGISTRY: dict[str, Callable] = {
    "wholeFieldPredicate": whole_field,
    "tokenFieldPredicate": token_field,
    "firstTokenPredicate": first_token,
    "commonIntegerPredicate": common_integer,
    "alphaNumericPredicate": alpha_numeric,
    "nearIntegersPredicate": near_integers,
    "hundredIntegerPredicate": hundred_integer,
    "hundredIntegersOddPredicate": hundred_integer_odd,
    "firstIntegerPredicate": first_integer,
    "commonTwoTokens": common_two_tokens,
    "commonThreeTokens": common_three_tokens,
    "fingerprint": fingerprint,
    "oneGramFingerprint": one_gram_fingerprint,
    "twoGramFingerprint": two_gram_fingerprint,
    "commonFourGram": common_four_gram,
    "commonSixGram": common_six_gram,
    "sameThreeCharStartPredicate": same_three_char_start,
    "sameFiveCharStartPredicate": same_five_char_start,
    "sameSevenCharStartPredicate": same_seven_char_start,
    "suffixArrayPredicate": lambda f: tuple(suffix_array(f)),
    "sortedAcronym": sorted_acronym,
    "doubleMetaphone": double_metaphone,
    "metaphoneToken": metaphone_token,
    "wholeSetPredicate": whole_set,
    "commonSetElementPredicate": common_set_element,
    "commonTwoElementsPredicate": common_two_elements,
    "commonThreeElementsPredicate": common_three_elements,
    "lastSetElementPredicate": last_set_element,
    "firstSetElementPredicate": first_set_element,
    "magnitudeOfCardinality": magnitude_of_cardinality,
    "latLongGridPredicate": lat_long_grid,
    "orderOfMagnitude": order_of_magnitude,
    "roundTo1": round_to_1,
    "existsPredicate": exists,
}
