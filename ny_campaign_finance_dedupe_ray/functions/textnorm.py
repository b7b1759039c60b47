"""Vectorized text normalizers (pyarrow.compute kernels, zero-copy batches).

Mirrors the reference normalizer semantics:
- LOWER(TRIM(x)), '' -> NULL        (/root/reference/data_load/init_postgres_db.py:110-121,187-199)
- punctuation strip + whitespace collapse for blocking
  (/root/reference/dedupe_extension/dedupe/dedupe/predicates.py:27-28,80)
- street-abbreviation synonym groups (/root/reference/data_load/clean_donors.py:52-91)
- period stripper (clean_donors.py:94-100)
- org-name abbreviation expansion (clean_donors.py:102-111)

All functions are ChunkedArray/Array -> Array and stateless, so they run
inside ``map_batches(batch_format='pyarrow')`` without per-batch setup.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Synonym groups: canonical -> abbreviations (subset used for normalization;
# every variant maps to the canonical long form, word-boundary matched).
STREET_SYNONYMS: dict[str, list[str]] = {
    "street": ["st", "str"],
    "avenue": ["ave", "av"],
    "boulevard": ["blvd", "boul"],
    "drive": ["dr", "drv"],
    "lane": ["ln"],
    "road": ["rd"],
    "place": ["pl"],
    "court": ["ct", "crt"],
    "circle": ["cir"],
    "terrace": ["ter", "terr"],
    "parkway": ["pkwy", "pky"],
    "highway": ["hwy"],
    "square": ["sq"],
    "apartment": ["apt"],
    "suite": ["ste"],
    "floor": ["fl", "flr"],
    "east": ["e"],
    "west": ["w"],
    "north": ["n"],
    "south": ["s"],
    "po box": ["p o box", "p.o. box", "pob", "po bx"],
}

ORG_EXPANSIONS: dict[str, str] = {
    "nyc": "new york city",
    "nys": "new york state",
    "ny": "new york",
}


def lower_trim_null(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """LOWER(TRIM(x)) with '' -> NULL (init_postgres_db.py:187-199)."""
    x = pc.utf8_trim_whitespace(pc.utf8_lower(arr))
    return pc.if_else(pc.equal(x, ""), pa.scalar(None, pa.string()), x)


def strip_punctuation(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Remove everything but word chars and spaces, collapse whitespace,
    trim — the StringPredicate pre-processing (predicates.py:76-91)."""
    x = pc.replace_substring_regex(arr, r"[^\w\s]", "")
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def strip_periods(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Remove '.' (clean_donors.py:94-100)."""
    return pc.replace_substring(arr, ".", "")


def normalize_street(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Expand street abbreviations to canonical long forms with word-boundary
    regex replaces (clean_donors.py:52-91). Input should already be lowered."""
    x = arr
    for canon, abbrevs in STREET_SYNONYMS.items():
        alts = "|".join(sorted(map(_re_escape, abbrevs), key=len, reverse=True))
        x = pc.replace_substring_regex(x, r"\b(?:%s)\.?\b" % alts, canon)
    return x


def expand_org_abbrevs(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """nyc/nys/ny -> long forms for org names (clean_donors.py:102-111).
    Ordered longest-first so 'nyc' wins over 'ny'."""
    x = arr
    for ab in sorted(ORG_EXPANSIONS, key=len, reverse=True):
        x = pc.replace_substring_regex(x, r"\b%s\b" % ab, ORG_EXPANSIONS[ab])
    return x


def collapse_ws_lower(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """CSV preProcess analogue: collapse spaces/newlines, strip quotes,
    lower, '' -> NULL (reference tests/exampleIO.py:5-11)."""
    x = pc.replace_substring_regex(arr, r"\s+", " ")
    x = pc.replace_substring_regex(x, "\"", "")
    return lower_trim_null(x)


def name_coalesce(
    corp: pa.Array, first: pa.Array, middle: pa.Array, last: pa.Array
) -> pa.Array:
    """corp if person names null else 'first middle last', lowered
    (init_postgres_db.py:480-483)."""
    person = pc.binary_join_element_wise(
        pc.coalesce(first, ""), pc.coalesce(middle, ""), pc.coalesce(last, ""),
        " ",
    )
    person = pc.replace_substring_regex(person, r"\s+", " ")
    person = pc.utf8_trim_whitespace(person)
    both_null = pc.and_(pc.is_null(first), pc.is_null(last))
    return lower_trim_null(pc.if_else(both_null, corp, person))


def _re_escape(s: str) -> str:
    import re

    return re.escape(s)


# Contributor-type coder: the 13-branch CASE mapping
# (init_postgres_db.py:122-147); NULL -> 'CORP', unknown -> 'UNK'.
CONTRIBUTOR_TYPE_CODES: dict[str, str] = {
    "Candidate/Canditate Spouse": "CAN",
    "Individual": "IND",
    "Unitemized": "UNITEM",
    "Partnership, including LLPs": "PART",
    "Candidate Family Member": "FAM",
    "Political Committee": "PAC",
    "Political Action Committee (PAC)": "PAC",
    "Committee": "COM",
    "Other": "OTHER",
    "Sole Proprietorship": "CORP",
    "Corporation": "CORP",
}

PERSON_TYPES = ("IND", "FAM")  # person flag source (init_postgres_db.py:487)


def map_codes(
    arr: pa.Array | pa.ChunkedArray,
    mapping: dict[str, str],
    null_code: str,
    unknown_code: str,
) -> pa.Array:
    """Dictionary-style CASE mapping via index_in lookup (vectorized)."""
    keys = pa.array(list(mapping.keys()), pa.string())
    vals = list(mapping.values())
    idx = pc.index_in(arr, value_set=keys)
    # build result: unknown -> unknown_code, null input -> null_code
    out = pc.if_else(
        pc.is_valid(idx),
        pc.take(pa.array(vals + [None], pa.string()), pc.fill_null(idx, len(vals))),
        pa.scalar(unknown_code, pa.string()),
    )
    return pc.if_else(pc.is_null(arr), pa.scalar(null_code, pa.string()), out)


def contributor_type_code(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    return map_codes(arr, CONTRIBUTOR_TYPE_CODES, null_code="CORP", unknown_code="UNK")


def person_flag(type_codes: pa.Array | pa.ChunkedArray) -> pa.Array:
    """type in {IND, FAM} -> 1 else 0 (init_postgres_db.py:487)."""
    return pc.is_in(type_codes, value_set=pa.array(PERSON_TYPES)).cast(pa.int32())


def parse_date(arr: pa.Array | pa.ChunkedArray, fmt: str = "%Y-%m-%d") -> pa.Array:
    """TO_DATE(TRIM(x), fmt) (init_postgres_db.py:214-227)."""
    return pc.strptime(pc.utf8_trim_whitespace(arr), format=fmt, unit="us")


def build_uuid(*parts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """concat(part1, '-', part2, ...) (init_postgres_db.py:224)."""
    casted = [pc.cast(p, pa.string()) for p in parts]
    return pc.binary_join_element_wise(*casted, "-")


# --- page-text field parsing (synthetic profile layout, FIXTURES.md §1) ---

_FIELD_NAMES = ["name", "street", "city", "state", "zip"]


def parse_profile_fields(text: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Split 'name | street | city | state | zip | filler' into normalized
    field columns, fully vectorized (split + list_element)."""
    parts = pc.split_pattern(text, " | ")
    out: dict[str, pa.Array] = {}
    n = pc.list_value_length(parts)
    for i, fname in enumerate(_FIELD_NAMES):
        ok = pc.greater(n, i)
        # list_element raises on short lists; guard by replacing short rows
        safe = pc.if_else(ok, parts, pa.scalar(["", "", "", "", ""], pa.list_(pa.string())))
        v = pc.list_element(safe, i)
        v = lower_trim_null(strip_punctuation(v))
        if fname == "street":
            v = normalize_street(v)
        out[fname] = pc.if_else(ok, v, pa.scalar(None, pa.string()))
    return out


def typo_variants(word: str) -> list[str]:
    """Candidate misspellings of ``word`` for data-exploration queries —
    behavior-matching the reference's typo word-list diagnostic
    (/root/reference/data_load/clean_donors.py:6-27): the word itself,
    prefix truncations recombined with consonant-skeleton tails, and every
    adjacent transposition.  Duplicates preserved, order identical."""
    out = [word]
    consonants = word
    for vowel in "aeiou":
        consonants = consonants.replace(vowel, "")
    for i in range(1, 8):
        if i > 3:
            out.append(word[0:i])
            out.append(word[0:i] + consonants[-2:] + word[-1])
        if i > 2:
            out.append(word[0:i] + consonants[-1])
            out.append(word[0:i] + consonants[-2:])
            out.append(word[0] + consonants[0:i])
            out.append(word[0] + consonants[1:i])
        out.append(word[0:i] + consonants[-3:-1] + word[-1])
    for i in range(len(word) - 1):
        switched = list(word)
        switched[i] = word[i + 1]
        switched[i + 1] = word[i]
        out.append("".join(switched))
    return out
