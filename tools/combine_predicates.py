"""Merge predicate sets from two trained model artifacts by index.

Reference: matching_evaluation/combine_predicates.py:12-30 — take settings
file 1, append the predicate tuples at the given indexes from settings
file 2, write a combined settings file.  Here both inputs may be engine
Model JSONs or reference settings pickles (pickles are converted on the
fly via tools/convert_settings, no dedupe/rlr install needed); the output
is always a Model JSON whose ``predicate_names`` carries the combined set
(feature spec/weights/threshold stay those of the FIRST model, exactly as
the reference keeps deduper 1's data_model and classifier).

Usage:
    python tools/combine_predicates.py first.json second.json 0,2 out.json
"""

from __future__ import annotations

import sys

import os as _os

# runnable as a script: put the repo root on sys.path
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

from ny_campaign_finance_dedupe_ray.state.model import Model


def load_model_any(path: str) -> Model:
    """Model JSON or reference settings pickle, sniffed by content."""
    with open(path, "rb") as f:
        head = f.read(2)
    if head.startswith(b"\x80"):  # pickle protocol 2+ opcode
        from tools.convert_settings import convert_settings

        return convert_settings(path)
    return Model.load(path)


def combine_predicates(
    first: Model, second: Model, indexes: list[int]
) -> Model:
    """First model with ``second.predicate_names[i]`` appended per index
    (duplicates allowed, matching the reference's plain list append)."""
    names = list(first.predicate_names)
    for i in indexes:
        names.append(second.predicate_names[int(i)])
    return Model(
        features=first.features,
        weights=first.weights,
        bias=first.bias,
        threshold=first.threshold,
        predicate_names=names,
    )


def main(argv: list[str]) -> int:
    if len(argv) != 5:
        print(
            "usage: python tools/combine_predicates.py <first_model> "
            "<second_model> <comma-separated indexes> <out_json>",
            file=sys.stderr,
        )
        return 2
    first = load_model_any(argv[1])
    second = load_model_any(argv[2])
    indexes = [int(x) for x in argv[3].split(",") if x != ""]
    combined = combine_predicates(first, second, indexes)
    combined.save(argv[4])
    print(
        f"wrote {argv[4]}: {len(first.predicate_names)} + {len(indexes)} "
        f"predicates = {len(combined.predicate_names)}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
