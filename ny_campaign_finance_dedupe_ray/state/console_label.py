"""Terminal labeling loop over a LabelLoop — the reference's
``console_label`` surface (/root/reference/dedupe_extension/dedupe/dedupe/
convenience.py:15-109) on top of the offline committee learner.

Same interaction contract: records of the uncertain pair print per field,
running match/distinct counts show, responses are (y)es / (n)o / (u)nsure /
(f)inished / (p)revious, a one-deep buffer lets 'p' revisit the previous
decision before it is committed, and buffered labels flush through
``LabelLoop.mark`` (which refits the logistic weights and re-learns the
blocking rules each time, the reference's mark_pairs + retrain behavior).

``input_fn`` / ``output`` are injectable so the loop is testable without a
TTY; default is stdin/stderr like the reference.
"""

from __future__ import annotations

import sys
from typing import Callable

from .label_loop import LabelLoop


def console_label(
    loop: LabelLoop,
    fields: list[str] | None = None,
    input_fn: Callable[[], str] = input,
    output=None,
    max_pairs: int | None = None,
) -> None:
    out = sys.stderr if output is None else output
    if fields is None:
        fields = sorted(
            {f.field for f in loop.features if "*" not in f.field}
        )

    def show(pair: tuple) -> None:
        for rid in pair:
            rec = loop.records.get(rid, {})
            for fld in fields:
                print(f"{fld} : {rec.get(fld)}", file=out)
            print(file=out)

    n_match = n_distinct = 0
    buffer: list[tuple[tuple, str]] = []  # one-deep previous-ops buffer
    pending: list[tuple] = []
    labeled = 0
    finished = use_previous = False

    def flush(entry: tuple[tuple, str]) -> None:
        nonlocal n_match, n_distinct
        pair, label = entry
        if label == "match":
            loop.mark([pair], [True])
            n_match += 1
        elif label == "distinct":
            loop.mark([pair], [False])
            n_distinct += 1

    while not finished:
        if use_previous:
            pair, _ = buffer.pop(0)
            use_previous = False
        else:
            if not pending:
                pending = loop.uncertain_pairs(n=10)
            if not pending:
                break
            pair = pending.pop()

        show(pair)
        nm = n_match + sum(lbl == "match" for _, lbl in buffer)
        nd = n_distinct + sum(lbl == "distinct" for _, lbl in buffer)
        print(f"{nm}/10 positive, {nd}/10 negative", file=out)
        print("Do these records refer to the same thing?", file=out)

        while True:
            if buffer:
                prompt = "(y)es / (n)o / (u)nsure / (f)inished / (p)revious"
                valid = {"y", "n", "u", "f", "p"}
            else:
                prompt = "(y)es / (n)o / (u)nsure / (f)inished"
                valid = {"y", "n", "u", "f"}
            print(prompt, file=out)
            resp = input_fn()
            if resp in valid:
                break

        if resp == "y":
            buffer.insert(0, (pair, "match"))
        elif resp == "n":
            buffer.insert(0, (pair, "distinct"))
        elif resp == "u":
            buffer.insert(0, (pair, "uncertain"))
        elif resp == "f":
            print("Finished labeling", file=out)
            finished = True
        elif resp == "p":
            use_previous = True
            pending.append(pair)

        while len(buffer) > 1:
            flush(buffer.pop())
        # only real dispositions consume the budget: (p)revious revisits
        # the prior pair and (f)inished ends the session — counting them
        # could hit the cap right after a 'p' and silently commit the very
        # label the user asked to revise
        if resp in ("y", "n", "u"):
            labeled += 1
        if max_pairs is not None and labeled >= max_pairs:
            finished = True

    for entry in buffer:
        flush(entry)
