"""Delimited-text sources with explicit schemas, bad-line filtering, and a
reject sink — the reference's fixed-format loaders re-expressed on Ray Data:

- positional CSV with caller-supplied column names
  (/root/reference/data_load/fix_all_reports.py:16-60 renames 45 positional
  columns; all_txt_to_csv.py:11-42 scrapes names from layout docs)
- bad-line filter: rows with the wrong delimiter count, pathological
  quoting, or a '('-prefix are split into a reject dataset
  (fix_all_reports.py:62-83)
- value truncation and regex date-trimming projections
  (all_txt_to_csv.py truncates OFFICE/DISTRICT; fix_all_reports trims
  dates to 10 chars)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def read_positional_csv(
    paths: str | list[str],
    column_names: list[str],
    delimiter: str = ",",
    **read_kwargs,
) -> "ray.data.Dataset":
    """CSV without a header row; columns named positionally by the caller."""
    from pyarrow import csv as pacsv

    return ray.data.read_csv(
        paths,
        read_options=pacsv.ReadOptions(column_names=column_names),
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
        **read_kwargs,
    )


def split_bad_lines(
    paths: str | list[str],
    n_fields: int,
    delimiter: str = ",",
    reject_prefixes: tuple[str, ...] = ("(",),
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Raw text lines -> (valid_lines, rejected_lines) datasets.

    A line is rejected when its delimiter count is not n_fields-1, it has an
    odd number of double quotes, or it starts with a reject prefix — the
    fix_all_reports.py:62-83 rules generalized."""
    lines = ray.data.read_text(paths)

    def classify(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        n_delim = pc.count_substring(txt, delimiter)
        n_quote = pc.count_substring(txt, '"')
        ok = pc.equal(n_delim, n_fields - 1)
        ok = pc.and_(ok, pc.equal(pc.bit_wise_and(n_quote, 1), 0))
        for p in reject_prefixes:
            ok = pc.and_(ok, pc.invert(pc.starts_with(txt, p)))
        return pa.table({"text": txt, "ok": ok})

    tagged = lines.map_batches(classify, batch_format="pyarrow")

    def keep(flag: bool):
        def _f(t: pa.Table) -> pa.Table:
            mask = t.column("ok")
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            if not flag:
                mask = pc.invert(mask)
            return t.filter(mask).drop_columns(["ok"])

        return _f

    valid = tagged.map_batches(keep(True), batch_format="pyarrow")
    rejected = tagged.map_batches(keep(False), batch_format="pyarrow")
    return valid, rejected


def truncate_columns(
    ds: "ray.data.Dataset", limits: dict[str, int]
) -> "ray.data.Dataset":
    """Truncate string columns to max lengths (layout-doc field limits)."""

    def trunc(t: pa.Table) -> pa.Table:
        for col, n in limits.items():
            if col in t.column_names:
                c = t.column(col)
                t = t.drop_columns([col]).append_column(
                    col, pc.utf8_slice_codeunits(c, 0, n)
                )
        return t

    return ds.map_batches(trunc, batch_format="pyarrow")


def trim_date_columns(
    ds: "ray.data.Dataset", columns: list[str], length: int = 10
) -> "ray.data.Dataset":
    """Trim date strings to their first ``length`` chars
    ('2024-01-02T...' -> '2024-01-02', the fix_all_reports regex trim)."""
    return truncate_columns(ds, {c: length for c in columns})
