"""Windowed aggregates over an ordered, partitioned event log.

The reference is fully batch (SURVEY.md §2.10) — these operators extend the
engine for stream-shaped training-data work: the events table is treated as
a keyed log (Ray Data has no watermarks, so late data is simply part of the
batch).

Physical shape (the pairs.py hash-bucket rule): a bare
``groupby(key).map_groups`` dispatches one Python call per key — at millions
of users that per-group dispatch dominates.  Instead:

- tumbling_window: windows need no per-key state at all — a per-batch
  partial aggregate over (key, window_id) followed by one bucketed final
  merge (the partial/combiner shape: the shuffle carries one row per
  (key, window) per batch, not one per event).
- session_window: sessionization needs per-key ts order, so rows are
  hash-bucketed by key and ONE task per bucket sessionizes all its keys in
  a single vectorized pandas pass (sort + shift, no per-key loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import hash64_str


def _key_bucket(t: pa.Table, col: str, n_buckets: int) -> pa.Table:
    c = t.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    h = hash64_str(c.cast(pa.string()))
    return t.append_column(
        "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
    )


def tumbling_window(
    events: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    window_seconds: int = 3600,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per (key, window): count + sum.  Ordering assumption: none — windows
    are computed from absolute timestamps, so the partial aggregates
    combine associatively across batches."""

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        epoch = ts.to_numpy(zero_copy_only=False) // 1_000_000
        win = epoch // window_seconds
        df = pd.DataFrame(
            {
                key_column: t.column(key_column).to_pandas(),
                "window_id": win.astype("int64"),
                "value": t.column(value_column).to_pandas(),
            }
        )
        agg = (
            df.groupby([key_column, "window_id"], sort=False)["value"]
            .agg(n_events="size", sum_value="sum")
            .reset_index()
        )
        return _key_bucket(
            pa.Table.from_pandas(agg, preserve_index=False),
            key_column,
            n_buckets,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby([key_column, "window_id"], sort=False)
            .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def session_window(
    events: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    gap_seconds: int = 1800,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Gap-based sessionization per key: a new session starts where the gap
    to the previous event exceeds ``gap_seconds``.  One task per key-hash
    bucket sessionizes every key in the bucket with a single sort +
    vectorized shift — no per-key dispatch or loop."""

    def sessionize_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key_column: pd.Series([], dtype=object),
                    "session_id": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "start_epoch": pd.Series([], dtype="int64"),
                    "end_epoch": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([key_column, ts_column], kind="mergesort")
        epoch = g[ts_column].astype("datetime64[us]").astype("int64") // 1_000_000
        key = g[key_column]
        new_key = key.ne(key.shift())
        gap = epoch.diff()
        new_session = (new_key | (gap > gap_seconds)).to_numpy()
        sid = np.cumsum(new_session)  # globally increasing session tag
        out = (
            g.assign(_sid=sid, _epoch=epoch.to_numpy())
            .groupby("_sid", sort=False)
            .agg(
                **{
                    key_column: (key_column, "first"),
                    "n_events": ("_epoch", "size"),
                    "start_epoch": ("_epoch", "min"),
                    "end_epoch": ("_epoch", "max"),
                }
            )
            .reset_index(drop=True)
        )
        # per-key 0-based session index in ts order (groups appear in
        # (key, ts) order after the stable sort)
        out["session_id"] = out.groupby(key_column, sort=False).cumcount()
        out["n_events"] = out["n_events"].astype("int64")
        return out[
            [key_column, "session_id", "n_events", "start_epoch", "end_epoch"]
        ]

    return (
        events.map_batches(
            lambda t: _key_bucket(t, key_column, n_buckets),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(sessionize_bucket, batch_format="pandas")
    )


def hopping_window(
    events: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    window_seconds: int = 3600,
    slide_seconds: int = 1800,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Overlapping (hopping) windows: window w covers
    [w*slide, w*slide + size).  Each event lands in ceil(size/slide)
    windows; the flat-map emits its per-(key, window) partials with one
    vectorized repeat — no per-event or per-key Python dispatch — then the
    same bucketed merge as tumbling_window."""
    if slide_seconds <= 0 or window_seconds < slide_seconds:
        raise ValueError("need 0 < slide_seconds <= window_seconds")

    from ..functions.hashing import _ranges

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column(ts_column).cast(pa.timestamp("us")).cast(pa.int64())
        epoch = ts.to_numpy(zero_copy_only=False) // 1_000_000
        wmax = epoch // slide_seconds
        wmin = (epoch - window_seconds) // slide_seconds + 1
        counts = wmax - wmin + 1
        rows = np.repeat(np.arange(len(epoch), dtype=np.int64), counts)
        wids = np.repeat(wmin, counts) + _ranges(counts)
        df = pd.DataFrame(
            {
                key_column: t.column(key_column).to_pandas().to_numpy()[rows],
                "window_id": wids.astype("int64"),
                "value": t.column(value_column).to_pandas().to_numpy()[rows],
            }
        )
        agg = (
            df.groupby([key_column, "window_id"], sort=False)["value"]
            .agg(n_events="size", sum_value="sum")
            .reset_index()
        )
        return _key_bucket(
            pa.Table.from_pandas(agg, preserve_index=False),
            key_column,
            n_buckets,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby([key_column, "window_id"], sort=False)
            .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )
