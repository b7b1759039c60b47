"""Windowed aggregates over an ordered, partitioned event log.

The reference is fully batch (SURVEY.md §2.10) — these operators extend the
engine for stream-shaped training-data work: the events table is treated as
a keyed log; windows are computed per key inside ``map_groups`` over
ts-sorted groups (the Ray-idiomatic shape for event-time windows; Ray Data
has no watermarks, so late data is simply part of the batch).

- tumbling_window: fixed-size windows per key (SQL-expressible:
  GROUP BY key, epoch(ts)/size).
- session_window: gap-based sessions per key (SQL-expressible with window
  functions: a session increments where ts - lag(ts) > gap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def tumbling_window(
    events: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    value_column: str = "value",
    window_seconds: int = 3600,
) -> "ray.data.Dataset":
    """Per (key, window): count + sum + min/max ts.  Ordering assumption:
    none needed — windows are computed from absolute timestamps."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_column].astype("datetime64[us]")
        epoch = ts.astype("int64") // 1_000_000
        win = (epoch // window_seconds).astype("int64")
        out = (
            g.assign(window_id=win)
            .groupby("window_id")
            .agg(
                n_events=(value_column, "size"),
                sum_value=(value_column, "sum"),
            )
            .reset_index()
        )
        out.insert(0, key_column, g[key_column].iloc[0])
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return events.groupby(key_column).map_groups(per_key, batch_format="pandas")


def session_window(
    events: "ray.data.Dataset",
    key_column: str = "user_id",
    ts_column: str = "ts",
    gap_seconds: int = 1800,
) -> "ray.data.Dataset":
    """Gap-based sessionization per key: a new session starts where the gap
    to the previous event exceeds ``gap_seconds``.  Ordering assumption:
    events are sorted by ts WITHIN each key group before sessionizing (done
    here inside the group task)."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_column)
        ts = g[ts_column].astype("datetime64[us]")
        epoch = ts.astype("int64") // 1_000_000
        gaps = epoch.diff().fillna(0)
        session = (gaps > gap_seconds).cumsum().astype("int64")
        out = (
            g.assign(session_id=session, _epoch=epoch)
            .groupby("session_id")
            .agg(
                n_events=(ts_column, "size"),
                start_epoch=("_epoch", "min"),
                end_epoch=("_epoch", "max"),
            )
            .reset_index()
        )
        out.insert(0, key_column, g[key_column].iloc[0])
        return out

    return events.groupby(key_column).map_groups(per_key, batch_format="pandas")
