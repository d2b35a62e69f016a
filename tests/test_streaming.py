"""Incremental keyed-state ingestion: incremental == batch recompute."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_incremental_equals_batch_recompute(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.stages.streaming import run_incremental

    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet", columns=["event_id", "ts", "user_id", "value"])
    got = run_incremental(ev, n_buckets=3, batch_size=97).to_pandas().sort_values("user_id").reset_index(drop=True)

    df = pd.read_parquet(f"{sf}/events.parquet")
    df["cents"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.sort_values("ts")
    expect = (
        df.groupby("user_id")
        .agg(n_events=("event_id", "count"), value_cents=("cents", "sum"),
             last_ts_us=("ts", "max"))
        .reset_index()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert got["user_id"].tolist() == expect["user_id"].tolist()
    assert got["n_events"].tolist() == expect["n_events"].tolist()
    assert got["value_cents"].tolist() == expect["value_cents"].tolist()
    assert got["last_ts_us"].tolist() == expect["last_ts_us"].astype("datetime64[us]").astype(np.int64).tolist()


def test_incremental_state_mid_stream(ray_session):
    """State after feeding half the log equals a recompute over that half."""
    import pyarrow as pa

    from geocoding_toolbox_ray.stages.streaming import IncrementalUserState

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, n),
            "value": rng.uniform(0, 100, n).round(2),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(np.sort(rng.integers(0, 10**6, n)), unit="s"),
        }
    )
    state = IncrementalUserState(n_buckets=2)
    half = n // 2
    for start in range(0, half, 100):
        state.feed_batch(
            pa.Table.from_pandas(df.iloc[start : min(start + 100, half)], preserve_index=False)
        )
    got = state.state_table().to_pandas().sort_values("user_id").reset_index(drop=True)
    fed = df.iloc[:half].copy()
    fed["cents"] = np.floor(fed["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    expect = (
        fed.groupby("user_id").agg(n_events=("value", "count"), value_cents=("cents", "sum")).reset_index()
    )
    assert got["n_events"].tolist() == expect["n_events"].tolist()
    assert got["value_cents"].tolist() == expect["value_cents"].tolist()
