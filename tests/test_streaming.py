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


def test_watermark_drops_planted_late_rows(ray_session):
    """A row arriving (by arrival order) with ts far older than the
    user's max-seen ts must be counted late and excluded from kept
    aggregates; slightly-old rows inside the lateness bound are kept."""
    import ray.data as rd

    from geocoding_toolbox_ray.stages.streaming import run_incremental_watermark

    base = pd.Timestamp("2024-01-01")
    hours = {0: 0, 1: 24, 2: 23.5, 3: 20, 15: 48}
    # arrival_key reverses 16-blocks: event_ids 0..15 ARRIVE as 15..0.
    # user 7: event 15 arrives FIRST (ts 48h, kept, watermark 48h);
    # events 3/2/1/0 then all trail 48h - 1h -> late.
    rows = []
    for eid, h in hours.items():
        rows.append(
            {
                "event_id": eid,
                "user_id": 7,
                "ts": base + pd.Timedelta(hours=h),
                "value": 1.0,
            }
        )
    # user 8: two rows 30 min apart, reversed arrival -> still kept
    rows.append({"event_id": 4, "user_id": 8, "ts": base + pd.Timedelta(minutes=30), "value": 2.0})
    rows.append({"event_id": 5, "user_id": 8, "ts": base, "value": 3.0})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (
        run_incremental_watermark(ds, n_buckets=2)
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    # user 7 arrival order by eid: 15, 3, 2, 1, 0 -> first kept (48h),
    # 20h late, 23.5h late, 24h late, 0h late
    assert out.loc[7, "n_kept"] == 1
    assert out.loc[7, "n_late"] == 4
    assert out.loc[7, "kept_cents"] == 100
    # user 8 arrival order: eid 5 (ts 0) then eid 4 (ts +30min)?  16-block
    # reversal maps 4 -> 11 and 5 -> 10, so eid 5 arrives first; both kept
    # (30 min < 1h lateness)
    assert out.loc[8, "n_kept"] == 2
    assert out.loc[8, "n_late"] == 0
    assert out.loc[8, "kept_cents"] == 500


def test_events_resample_ffill_semantics(ray_session):
    """Gap rows exist (n=0), carry the previous hour's value, and every
    user's grid is hour-dense from first to last event."""
    from geocoding_toolbox_ray import queries

    df = (
        queries.events_resample_ffill("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["user_id", "hour"])
        .reset_index(drop=True)
    )
    assert (df["n"] == 0).any()  # real gaps in the fixture
    for uid, g in df.groupby("user_id"):
        hours = g["hour"].to_numpy()
        assert (np.diff(hours) == np.timedelta64(1, "h")).all(), uid
        # forward fill: value on an n=0 row equals the previous row's value
        vals = g["last_cents"].to_numpy()
        zero = g["n"].to_numpy() == 0
        idx = np.nonzero(zero)[0]
        idx = idx[idx > 0]
        assert (vals[idx] == vals[idx - 1]).all(), uid
