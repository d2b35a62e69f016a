"""Unit pins for the round-4 analytics-wave kernels (independent of the
oracle parity tests): vectorized segmented pair generation vs itertools,
and segment-lifted running-max records vs a per-group Python reference."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


def test_segment_pairs_matches_itertools():
    from geocoding_toolbox_ray.queries import _segment_pairs

    rng = np.random.RandomState(7)
    for trial in range(20):
        counts = rng.randint(0, 6, size=rng.randint(1, 8)).astype(np.int64)
        counts = counts[counts > 0] if trial % 3 else counts  # keep some zeros
        n = int(counts.sum())
        vals = rng.randint(0, 100, size=n).astype(np.int64)
        a, b = _segment_pairs(vals, counts)
        got = sorted(zip(a.tolist(), b.tolist()))
        starts = np.cumsum(counts) - counts
        want = sorted(
            (i, j)
            for s, c in zip(starts, counts)
            for i, j in itertools.combinations(range(int(s), int(s + c)), 2)
        )
        assert got == want, (counts, got, want)


def test_record_highs_reference(ray_session, tmp_path):
    """Engine record-high rows == a per-customer Python loop reference on
    a fixture with ties, decreasing runs, and same-date tiebreaks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geocoding_toolbox_ray.queries import orders_record_highs

    rows = [
        # (orderkey, custkey, totalprice, orderdate)
        (1, 1, 10.00, "2020-01-01"),
        (2, 1, 10.00, "2020-01-02"),   # tie with record -> NOT a record
        (3, 1, 12.50, "2020-01-03"),   # record
        (4, 1, 11.00, "2020-01-04"),
        (5, 2, 5.00, "2020-01-01"),
        (6, 2, 4.00, "2020-01-02"),
        (7, 2, 6.00, "2020-01-02"),    # same date, higher orderkey, record
        (8, 3, 1.00, "2020-03-01"),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["O"] * len(rows)),
            "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
            "o_orderdate": pa.array(
                [np.datetime64(r[3], "us") for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "orders.parquet")
    got = (
        orders_record_highs(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")["o_orderkey"]
        .tolist()
    )
    # reference loop
    want = []
    best: dict[int, float] = {}
    for ok, ck, price, _d in rows:  # rows already in (date, orderkey) order per cust
        cents = int(np.floor(price * 100 + 0.5))
        if ck not in best or cents > best[ck]:
            want.append(ok)
            best[ck] = max(best.get(ck, -1), cents)
        best[ck] = max(best[ck], cents)
    assert got == sorted(want)


def test_hull_points_diameter_vs_bruteforce():
    """Quad-pruned monotone-chain hull: max pairwise distance over hull
    vertices == brute-force over all points, incl. collinear/duplicate
    degenerate cases."""
    from geocoding_toolbox_ray.queries import _hull_points

    rng = np.random.RandomState(11)
    cases = [
        (np.array([3], dtype=np.int64), np.array([4], dtype=np.int64)),
        (np.array([0, 1, 2, 3, 3, 0], dtype=np.int64), np.array([0, 1, 2, 3, 3, 0], dtype=np.int64)),
        (np.array([5, 5, 5, 5], dtype=np.int64), np.array([1, 9, 3, 9], dtype=np.int64)),
    ]
    for _ in range(60):
        n = rng.randint(1, 80)
        cases.append(
            (rng.randint(0, 40, n).astype(np.int64), rng.randint(0, 40, n).astype(np.int64))
        )
    for x, y in cases:
        hx, hy = _hull_points(x, y)
        d2h = ((hx[:, None] - hx[None, :]) ** 2 + (hy[:, None] - hy[None, :]) ** 2).max()
        d2b = ((x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2).max()
        assert d2h == d2b
