"""Generic hash-join stage (stages/join.py): strategy equivalence,
multiplicity semantics, auto selection."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from geocoding_toolbox_ray.stages.join import broadcast_join, hash_join, shuffle_join


def _ds(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(table)


def _fixture():
    left = pa.table(
        {
            "k": pa.array([1, 2, 2, 3, 5], pa.int64()),
            "lv": pa.array([10, 20, 21, 30, 50], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([2, 3, 3, 4], pa.int64()),
            "rv": pa.array([200, 300, 301, 400], pa.int64()),
        }
    )
    return left, right


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["k", "lv", "rv"]]
    return df.sort_values(["k", "lv", "rv"]).reset_index(drop=True)


def _expected() -> pd.DataFrame:
    left, right = _fixture()
    return _norm(left.to_pandas().merge(right.to_pandas(), on="k", how="inner"))


def test_broadcast_and_shuffle_agree(ray_session):
    """Inner-join multiplicity (2x2 key matches expand to 4 rows) and
    unmatched-key drops, identical across strategies."""
    left, right = _fixture()
    exp = _expected()
    b = _norm(broadcast_join(_ds(left), _ds(right), "k", ["rv"]).to_pandas())
    s = _norm(shuffle_join(_ds(left), _ds(right), "k", ["rv"]).to_pandas())
    assert b.equals(exp)
    assert s.equals(exp)
    # multiplicity: k=2 matches 2 left x 1 right = 2 rows,
    # k=3 matches 1 left x 2 right = 2 rows, k=5/k=4 drop
    assert len(exp) == 4
    assert (exp["k"].value_counts().sort_index() == pd.Series({2: 2, 3: 2})).all()


def test_auto_strategy_selects_broadcast_under_threshold(ray_session):
    left, right = _fixture()
    out = hash_join(_ds(left), _ds(right), "k", ["rv"], strategy="auto", right_rows=4)
    assert _norm(out.to_pandas()).equals(_expected())


def test_shuffle_join_many_buckets(ray_session):
    """Bucket count larger than the key space must not lose or duplicate
    rows (each key lands in exactly one bucket on both sides)."""
    rng = np.random.RandomState(3)
    lk = rng.randint(0, 50, 500).astype(np.int64)
    rk = rng.randint(0, 50, 80).astype(np.int64)
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(500, dtype=np.int64))})
    right = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(80, dtype=np.int64))})
    out = shuffle_join(_ds(left), _ds(right), "k", ["rv"], nbuckets=97).to_pandas()
    exp = left.to_pandas().merge(right.to_pandas(), on="k", how="inner")
    assert len(out) == len(exp)
    a = out.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    b = exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    assert a.equals(b)
