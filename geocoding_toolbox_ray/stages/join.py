"""General distributed hash join: broadcast or bucketed co-group.

The planner decision every 100 TB pipeline makes, as an explicit
operator: if one side fits the object store it ships ONCE (remote
gather task -> Arrow table ref, joined Arrow-native inside every left
block — zero shuffle, the stages/matcher.py discipline); otherwise BOTH
sides pay exactly one coarse hash-bucket shuffle on the key and the
join runs vectorized (pandas merge) inside each bounded bucket — never
a Ray groupby keyed on the join key itself (Ray aggregate cost scales
with group count, ~0.25 ms/group measured).

Contract: single int64 equi-key, inner / left-outer / full-outer / semi /
anti join (full outer is shuffle-only — a broadcast would emit every
right-unmatched row once per left block)
(semi and anti carry no right-side columns — EXISTS / NOT EXISTS as an
operator, Acero "left semi"/"left anti" on the broadcast path and a
vectorized isin mask on the shuffle path), right side
deduplicated by the caller if multiplicity matters.  Skewed keys: salt the bucket of
hot keys upstream (stages/salt.py) — the bucket key here is a plain
hash so salting composes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import TARGET_BUCKET_ROWS, _lazy_remote, _mix_bucket

#: right side ships whole below this row count (object-store broadcast)
BROADCAST_MAX_ROWS = 2_000_000


@_lazy_remote
def _gather_table_task(refs, columns):
    """Union blocks into ONE Arrow table living in the object store; the
    driver keeps only the ObjectRef (driver-free broadcast pattern)."""
    import ray

    parts = []
    for r in refs:
        blk = ray.get(r)
        t = blk if isinstance(blk, pa.Table) else pa.Table.from_pandas(blk)
        if t.num_rows:
            parts.append(t.select(columns))
    if not parts:
        return None
    return pa.concat_tables(parts).combine_chunks()



def _arrow_type(ds_schema, col: str) -> pa.DataType:
    """Column's Arrow type from a Dataset schema — handles both Arrow
    schemas and PandasBlockSchema (map_groups-produced datasets)."""
    base = getattr(ds_schema, "base_schema", ds_schema)
    if hasattr(base, "field"):
        return base.field(col).type
    return pa.from_numpy_dtype(base.types[base.names.index(col)])


def broadcast_join(
    left,
    right,
    key: str,
    right_cols: list[str],
    how: str = "inner",
    fill: dict | None = None,
):
    """Inner or left-outer join with the (small) right side shipped once.
    Each left block joins via the Arrow (Acero) hash-join kernel —
    zero-copy object-store read per task, no shuffle anywhere.  For
    ``how='left'``, ``fill`` maps right-side columns to the value
    substituted on misses (kept integer-exact via pc.coalesce + cast to
    the source type — no pandas NaN float round-trip)."""
    import ray
    import pyarrow.compute as pc

    arrow_how = {
        "inner": "inner",
        "left": "left outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]
    right = right.materialize()
    refs = [br for bd in right.iter_internal_ref_bundles() for br in bd.block_refs]
    table_ref = _gather_table_task.remote(refs, [key] + right_cols)
    rschema = right.schema()
    rtypes = {c: _arrow_type(rschema, c) for c in [key] + right_cols}

    def _join(t: pa.Table) -> pa.Table:
        rt = ray.get(table_ref)
        if rt is None:
            rt = pa.table({c: pa.array([], rtypes[c]) for c in [key] + right_cols})
        j = t.join(rt, keys=key, join_type=arrow_how)
        if fill:
            for c, v in fill.items():
                typ = rtypes[c]
                j = j.set_column(
                    j.schema.get_field_index(c),
                    c,
                    pc.coalesce(j[c], pa.scalar(v, typ)),
                )
        return j

    return left.map_batches(_join, batch_format="pyarrow")


def shuffle_join(
    left,
    right,
    key: str,
    right_cols: list[str],
    nbuckets: int | None = None,
    approx_rows: int | None = None,
    how: str = "inner",
    fill: dict | None = None,
):
    """Big-big inner or left-outer join: both sides tagged and
    hash-bucketed on the key (one shuffle each), vectorized pandas merge
    inside each bounded bucket.  The union schema carries each side's
    columns nulled on the other side — only the bucket/key columns are
    dense.  For ``how='left'``, misses take ``fill`` values before the
    dtype restore so integer columns never float."""
    if nbuckets is None:
        n = approx_rows if approx_rows is not None else 0
        nbuckets = max(16, n // TARGET_BUCKET_ROWS + 1)

    left_cols = [c for c in left.schema().names if c != key]

    def _tag(side: int, cols: list[str]):
        def _f(t: pa.Table) -> pa.Table:
            k = np.asarray(t[key].to_numpy(zero_copy_only=False), np.int64)
            data = {
                "bucket": pa.array(
                    _mix_bucket(k, np.zeros(len(k), np.int64), nbuckets), pa.int64()
                ),
                "__side": pa.array(np.full(len(k), side, np.int64)),
                key: pa.array(k),
            }
            for c in left_cols:
                data[c] = t[c] if (side == 0 and c in t.schema.names) else pa.nulls(
                    len(k), _arrow_type(left.schema(), c)
                )
            for c in right_cols:
                data[c] = t[c] if (side == 1 and c in t.schema.names) else pa.nulls(
                    len(k), _arrow_type(right.schema(), c)
                )
            return pa.table(data)

        return _f

    tagged = left.map_batches(_tag(0, left_cols), batch_format="pyarrow").union(
        right.map_batches(_tag(1, right_cols), batch_format="pyarrow")
    )

    out_cols = [key] + left_cols + right_cols
    # the union's null padding floats integer columns in pandas blocks;
    # restore each column's source dtype after the (null-free) inner merge
    lt, rt = left.schema(), right.schema()
    dtypes = {key: np.int64}
    for c in left_cols:
        dtypes[c] = _arrow_type(lt, c).to_pandas_dtype()
    for c in right_cols:
        dtypes[c] = _arrow_type(rt, c).to_pandas_dtype()

    if how in ("semi", "anti"):
        out_cols = [key] + left_cols
        dtypes = {c: dtypes[c] for c in out_cols}

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, [key] + left_cols]
        r = g.loc[g["__side"] == 1, [key] + right_cols]
        if how in ("semi", "anti"):
            mask = l[key].isin(r[key].to_numpy())
            m = l[mask] if how == "semi" else l[~mask]
            return m[out_cols].astype(dtypes)
        # pandas spells full outer 'outer'; both sides of every key hash
        # to the same bucket, so per-bucket outer merges compose exactly
        m = l.merge(r, on=key, how="outer" if how == "full" else how)
        if fill:
            m = m.fillna(fill)
        return m[out_cols].astype(dtypes)

    return tagged.groupby("bucket").map_groups(_merge, batch_format="pandas")


def hash_join(
    left,
    right,
    key: str,
    right_cols: list[str],
    strategy: str = "auto",
    right_rows: int | None = None,
    left_rows: int | None = None,
    how: str = "inner",
    fill: dict | None = None,
):
    """Strategy-selecting inner / left-outer equi-join.  ``auto``
    broadcasts when the known right-side row count is under
    BROADCAST_MAX_ROWS, else falls back to the bucketed co-group.  Pass
    ``right_rows`` from parquet metadata so selection never triggers a
    count() execution."""
    if how not in ("inner", "left", "semi", "anti", "full"):
        raise ValueError(f"unknown join type: {how}")
    if how in ("semi", "anti") and right_cols:
        raise ValueError(f"{how} join carries no right-side columns")
    if how == "full":
        # full outer cannot broadcast: each left block joining the whole
        # right table would emit every right-unmatched row once PER BLOCK.
        # Only the bucketed co-group keeps the one-row-per-orphan contract.
        if strategy == "broadcast":
            raise ValueError("full outer join requires the shuffle strategy")
        strategy = "shuffle"
    if strategy == "auto":
        n = right_rows if right_rows is not None else right.count()
        strategy = "broadcast" if n <= BROADCAST_MAX_ROWS else "shuffle"
    if strategy == "broadcast":
        return broadcast_join(left, right, key, right_cols, how=how, fill=fill)
    if strategy == "shuffle":
        return shuffle_join(
            left, right, key, right_cols, approx_rows=left_rows, how=how, fill=fill
        )
    raise ValueError(f"unknown join strategy: {strategy}")
