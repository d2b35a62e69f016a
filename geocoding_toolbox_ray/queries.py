"""Driver-facing Ray Data query callables (the ``queries()`` registry).

Each function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table whose column names AND dtypes match the corresponding
``oracle.py`` SQL exactly.  Ray is initialised by the caller; nothing here
calls ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import PipelineConfig
from .functions.cleanse import cleanse_street_arrow, cleanse_zone_arrow
from .pipelines.candidates import derive_candidates
from .pipelines.geocode import geocode_candidates


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ------------------------------------------------------------- geocoding

def geocode_orders(sf_dir: str):
    """Flagship oracle-checked pipeline: orders -> derived candidates ->
    cleanse/standardize/match -> 11-column reference output."""
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    cands = orders.map_batches(derive_candidates, batch_format="pyarrow")
    return geocode_candidates(cands, PipelineConfig())


def counters_report(sf_dir: str) -> pd.DataFrame:
    """Run counters (reference geocode.py:136-163) as a 1-row table."""
    from ray.data.aggregate import Count, Sum

    out = geocode_orders(sf_dir)
    out = out.map_batches(
        lambda t: pa.table(
            {
                "matched": pa.array(
                    np.asarray(pa.compute.is_null(t["message"]).to_numpy(zero_copy_only=False), np.int64)
                ),
                "score": t["score"],
            }
        ),
        batch_format="pyarrow",
    )
    agg = out.aggregate(
        Count(alias_name="total"),
        Sum("matched", alias_name="success"),
        Sum("score", alias_name="score_sum"),
    )
    total = int(agg["total"])
    success = int(agg["success"])
    fail = total - success
    failure_rate = int(np.floor(100.0 * fail / total + 0.5))
    avg_score = (
        int(np.floor(float(agg["score_sum"]) / success + 0.5)) if success else None
    )
    return pd.DataFrame(
        {
            "total": pd.array([total], dtype="int64"),
            "success": pd.array([success], dtype="int64"),
            "fail": pd.array([fail], dtype="int64"),
            "failure_rate": pd.array([failure_rate], dtype="int64"),
            "avg_score": pd.array([avg_score], dtype="int64"),
        }
    )


# ----------------------------------------------------------- conformance

def cleanse_street_documents(sf_dir: str):
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "street_clean": cleanse_street_arrow(t["text"])}
        ),
        batch_format="pyarrow",
    )


def cleanse_zone_orders(sf_dir: str):
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def _f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        synth = pc.cast(pc.add(t["o_orderkey"], 800_000), pa.string())
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "zone_clean": cleanse_zone_arrow(synth),
                "zone_clean_text": cleanse_zone_arrow(t["o_orderpriority"]),
            }
        )

    return orders.map_batches(_f, batch_format="pyarrow")


# -------------------------------------------------------------- spatial

def pip_join(sf_dir: str):
    from .pipelines.spatial import pip_join as _pip

    return _pip(sf_dir)


def knn_join(sf_dir: str):
    from .pipelines.spatial import knn_join as _knn

    return _knn(sf_dir)


def cell_encode_lineitem(sf_dir: str):
    from .pipelines.spatial import cell_encode_lineitem as _f

    return _f(sf_dir)


def tile_assign_lineitem(sf_dir: str):
    from .pipelines.spatial import tile_assign_lineitem as _f

    return _f(sf_dir)


def tile_counts(sf_dir: str):
    from .pipelines.spatial import tile_counts as _f

    return _f(sf_dir)
