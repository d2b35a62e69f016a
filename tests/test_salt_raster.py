"""Hot-key salting and raster<->vector operator tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geocoding_toolbox_ray.stages import raster, salt


def test_detect_hot_keys_and_salted_groupby(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    # skewed keys: key 7 has 5000 rows, others ~10
    keys = np.concatenate([np.full(5000, 7), np.repeat(np.arange(100, 150), 10)])
    rows = pa.table({"cell": pa.array(keys, pa.int64()),
                     "rid": pa.array(np.arange(len(keys)), pa.int64())})
    ds = rd.from_arrow(rows)
    hot = salt.detect_hot_keys(ds, "cell", threshold=1000)
    assert hot == {7}

    S = 8
    salted = ds.map_batches(
        lambda t: salt.add_salted_key(t, "cell", "rid", hot, S), batch_format="pyarrow"
    )

    def _partial(t):
        k = np.asarray(t["salted_key"].to_numpy(zero_copy_only=False), np.int64)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table({"salted_key": pa.array(uniq), "part_n": pa.array(counts.astype(np.int64))})

    counts = (
        salted.map_batches(_partial, batch_format="pyarrow")
        .groupby("salted_key")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    # hot key split into multiple sub-groups, none holding everything
    hot_groups = counts[counts["salted_key"] // S == 7]
    assert len(hot_groups) > 1
    assert hot_groups["n"].max() < 5000
    # de-salt reproduces exact totals
    counts["cell"] = salt.desalt(counts["salted_key"].to_numpy(), S)
    total = counts.groupby("cell")["n"].sum()
    assert total[7] == 5000
    assert (total.drop(7) == 10).all()


def test_rasterize_vectorize_roundtrip(ray_session):
    import ray.data as rd

    from geocoding_toolbox_ray.functions.cells import EXTENT, X0, Y0

    rng = np.random.default_rng(11)
    pts = pa.table(
        {
            "qx": pa.array(rng.uniform(X0, X0 + EXTENT, 5000), pa.float64()),
            "qy": pa.array(rng.uniform(Y0, Y0 + EXTENT, 5000), pa.float64()),
        }
    )
    sparse = raster.rasterize_sparse(rd.from_arrow(pts)).to_pandas()
    assert sparse["n"].sum() == 5000
    assert ((sparse["px_x"] >= 0) & (sparse["px_x"] < 256)).all()

    # raster -> vector -> raster: centroid of a pixel lands in that pixel
    cent = raster.vectorize_centroids(pa.Table.from_pandas(sparse))
    n = float(1 << 12) * 256
    lon = cent["lon"].to_numpy()
    lat = np.asarray(cent["lat"].to_numpy(), np.float64)
    gx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = lat * (np.pi / 180.0)
    gy = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n).astype(np.int64)
    assert np.array_equal(gx, (sparse["tile_x"] * 256 + sparse["px_x"]).to_numpy())
    assert np.array_equal(gy, (sparse["tile_y"] * 256 + sparse["px_y"]).to_numpy())


def test_tile_raster_sparse_parity(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    ray_df = entrymod.queries()["tile_raster_sparse"](sf).to_pandas()
    o = con.execute(entrymod.oracle_sql()["tile_raster_sparse"]).df()
    key = ["tile_x", "tile_y", "px_x", "px_y", "n"]
    a = ray_df[key].sort_values(key).reset_index(drop=True)
    b = o[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_write_tiles_partitioned_layout(ray_session, tmp_path):
    import glob

    import ray.data as rd

    from geocoding_toolbox_ray.pipelines.candidates import derive_candidates
    from geocoding_toolbox_ray.pipelines.geocode import geocode_candidates
    from geocoding_toolbox_ray.pipelines.tiles import write_tiles

    orders = rd.read_parquet("/root/testdata/sf0.001/orders.parquet", columns=["o_orderkey"])
    geocoded = geocode_candidates(orders.map_batches(derive_candidates, batch_format="pyarrow"))
    out = str(tmp_path / "tiles")
    write_tiles(geocoded, out)
    dirs = glob.glob(f"{out}/z=*/tile_x=*/tile_y=*")
    assert len(dirs) >= 2  # multiple tiles written
    back = rd.read_parquet(out).to_pandas()
    assert len(back) > 0
    assert back["message"].isna().all()  # only matched rows are tiled
    # partition pruning: reading one tile dir yields a strict subset
    one = rd.read_parquet(dirs[0]).to_pandas()
    assert 0 < len(one) < len(back)
