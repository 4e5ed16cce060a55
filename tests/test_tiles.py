"""Tiling: grouped aggregation vs pandas ground truth, salting."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.stages.tiles import (
    SaltStage,
    cell_histogram,
    grouped_aggregate,
    salt_plan,
)


def test_grouped_aggregate_kinds_and_null_semantics(ray_session):
    """All partial kinds in one spec; null KEYS drop (pandas groupby
    semantics); count over a COLUMN counts non-null values only."""
    import ray.data as rd

    df = pd.DataFrame({
        "k": pd.array([1, 1, 2, 2, 2, None], dtype="Int64"),
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 99.0],
        "w": pd.array([10, None, 30, None, 50, 60], dtype="Int64"),
    })
    out = grouped_aggregate(
        rd.from_pandas(df).repartition(3), ["k"], {
            "n": (None, "count"), "nw": ("w", "count"), "s": ("v", "sum"),
            "mn": ("v", "min"), "mx": ("v", "max"), "ss": ("v", "sumsq"),
        }, batch_size=2,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2]          # null key dropped
    assert out["n"].tolist() == [2, 3]
    assert out["nw"].tolist() == [1, 2]         # non-null w only
    assert out["s"].tolist() == [3.0, 12.0]
    assert out["mn"].tolist() == [1.0, 3.0]
    assert out["mx"].tolist() == [2.0, 5.0]
    assert out["ss"].tolist() == [5.0, 50.0]
    with pytest.raises(Exception):
        grouped_aggregate(rd.from_pandas(df), ["k"],
                          {"z": ("v", "median")}).materialize()


def test_grouped_aggregate_equals_pandas(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "k": rng.randint(0, 50, 10000),
        "v": rng.uniform(0, 100, 10000),
    })
    ds = rd.from_pandas(df).repartition(8)
    out = grouped_aggregate(
        ds, ["k"], {"n": (None, "count"), "s": ("v", "sum"), "mx": ("v", "max")},
        batch_size=500,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = df.groupby("k").agg(n=("v", "size"), s=("v", "sum"), mx=("v", "max")).reset_index()
    assert out["n"].tolist() == exp["n"].tolist()
    assert out["mx"].tolist() == exp["mx"].tolist()
    np.testing.assert_allclose(out["s"], exp["s"], rtol=1e-12)


def test_tile_uniqueness(sf_dir):
    """Each page hashes to exactly one cell per resolution — the
    geometric-uniqueness guarantee the reference needs jitter for
    (spatial/base.py:776-790) is structural here."""
    import pyarrow.parquet as pq

    from ocgis_ray import grid
    from ocgis_ray.sources import pages as P

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source", "n_chars"])
    t = P.synthesize_pages_batch(docs)
    lon, lat = P.coords_from_page_id(t["page_id"].to_numpy())
    c8 = grid.encode(lon, lat, 8)
    assert len(c8) == t.num_rows  # total function, one cell per page
    # and parents nest: every r8 cell maps to exactly one r7 parent
    c7 = grid.encode(lon, lat, 7)
    m = pd.DataFrame({"c8": c8, "c7": c7}).groupby("c8")["c7"].nunique()
    assert (m == 1).all()


def test_salt_plan_and_stage():
    hist = pd.DataFrame({"cell_r7": [1, 2, 3], "n": [1000, 50, 2500]})
    plan = salt_plan(hist, rows_per_salt=1000)
    assert plan == {3: 3}
    import pyarrow as pa

    batch = pa.table({
        "cell_r7": pa.array([1, 3, 3, 3], type=pa.int64()),
        "page_id": pa.array([10, 11, 12, 13], type=pa.int64()),
    })
    stage = SaltStage(plan)
    out = stage(batch)
    salt = out["salt"].to_numpy()
    assert salt[0] == 0  # cold cell
    assert (salt[1:] < 3).all()
    # deterministic: same input -> same salts
    out2 = SaltStage(plan)(batch)
    assert (out2["salt"].to_numpy() == salt).all()


def test_cell_histogram(ray_session, sf_dir):
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode

    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    hist = cell_histogram(ds, "cell_r7")
    assert hist["n"].sum() == ds.count()
    assert hist["n"].max() > 100  # hot cells visible


def test_tile_pyramid_matches_duckdb_per_level(ray_session):
    import duckdb
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.stages.tiles import tile_pyramid

    rng = np.random.RandomState(5)
    n = 20_000
    df = pd.DataFrame({
        "lon": rng.uniform(-179.9, 179.9, n),
        "lat": rng.uniform(-89.9, 89.9, n),
        "v": rng.uniform(0, 100, n),
    })
    df["cell_r6"] = grid.encode(df["lon"].to_numpy(), df["lat"].to_numpy(), 6)
    pyr = tile_pyramid(
        rd.from_pandas(df).repartition(6),
        {"n": (None, "count"), "sum_v": ("v", "sum"),
         "max_v": ("v", "max")},
        res=6, to_res=3).to_pandas()

    con = duckdb.connect()
    con.register("pts", df[["lon", "lat", "v"]])
    parts = [
        f"SELECT {r} AS res, {grid.encode_sql('lon', 'lat', r)} AS cell, "
        f"count(*) AS n, sum(v) AS sum_v, max(v) AS max_v "
        f"FROM pts GROUP BY cell"
        for r in range(3, 7)
    ]
    want = con.execute(" UNION ALL ".join(parts)).fetchdf()
    con.close()

    a = pyr.sort_values(["res", "cell"]).reset_index(drop=True)
    b = want.sort_values(["res", "cell"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert list(a["res"]) == list(b["res"].astype(np.int64))
    assert list(a["cell"]) == list(b["cell"])
    assert list(a["n"]) == list(b["n"])
    assert np.allclose(a["sum_v"], b["sum_v"], rtol=1e-12)
    assert (a["max_v"] == b["max_v"]).all()
    # level row counts shrink toward the root
    sizes = a.groupby("res").size()
    assert sizes.loc[3] < sizes.loc[6]

    # non-mergeable kinds rejected by grouped_aggregate's partial
    with pytest.raises(Exception):
        tile_pyramid(rd.from_pandas(df), {"m": ("v", "mean")},
                     res=6, to_res=5).to_pandas()
