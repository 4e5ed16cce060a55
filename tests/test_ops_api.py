"""OcgRayOperations — the declarative OcgOperations-analog API."""

import os

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.pipelines.ops import OcgRayOperations


def test_validation_errors(sf_dir):
    with pytest.raises(ValueError, match="spatial_operation"):
        OcgRayOperations(sf_dir, spatial_operation="nope")
    with pytest.raises(ValueError, match="output_format"):
        OcgRayOperations(sf_dir, output_format="netcdf")
    with pytest.raises(ValueError, match="calc_grouping"):
        OcgRayOperations(sf_dir, calc_grouping=("fortnight",))
    with pytest.raises(ValueError, match="calc func"):
        OcgRayOperations(sf_dir, calc=[{"func": "kurtosis", "field": "n_chars"}])
    with pytest.raises(ValueError, match="unknown geom"):
        OcgRayOperations(sf_dir, geom="mars_craters")


def test_subset_with_geometry(ray_session, sf_dir):
    ops = OcgRayOperations(sf_dir, geom="world_regions", output_format="pandas")
    out = ops.execute()
    assert "ugid" in out.columns
    assert len(out) > 0
    # select_ugid restricts the selection geometries
    one = OcgRayOperations(sf_dir, geom="world_regions", select_ugid=[1],
                           output_format="pandas").execute()
    assert set(one["ugid"]) == {1}


def test_aggregate_per_geometry(ray_session, sf_dir):
    out = OcgRayOperations(sf_dir, geom="world_regions", aggregate=True,
                           output_format="pandas").execute()
    assert set(out.columns) >= {"ugid", "n_pages", "sum_chars"}
    # one row per matched geometry
    assert out["ugid"].is_unique


def test_calc_with_temporal_grouping(ray_session, sf_dir):
    ops = OcgRayOperations(
        sf_dir, geom="world_regions", select_ugid=[1],
        calc=[{"func": "mean", "field": "n_chars", "name": "mean_chars"},
              {"func": "count", "field": "n_chars", "name": "n"}],
        calc_grouping=("month",), aggregate=True, output_format="pandas",
    )
    out = ops.execute()
    assert set(out.columns) == {"ugid", "month", "mean_chars", "n"}
    assert (out["ugid"] == 1).all()
    assert out["n"].sum() > 0
    # mean within plausible n_chars bounds
    assert out["mean_chars"].between(1, 1000).all()


def test_time_range_and_parquet_output(ray_session, sf_dir, tmp_path):
    ops = OcgRayOperations(
        sf_dir, time_range=("2024-01-01T00:00:00", "2024-06-30T23:59:59"),
        geom="world_regions", aggregate=True,
        output_format="parquet", output_dir=str(tmp_path), prefix="agg",
    )
    path = ops.execute()
    assert os.path.isdir(path)
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(os.path.join(path, "*.parquet"))
    assert files
    t = pq.read_table(files[0])
    assert "n_pages" in t.column_names


def test_callback_hook(ray_session, sf_dir):
    """progress callback parity (ops/parms/definition.py:103-117)."""
    from ocgis_ray.pipelines.ops import OcgRayOperations

    seen = []
    OcgRayOperations(
        sf_dir, geom="world_regions", select_ugid=[1], aggregate=True,
        output_format="pandas", callback=lambda f, m: seen.append((f, m)),
    ).execute()
    fracs = [f for f, _ in seen]
    assert fracs == sorted(fracs) and fracs[0] == 0.0 and fracs[-1] == 1.0


def test_agg_selection_dissolves(ray_session, sf_dir):
    """agg_selection=True: one dissolved selection geometry (ugid 0),
    rows in ANY polygon counted once — strictly fewer rows than the
    per-ugid inner join when polygons overlap (bay_area in bay_wide)."""
    from ocgis_ray.pipelines.ops import OcgRayOperations

    dis = OcgRayOperations(
        sf_dir, geom="world_regions", aggregate=True, agg_selection=True,
        output_format="pandas",
    ).execute()
    assert list(dis["ugid"]) == [0]
    per = OcgRayOperations(
        sf_dir, geom="world_regions", aggregate=True,
        output_format="pandas",
    ).execute()
    assert int(dis["n_pages"].iloc[0]) < int(per["n_pages"].sum())
    assert int(dis["n_pages"].iloc[0]) > 0
    # calc path composes with the dissolved join too
    calc = OcgRayOperations(
        sf_dir, geom="world_regions", agg_selection=True, aggregate=True,
        calc=[{"func": "mean", "field": "n_chars", "name": "mc"}],
        output_format="pandas",
    ).execute()
    assert list(calc["ugid"]) == [0] and "mc" in calc.columns


def test_calc_accepts_registry_indices(ray_session, sf_dir):
    """the library_icclim-through-calc path: registered climate indices
    are valid calc funcs, computed over the ts-ordered series per
    group and mixed freely with builtin aggregations."""
    from ocgis_ray.functions.climate import DEFAULTS  # noqa: F401
    from ocgis_ray.pipelines.ops import OcgRayOperations

    out = OcgRayOperations(
        sf_dir, geom="world_regions", select_ugid=[1, 9], aggregate=True,
        calc=[{"func": "su", "field": "n_chars", "name": "su_chars"},
              {"func": "csu", "field": "n_chars", "name": "csu_chars"},
              {"func": "mean", "field": "n_chars", "name": "mc"}],
        output_format="pandas",
    ).execute().sort_values("ugid").reset_index(drop=True)
    assert set(out.columns) == {"ugid", "su_chars", "csu_chars", "mc"}
    row = out[out["ugid"] == 1].iloc[0]
    assert row["su_chars"] >= 0 and row["csu_chars"] <= row["su_chars"] + 1
    with pytest.raises(ValueError):
        OcgRayOperations(sf_dir, calc=[{"func": "nope", "field": "x"}])


def test_global_rollup_and_count_semantics(ray_session, sf_dir):
    """no geom + no grouping + calc => ONE global row (not per-rep);
    aggregate without geom or calc raises instead of returning raw
    rows."""
    from ocgis_ray.pipelines.ops import OcgRayOperations

    out = OcgRayOperations(
        sf_dir, aggregate=True,
        calc=[{"func": "mean", "field": "n_chars", "name": "mc"},
              {"func": "count", "field": "n_chars", "name": "n"}],
        output_format="pandas",
    ).execute()
    assert len(out) == 1 and "_all" not in out.columns
    assert out["n"].iloc[0] > 0
    with pytest.raises(ValueError):
        OcgRayOperations(sf_dir, aggregate=True,
                         output_format="pandas").execute()


def test_ops_spatial_reorder(ray_session, sf_dir):
    from ocgis_ray.pipelines.ops import OcgRayOperations

    out = OcgRayOperations(sf_dir, geom="world_regions",
                           spatial_reorder=True,
                           output_format="pandas").execute()
    lon = out["lon"].to_numpy()
    assert len(out) > 0 and (np.diff(np.mod(lon + 180.0, 360.0)) >= 0).all()
    with pytest.raises(ValueError, match="spatial_reorder"):
        OcgRayOperations(sf_dir, calc=[{"func": "mean", "field": "n_chars"}],
                         spatial_reorder=True)


def test_ops_custom_month_groups(ray_session, sf_dir):
    """calc_grouping with arbitrary month lists (the reference's
    seasonal-aggregation form): group ids by list position, rows
    outside every group dropped."""
    from ocgis_ray.pipelines.ops import OcgRayOperations

    out = OcgRayOperations(
        sf_dir,
        calc=[{"func": "count", "field": "n_chars", "name": "n"}],
        calc_grouping=("year", (11, 12, 1, 2), (5, 6, 7, 8)),
        aggregate=True,
        output_format="pandas",
    ).execute()
    assert set(out.columns) == {"year", "season", "n"}
    assert set(out["season"]) <= {0, 1}
    # parity against a direct pandas regroup of the raw rows
    raw = OcgRayOperations(sf_dir, output_format="pandas").execute()
    months = raw["warc_ts"].dt.month.to_numpy()
    years = raw["warc_ts"].dt.year.to_numpy()
    lut = {m: 0 for m in (11, 12, 1, 2)} | {m: 1 for m in (5, 6, 7, 8)}
    import collections
    exp = collections.Counter(
        (y, lut[m]) for y, m in zip(years, months) if m in lut)
    got = {(int(r.year), int(r.season)): int(r.n) for r in out.itertuples()}
    assert got == dict(exp)
    with pytest.raises(ValueError, match="two groups"):
        OcgRayOperations(sf_dir, calc_grouping=((1, 2), (2, 3)))
    with pytest.raises(ValueError, match="one or the other"):
        OcgRayOperations(sf_dir, calc_grouping=("season", (1, 2)))


def test_ops_select_name(ray_session, sf_dir):
    from ocgis_ray.pipelines.ops import OcgRayOperations

    by_name = OcgRayOperations(sf_dir, geom="world_regions",
                               select_name=["bay_area", "nyc"],
                               output_format="pandas").execute()
    by_ugid = OcgRayOperations(sf_dir, geom="world_regions",
                               select_ugid=[1, 2],
                               output_format="pandas").execute()
    assert sorted(by_name["page_id"]) == sorted(by_ugid["page_id"])
    assert set(by_name["ugid"]) == {1, 2}
    with pytest.raises(ValueError, match="select_name"):
        OcgRayOperations(sf_dir, geom="world_regions",
                         select_name=["atlantis"]).execute()


def test_wmean_calc_and_reference_states(ray_session, sf_dir):
    """The cross-engine integration scenario: intersects + aggregate +
    calc (count/sum/weighted-mean) through the public API over the
    reference's REAL state_boundaries shapefile — NYC hot pages land
    in New York (ugid 17), SF hot pages in California (ugid 25)."""
    import os

    from ocgis_ray.sources.cabinet import REFERENCE_STATES_SHP

    if not os.path.exists(REFERENCE_STATES_SHP):
        pytest.skip("reference fixture not present")
    calc = [
        {"func": "count", "field": "n_chars", "name": "n_pages"},
        {"func": "sum", "field": "n_chars", "name": "sum_chars"},
        {"func": "wmean", "field": "rep", "weight": "n_chars",
         "name": "wmean_rep"},
    ]
    out = OcgRayOperations(sf_dir, geom="state_boundaries",
                           select_ugid=[17, 25], aggregate=True,
                           calc=calc, output_format="pandas").execute()
    out = out.set_index("ugid")
    # the hot-city clusters dominate (the NYC box straddles the NJ
    # border and the SF box the coastline, so ~half of each city's
    # 160 hot pages falls inside the state polygon)
    assert out.loc[17, "n_pages"] >= 50
    assert out.loc[25, "n_pages"] >= 50
    # weighted mean of rep (0..3) must sit inside the rep range
    assert ((out["wmean_rep"] >= 0) & (out["wmean_rep"] <= 3)).all()
    # wmean validation: missing weight raises eagerly
    with pytest.raises(ValueError, match="wmean"):
        OcgRayOperations(sf_dir, calc=[{"func": "wmean", "field": "rep"}])


def test_geojson_and_csv_shp_output(ray_session, sf_dir, tmp_path):
    """Vector output formats (reference GeoJsonConverter /
    CsvShapefileConverter): aggregate -> polygons with computed
    properties; rows -> point features; grouped -> csv + UGID-linked
    shapefile."""
    import json

    from ocgis_ray.sources.geojson import load_shapefile

    # aggregate -> polygon features with attributes
    out = OcgRayOperations(
        sf_dir, geom="world_regions", aggregate=True,
        output_format="geojson", output_dir=str(tmp_path),
        prefix="agg").execute()
    gj = json.load(open(out))
    assert gj["type"] == "FeatureCollection"
    feats = gj["features"]
    assert len(feats) > 0
    assert {"UGID", "n_pages", "sum_chars"} <= set(
        feats[0]["properties"].keys())
    assert feats[0]["geometry"]["type"] == "Polygon"

    # row output -> streamed point features
    out2 = OcgRayOperations(
        sf_dir, geom="world_regions", select_ugid=[1],
        output_format="geojson", output_dir=str(tmp_path),
        prefix="rows").execute()
    gj2 = json.load(open(out2))
    assert all(f["geometry"]["type"] == "Point" for f in gj2["features"])
    assert len(gj2["features"]) > 0

    # grouped calc -> geojson refuses (duplicate ugid rows), csv-shp works
    grouped = OcgRayOperations(
        sf_dir, geom="world_regions",
        calc=[{"func": "count", "field": "n_chars", "name": "n"}],
        calc_grouping=("month",), aggregate=True,
        output_format="geojson", output_dir=str(tmp_path), prefix="bad")
    with pytest.raises(ValueError, match="one row per ugid"):
        grouped.execute()
    out3 = OcgRayOperations(
        sf_dir, geom="world_regions",
        calc=[{"func": "count", "field": "n_chars", "name": "n"}],
        calc_grouping=("month",), aggregate=True,
        output_format="csv-shp", output_dir=str(tmp_path),
        prefix="melted").execute()
    import os

    assert os.path.isdir(out3)  # the csv directory
    polys = load_shapefile(out3 + "_gid.shp")
    assert len({p.ugid for p in polys}) == 9  # UGID-linked sidecar


def test_ops_regrid_destination(ray_session):
    """regrid_destination/regrid_options (ops/parms/definition.py:
    1015-1101 analog): the ops front end's destination-point regrid
    equals the direct stages composition; unknown option keys and
    incompatible parameter combinations raise like the reference."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.pipelines.ops import OcgRayOperations
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import apply_weights, patch_weights
    from ocgis_ray.stages.tiles import grouped_aggregate

    targets = pd.DataFrame({"target_id": [1, 2],
                            "lon": [10.3, -77.2], "lat": [48.1, 38.9]})
    got = OcgRayOperations(
        "/root/testdata/sf0.001", regrid_destination=targets,
        regrid_options={"regrid_method": "patch", "res": 5},
        output_format="pandas").execute().sort_values("target_id")

    # direct composition
    ds = geocode(pages_dataset("/root/testdata/sf0.001")) \
        .drop_columns(["html"])

    def add_cell(t: pa.Table) -> pa.Table:
        cell = grid.encode(t["lon"].to_numpy(zero_copy_only=False),
                           t["lat"].to_numpy(zero_copy_only=False), 5)
        return t.append_column("c", pa.array(cell))

    cells = grouped_aggregate(
        ds.select_columns(["lon", "lat", "n_chars"]).map_batches(
            add_cell, batch_format="pyarrow", zero_copy_batch=True),
        "c", {"s": ("n_chars", "sum"), "n": (None, "count")})
    field = cells.map_batches(
        lambda t: pa.table({"c": t["c"], "v": pa.array(
            t["s"].to_numpy(zero_copy_only=False).astype(float)
            / t["n"].to_numpy(zero_copy_only=False))}),
        batch_format="pyarrow", zero_copy_batch=True)
    w = patch_weights(targets, 5)
    want = apply_weights(field, w, src_col="c", value_col="v",
                         out_col="n_chars").to_pandas() \
        .rename(columns={"dst": "target_id"}).sort_values("target_id")
    assert np.allclose(got["n_chars"].to_numpy(),
                       want["n_chars"].to_numpy(), rtol=0, atol=1e-12)

    # method selection changes the answer (patch != nearest here)
    near = OcgRayOperations(
        "/root/testdata/sf0.001", regrid_destination=targets,
        regrid_options={"regrid_method": "nearest_stod", "res": 5},
        output_format="pandas").execute().sort_values("target_id")
    assert not np.allclose(got["n_chars"].to_numpy(),
                           near["n_chars"].to_numpy())

    with pytest.raises(ValueError, match="not allowed"):
        OcgRayOperations("/root/testdata/sf0.001",
                         regrid_destination=targets,
                         regrid_options={"nope": 1})
    with pytest.raises(ValueError, match="aggregate"):
        OcgRayOperations("/root/testdata/sf0.001",
                         regrid_destination=targets, aggregate=True)
    with pytest.raises(ValueError, match="without regrid_destination"):
        OcgRayOperations("/root/testdata/sf0.001",
                         regrid_options={"regrid_method": "bilinear"})


def test_ops_snippet(ray_session):
    """snippet=True (ops/parms/definition.py:1198): first temporal
    slice per selection geometry — must match the oracle-checked
    snippet query's (ugid, page_id) pairs; without a geom, one global
    earliest row; combining with calc/aggregate raises."""
    from ocgis_ray.pipelines.catalog import QUERIES
    from ocgis_ray.pipelines.ops import OcgRayOperations

    out = OcgRayOperations("/root/testdata/sf0.001", geom="world_regions",
                           snippet=True, output_format="pandas").execute()
    want = QUERIES["snippet_first_page"]("/root/testdata/sf0.001")
    got = out[["ugid", "page_id"]].sort_values("ugid").reset_index(drop=True)
    want = want[["ugid", "page_id"]].sort_values("ugid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    g = OcgRayOperations("/root/testdata/sf0.001", snippet=True,
                         output_format="pandas").execute()
    assert len(g) == 1
    # the global row is the earliest page overall: no row in the
    # per-ugid snippet set precedes it
    assert (g["warc_ts"].iloc[0].value
            <= want.merge(out[["ugid", "warc_ts"]], on="ugid")
            ["warc_ts"].min().value)

    with pytest.raises(ValueError, match="snippet"):
        OcgRayOperations("/root/testdata/sf0.001", snippet=True,
                         calc=[{"func": "mean", "field": "n_chars"}])
