"""CSV round-trip, time-subset-by-function, extension registry."""

import numpy as np
import pytest
import pandas as pd
import pyarrow as pa


def test_csv_roundtrip(ray_session, tmp_path):
    """DriverCSV analog: Ray-native csv sink + source."""
    import ray.data as rd

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    out = str(tmp_path / "csv_out")
    rd.from_pandas(df).write_csv(out)
    back = rd.read_csv(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert back.equals(df)


def test_time_subset_fn(ray_session):
    """Arbitrary-UDF time subset (variable/temporal.py:345-378)."""
    import ray.data as rd

    from ocgis_ray.stages.temporal import time_subset_fn

    df = pd.DataFrame({
        "event_id": range(6),
        "ts": pd.to_datetime([
            "2024-01-01", "2024-01-15", "2024-02-01",
            "2024-02-15", "2024-03-01", "2024-03-15",
        ]),
    })

    def odd_months(ts: np.ndarray) -> np.ndarray:
        months = ts.astype("datetime64[M]").astype(int) % 12 + 1
        return months % 2 == 1

    out = time_subset_fn(rd.from_pandas(df), "ts", odd_months).to_pandas()
    assert sorted(out["event_id"]) == [0, 1, 4, 5]


def test_registry_seams(ray_session):
    """User-extension surface (calc/library/register.py analog)."""
    import ray.data as rd

    from ocgis_ray.functions import registry

    def double_v(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("v2", pc.multiply(t["v"], pa.scalar(2.0)))

    registry.register_kernel("double_v", double_v)
    registry.register_source("range3", lambda sf_dir: rd.from_pandas(
        pd.DataFrame({"v": [1.0, 2.0, 3.0]})))
    registry.register_aggregate("sum_v", {"s": ("v", "sum")})

    ds = registry.source("range3")("unused")
    out = registry.apply_kernel(ds, "double_v").to_pandas()
    assert out["v2"].tolist() == [2.0, 4.0, 6.0]

    from ocgis_ray.stages.tiles import grouped_aggregate

    ds2 = ds.map_batches(lambda t: t.append_column("k", pa.array([1, 1, 2])),
                         batch_format="pyarrow")
    agg = grouped_aggregate(ds2, ["k"], registry.aggregate_spec("sum_v")).to_pandas()
    assert sorted(agg["s"]) == [3.0, 3.0]

    names = registry.names()
    assert "double_v" in names["kernels"]
    assert "range3" in names["sources"]


def test_sessionize(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages import calc

    df = pd.DataFrame({
        "event_id": range(6),
        "user_id": [1, 1, 1, 2, 2, 2],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
            "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 01:20",
        ]),
    })
    out = calc.sessionize(rd.from_pandas(df), "user_id", "ts", gap_seconds=1800)
    pdf = out.to_pandas().set_index("event_id")["session_id"]
    assert pdf[0] == 0 and pdf[1] == 0 and pdf[2] == 1  # 2h gap splits
    assert pdf[3] == 0 and pdf[4] == 1 and pdf[5] == 1  # 1h gap splits, 20m doesn't


def test_top_level_api_export():
    import ocgis_ray

    assert ocgis_ray.OcgRayOperations.__name__ == "OcgRayOperations"


def test_asof_join(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.asof import asof_join

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 02:00:00",
                              "2024-01-01 00:30:00"]),
    })
    series = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00",
                              "2024-01-01 01:00:00"]),
        "rate": [10.0, 20.0, 30.0],
    })
    out = asof_join(rd.from_pandas(df), series, on="ts", by="k").to_pandas()
    got = out.set_index("id")["rate"]
    assert got[1] == 10.0   # latest 'a' mark <= 00:30
    assert got[2] == 20.0   # latest 'a' mark <= 02:00
    import numpy as np

    assert np.isnan(got[3])  # 'b' has no mark <= 00:30


def test_geojson_loader(ray_session, sf_dir):
    """GeoJSON FeatureCollection -> Polygon layer -> real join
    (driver/vector.py + geom_cabinet.py analog).  Hand-computed
    membership: the sydney donut hole excludes part of the hot box."""
    import os

    import numpy as np

    import ocgis_ray
    from ocgis_ray.sources.geojson import load_geojson, register_geojson_layer
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join

    path = os.path.join(os.path.dirname(ocgis_ray.__file__), "data",
                        "oracle_layer.geojson")
    polys = load_geojson(path)
    ugids = sorted({p.ugid for p in polys})
    assert ugids == [301, 302, 303]
    donut = [p for p in polys if p.ugid == 302][0]
    assert len(donut.holes) == 1 and not donut.convex
    # hand-computed: hole center excluded, ring interior included
    assert not donut.contains(np.array([151.4]), np.array([-33.8]))[0]
    assert donut.contains(np.array([150.5]), np.array([-34.0]))[0]
    multi = [p for p in polys if p.ugid == 303]
    assert len(multi) == 2  # MultiPolygon parts share the ugid

    register_geojson_layer("geojson_oracle", path)
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    out = spatial_join(ds, layer("geojson_oracle"), how="inner",
                       concurrency=2).to_pandas()
    counts = out.groupby("ugid").size().to_dict()
    assert set(counts) <= {301, 302, 303} and counts.get(302, 0) > 0


def test_geopackage_loader(tmp_path):
    """GeoPackage via stdlib sqlite3 + minimal WKB (driver/vector.py
    analog #2): polygon with hole + MultiPolygon parts."""
    import sqlite3
    import struct

    import numpy as np

    from ocgis_ray.sources.geojson import load_geopackage

    path = str(tmp_path / "layer.gpkg")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)")
    con.execute("INSERT INTO gpkg_contents VALUES ('states', 'features')")
    con.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('states', 'geom')")
    con.execute("CREATE TABLE states (UGID INTEGER, name TEXT, geom BLOB)")

    def wkb_polygon(rings):
        out = struct.pack("<BI", 1, 3) + struct.pack("<I", len(rings))
        for r in rings:
            out += struct.pack("<I", len(r)) + np.asarray(r, "<f8").tobytes()
        return out

    ring = [[-123.0, 37.0], [-121.5, 37.0], [-121.5, 38.5], [-123.0, 38.5],
            [-123.0, 37.0]]
    hole = [[-122.6, 37.4], [-122.2, 37.4], [-122.2, 37.8], [-122.6, 37.8],
            [-122.6, 37.4]]
    blob = b"GP" + bytes([0, 0]) + struct.pack("<i", 4326) + wkb_polygon([ring, hole])
    con.execute("INSERT INTO states VALUES (7, 'bay', ?)", (blob,))
    con.commit()
    con.close()
    polys = load_geopackage(path)
    assert polys[0].ugid == 7 and len(polys[0].holes) == 1
    import numpy as np

    assert not polys[0].contains(np.array([-122.4]), np.array([37.6]))[0]
    assert polys[0].contains(np.array([-122.9]), np.array([37.1]))[0]


def test_reference_state_boundaries_shapefile(ray_session, sf_dir):
    """Load the reference's ACTUAL GeomCabinet fixture
    (test/bin/shp/state_boundaries: 51 states, 134 parts, mostly
    non-convex) with the pure-stdlib shapefile reader and run a real
    join — known memberships: Denver in Colorado, NYC hot pages in
    New York."""
    import os

    import numpy as np

    from ocgis_ray.sources.geojson import load_shapefile
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join

    shp = ("/root/reference/src/ocgis/test/bin/shp/state_boundaries/"
           "state_boundaries.shp")
    if not os.path.exists(shp):
        import pytest

        pytest.skip("reference fixture not present")
    polys = load_shapefile(shp)
    assert len({p.ugid for p in polys}) == 51
    names = {p.ugid: p.name.split("/")[0] for p in polys}
    denver = [p.ugid for p in polys
              if p.contains(np.array([-104.99]), np.array([39.74]))[0]]
    assert [names[u] for u in denver] == ["Colorado"]
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    out = spatial_join(ds, polys, how="inner", concurrency=2,
                       batch_size=4096).to_pandas()
    by_state = out.groupby("ugid").size()
    top = names[by_state.idxmax()]
    # the NYC hot city dominates the US pages
    assert top == "New York", (top, by_state.sort_values().tail())


def test_cf_calendar_decode():
    """CF calendar decode (variable/temporal.py:768-980 analog):
    standard, 360_day, noleap — hand-computed expectations."""
    import numpy as np

    from ocgis_ray.stages.temporal import cf_time_decode

    f = cf_time_decode(np.array([10.25]), "days since 2000-01-15 06:00:00")
    assert (int(f["year"][0]), int(f["month"][0]), int(f["day"][0]),
            int(f["hour"][0])) == (2000, 1, 25, 12)
    f2 = cf_time_decode(np.array([35.0, 360.0]), "days since 2000-01-01",
                        "360_day")
    assert f2["month"].tolist() == [2, 1] and f2["day"].tolist() == [6, 1]
    assert f2["year"].tolist() == [2000, 2001]
    f3 = cf_time_decode(np.array([59.0]), "days since 2001-01-01", "noleap")
    assert (int(f3["month"][0]), int(f3["day"][0])) == (3, 1)
    f4 = cf_time_decode(np.array([25.5]), "hours since 2000-12-30 00:00:00",
                        "360_day")
    # Dec 30 is the LAST day of a 360-day year -> rolls into the new year
    assert (int(f4["year"][0]), int(f4["month"][0]), int(f4["day"][0]),
            int(f4["hour"][0]), int(f4["minute"][0])) == (2001, 1, 1, 1, 30)


def test_add_cf_time_parts(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.temporal import add_cf_time_parts

    df = pd.DataFrame({"t": [0.0, 30.0, 359.0]})
    out = add_cf_time_parts(rd.from_pandas(df), "t",
                            "days since 1850-01-01", "360_day").to_pandas()
    assert out["month"].tolist() == [1, 2, 12]
    assert out["day"].tolist() == [1, 1, 30]


def test_sample_by_key_deterministic(ray_session, sf_dir):
    """hash sampling: stable across runs, rate approximately honored,
    and bit-identical to the SQL predicate twin."""
    import duckdb
    import numpy as np

    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.reshape import sample_by_key, sample_by_key_sql_pred

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    a = sample_by_key(docs, "doc_id", 0.25).to_pandas()["doc_id"].sort_values()
    b = sample_by_key(docs, "doc_id", 0.25).to_pandas()["doc_id"].sort_values()
    assert a.tolist() == b.tolist()
    n = docs.count()
    assert 0.15 * n < len(a) < 0.35 * n
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    pred = sample_by_key_sql_pred("doc_id", 0.25)
    sql = con.execute(
        f"SELECT doc_id FROM documents WHERE {pred} ORDER BY doc_id").df()
    assert sql["doc_id"].tolist() == a.tolist()


def test_vector_writers_roundtrip(tmp_path):
    """GeoJSON + Shapefile WRITERS (ShpConverter/GeoJsonConverter
    analogs): write -> reload -> identical ugids, areas and hole
    structure; the real 51-state reference layer survives a shapefile
    round-trip bit-for-area."""
    import numpy as np

    from ocgis_ray.geometry import Polygon
    from ocgis_ray.sources.geojson import (load_geojson, load_shapefile,
                                           write_geojson, write_shapefile)

    donut = Polygon(7, "donut",
                    np.array([[0.0, 0], [10, 0], [10, 10], [0, 10]]),
                    holes=[np.array([[3.0, 3], [7, 3], [7, 7], [3, 7]])])
    tri = Polygon(9, "tri", np.array([[20.0, 0], [24, 0], [22, 3]]))
    for writer, loader, fname in [
            (write_geojson, load_geojson, "layer.geojson"),
            (write_shapefile, load_shapefile, "layer.shp")]:
        path = writer([donut, tri], str(tmp_path / fname))
        back = loader(path)
        assert [p.ugid for p in back] == [7, 9]
        assert back[0].name.strip() == "donut"
        assert len(back[0].holes) == 1 and not back[1].holes
        assert back[0].area() == pytest.approx(84.0)
        assert back[1].area() == pytest.approx(6.0)
    # real-geometry round-trip: reference states through OUR writer
    src = load_shapefile(
        "/root/reference/src/ocgis/test/bin/shp/state_boundaries/"
        "state_boundaries.shp")
    out = write_shapefile(src, str(tmp_path / "states.shp"))
    back = load_shapefile(out)
    assert len(back) == len(src)
    for a, b in zip(src, back):
        assert a.ugid == b.ugid
        assert b.area() == pytest.approx(a.area(), rel=1e-12)


def test_sample_exact_k(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.reshape import sample_exact_k

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64),
                       "v": np.arange(5000) * 2.0})
    ds = rd.from_pandas(df).repartition(8)
    a = sample_exact_k(ds, "doc_id", 100).to_pandas()
    assert len(a) == 100
    # deterministic across runs and partitionings
    b = sample_exact_k(rd.from_pandas(df).repartition(3),
                       "doc_id", 100).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # a different salt is a different draw
    c = sample_exact_k(ds, "doc_id", 100, salt=7).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    # k >= n returns everything
    full = sample_exact_k(ds, "doc_id", 10_000).to_pandas()
    assert sorted(full["doc_id"]) == list(range(5000))
    # roughly uniform: mean of sampled ids near the population mean
    assert abs(a["doc_id"].mean() - 2500) < 450


def test_plan_mixture_water_filling():
    from ocgis_ray.stages.reshape import plan_mixture

    # no saturation: rates hit the exact proportional targets
    avail = {"web": 1000.0, "books": 1000.0}
    r = plan_mixture(avail, {"web": 0.5, "books": 0.5}, 1000)
    assert abs(r["web"] - 0.5) < 1e-9 and abs(r["books"] - 0.5) < 1e-9

    # books saturates; its unmet share flows to web
    avail = {"web": 10_000.0, "books": 100.0}
    r = plan_mixture(avail, {"web": 0.5, "books": 0.5}, 1000)
    assert r["books"] == 1.0
    got = r["web"] * avail["web"] + avail["books"]
    assert abs(got - 1000) < 1e-6
    assert "_unmet" not in r

    # budget exceeds supply: all 1.0 + unmet reported
    r = plan_mixture({"a": 50.0, "b": 30.0}, {"a": 0.7, "b": 0.3}, 1000)
    assert r["a"] == 1.0 and r["b"] == 1.0
    assert abs(r["_unmet"] - 920) < 1e-6

    # three-way cascade: two saturate in sequence
    avail = {"a": 10.0, "b": 100.0, "c": 100000.0}
    r = plan_mixture(avail, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}, 900)
    assert r["a"] == 1.0 and r["b"] == 1.0
    got = sum(r[g] * avail[g] for g in avail)
    assert abs(got - 900) < 1e-6

    # groups with zero supply are skipped; empty -> all budget unmet
    r = plan_mixture({"a": 0.0}, {"a": 1.0}, 10)
    assert r["_unmet"] == 10.0


def test_sample_exact_k_string_and_float_keys(ray_session):
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from ocgis_ray.stages.reshape import sample_exact_k

    # string keys: full-content hash, deterministic across partitionings
    df = pd.DataFrame({"url": [f"https://example.com/{i}"
                               for i in range(2000)]})
    a = sample_exact_k(rd.from_pandas(df).repartition(5),
                       "url", 50).to_pandas()
    b = sample_exact_k(rd.from_pandas(df).repartition(2),
                       "url", 50).to_pandas()
    assert len(a) == 50
    assert sorted(a["url"]) == sorted(b["url"])
    # float keys: rejected loudly (truncation would collide 1.2 and 1.7)
    fdf = pd.DataFrame({"key": np.linspace(0.0, 2.0, 100)})
    with pytest.raises(Exception) as ei:
        sample_exact_k(rd.from_pandas(fdf), "key", 10).to_pandas()
    assert "integer or string" in str(ei.value)


def test_soft_dedup_weights(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.dedup import soft_dedup_weights

    df = pd.DataFrame({
        "doc_id": np.arange(9, dtype=np.int64),
        "text": ["a", "a", "a", "b", "b", "c", "d", "d", "d"],
    })
    out = soft_dedup_weights(rd.from_pandas(df).repartition(3),
                             count_col="n").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["n"]) == [3, 3, 3, 2, 2, 1, 3, 3, 3]
    assert np.allclose(out["soft_w"], 1.0 / out["n"].to_numpy())
    # total weight == number of distinct documents (alpha=1 property)
    assert out["soft_w"].sum() == pytest.approx(4.0)
    # alpha=0.5 interpolates toward keeping duplicates
    half = soft_dedup_weights(rd.from_pandas(df), alpha=0.5,
                              count_col="n").to_pandas()
    assert np.allclose(half["soft_w"],
                       np.power(half["n"].to_numpy(np.float64), -0.5))


def test_sample_by_weight_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.dedup import soft_dedup_weights
    from ocgis_ray.stages.reshape import (sample_by_weight,
                                          sample_by_weight_sql_pred)

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        # duplicate clusters of wildly different sizes
        "text": [f"doc {i % 37}" if i % 3 == 0 else f"unique {i}"
                 for i in range(4000)],
    })
    weighted = soft_dedup_weights(rd.from_pandas(df).repartition(4),
                                  count_col="n")
    kept = sample_by_weight(weighted, "doc_id", "soft_w",
                            salt=5).to_pandas()

    con = duckdb.connect()
    con.register("docs", df)
    pred = sample_by_weight_sql_pred("doc_id", "soft_w", salt=5)
    want = con.execute(
        "WITH w AS (SELECT doc_id, 1.0 / count(*) OVER (PARTITION BY text)"
        f" AS soft_w FROM docs) SELECT doc_id FROM w WHERE {pred}"
    ).fetchdf()
    con.close()
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    # expected survivors per duplicate cluster ~= 1: the 37 hot
    # clusters contribute ~37 rows, not 1333
    hot = kept[kept["n"] > 1]
    assert 10 <= len(hot) <= 80
    # NULL/NaN weights drop
    df2 = pd.DataFrame({"doc_id": [0, 1], "soft_w": [np.nan, 1.0]})
    out2 = sample_by_weight(rd.from_pandas(df2), "doc_id",
                            "soft_w").to_pandas()
    assert list(out2["doc_id"]) == [1]


def test_sample_by_weight_nan_parity_with_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocgis_ray.stages.reshape import (sample_by_weight,
                                          sample_by_weight_sql_pred)

    # REAL NaN (via pyarrow, not pandas-NULL) must drop on both sides
    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                  "soft_w": pa.array([float("nan") if i % 3 == 0 else 1.0
                                      for i in range(100)])})
    kept = sample_by_weight(rd.from_arrow(t), "doc_id",
                            "soft_w").to_pandas()
    con = duckdb.connect()
    con.register("w", t)
    pred = sample_by_weight_sql_pred("doc_id", "soft_w")
    want = con.execute(f"SELECT doc_id FROM w WHERE {pred}").fetchdf()
    con.close()
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    assert not any(i % 3 == 0 for i in kept["doc_id"])


def test_soft_dedup_keep_first_fused(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.dedup import soft_dedup_weights

    df = pd.DataFrame({
        "doc_id": np.array([5, 1, 3, 2, 4], dtype=np.int64),
        "text": ["a", "a", "b", "a", "b"],
    })
    out = soft_dedup_weights(rd.from_pandas(df).repartition(2),
                             keep_first_by="doc_id",
                             count_col="n").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 3]
    assert list(out["n"]) == [3, 2]
    assert np.allclose(out["soft_w"], [1 / 3, 1 / 2])
