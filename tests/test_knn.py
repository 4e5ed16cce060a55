"""kNN: brute force vs cell-ring acceleration, known nearest."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.sources.pages import HOT_CENTERS_LAT, HOT_CENTERS_LON


@pytest.fixture(scope="module")
def geo_ds(ray_session, sf_dir):
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode

    return geocode(pages_dataset(sf_dir).drop_columns(["html"])).materialize()


QUERIES = pd.DataFrame({
    "query_id": np.arange(4, dtype=np.int64),
    "lon": [HOT_CENTERS_LON[0], 0.0, 100.0, -179.9],
    "lat": [HOT_CENTERS_LAT[0], 0.0, 45.0, 0.0],
})


def test_bruteforce_topk_shape(geo_ds):
    from ocgis_ray.stages.knn import knn_bruteforce

    out = knn_bruteforce(geo_ds, QUERIES, k=5).to_pandas()
    assert len(out) == 20
    for q in range(4):
        mine = out[out["query_id"] == q].sort_values("rank")
        assert mine["rank"].tolist() == [1, 2, 3, 4, 5]
        assert mine["dist_km"].is_monotonic_increasing


def test_bruteforce_hot_city_nearest(geo_ds):
    """query at hot city 0 center: nearest pages must be in its 0.2deg
    box (dist < ~20 km)."""
    from ocgis_ray.stages.knn import knn_bruteforce

    out = knn_bruteforce(geo_ds, QUERIES, k=5).to_pandas()
    city = out[out["query_id"] == 0]
    assert (city["dist_km"] < 20.0).all()


def test_cells_matches_bruteforce(geo_ds):
    from ocgis_ray.stages.knn import knn_bruteforce, knn_cells

    bf = knn_bruteforce(geo_ds, QUERIES, k=5).to_pandas()
    cr = knn_cells(geo_ds, QUERIES, k=5).to_pandas()
    for q in range(4):
        a = bf[bf["query_id"] == q].sort_values("rank")["page_id"].tolist()
        b = cr[cr["query_id"] == q].sort_values("rank")["page_id"].tolist()
        assert a == b, f"query {q}: {a} vs {b}"


def test_bruteforce_matches_numpy_direct(geo_ds):
    from ocgis_ray.geometry import haversine_km
    from ocgis_ray.stages.knn import knn_bruteforce

    pdf = geo_ds.to_pandas()
    out = knn_bruteforce(geo_ds, QUERIES.head(1), k=3).to_pandas().sort_values("rank")
    d = haversine_km(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                     float(QUERIES["lon"][0]), float(QUERIES["lat"][0]))
    order = np.lexsort((pdf["page_id"].to_numpy(), d))[:3]
    assert out["page_id"].tolist() == pdf["page_id"].to_numpy()[order].tolist()


def test_cells_thousand_queries(geo_ds):
    """10^3 queries through the single-scan path: one inverted-index
    probe per batch, no per-query rescans (the old ring-doubling shape
    was O(log max_ring) full scans and O(Q) isin passes per batch)."""
    from ocgis_ray.stages.knn import knn_bruteforce, knn_cells

    rng = np.random.RandomState(3)
    qs = pd.DataFrame({
        "query_id": np.arange(1000, dtype=np.int64),
        "lon": rng.uniform(-179.9, 179.9, 1000),
        "lat": rng.uniform(-85.0, 85.0, 1000),
    })
    cr = knn_cells(geo_ds, qs, k=3).to_pandas()
    assert cr.groupby("query_id").size().eq(3).all() and len(cr) == 3000
    # exactness spot-check against brute force on a slice
    sample = qs.iloc[::97].reset_index(drop=True)
    bf = knn_bruteforce(geo_ds, sample, k=3).to_pandas()
    cs = cr[cr["query_id"].isin(sample["query_id"])]
    for q in sample["query_id"]:
        a = bf[bf["query_id"] == q].sort_values("rank")["page_id"].tolist()
        b = cs[cs["query_id"] == q].sort_values("rank")["page_id"].tolist()
        assert a == b, f"query {q}: {a} vs {b}"


def test_cells_polar_query(geo_ds):
    """near-pole query exercises the latitude clamp in the coverage
    bound and the disk's longitude wrap."""
    from ocgis_ray.stages.knn import knn_bruteforce, knn_cells

    qs = pd.DataFrame({"query_id": np.array([0], dtype=np.int64),
                       "lon": [12.0], "lat": [88.5]})
    bf = knn_bruteforce(geo_ds, qs, k=4).to_pandas()
    cr = knn_cells(geo_ds, qs, k=4).to_pandas()
    assert bf.sort_values("rank")["page_id"].tolist() == \
        cr.sort_values("rank")["page_id"].tolist()


def test_bruteforce_tiebreak_across_batches(ray_session):
    """points tied at the k-th distance: the partial top-k must keep
    the SMALLEST ids deterministically, whatever the batch layout
    (argpartition alone cuts ties arbitrarily)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.knn import knn_bruteforce

    # 30 points at the identical location, ids shuffled across blocks
    ids = np.array([17, 3, 25, 8, 1, 29, 12, 5, 21, 9, 2, 28, 14, 6,
                    22, 11, 4, 26, 16, 7, 23, 13, 0, 27, 15, 10, 24,
                    19, 18, 20], dtype=np.int64)
    df = pd.DataFrame({"page_id": ids,
                       "lon": np.zeros(len(ids)),
                       "lat": np.zeros(len(ids))})
    ds = rd.from_pandas(df).repartition(5)
    q = pd.DataFrame({"query_id": [0], "lon": [0.0], "lat": [0.0]})
    out = knn_bruteforce(ds, q, k=5, batch_size=4).to_pandas()
    assert out.sort_values("rank")["page_id"].tolist() == [0, 1, 2, 3, 4]


def test_knn_cells_pole_and_antimeridian_points(ray_session):
    """data at exactly lat=90 / lon=180 (grid.encode maps one past the
    grid): knn_cells folds them onto the boundary cell instead of
    crashing, and still agrees with brute force."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray import grid
    from ocgis_ray.stages.knn import knn_bruteforce, knn_cells

    rng = np.random.default_rng(5)
    lon = np.concatenate([rng.uniform(-10, 10, 40), [180.0, 0.0]])
    lat = np.concatenate([rng.uniform(40, 50, 40), [45.0, 90.0]])
    ids = np.arange(len(lon), dtype=np.int64)
    df = pd.DataFrame({"page_id": ids, "lon": lon, "lat": lat})
    df["cell_r7"] = grid.encode(lon, lat, 7)
    ds = rd.from_pandas(df).repartition(3)
    q = pd.DataFrame({"query_id": [0, 1], "lon": [0.0, 179.0],
                      "lat": [45.0, 46.0]})
    bf = knn_bruteforce(ds, q, k=3).to_pandas()
    kc = knn_cells(ds, q, k=3).to_pandas()
    for qi in (0, 1):
        b = bf[bf["query_id"] == qi].sort_values("rank")["page_id"].tolist()
        c = kc[kc["query_id"] == qi].sort_values("rank")["page_id"].tolist()
        assert b == c, (qi, b, c)


class TestKnnJoin:
    """knn_join (both sides Datasets) must equal knn_bruteforce with
    the left side as broadcast queries — including antimeridian wrap,
    pole clamp, and (dist, id) tie determinism."""

    def _sides(self, n_left=300, n_right=4000, seed=3):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        left = pd.DataFrame({
            "query_id": np.arange(n_left, dtype=np.int64),
            "lon": rng.uniform(-180, 180, n_left),
            "lat": rng.uniform(-90, 90, n_left),
        })
        # clustered right side + wrap/pole stress points
        centers = rng.uniform(-170, 170, (12, 2))
        pick = rng.randint(0, 12, n_right)
        right = pd.DataFrame({
            "page_id": np.arange(n_right, dtype=np.int64),
            "lon": ((centers[pick, 0] + rng.normal(0, 8, n_right) + 180)
                    % 360) - 180,
            "lat": np.clip(centers[pick, 1] * 0.5
                           + rng.normal(0, 8, n_right), -90, 90),
        })
        right.loc[:20, "lon"] = rng.uniform(176, 180, 21)   # near seam
        right.loc[21:40, "lon"] = rng.uniform(-180, -176, 20)
        right.loc[41:50, "lat"] = rng.uniform(88, 90, 10)   # near pole
        left.loc[:5, "lon"] = rng.uniform(178, 180, 6)
        left.loc[6:10, "lat"] = rng.uniform(-90, -88, 5)
        return (rd.from_pandas(left).repartition(4),
                rd.from_pandas(right).repartition(5), left)

    def test_matches_bruteforce(self, ray_session):
        from ocgis_ray.stages.knn import knn_bruteforce, knn_join

        left_ds, right_ds, left_df = self._sides()
        got = knn_join(left_ds, right_ds, k=5, res=6).to_pandas() \
            .sort_values(["query_id", "rank"]).reset_index(drop=True)
        want = knn_bruteforce(right_ds, left_df, k=5) \
            .to_pandas().sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        assert len(got) == len(want)
        assert (got["query_id"] == want["query_id"]).all()
        assert (got["page_id"] == want["page_id"]).all()
        assert np.allclose(got["dist_km"], want["dist_km"], rtol=1e-12)

    def test_duplicate_points_and_small_right(self, ray_session):
        import ray.data as rd

        from ocgis_ray.stages.knn import knn_join

        left = rd.from_pandas(pd.DataFrame({
            "query_id": np.array([0, 1], dtype=np.int64),
            "lon": [0.0, 10.0], "lat": [0.0, 10.0]}))
        # right has fewer rows than k and exact ties
        right = rd.from_pandas(pd.DataFrame({
            "page_id": np.array([7, 3, 9], dtype=np.int64),
            "lon": [1.0, 1.0, 50.0], "lat": [1.0, 1.0, 50.0]}))
        out = knn_join(left, right, k=5, res=5).to_pandas() \
            .sort_values(["query_id", "rank"])
        assert len(out) == 6  # min(k, |right|) per query
        q0 = out[out.query_id == 0]
        # tie at identical coords ranks by id: 3 before 7
        assert list(q0["page_id"])[:2] == [3, 7]


def test_idw_regrid_join_matches_broadcast_path(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.regrid import idw_interpolate, idw_regrid_join

    rng = np.random.RandomState(9)
    src = pd.DataFrame({
        "page_id": np.arange(3000, dtype=np.int64),
        "lon": rng.uniform(-30, 30, 3000),
        "lat": rng.uniform(-20, 20, 3000),
        "val": rng.uniform(0, 50, 3000),
    })
    tgt = pd.DataFrame({
        "target_id": np.arange(40, dtype=np.int64),
        "lon": rng.uniform(-25, 25, 40),
        "lat": rng.uniform(-15, 15, 40),
    })
    # exact-hit target: same coords as a source
    tgt.loc[0, ["lon", "lat"]] = src.loc[7, ["lon", "lat"]].to_numpy()

    src_ds = rd.from_pandas(src).repartition(4)
    got = idw_regrid_join(rd.from_pandas(tgt).repartition(2), src_ds,
                          k=6, value_col="val", res=5) \
        .to_pandas().sort_values("target_id").reset_index(drop=True)
    want = idw_interpolate(src_ds, tgt, k=6, value_col="val") \
        .to_pandas().sort_values("target_id").reset_index(drop=True)
    assert len(got) == 40
    assert (got["target_id"] == want["target_id"]).all()
    assert np.allclose(got["idw_value"], want["idw_value"])
    # exact hit short-circuits to the source value
    assert got.loc[0, "idw_value"] == pytest.approx(
        round(float(src.loc[7, "val"]), 4))


def test_knn_join_hot_cell_salting(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.knn import knn_bruteforce, knn_join

    rng = np.random.RandomState(17)
    # a web-scale coordinate stack: 5000 right rows on near-identical
    # coords, plus scattered background
    n_hot, n_bg = 5000, 500
    right = pd.DataFrame({
        "page_id": np.arange(n_hot + n_bg, dtype=np.int64),
        "lon": np.concatenate([np.full(n_hot, 10.0)
                               + rng.normal(0, 1e-4, n_hot),
                               rng.uniform(-60, 60, n_bg)]),
        "lat": np.concatenate([np.full(n_hot, 20.0)
                               + rng.normal(0, 1e-4, n_hot),
                               rng.uniform(-40, 40, n_bg)]),
    })
    left = pd.DataFrame({
        "query_id": np.arange(50, dtype=np.int64),
        "lon": np.concatenate([np.full(25, 10.0), rng.uniform(-60, 60, 25)]),
        "lat": np.concatenate([np.full(25, 20.0), rng.uniform(-40, 40, 25)]),
    })
    # rows_per_salt=256 forces ~20 sub-keys on the stack
    got = knn_join(rd.from_pandas(left).repartition(2),
                   rd.from_pandas(right).repartition(4), k=4, res=6,
                   rows_per_salt=256).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = knn_bruteforce(rd.from_pandas(right), left, k=4).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["page_id"] == want["page_id"]).all()
    assert np.allclose(got["dist_km"], want["dist_km"], rtol=1e-12)
