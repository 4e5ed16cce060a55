"""Distributed k-means: blob recovery, inertia monotonicity, local
parity, cluster-balanced curation sampling."""

import numpy as np
import pandas as pd
import pytest


def _blobs(n_per: int = 80, d: int = 8, k: int = 4, seed: int = 9):
    rng = np.random.default_rng(seed)
    centers = _norm(rng.normal(size=(k, d)))
    rows = []
    for c in range(k):
        pts = centers[c] + 0.05 * rng.normal(size=(n_per, d))
        for i, p in enumerate(pts):
            rows.append((c * n_per + i, p.astype(np.float64), c))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "true_c"])
    return df, centers


def _norm(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def fitted(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.cluster import kmeans_fit

    df, centers = _blobs()
    ds = rd.from_pandas(df[["vec_id", "embedding"]]).repartition(4)
    model = kmeans_fit(ds, k=4, iters=8, init_n=320)
    return df, centers, ds, model


def test_recovers_blob_centers(fitted):
    df, centers, _, model = fitted
    cent = model["centroids"]
    assert cent.shape == (4, 8)
    # every true center has a fitted centroid with cosine > 0.99
    sims = centers @ cent.T
    assert (sims.max(axis=1) > 0.99).all()


def test_inertia_monotone_nonincreasing(fitted):
    _, _, _, model = fitted
    inertia = np.array(model["inertia"])
    assert (np.diff(inertia) <= 1e-9).all()
    assert inertia[-1] < 0.01  # tight blobs converge


def test_assignment_matches_local_and_truth(fitted):
    from ocgis_ray.stages.cluster import kmeans_assign

    df, _, ds, model = fitted
    out = (kmeans_assign(ds, model).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    m = _norm(np.stack(df.sort_values("vec_id")["embedding"].to_numpy()))
    sims = m @ model["centroids"].T
    np.testing.assert_array_equal(out["cluster"].to_numpy(),
                                  np.argmax(sims, axis=1))
    np.testing.assert_allclose(out["centroid_sim"].to_numpy(),
                               sims.max(axis=1), rtol=0, atol=1e-12)
    # cluster labels are a permutation of true blobs (pure clusters)
    merged = out.merge(df[["vec_id", "true_c"]], on="vec_id")
    purity = (merged.groupby("cluster")["true_c"].nunique() == 1).all()
    assert purity


def test_cluster_balanced_sample(fitted):
    from ocgis_ray.stages.cluster import cluster_balanced_sample

    df, _, ds, model = fitted
    proto = cluster_balanced_sample(ds, model, n_per_cluster=5).to_pandas()
    assert len(proto) == 20
    assert (proto.groupby("cluster").size() == 5).all()
    div = cluster_balanced_sample(ds, model, n_per_cluster=5,
                                  keep="diverse").to_pandas()
    # prototypical picks higher-sim rows than diverse, per cluster
    for c in range(4):
        p = proto[proto["cluster"] == c]["centroid_sim"].min()
        q = div[div["cluster"] == c]["centroid_sim"].max()
        assert p > q
    with pytest.raises(ValueError, match="prototypical|diverse"):
        cluster_balanced_sample(ds, model, 5, keep="weird")


def test_empty_and_degenerate(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.cluster import kmeans_fit

    empty = rd.from_pandas(pd.DataFrame({"vec_id": [], "embedding": []}))
    with pytest.raises(ValueError, match="empty"):
        kmeans_fit(empty, k=2)
    # k > n degrades to n centroids
    df, _ = _blobs(n_per=1, k=3)
    model = kmeans_fit(rd.from_pandas(df[["vec_id", "embedding"]]), k=8,
                       iters=2)
    assert model["k"] == 3


def test_duplicate_sample_rows_collapse_k(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.cluster import kmeans_fit

    # 50 rows but only 2 distinct vectors -> k' == 2, no duplicate
    # centroids
    df = pd.DataFrame({
        "vec_id": np.arange(50),
        "embedding": [np.array([1.0, 0.0])] * 25
                     + [np.array([0.0, 1.0])] * 25,
    })
    model = kmeans_fit(rd.from_pandas(df), k=8, iters=3)
    assert model["k"] == 2
    assert len(np.unique(model["centroids"], axis=0)) == 2


def test_empty_partition_survives(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.cluster import kmeans_fit

    df, _ = _blobs(n_per=20, k=2)
    ds = (rd.from_pandas(df[["vec_id", "embedding"]])
          .repartition(8)  # more partitions than needed -> empty blocks
          .filter(lambda r: r["vec_id"] % 3 != 1))
    model = kmeans_fit(ds, k=2, iters=3)
    assert model["k"] == 2


def test_ensure_list_column_normalizes_large_list():
    import pyarrow as pa

    from ocgis_ray.sources.io import ensure_list_column

    big = pa.array([[1, 2], [3]], pa.large_list(pa.int32()))
    t = pa.table({"x": big})
    out = ensure_list_column(t, "x")
    assert pa.types.is_list(out["x"].type)
    assert out["x"].to_pylist() == [[1, 2], [3]]
    # already-plain list with matching type passes through untouched
    small = pa.table({"x": pa.array([[1]], pa.list_(pa.int32()))})
    assert ensure_list_column(small, "x") is small


def test_ensure_list_column_null_rows_preserved():
    """Null list rows map to null (validity preserved), not TypeError
    (round-3 advice: len(None) crashed the lens scan)."""
    import pyarrow as pa

    from ocgis_ray.sources.io import ensure_list_column

    big = pa.array([[1, 2], None, [3]], pa.large_list(pa.int32()))
    out = ensure_list_column(pa.table({"x": big}), "x")
    assert pa.types.is_list(out["x"].type)
    assert out["x"].to_pylist() == [[1, 2], None, [3]]
    assert out["x"].null_count == 1
