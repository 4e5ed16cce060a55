"""Per-group mergeable t-digest quantiles (sketch.quantile_sketch_rollup):
compression invariants, rank-error accuracy vs exact, exact min/max
sentinels, partitioning-independence of the error bound."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocgis_ray.stages.sketch import (_digest_compress, _digest_quantiles,
                                     quantile_sketch_rollup)


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    """|empirical CDF at the estimate - q| (rank error, the quantity
    the t-digest scale function bounds)."""
    lo = np.searchsorted(np.sort(values), est, side="left")
    hi = np.searchsorted(np.sort(values), est, side="right")
    # nearest rank in the tie range
    r = np.clip(q * len(values), lo, hi) / len(values)
    return abs(r / 1.0 - q)


def test_compress_invariants():
    rng = np.random.RandomState(7)
    n, K = 50_000, 64
    g = rng.randint(0, 3, n).astype(np.int64)
    v = rng.lognormal(0, 2, n)
    w = np.ones(n)
    cg, means, ws, gmin, gmax = _digest_compress(g, v, w, v.copy(),
                                                 v.copy(), K)
    # <= K centroids per group, total weight preserved per group
    assert np.bincount(cg).max() <= K
    np.testing.assert_allclose(np.bincount(cg, weights=ws),
                               np.bincount(g, weights=w))
    # exact per-group extremes survive compression
    for gi in range(3):
        assert gmin[gi] == v[g == gi].min()
        assert gmax[gi] == v[g == gi].max()
    # centroid means lie inside the group's range and are sorted
    for gi in range(3):
        m = means[cg == gi]
        assert (np.diff(m) >= 0).all()
        assert m.min() >= gmin[gi] and m.max() <= gmax[gi]


def test_digest_quantile_accuracy_direct():
    """Compress + interpolate on one machine: rank error well inside
    the t-digest bound at mid-range and tails, p0/p100 exact."""
    rng = np.random.RandomState(1)
    n, K = 200_000, 128
    g = np.zeros(n, dtype=np.int64)
    v = rng.lognormal(0, 2, n)  # heavy-tailed
    cg, means, ws, gmin, gmax = _digest_compress(
        g, v, np.ones(n), v.copy(), v.copy(), K)
    qs = [0.0, 0.01, 0.5, 0.9, 0.99, 1.0]
    est, W = _digest_quantiles(cg, means, ws, gmin, gmax, qs)
    assert W[0] == n
    assert est[0, 0] == v.min() and est[0, -1] == v.max()
    assert _rank_error(v, est[0, 2], 0.5) < 0.01          # mid
    assert _rank_error(v, est[0, 3], 0.9) < 0.01
    assert _rank_error(v, est[0, 1], 0.01) < 0.002        # tails tighter
    assert _rank_error(v, est[0, 4], 0.99) < 0.002


def _skewed_table(n_hot=60_000, n_cold=500, seed=3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "cell": (["hot"] * n_hot + ["cold"] * n_cold
                 + ["tiny"] * 7),
        "v": np.concatenate([rng.lognormal(0, 1.5, n_hot),
                             rng.normal(100, 5, n_cold),
                             np.full(7, 42.0)]),
    })


def test_rollup_vs_exact(ray_session):
    import ray

    df = _skewed_table()
    ds = ray.data.from_pandas(df).repartition(8)
    out = quantile_sketch_rollup(ds, "cell", "v", [0.0, 0.5, 0.99, 1.0],
                                 max_centroids=128,
                                 batch_size=4096).to_pandas()
    out = out.set_index("cell")
    assert sorted(out.index) == ["cold", "hot", "tiny"]
    for cell in ("hot", "cold"):
        vals = df.loc[df.cell == cell, "v"].to_numpy()
        row = out.loc[cell]
        assert row["cnt"] == len(vals)
        assert row["p0"] == vals.min() and row["p100"] == vals.max()
        assert _rank_error(vals, row["p50"], 0.5) < 0.015, cell
        assert _rank_error(vals, row["p99"], 0.99) < 0.005, cell
    # constant group: every quantile is the constant
    trow = out.loc["tiny"]
    assert trow["cnt"] == 7
    assert (trow[["p0", "p50", "p99", "p100"]] == 42.0).all()


def test_partitioning_changes_estimate_not_bound(ray_session):
    """Different batch sizes give (possibly) different estimates but
    both inside the rank-error bound — the merge path is sound."""
    import ray

    df = _skewed_table(seed=11)
    vals = df.loc[df.cell == "hot", "v"].to_numpy()
    got = []
    for bs in (1024, 16384):
        ds = ray.data.from_pandas(df).repartition(4)
        out = quantile_sketch_rollup(ds, "cell", "v", [0.5],
                                     max_centroids=64,
                                     batch_size=bs).to_pandas()
        got.append(float(out.set_index("cell").loc["hot", "p50"]))
    for e in got:
        assert _rank_error(vals, e, 0.5) < 0.03


def test_nan_and_multikey(ray_session):
    import ray

    df = pd.DataFrame({
        "a": ["x"] * 6 + ["y"] * 4,
        "b": [1] * 6 + [2] * 4,
        "v": [1.0, 2.0, np.nan, 4.0, 5.0, np.nan, 10.0, 20.0, 30.0,
              np.nan],
    })
    ds = ray.data.from_pandas(df)
    out = quantile_sketch_rollup(ds, ["a", "b"], "v", [0.5],
                                 max_centroids=16).to_pandas()
    out = out.sort_values("a").reset_index(drop=True)
    assert out["cnt"].tolist() == [4, 3]  # NaNs dropped
    assert out.loc[0, "p50"] == pytest.approx(3.0)   # median of 1,2,4,5
    assert out.loc[1, "p50"] == pytest.approx(20.0)
