"""Bounded-memory streaming summaries: hopping windows, Misra-Gries
heavy hitters, HyperLogLog distinct — exactness / error-bound checks
against DuckDB ground truth."""

import duckdb
import numpy as np
import pandas as pd
import pytest


def test_hopping_window_rollup(ray_session, sf_dir):
    """size=2h hop=1h windows over events: engine == the SQL twin
    (UNNEST window-offset expansion)."""
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.sketch import hopping_window_rollup

    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = hopping_window_rollup(ds, "ts", size_s=7200, hop_s=3600,
                                keys=["event_type"], value_col="value") \
        .to_pandas().sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)
    sql = f"""
SELECT event_type,
       (floor(epoch(ts))::BIGINT // 3600) * 3600 - i.i * 3600 AS window_start,
       count(*) AS n, sum(value) AS sum_v
FROM '{sf_dir}/events.parquet', (SELECT unnest([0, 1]) AS i) i
WHERE (floor(epoch(ts))::BIGINT // 3600) * 3600 - i.i * 3600 + 7200 > floor(epoch(ts))::BIGINT
GROUP BY 1, 2 ORDER BY 1, 2"""
    truth = duckdb.sql(sql).df()
    assert len(out) == len(truth)
    assert (out["event_type"].to_numpy() ==
            truth["event_type"].to_numpy()).all()
    assert (out["window_start"].to_numpy() ==
            truth["window_start"].to_numpy()).all()
    assert (out["n"].to_numpy() == truth["n"].to_numpy()).all()
    assert np.allclose(out["sum_v"].to_numpy(), truth["sum_v"].to_numpy())
    # every row appears in exactly size/hop = 2 windows
    n_rows = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    assert int(out["n"].sum()) == 2 * n_rows


def test_heavy_hitters_mg_guarantees(ray_session, sf_dir):
    """Misra-Gries: every value with freq > N/capacity is found;
    estimates undercount by at most N/capacity; top ranks match the
    exact ordering on clearly-separated heads."""
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.sketch import heavy_hitters

    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = heavy_hitters(ds, "event_type", k=5, capacity=40,
                        batch_size=4096).to_pandas()
    truth = duckdb.sql(
        f"SELECT event_type AS value, count(*) AS c FROM "
        f"'{sf_dir}/events.parquet' GROUP BY 1 ORDER BY c DESC").df()
    n = int(truth["c"].sum())
    bound = n / 40
    tmap = dict(zip(truth["value"], truth["c"]))
    got = dict(zip(out["value"], out["est"]))
    for v, c in tmap.items():
        if c > bound:
            assert v in got, (v, c, bound)
    for v, est in got.items():
        assert est <= tmap[v]
        assert est >= tmap[v] - bound
    # head of the ranking matches where the gap exceeds the error bound
    head = truth.head(3)
    if (head["c"].diff().abs().dropna() > 2 * bound).all():
        assert out["value"].head(3).tolist() == head["value"].tolist()


def test_approx_distinct_hll(ray_session, sf_dir):
    """HLL at p=12: within 5% of the exact distinct count for three
    cardinality regimes (small uses linear counting)."""
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.sketch import approx_distinct

    for col, table in [("event_type", "events"), ("user_id", "events"),
                       ("event_id", "events")]:
        ds = read_parquet_sized(f"{sf_dir}/{table}.parquet")
        est = approx_distinct(ds, col, p=12)
        exact = duckdb.sql(
            f"SELECT count(DISTINCT {col}) FROM "
            f"'{sf_dir}/{table}.parquet'").fetchone()[0]
        assert abs(est - exact) <= max(2, 0.05 * exact), (col, est, exact)


def test_bloom_filter_membership(ray_session, sf_dir):
    """no false negatives ever; FPR near the design point; anti-join
    shape keeps every true non-member."""
    import ray.data as rd

    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.sketch import (BloomFilter, _hash64,
                                         bloom_filter_rows, build_bloom)

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet")
    n = docs.count()
    bloom = build_bloom(docs, "doc_id", expected_n=n)
    # every member hits (no false negatives)
    kept = bloom_filter_rows(docs, "doc_id", bloom, keep_hits=True)
    assert kept.count() == n
    # disjoint ids: few false positives (10 bits/elem, k=4 => ~1%)
    import pandas as pd

    probe = pd.DataFrame({"doc_id": np.arange(10**6, 10**6 + 5000,
                                              dtype=np.int64)})
    fp = bloom_filter_rows(rd.from_pandas(probe), "doc_id", bloom,
                           keep_hits=True).count()
    assert fp / 5000 < 0.05, fp
    # anti shape: true non-members all survive
    anti = bloom_filter_rows(rd.from_pandas(probe), "doc_id", bloom,
                             keep_hits=False).count()
    assert anti == 5000 - fp
    # merge = OR
    a = BloomFilter(1 << 12)
    b = BloomFilter(1 << 12)
    ha = _hash64(__import__("pyarrow").array(np.arange(10, dtype=np.int64)))
    hb = _hash64(__import__("pyarrow").array(np.arange(10, 20, dtype=np.int64)))
    a.add_hashes(ha)
    b.add_hashes(hb)
    a.merge(b)
    assert a.contains_hashes(ha).all() and a.contains_hashes(hb).all()


def test_quantile_reservoir_accuracy(ray_session, sf_dir):
    """rank-stratified reservoir quantiles land within ~1% rank error
    of the exact quantiles."""
    import duckdb

    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.sketch import quantile_reservoir

    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    qs = [0.1, 0.5, 0.9, 0.99]
    approx = quantile_reservoir(ds, "value", qs)
    vals = duckdb.sql(
        f"SELECT value FROM '{sf_dir}/events.parquet'").df()["value"] \
        .to_numpy()
    vals.sort()
    for q in qs:
        # rank error: where does the approx value sit in the true CDF?
        rank = np.searchsorted(vals, approx[q]) / len(vals)
        assert abs(rank - q) < 0.02, (q, approx[q], rank)


def test_bloom_and_hll_null_stability(ray_session):
    """a null in a batch must not flip the hash domain of the other
    values (int64 -> float64 conversion): members still hit, HLL stays
    consistent, null rows are non-members."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocgis_ray.stages.sketch import (approx_distinct,
                                         bloom_filter_rows, build_bloom)

    ids = np.arange(1000, dtype=np.int64)
    clean = rd.from_arrow(pa.table({"doc_id": ids}))
    bloom = build_bloom(clean, "doc_id", expected_n=1000)
    dirty = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids.tolist() + [None], pa.int64())}))
    kept = bloom_filter_rows(dirty, "doc_id", bloom,
                             keep_hits=True).to_pandas()
    assert len(kept) == 1000  # every true member survives; null doesn't
    anti = bloom_filter_rows(dirty, "doc_id", bloom,
                             keep_hits=False).to_pandas()
    assert len(anti) == 1 and pd.isna(anti["doc_id"].iloc[0])
    # HLL: same estimate with and without a null row
    assert abs(approx_distinct(dirty, "doc_id") -
               approx_distinct(clean, "doc_id")) <= 1


def test_approx_distinct_by_accuracy_and_consistency(ray_session):
    """Per-group HLL: matches the global estimator on a single group
    bit-for-bit, tracks exact nunique within ~5x standard error per
    group, and is invariant to input partitioning."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.sketch import approx_distinct, approx_distinct_by

    rng = np.random.RandomState(5)
    sizes = {"a": 50, "b": 900, "c": 12000, "d": 1}
    frames = [pd.DataFrame({
        "k": g, "v": rng.randint(0, n * 3, n * 2)})  # ~duplicated values
        for g, n in sizes.items()]
    df = pd.concat(frames, ignore_index=True)
    exact = df.groupby("k")["v"].nunique()

    ds = rd.from_pandas(df).repartition(8)
    got = (approx_distinct_by(ds, "k", "v", p=12, num_buckets=4)
           .to_pandas().set_index("k")["approx_distinct"])
    assert set(got.index) == set(exact.index)
    for g in exact.index:
        rel = abs(got[g] - exact[g]) / max(exact[g], 1)
        assert rel < 0.09, (g, got[g], exact[g])

    # single group == global estimator, exactly
    one = df[df["k"] == "c"]
    glob = approx_distinct(rd.from_pandas(one), "v", p=12)
    assert got["c"] == glob

    # partition invariance
    got2 = (approx_distinct_by(rd.from_pandas(df).repartition(2), "k", "v",
                               p=12, num_buckets=4)
            .to_pandas().set_index("k")["approx_distinct"])
    assert got.sort_index().equals(got2.sort_index())


def test_approx_distinct_by_null_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.sketch import approx_distinct_by

    df = pd.DataFrame({
        "k": ["x", "x", "x", "y", "y"],
        "v": pd.array([1, 1, None, None, None], dtype="Int64"),
    })
    got = (approx_distinct_by(rd.from_pandas(df), "k", "v", p=10)
           .to_pandas().set_index("k")["approx_distinct"])
    assert got.to_dict() == {"x": 1}  # nulls don't count; all-null group absent


# ----------------------------------------------------- count-min sketch

class TestCountMin:
    def _data(self, n=20000, seed=2):
        rng = np.random.RandomState(seed)
        # Zipf-ish: a few heavy values + long tail
        vals = np.where(rng.rand(n) < 0.4,
                        rng.randint(0, 5, n),
                        rng.randint(0, 2000, n))
        return pd.DataFrame({"v": vals.astype(np.int64)})

    def test_never_undercounts_and_bounded_overcount(self, ray_session):
        import ray.data as rd

        from ocgis_ray.stages.sketch import count_min

        df = self._data()
        cms = count_min(rd.from_pandas(df), "v", width=4096, depth=4,
                        batch_size=2048)
        exact = df["v"].value_counts()
        import pandas.util as pu

        keys = exact.index.to_numpy(np.int64)
        h = pu.hash_array(keys)
        est = cms.estimate_hashes(h)
        true = exact.to_numpy(np.int64)
        assert (est >= true).all()          # CMS guarantee
        n = len(df)
        assert (est - true).max() <= np.e * n / 4096 * 3  # generous bound
        # heavy values estimate near-exactly
        heavy = true >= 500
        assert (est[heavy] == true[heavy]).all() or \
            (est[heavy] - true[heavy]).max() <= n // 4096

    def test_merge_is_sum(self):
        from ocgis_ray.stages.sketch import CountMinSketch
        import pandas.util as pu

        a, b = CountMinSketch(256, 3), CountMinSketch(256, 3)
        h = pu.hash_array(np.array([7, 9], dtype=np.int64))
        a.add_hashes(h, np.array([5, 2]))
        b.add_hashes(h, np.array([1, 10]))
        a.merge(b)
        assert (a.estimate_hashes(h) >= np.array([6, 12])).all()

    def test_add_estimate_column_and_nulls(self, ray_session):
        import ray.data as rd

        from ocgis_ray.stages.sketch import cms_add_estimate, count_min

        df = pd.DataFrame({"v": pd.array([1, 1, 1, 2, None],
                                         dtype="Int64")})
        ds = rd.from_pandas(df)
        cms = count_min(ds, "v", width=512, depth=4)
        out = cms_add_estimate(ds, "v", cms).to_pandas()
        got = dict(zip(out["v"].fillna(-1), out["freq_est"]))
        assert got[1] >= 3 and got[2] >= 1 and got[-1] == 0
