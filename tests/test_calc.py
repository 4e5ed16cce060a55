"""Calculation library vs pandas/analytic ground truth."""

import numpy as np
import pandas as pd
import pytest

from ocgis_ray.parity import sql_round
from ocgis_ray.stages import calc


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(1)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 40, n),
        "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 86400 * 30, n), unit="s"),
        "value": np.round(rng.uniform(0, 500, n), 2),
        "event_type": rng.choice(["a", "b", "c"], n),
    })
    return rd.from_pandas(df).repartition(4), df


def test_stats_rollup(events_ds):
    ds, df = events_ds
    out = calc.stats_rollup(ds, "event_type", "value").to_pandas().sort_values("event_type")
    exp = df.groupby("event_type")["value"].agg(["count", "sum", "mean", "std", "min", "max"])
    np.testing.assert_array_equal(out["cnt"], exp["count"])
    np.testing.assert_allclose(out["sum_v"], sql_round(exp["sum"].to_numpy(), 4), atol=1e-9)
    np.testing.assert_allclose(out["mean_v"], sql_round(exp["mean"].to_numpy(), 4), atol=1e-9)
    np.testing.assert_allclose(out["std_v"], exp["std"].to_numpy(), atol=1e-3)
    np.testing.assert_array_equal(out["min_v"], exp["min"])
    np.testing.assert_array_equal(out["max_v"], exp["max"])


def test_quantile_rollup(events_ds):
    ds, df = events_ds
    out = calc.quantile_rollup(ds, "event_type", "value", 0.5, out_col="m").to_pandas()
    exp = df.groupby("event_type")["value"].quantile(0.5)
    for _, row in out.iterrows():
        assert row["m"] == pytest.approx(exp[row["event_type"]], abs=1e-6)


def test_threshold_rollup(events_ds):
    ds, df = events_ds
    out = calc.threshold_rollup(ds, "event_type", "value", lower=100, upper=300).to_pandas()
    exp = df[(df["value"] >= 100) & (df["value"] <= 300)].groupby("event_type").size()
    for _, row in out.iterrows():
        assert row["n_meeting"] == exp[row["event_type"]]


def test_duration_rollup_constructed(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "event_id": range(8),
        "user_id": [1] * 5 + [2] * 3,
        "ts": pd.date_range("2024-01-01", periods=8, freq="h"),
        "value": [10, 300, 310, 5, 320, 400, 400, 400],  # u1: runs 2,1 ; u2: run 3
    })
    out = calc.duration_rollup(
        rd.from_pandas(df), "user_id", "ts", "value", threshold=200.0
    ).to_pandas().sort_values("user_id")
    assert out["max_run"].tolist() == [2, 3]


def test_duration_no_qualifying_user(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "event_id": range(4),
        "user_id": [1, 1, 2, 2],
        "ts": pd.date_range("2024-01-01", periods=4, freq="h"),
        "value": [1.0, 2.0, 500.0, 1.0],
    })
    out = calc.duration_rollup(
        rd.from_pandas(df), "user_id", "ts", "value", threshold=100.0
    ).to_pandas()
    assert out["user_id"].tolist() == [2]  # user 1 omitted


def test_moving_window(events_ds):
    ds, df = events_ds
    out = calc.moving_window(ds, "user_id", "ts", "value", window=5,
                             tiebreak_col="event_id").to_pandas()
    merged = out.set_index("event_id")["moving_mean"]
    for eid in [0, 100, 2500, 4999]:
        user = df.loc[df["event_id"] == eid, "user_id"].iloc[0]
        g = df[df["user_id"] == user].sort_values(["ts", "event_id"]).reset_index(drop=True)
        pos = g.index[g["event_id"] == eid][0]
        expect = g["value"].iloc[max(0, pos - 4) : pos + 1].mean()
        assert merged[eid] == pytest.approx(sql_round(expect, 4), abs=1e-9)


def test_state_machine(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "user_id": [1] * 4,
        "ts": pd.date_range("2024-01-01", periods=4, freq="h"),
        "value": [-1.0, 2.0, -3.0, 4.0],
    })

    def crossings(g):
        sign = np.sign(g["value"].to_numpy())
        flips = int(np.sum(sign[1:] != sign[:-1]))
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "flips": [flips]})

    out = calc.state_machine(rd.from_pandas(df), "user_id", "ts", crossings).to_pandas()
    assert out["flips"].tolist() == [3]


def test_compile_expression_whitelist():
    name, kernel = calc.compile_expression("out = log(v + 1.0) * 2.0")
    assert name == "out"
    v = np.array([0.0, np.e - 1.0])
    np.testing.assert_allclose(kernel({"v": v}), [0.0, 2.0], atol=1e-12)
    with pytest.raises(ValueError):
        calc.compile_expression("out = __import__('os').system('x')")
    with pytest.raises(ValueError):
        calc.compile_expression("out = open('/etc/passwd')")
    with pytest.raises(ValueError):
        calc.compile_expression("no equals sign")


def test_multivariate_map(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"q": [10.0, 30.0], "p": [100.0, 100.0], "d": [0.1, 0.1]})
    out = calc.multivariate_map(
        rd.from_pandas(df), "rev",
        lambda q, p, d: np.where(q > 25.0, p * (1.0 - d), np.nan), ["q", "p", "d"],
    ).to_pandas()
    assert np.isnan(out["rev"][0])
    assert out["rev"][1] == pytest.approx(90.0)


def test_climate_indices_registry_and_values(ray_session, sf_dir):
    """ICCLIM-analog index library: one bucketed pass computes every
    registered index per entity; plugin seam registers new ones
    (contrib/library_icclim.py + calc/library/register.py:10-43)."""
    import numpy as np

    from ocgis_ray.functions import climate
    from ocgis_ray.sources.io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = climate.climate_indices(ds).to_pandas().sort_values("user_id")
    assert len(out) == out["user_id"].nunique()
    assert set(climate.index_names()) <= set(out.columns)
    assert (out["tx"] >= out["tg"]).all() and (out["tg"] >= out["tn"]).all()
    assert (out["cdd"] >= 1).any() and (out["su"] >= 0).all()
    # plugin seam: a user-registered index shows up in the same pass
    climate.register_index("above_mean", lambda v, d, p: int((v > v.mean()).sum()))
    try:
        out2 = climate.climate_indices(ds, indices=["tg", "above_mean"]).to_pandas()
        assert set(out2.columns) == {"user_id", "tg", "above_mean"}
        assert (out2["above_mean"] > 0).all()
    finally:
        climate._INDEX_FUNCS.pop("above_mean")
    # hand-check one entity against plain numpy
    import duckdb
    df = duckdb.sql(f"SELECT * FROM '{sf_dir}/events.parquet' WHERE user_id = 1 "
                    "ORDER BY ts, event_id").df()
    v = df["value"].to_numpy(np.float64)
    row = out[out["user_id"] == 1].iloc[0]
    assert row["tx"] == v.max() and row["tn"] == v.min()
    assert row["su"] == int((v > 60.0).sum())


def test_climate_second_tranche_numpy_parity(ray_session, sf_dir):
    """hand-check the round-2 index tranche (etr/hd17/gd4/rr1/sdii/
    csu/cfd/vdtr/tg10p/wsdi/csdi) for one entity against plain numpy."""
    import duckdb
    import numpy as np

    from ocgis_ray.functions import climate
    from ocgis_ray.functions.climate import (DEFAULTS, _max_run,
                                             _spell_total)
    from ocgis_ray.sources.io import read_parquet_sized

    names = ["etr", "hd17", "gd4", "rr1", "sdii", "csu", "cfd", "vdtr",
             "tg10p", "wsdi", "csdi"]
    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = climate.climate_indices(ds, indices=names).to_pandas()
    row = out[out["user_id"] == 1].iloc[0]
    df = duckdb.sql(f"SELECT * FROM '{sf_dir}/events.parquet' WHERE user_id = 1 "
                    "ORDER BY ts, event_id").df()
    v = df["value"].to_numpy(np.float64)
    assert row["etr"] == v.max() - v.min()
    c = np.floor(v * 100.0 + 0.5).astype(np.int64)
    assert row["hd17"] == pytest.approx(np.maximum(0, 3500 - c).sum() / 100.0)
    assert row["gd4"] == pytest.approx(np.maximum(0, c - 2000).sum() / 100.0)
    wet = v >= DEFAULTS["wet_thr"]
    assert row["rr1"] == int(wet.sum())
    assert row["sdii"] == pytest.approx(v[wet].mean(), abs=2e-4)
    assert row["csu"] == _max_run(v > DEFAULTS["su_thr"])
    assert row["cfd"] == _max_run(v < DEFAULTS["fd_thr"])
    assert row["tg10p"] == int((v < np.percentile(v, 10.0)).sum())
    assert row["wsdi"] == _spell_total(v > np.percentile(v, 90.0), 6)
    assert row["csdi"] == _spell_total(v < np.percentile(v, 10.0), 6)
    # _spell_total itself against a literal case
    m = np.array([1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 1], bool)
    assert _spell_total(m, 6) == 6  # only the first run reaches 6
    assert _spell_total(m, 5) == 11


def test_units_registry_and_conform(ray_session, sf_dir):
    """conform_units_to analog (variable/base.py:909 via
    util/units.py): affine registry, family guard, distributed form."""
    from ocgis_ray.functions.units import (conversion, convert_values,
                                           conform_units, register_unit)
    from ocgis_ray.sources.io import read_parquet_sized

    v = np.array([0.0, 100.0, -40.0])
    assert np.allclose(convert_values(v, "degC", "K"), v + 273.15)
    assert np.allclose(convert_values(v, "degC", "degF"), v * 9 / 5 + 32)
    assert np.allclose(convert_values(np.array([-40.0]), "degF", "degC"),
                       [-40.0])
    assert np.allclose(convert_values(np.array([1.0]), "km", "mi"),
                       [0.621371192], atol=1e-8)
    assert np.allclose(convert_values(np.array([86400.0]), "mm/day",
                                      "kg m-2 s-1") * 86400, [86400.0])
    with pytest.raises(ValueError):
        conversion("degC", "km")
    with pytest.raises(KeyError):
        conversion("furlong", "m")
    register_unit("halfK", "temperature", 0.5)
    assert np.allclose(convert_values(np.array([2.0]), "halfK", "K"), [1.0])
    # distributed form over events.value
    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = conform_units(ds.limit(100), "value", "degC", "K",
                        out_col="value_k").to_pandas()
    assert np.allclose(out["value_k"], out["value"] + 273.15)


def test_run_indices_null_vs_zero_parity(ray_session, sf_dir):
    """an entity with NO qualifying run: SQL twin must coalesce to the
    engine's 0, not NULL (csu with an unreachable threshold)."""
    import duckdb

    from ocgis_ray.functions import climate
    from ocgis_ray.sources.io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet")
    out = climate.climate_indices(ds, indices=["csu", "cfd"],
                                  su_thr=1e9, fd_thr=-1e9).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert (out["csu"] == 0).all() and (out["cfd"] == 0).all()
    sql = climate.climate_indices_sql(indices=["csu", "cfd"],
                                      su_thr=1e9, fd_thr=-1e9)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    truth = con.execute(sql).df().sort_values("user_id") \
        .reset_index(drop=True)
    assert (truth["csu"] == 0).all() and (truth["cfd"] == 0).all()
    assert (out["csu"].to_numpy() == truth["csu"].to_numpy()).all()


def test_convolve_short_entity(ray_session):
    """an entity with fewer events than the kernel must not crash the
    convolve stage (numpy 'same' returns kernel-length output)."""
    import pandas as pd
    import ray.data as rd

    from ocgis_ray.stages.calc import convolve_1d

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 3, 3],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                              "2024-01-01", "2024-01-01", "2024-01-02"]),
        "value": [1.0, 2.0, 3.0, 10.0, 4.0, 6.0],
    })
    out = convolve_1d(rd.from_pandas(df), "user_id", "ts", "value",
                      [0.25, 0.5, 0.25]).to_pandas()
    assert len(out) == 6
    one = out[out["user_id"] == 2]["convolved"].iloc[0]
    assert one == pytest.approx(10.0 * 0.5)  # centered tap only


def test_third_tranche_index_kernels():
    """Hand-computed values for rx1day/rx5day/r10mm/r20mm/r99ptot/
    r75p/txn/tnx, incl. a calendar gap inside the rx5day window."""
    import numpy as np
    from ocgis_ray.functions import climate

    # days 0,0,1,5,6 (gap 2-4): values chosen for distinct daily stats
    d = np.array(["2020-01-01", "2020-01-01", "2020-01-02",
                  "2020-01-06", "2020-01-07"], dtype="datetime64[D]")
    v = np.array([40.0, 70.0, 90.0, 120.0, 10.0])
    p = dict(climate.DEFAULTS)
    # daily sums: 110, 90, 120, 10
    assert climate._INDEX_FUNCS["rx1day"](v, d, p) == 120.0
    # calendar-5-day windows ending at each present day:
    #   d0: 110; d1: 200; d5: 90+120=210; d6: 120+10=130  -> max 210
    assert climate._INDEX_FUNCS["rx5day"](v, d, p) == 210.0
    assert climate._INDEX_FUNCS["r10mm"](v, d, p) == 2   # sums 110,120 >= 100
    assert climate._INDEX_FUNCS["r20mm"](v, d, p) == 0   # no daily sum >= 200
    assert climate._INDEX_FUNCS["txn"](v, d, p) == 10.0  # min of day maxes (70,90,120,10)
    assert climate._INDEX_FUNCS["tnx"](v, d, p) == 120.0  # max of day mins (40,90,120,10)
    q99 = np.percentile(v, 99.0)
    assert climate._INDEX_FUNCS["r99ptot"](v, d, p) == float(np.sum(v[v > q99]))
    assert climate._INDEX_FUNCS["r75p"](v, d, p) == int((v > np.percentile(v, 75.0)).sum())
