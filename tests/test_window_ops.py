"""General per-entity window functions (calc.window_ops) — exact
parity with DuckDB's window functions over the real events table,
tie handling for rank/dense_rank, and multi-entity boundaries."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from ocgis_ray.stages.calc import window_ops

SF = "/root/testdata/sf0.001"


def test_duckdb_parity_events(ray_session):
    import ray

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])
    out = window_ops(
        ds, "user_id", ["ts", "event_id"],
        {"rn": ("row_number", None),
         "prev_v": ("lag", "value"),
         "next_v": ("lead", "value"),
         "lag3": ("lag", "value", 3),
         "dv": ("delta", "value"),
         "run_sum": ("cumsum", "value"),
         "run_max": ("cummax", "value"),
         "prev_ts": ("lag", "ts")},
    ).to_pandas().sort_values("event_id", ignore_index=True)

    con = duckdb.connect()
    want = con.execute(f"""
        SELECT event_id,
               row_number() OVER w AS rn,
               lag(value) OVER w AS prev_v,
               lead(value) OVER w AS next_v,
               lag(value, 3) OVER w AS lag3,
               value - lag(value) OVER w AS dv,
               sum(value) OVER (w ROWS UNBOUNDED PRECEDING) AS run_sum,
               max(value) OVER (w ROWS UNBOUNDED PRECEDING) AS run_max,
               lag(ts) OVER w AS prev_ts
        FROM '{SF}/events.parquet'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """).fetchdf()
    assert len(out) == len(want) > 0
    assert out["rn"].tolist() == want["rn"].tolist()
    for c in ("prev_v", "next_v", "lag3", "dv", "run_max"):
        a = out[c].to_numpy(np.float64)
        b = want[c].to_numpy(np.float64)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
    # DuckDB windowed SUM aggregates via a segment tree, not a
    # sequential running sum — addition order differs, so run_sum
    # matches to ulp, not bitwise (everything above is bit-exact)
    np.testing.assert_allclose(out["run_sum"].to_numpy(np.float64),
                               want["run_sum"].to_numpy(np.float64),
                               rtol=1e-12)
    a, b = out["prev_ts"], want["prev_ts"]
    assert (a.isna() == b.isna()).all()
    assert (a.dropna().to_numpy("datetime64[us]")
            == b.dropna().to_numpy("datetime64[us]")).all()


def test_rank_ties(ray_session):
    import ray

    # low-cardinality order column -> real ties
    df = pd.DataFrame({
        "ent": ["a"] * 6 + ["b"] * 3,
        "score": [1, 1, 2, 2, 2, 5, 7, 7, 7],
        "rid": range(9),
    })
    out = window_ops(
        ray.data.from_pandas(df), "ent", ["score"],
        {"r": ("rank", None), "dr": ("dense_rank", None)},
    ).to_pandas().sort_values("rid", ignore_index=True)
    want = duckdb.sql("""
        SELECT rid, rank() OVER w AS r, dense_rank() OVER w AS dr
        FROM df WINDOW w AS (PARTITION BY ent ORDER BY score)
        ORDER BY rid
    """).fetchdf()
    assert out["r"].tolist() == want["r"].tolist()
    assert out["dr"].tolist() == want["dr"].tolist()


def test_validation_and_short_entities(ray_session):
    import ray

    with pytest.raises(ValueError, match="unknown window kind"):
        window_ops(ray.data.range(1), "id", ["id"],
                   {"x": ("median", "id")})
    # single-row entities: lag is NaN, row_number is 1
    df = pd.DataFrame({"ent": list("abc"), "v": [1.0, 2.0, 3.0],
                       "t": [1, 2, 3]})
    out = window_ops(ray.data.from_pandas(df), "ent", ["t"],
                     {"rn": ("row_number", None), "p": ("lag", "v")}
                     ).to_pandas().sort_values("ent", ignore_index=True)
    assert out["rn"].tolist() == [1, 1, 1]
    assert out["p"].isna().all()
