"""Per-group cap (reshape.cap_per_group) — determinism, both scale
shapes, ordered variant, and the DuckDB row_number twin."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ocgis_ray.stages.reshape import cap_per_group, cap_per_group_sql


def _docs(n=200, groups=("en", "de", "fr"), seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array([groups[i % len(groups)] for i in range(n)]),
        "score": pa.array(rng.random(n)),
        "text": pa.array([f"doc {i} body" for i in range(n)])})


def test_cap_counts_and_determinism():
    t = _docs()
    a = cap_per_group(rd.from_arrow(t), "lang", 5, "doc_id").to_pandas()
    assert (a.groupby("lang").size() == 5).all()
    # partitioning-invariant: same survivors from a differently-split input
    b = cap_per_group(rd.from_arrow(t).repartition(13), "lang", 5,
                      "doc_id").to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_cap_slim_path_matches_fat_and_keeps_schema():
    t = _docs()
    fat = cap_per_group(rd.from_arrow(t), "lang", 7, "doc_id").to_pandas()
    slim = cap_per_group(rd.from_arrow(t), "lang", 7, "doc_id",
                         decide_on_slim=True).to_pandas()
    assert sorted(slim["doc_id"]) == sorted(fat["doc_id"])
    # slim path returns the untouched full schema (no rank/_cap_h)
    assert set(slim.columns) == {"doc_id", "lang", "score", "text"}


def test_cap_order_col_keeps_best():
    t = _docs()
    out = cap_per_group(rd.from_arrow(t), "lang", 3, "doc_id",
                        order_col="score").to_pandas()
    df = t.to_pandas()
    for g, grp in df.groupby("lang"):
        exp = grp.sort_values(["score", "doc_id"]).head(3)["doc_id"]
        assert sorted(out[out["lang"] == g]["doc_id"]) == sorted(exp)


def test_cap_small_groups_survive_whole():
    t = _docs(n=4)  # groups of size 2/1/1 with k=5
    out = cap_per_group(rd.from_arrow(t), "lang", 5, "doc_id").to_pandas()
    assert len(out) == 4


def test_cap_sql_twin_same_survivors():
    t = _docs()
    eng = cap_per_group(rd.from_arrow(t), "lang", 5, "doc_id",
                        salt=11).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    ora = con.execute(
        cap_per_group_sql("documents", "lang", 5, "doc_id", salt=11)).df()
    con.close()
    a = eng[["lang", "doc_id"]].sort_values(["lang", "doc_id"]) \
        .reset_index(drop=True)
    b = ora[["lang", "doc_id"]].sort_values(["lang", "doc_id"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
