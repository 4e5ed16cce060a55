"""Group-aware split assignment + token-entropy signal."""

import numpy as np
import pandas as pd
import pytest


def test_assign_split_group_consistency(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import assign_split

    rng = np.random.default_rng(3)
    hosts = [f"host{i}.example" for i in range(40)]
    df = pd.DataFrame({
        "doc_id": np.arange(400),
        "host": rng.choice(hosts, 400),
    })
    rates = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = (assign_split(rd.from_pandas(df).repartition(4), "host", rates)
           .to_pandas())
    # every row of a group shares the label (leakage guard)
    assert (out.groupby("host")["split"].nunique() == 1).all()
    # labels limited to the declared set; all groups covered
    assert set(out["split"]) <= set(rates)
    # deterministic under repartition
    out2 = (assign_split(rd.from_pandas(df).repartition(1), "host", rates)
            .to_pandas())
    pd.testing.assert_series_equal(
        out.sort_values("doc_id")["split"].reset_index(drop=True),
        out2.sort_values("doc_id")["split"].reset_index(drop=True))
    # roughly proportional at the GROUP level (40 groups, loose bound)
    by_group = out.drop_duplicates("host")["split"].value_counts()
    assert by_group.get("train", 0) > by_group.get("val", 0)


def test_assign_split_sql_twin(ray_session):
    import duckdb
    import ray.data as rd

    from ocgis_ray.stages.reshape import assign_split, assign_split_sql_expr

    df = pd.DataFrame({
        "doc_id": np.arange(60),
        "src": [f"s{i % 13}" for i in range(60)],
    })
    rates = {"train": 0.7, "val": 0.15, "test": 0.15}
    eng = (assign_split(rd.from_pandas(df), "src", rates).to_pandas()
           .sort_values("doc_id")["split"].to_numpy())
    con = duckdb.connect()
    con.register("t", df)
    sql = (con.execute(
        f"SELECT doc_id, {assign_split_sql_expr('src', rates)} AS s "
        f"FROM t ORDER BY doc_id").fetchdf()["s"].to_numpy())
    assert (eng == sql).all()


def test_assign_split_validation(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import assign_split, assign_split_sql_expr

    ds = rd.from_pandas(pd.DataFrame({"g": ["a"]}))
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(ds, "g", {"train": 0.5, "val": 0.2})
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split_sql_expr("g", {"a": 1.2, "b": -0.2})
    # single-label degenerate case works on both sides
    out = assign_split(ds, "g", {"all": 1.0}).to_pandas()
    assert list(out["split"]) == ["all"]
    assert assign_split_sql_expr("g", {"all": 1.0}) == "'all'"


def test_token_entropy_reference_values():
    import pyarrow as pa

    from ocgis_ray.stages.text import token_entropy_values

    vals = pa.array(["a a a", "a b", "a a b b c c d d", "", "Tok tok TOK"],
                    pa.string())
    h = token_entropy_values(vals)
    assert h[0] == 0.0                      # constant text
    assert h[1] == pytest.approx(np.log(2))  # two distinct, uniform
    assert h[2] == pytest.approx(np.log(4))  # four distinct, uniform
    assert h[3] == 0.0                      # empty
    assert h[4] == 0.0                      # case-folded to one token


def test_token_entropy_orders_repetitive_below_diverse(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.text import add_token_entropy

    df = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["spam " * 50, " ".join(f"w{i}" for i in range(50))],
    })
    out = (add_token_entropy(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id")["token_entropy"])
    assert out.loc[0] < 0.1 < out.loc[1]


def test_deterministic_shuffle(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(500), "v": np.arange(500) * 2})
    ds = rd.from_pandas(df).repartition(5)
    a = deterministic_shuffle(ds, "doc_id", salt=1).to_pandas()
    # a permutation of the input, not the identity order
    assert sorted(a["doc_id"]) == list(range(500))
    assert list(a["doc_id"]) != list(range(500))
    assert (a["v"].to_numpy() == a["doc_id"].to_numpy() * 2).all()
    # resume-stable: same salt + any partitioning -> same order
    b = deterministic_shuffle(ds.repartition(2), "doc_id", salt=1).to_pandas()
    assert list(a["doc_id"]) == list(b["doc_id"])
    # a new salt is a fresh permutation
    c = deterministic_shuffle(ds, "doc_id", salt=2).to_pandas()
    assert list(c["doc_id"]) != list(a["doc_id"])
    # displacement sanity: the shuffle actually moves most rows far
    disp = np.abs(np.argsort(a["doc_id"].to_numpy()) - np.arange(500))
    assert np.median(disp) > 50


def test_deterministic_shuffle_sql_mirror(ray_session):
    import duckdb
    import ray.data as rd

    from ocgis_ray.stages.reshape import deterministic_shuffle

    df = pd.DataFrame({"doc_id": np.arange(100)})
    eng = (deterministic_shuffle(rd.from_pandas(df), "doc_id", salt=7,
                                 mix=False).to_pandas()["doc_id"].tolist())
    con = duckdb.connect()
    con.register("t", df)
    sql = con.execute(
        "SELECT doc_id FROM t ORDER BY "
        "((CAST(doc_id AS UBIGINT) % 4294967296) * 2654435761 + 7) "
        "% 4294967296, doc_id").fetchdf()["doc_id"].tolist()
    assert eng == sql


def test_shuffle_tiebreak_on_duplicate_keys(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import deterministic_shuffle

    # 100 rows but only 5 distinct shuffle keys: without a tiebreak
    # equal keys have no defined order under Ray's sort
    df = pd.DataFrame({"k": np.arange(100) % 5, "rid": np.arange(100)})
    a = deterministic_shuffle(rd.from_pandas(df).repartition(2), "k",
                              salt=1, tiebreak_cols=["rid"]).to_pandas()
    b = deterministic_shuffle(rd.from_pandas(df).repartition(7), "k",
                              salt=1, tiebreak_cols=["rid"]).to_pandas()
    assert list(a["rid"]) == list(b["rid"])
    # within a key group, rid ascends
    for _, grp in a.groupby("k"):
        assert (np.diff(grp["rid"].to_numpy()) > 0).all()
