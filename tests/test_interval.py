"""Interval/range join: broadcast + bucketed paths vs a brute-force
pandas reference (and DuckDB's BETWEEN-join semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocgis_ray.stages.interval import (build_interval_index, interval_join,
                                       interval_join_bucketed)


def brute(values, ranges, closed="left"):
    """(row, range) match pairs by scanning every pair."""
    out = []
    for i, v in enumerate(values):
        if np.isnan(v):
            continue
        for j, (lo, hi) in enumerate(zip(ranges["lo"], ranges["hi"])):
            inside = v >= lo and (v <= hi if closed == "both" else v < hi)
            if inside:
                out.append((i, j))
    return out


def sorted_ranges(ranges):
    order = np.lexsort((ranges["hi"].to_numpy(), ranges["lo"].to_numpy()))
    return ranges.iloc[order].reset_index(drop=True)


@pytest.mark.parametrize("closed", ["left", "both"])
def test_probe_matches_brute_force_overlapping(closed):
    rng = np.random.RandomState(7)
    lo = rng.uniform(0, 100, 40)
    ranges = pd.DataFrame({
        "lo": lo, "hi": lo + rng.uniform(0.5, 30, 40),
        "tag": np.arange(40)})
    values = np.concatenate([rng.uniform(-10, 140, 300), [np.nan]])
    idx = build_interval_index(ranges, closed=closed)
    rows, rid = idx.probe(values)
    sr = sorted_ranges(ranges)
    got = {(int(r), int(sr["tag"].iloc[int(g)])) for r, g in zip(rows, rid)}
    want = {(i, int(ranges["tag"].iloc[j]))
            for i, j in brute(values, ranges, closed)}
    assert got == want
    assert not idx.disjoint


def test_probe_disjoint_fast_path():
    ranges = pd.DataFrame({"lo": [0.0, 10.0, 25.0], "hi": [10.0, 25.0, 60.0],
                           "band": ["a", "b", "c"]})
    idx = build_interval_index(ranges)
    assert idx.disjoint
    values = np.array([-1.0, 0.0, 9.999, 10.0, 24.9, 59.0, 60.0, np.nan])
    rows, rid = idx.probe(values)
    got = {(int(r), int(g)) for r, g in zip(rows, rid)}
    assert got == {(1, 0), (2, 0), (3, 1), (4, 1), (5, 2)}
    # closed='both' keeps the hi edge and the shared edge matches BOTH
    idx2 = build_interval_index(ranges, closed="both")
    assert not idx2.disjoint  # shared edges now overlap
    rows2, rid2 = idx2.probe(values)
    got2 = {(int(r), int(g)) for r, g in zip(rows2, rid2)}
    assert got2 == {(1, 0), (2, 0), (3, 0), (3, 1), (4, 1), (5, 2), (6, 2)}


def test_build_rejects_bad_input():
    with pytest.raises(ValueError, match="empty interval"):
        build_interval_index(pd.DataFrame({"lo": [1.0], "hi": [1.0]}))
    # hi == lo is a valid point interval under closed='both'
    idx = build_interval_index(pd.DataFrame({"lo": [1.0], "hi": [1.0]}),
                               closed="both")
    rows, _ = idx.probe(np.array([1.0, 1.1]))
    assert list(rows) == [0]
    with pytest.raises(ValueError, match="non-NaN"):
        build_interval_index(pd.DataFrame({"lo": [np.nan], "hi": [2.0]}))
    with pytest.raises(ValueError, match="infinite"):
        build_interval_index(pd.DataFrame(
            {"lo": [0.0, 1.0], "hi": [np.inf, 5.0]}))
    # infinite bounds ARE fine when the table is disjoint
    idx = build_interval_index(pd.DataFrame(
        {"lo": [-np.inf, 0.0], "hi": [0.0, np.inf], "s": ["neg", "pos"]}))
    rows, rid = idx.probe(np.array([-5.0, 5.0]))
    assert list(rows) == [0, 1] and list(rid) == [0, 1]


def test_interval_join_inner_and_left(ray_session):
    facts = rd.from_pandas(pd.DataFrame(
        {"fid": np.arange(6), "v": [1.0, 5.0, 5.0, 99.0, 12.0, np.nan]}))
    ranges = pd.DataFrame({"lo": [0.0, 4.0, 10.0], "hi": [6.0, 8.0, 20.0],
                           "band": ["low", "mid", "high"]})
    inner = interval_join(facts, ranges, "v").to_pandas()
    pairs = sorted(zip(inner["fid"], inner["band"]))
    # v=1 -> low; v=5 -> low AND mid (overlap); v=12 -> high
    assert pairs == [(0, "low"), (1, "low"), (1, "mid"), (2, "low"),
                     (2, "mid"), (4, "high")]
    left = interval_join(facts, ranges, "v", how="left").to_pandas()
    assert len(left) == len(inner) + 2  # fid 3 and the NaN row survive
    missed = left[left["band"].isna()]["fid"].tolist()
    assert sorted(missed) == [3, 5]


def test_interval_join_payload_collision(ray_session):
    facts = rd.from_pandas(pd.DataFrame({"v": [1.0], "band": ["x"]}))
    ranges = pd.DataFrame({"lo": [0.0], "hi": [2.0], "band": ["y"]})
    with pytest.raises(ValueError, match="collide"):
        interval_join(facts, ranges, "v")


def test_bucketed_equals_broadcast(ray_session):
    rng = np.random.RandomState(3)
    lo = rng.uniform(0, 200, 60)
    ranges = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(1, 25, 60),
                           "rid": np.arange(60, dtype=np.int64)})
    facts = pd.DataFrame({"fid": np.arange(500, dtype=np.int64),
                          "v": rng.uniform(-20, 240, 500)})
    a = interval_join(rd.from_pandas(facts), ranges, "v",
                      payload_cols=["rid"]).to_pandas()
    b = interval_join_bucketed(
        rd.from_pandas(facts), rd.from_pandas(ranges), "v",
        payload_cols=["rid"], chunk=10.0).to_pandas()
    key = lambda df: sorted(zip(df["fid"], df["rid"]))
    assert key(a) == key(b)
    assert len(a) == len(brute(facts["v"].to_numpy(), ranges))


def test_bucketed_chunk_insensitive(ray_session):
    """Output is identical whatever the grid width (only cost moves)."""
    ranges = pd.DataFrame({"lo": [0.0, 3.0], "hi": [10.0, 4.0],
                           "tag": ["wide", "narrow"]})
    facts = pd.DataFrame({"fid": [0, 1, 2], "v": [3.5, 9.999, 10.0]})
    outs = []
    for chunk in (0.5, 7.0, 100.0):
        out = interval_join_bucketed(
            rd.from_pandas(facts), rd.from_pandas(ranges), "v",
            chunk=chunk).to_pandas()
        outs.append(sorted(zip(out["fid"], out["tag"])))
    assert outs[0] == outs[1] == outs[2] == [
        (0, "narrow"), (0, "wide"), (1, "wide")]


def test_matches_duckdb_between_join(ray_session):
    import duckdb

    rng = np.random.RandomState(11)
    lo = rng.uniform(0, 50, 25)
    ranges = pd.DataFrame({"lo": lo, "hi": lo + rng.uniform(0.1, 20, 25),
                           "rid": np.arange(25, dtype=np.int64)})
    facts = pd.DataFrame({"fid": np.arange(400, dtype=np.int64),
                          "v": rng.uniform(0, 80, 400)})
    got = interval_join(rd.from_pandas(facts), ranges, "v",
                        payload_cols=["rid"]).to_pandas()
    want = duckdb.sql(
        "SELECT f.fid, r.rid FROM facts f JOIN ranges r "
        "ON f.v >= r.lo AND f.v < r.hi").df()
    assert (sorted(zip(got["fid"], got["rid"]))
            == sorted(zip(want["fid"], want["rid"])))
