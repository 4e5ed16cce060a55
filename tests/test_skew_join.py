"""Salted-replication skew join == plain hash join, under heavy skew."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocgis_ray.sources.io import join_datasets, skew_join


def make_skewed(n=4000, hot_frac=0.5, seed=0):
    rng = np.random.RandomState(seed)
    keys = np.where(rng.rand(n) < hot_frac, "hot.example.com",
                    pd.Series(rng.randint(0, 200, n)).map(
                        "site-{}.com".format))
    left = pd.DataFrame({"lid": np.arange(n, dtype=np.int64), "host": keys})
    hosts = pd.unique(keys)
    right = pd.DataFrame({
        "host": np.repeat(hosts, 2),  # two build rows per key
        "rank": np.arange(2 * len(hosts), dtype=np.int64),
    })
    return left, right


def pairs(df):
    return sorted(zip(df["lid"], df["rank"]))


def test_inner_equals_plain_join(ray_session):
    left, right = make_skewed()
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    want = join_datasets(l, r, on=["host"]).to_pandas()
    got = skew_join(l, r, "host", hot_values=["hot.example.com"],
                    salt=8).to_pandas()
    assert pairs(got) == pairs(want)
    assert len(got) == 2 * len(left)  # every lid matches both build rows


def test_left_outer_keeps_unmatched_once(ray_session):
    left, right = make_skewed(n=500)
    left.loc[0, "host"] = "orphan.net"  # no build row
    right = right[right.host != "hot.example.com"]  # hot key unmatched too
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    want = join_datasets(l, r, on=["host"], join_type="left_outer").to_pandas()
    got = skew_join(l, r, "host", join_type="left_outer",
                    hot_values=["hot.example.com"], salt=4).to_pandas()
    key = lambda df: sorted(zip(df["lid"],
                                df["rank"].fillna(-1).astype(np.int64)))
    assert key(got) == key(want)
    # each unmatched left row (orphan + every hot row) appears exactly once
    hot_rows = (left.host == "hot.example.com").sum()
    assert got["rank"].isna().sum() == 1 + hot_rows


def test_auto_hot_detection(ray_session):
    left, right = make_skewed(n=3000)
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    want = join_datasets(l, r, on=["host"]).to_pandas()
    got = skew_join(l, r, "host", hot_k=4, salt=8).to_pandas()
    assert pairs(got) == pairs(want)


def test_salt_one_and_empty_hot_degenerate(ray_session):
    left, right = make_skewed(n=400)
    l, r = rd.from_pandas(left), rd.from_pandas(right)
    want = pairs(join_datasets(l, r, on=["host"]).to_pandas())
    assert pairs(skew_join(l, r, "host", hot_values=[], salt=8)
                 .to_pandas()) == want
    assert pairs(skew_join(l, r, "host", hot_values=["hot.example.com"],
                           salt=1).to_pandas()) == want


def test_rejects_outer_types(ray_session):
    left, right = make_skewed(n=10)
    with pytest.raises(ValueError, match="inner/left_outer"):
        skew_join(rd.from_pandas(left), rd.from_pandas(right), "host",
                  join_type="full_outer", hot_values=[])
