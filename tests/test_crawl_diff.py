"""Crawl-snapshot diff (stages/crawl.py) — DuckDB-twin parity and the
incremental-update gate."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ocgis_ray.stages.crawl import (crawl_diff, crawl_diff_sql,
                                    incremental_updates)


def _snapshots():
    old = pa.table({
        "url": [f"https://h.example.com/p/{i}" for i in range(6)],
        "warc_ts": pa.array(np.arange(6) * 1000, pa.int64()),
        "text": ["same-0", "same-1", "old-2", "old-3", "same-4", "gone-5"]})
    new = pa.table({
        "url": ([f"https://h.example.com/p/{i}" for i in range(5)]
                + ["https://h.example.com/p/9"]),
        "warc_ts": pa.array(np.arange(6) * 1000 + 7, pa.int64()),
        # 0,1,4 unchanged content; 2,3 changed; 5 removed; 9 added
        "text": ["same-0", "same-1", "new-2", "new-3", "same-4", "fresh-9"]})
    return old, new


def test_crawl_diff_statuses_and_sql_parity():
    old, new = _snapshots()
    diff = crawl_diff(rd.from_arrow(old), rd.from_arrow(new)).to_pandas()
    got = diff.set_index("url")["status"].sort_index()
    exp = {f"https://h.example.com/p/{i}": s for i, s in
           [(0, "unchanged"), (1, "unchanged"), (2, "changed"),
            (3, "changed"), (4, "unchanged"), (5, "removed"),
            (9, "added")]}
    assert got.to_dict() == exp

    con = duckdb.connect()
    con.register("old_snap", old)
    con.register("new_snap", new)
    ora = con.execute(crawl_diff_sql("old_snap", "new_snap")).df()
    con.close()
    cols = sorted(diff.columns)
    a = diff[cols].sort_values("url").reset_index(drop=True)
    b = ora[cols].sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_crawl_diff_ts_only_and_keyless_same():
    old, new = _snapshots()
    # ts-only: every shared URL has a different ts -> changed
    diff = crawl_diff(rd.from_arrow(old), rd.from_arrow(new),
                      content_col=None).to_pandas()
    shared = diff[diff["status"].isin(["changed", "unchanged"])]
    assert (shared["status"] == "changed").all()
    # neither ts nor content: shared rows are unchanged
    diff2 = crawl_diff(rd.from_arrow(old), rd.from_arrow(new),
                       ts_col=None, content_col=None).to_pandas()
    assert set(diff2["status"]) == {"added", "removed", "unchanged"}


def test_incremental_updates_returns_full_rows():
    old, new = _snapshots()
    upd = incremental_updates(rd.from_arrow(old),
                              rd.from_arrow(new)).to_pandas()
    # added p/9 + changed p/2, p/3 — full new-snapshot schema
    assert sorted(upd["url"].str.rsplit("/", n=1).str[-1]) == ["2", "3", "9"]
    assert set(upd.columns) == {"url", "warc_ts", "text"}
    assert sorted(upd["text"]) == ["fresh-9", "new-2", "new-3"]
