"""JSONL source/sink: round-trip, gzip, column pruning, conversion."""

import gzip
import json
import os

import numpy as np
import pandas as pd

from ocgis_ray.sources.jsonl import jsonl_to_parquet, read_jsonl, write_jsonl

ROWS = [{"doc_id": i, "text": f"doc {i} body " * 3, "lang": "en"}
        for i in range(50)]


def write_fixture(path, rows, gz=False):
    op = (lambda p: gzip.open(p, "wt")) if gz else (lambda p: open(p, "w"))
    with op(path) as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_read_plain_and_pruned(ray_session, tmp_path):
    p = str(tmp_path / "d.jsonl")
    write_fixture(p, ROWS)
    df = read_jsonl(p).to_pandas().sort_values("doc_id")
    assert len(df) == 50 and list(df.columns) == ["doc_id", "text", "lang"]
    assert df["text"].iloc[0] == ROWS[0]["text"]
    pruned = read_jsonl(p, columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"]


def test_read_gzip_members(ray_session, tmp_path):
    p = str(tmp_path / "d.jsonl.gz")
    write_fixture(p, ROWS, gz=True)
    df = read_jsonl(p).to_pandas()
    assert len(df) == 50


def test_multi_file_and_write_round_trip(ray_session, tmp_path):
    p1, p2 = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    write_fixture(p1, ROWS[:30])
    write_fixture(p2, ROWS[30:])
    ds = read_jsonl([p1, p2])
    out = str(tmp_path / "out")
    write_jsonl(ds, out)
    files = [os.path.join(out, f) for f in os.listdir(out)]
    back = read_jsonl(files).to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(range(50))
    assert list(back["text"]) == [r["text"] for r in ROWS]


def test_jsonl_to_parquet(ray_session, tmp_path):
    p = str(tmp_path / "d.jsonl")
    write_fixture(p, ROWS)
    out = str(tmp_path / "pq")
    n = jsonl_to_parquet(p, out, columns=["doc_id", "lang"])
    assert n == 50
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert t.num_rows == 50 and set(t.schema.names) == {"doc_id", "lang"}
