"""Host-level boilerplate line removal (quality.boilerplate_line_filter)
— CCNet-shape frequency rule, rebuild fidelity, DuckDB twin parity."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ocgis_ray.stages.quality import (boilerplate_line_filter,
                                      boilerplate_line_filter_sql)


def _corpus():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "host": ["a.com"] * 4 + ["b.com"] * 2,
        "lang": ["en"] * 6,
        "text": [
            "unique zero\nCOOKIE BANNER\nbody zero",
            "unique one\nCOOKIE BANNER\nbody one",
            "COOKIE BANNER\nunique two",
            "unique three\nCOOKIE BANNER",
            "COOKIE BANNER\nb-side body",
            "b unique\nanother line",
        ]})


def test_frequency_rule_is_per_group():
    out = boilerplate_line_filter(
        rd.from_arrow(_corpus()), "host", min_docs=2, max_frac=0.6,
        carry=("lang",)).to_pandas().set_index("doc_id")["text"]
    # banner in 4/4 a.com docs (>0.6) -> removed everywhere there
    assert out[0] == "unique zero\nbody zero"
    assert out[2] == "unique two"
    # banner in 1/2 b.com docs (<=0.6) -> kept
    assert out[4] == "COOKIE BANNER\nb-side body"


def test_every_occurrence_removed_not_just_dups():
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "host": ["h", "h"],
        "text": ["NAV\nbody\nNAV", "NAV\nother"]})
    out = boilerplate_line_filter(
        rd.from_arrow(t), "host", min_docs=2, max_frac=0.5) \
        .to_pandas().set_index("doc_id")["text"]
    assert out[0] == "body"          # both NAV copies gone
    assert out[1] == "other"


def test_all_lines_removed_doc():
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "host": ["h"] * 3,
        "text": ["NAV", "NAV\nreal body", "NAV\nmore body"]})
    dropped = boilerplate_line_filter(
        rd.from_arrow(t), "host", min_docs=2, max_frac=0.5).to_pandas()
    assert sorted(dropped["doc_id"]) == [1, 2]
    kept = boilerplate_line_filter(
        rd.from_arrow(t), "host", min_docs=2, max_frac=0.5,
        drop_empty_docs=False).to_pandas().set_index("doc_id")["text"]
    assert kept[0] == "" and len(kept) == 3


def test_partitioning_invariance():
    a = boilerplate_line_filter(
        rd.from_arrow(_corpus()), "host", min_docs=2,
        max_frac=0.6).to_pandas().sort_values("doc_id")
    b = boilerplate_line_filter(
        rd.from_arrow(_corpus()).repartition(7), "host", min_docs=2,
        max_frac=0.6, num_buckets=3).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["text"].tolist() == b["text"].tolist()


def _random_corpus(n=120, seed=3):
    rng = np.random.default_rng(seed)
    hosts = [f"h{i}.com" for i in range(4)]
    rows = []
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for i in range(n):
        h = hosts[i % len(hosts)]
        lines = [" ".join(rng.choice(vocab, size=3)) for _ in
                 range(int(rng.integers(1, 5)))]
        # host-specific footer on ~80% of docs
        if rng.random() < 0.8:
            lines.append(f"(c) {h} all rights reserved")
        rows.append((i, h, "\n".join(lines)))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "host": [r[1] for r in rows],
        "text": [r[2] for r in rows]})


def test_sql_twin_parity_random_corpus():
    t = _random_corpus()
    for drop in (True, False):
        eng = boilerplate_line_filter(
            rd.from_arrow(t), "host", min_docs=2, max_frac=0.5,
            drop_empty_docs=drop).to_pandas()
        con = duckdb.connect()
        con.register("docs", t)
        ora = con.execute(boilerplate_line_filter_sql(
            "docs", "host", min_docs=2, max_frac=0.5,
            drop_empty_docs=drop)).df()
        con.close()
        cols = ["doc_id", "host", "text"]
        a = eng[cols].sort_values("doc_id").reset_index(drop=True)
        b = ora[cols].sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
