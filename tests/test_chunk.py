"""Token-window chunking: window math, byte-exact slices, coverage."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocgis_ray.stages.chunk import chunk_by_tokens, chunk_counts


def make_ds(texts):
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))


def test_chunk_counts_formula():
    n = np.array([0, 1, 8, 9, 10, 15, 16, 17])
    # max=8, overlap=2 -> stride 6: n<=8 -> 1; 9..14 -> 2; 15..20 -> 3
    got = chunk_counts(n, 8, 2)
    assert list(got) == [1, 1, 1, 2, 2, 3, 3, 3]


def test_windows_cover_all_tokens_with_overlap(ray_session):
    words = [f"w{i}" for i in range(23)]
    out = chunk_by_tokens(make_ds([" ".join(words)]), max_tokens=8,
                          overlap=2).to_pandas().sort_values("chunk_seq")
    # stride 6: starts 0,6,12,18 -> 4 chunks (23 tokens)
    assert list(out["chunk_seq"]) == [0, 1, 2, 3]
    seen = []
    for _, r in out.iterrows():
        toks = r["chunk_text"].split()
        assert len(toks) == r["chunk_tokens"]
        start = r["chunk_seq"] * 6
        assert toks == words[start:start + 8]
        seen.extend(toks)
    assert set(seen) == set(words)  # full coverage


def test_short_and_empty_docs_emit_one_chunk(ray_session):
    out = chunk_by_tokens(make_ds(["one two", "", "   "]),
                          max_tokens=8, overlap=2).to_pandas()
    assert len(out) == 3
    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "chunk_text"] == "one two"
    assert by_id.loc[0, "chunk_tokens"] == 2
    assert by_id.loc[1, "chunk_text"] == "" and by_id.loc[1, "chunk_tokens"] == 0
    assert by_id.loc[2, "chunk_text"] == "" and by_id.loc[2, "chunk_tokens"] == 0


def test_inner_whitespace_is_byte_exact(ray_session):
    text = "a  b\t\tc\nd     e f"  # mixed runs between tokens
    out = chunk_by_tokens(make_ds([text]), max_tokens=4,
                          overlap=1).to_pandas().sort_values("chunk_seq")
    # stride 3: chunk0 = tokens 0..3 -> "a  b\t\tc\nd", chunk1 = 3..5
    assert out["chunk_text"].iloc[0] == "a  b\t\tc\nd"
    assert out["chunk_text"].iloc[1] == "d     e f"


def test_keep_cols_and_multi_doc_batches(ray_session):
    texts = [" ".join(f"t{i}_{j}" for j in range(n))
             for i, n in enumerate([0, 5, 13, 30])]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "lang": ["en", "de", "fr", "es"], "text": texts}))
    out = chunk_by_tokens(ds, max_tokens=8, overlap=2,
                          keep_cols=["lang"]).to_pandas()
    want_counts = chunk_counts(np.array([0, 5, 13, 30]), 8, 2)
    got_counts = out.groupby("doc_id").size().reindex(range(4)).to_numpy()
    assert list(got_counts) == list(want_counts)
    assert (out[out.doc_id == 3]["lang"] == "es").all()
    # every non-final chunk is full
    for did in range(4):
        g = out[out.doc_id == did].sort_values("chunk_seq")
        assert (g["chunk_tokens"].iloc[:-1] == 8).all()


def test_overlap_validation():
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_tokens(make_ds(["x"]), max_tokens=4, overlap=4)


def test_sql_twin_formula(ray_session):
    import duckdb

    from ocgis_ray.stages.chunk import chunk_counts_sql

    rng = np.random.RandomState(9)
    texts = [" ".join("w" * 3 for _ in range(int(n)))
             for n in rng.randint(0, 40, 30)]
    out = chunk_by_tokens(make_ds(texts), max_tokens=8, overlap=2
                          ).to_pandas().groupby("doc_id").size()
    docs = pd.DataFrame({"doc_id": np.arange(30),
                         "text": texts})  # noqa: F841
    expr = chunk_counts_sql(
        "length(text) - length(replace(text, ' ', '')) + "
        "(CASE WHEN trim(text) = '' THEN 0 ELSE 1 END)", 8, 2)
    want = duckdb.sql(
        f"SELECT doc_id, {expr} AS n FROM docs ORDER BY doc_id").df()
    assert list(out.reindex(range(30))) == list(want["n"])
