"""RAG composition: chunk -> hash-embed -> persisted HNSW -> search."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ocgis_ray.pipelines.rag import (build_rag_index, embed_text,
                                     embed_tokens_matrix, rag_search)

DOCS = [
    "the solar panel array generates renewable energy from sunlight "
    "photovoltaic cells convert photons into electric current " * 3,
    "quarterly revenue grew by twelve percent driven by subscription "
    "sales and enterprise contracts in the cloud segment " * 3,
    "the recipe calls for two cups of flour one egg and a pinch of "
    "salt knead the dough until smooth then bake " * 3,
    "migratory birds navigate using the earth magnetic field and "
    "celestial cues during their seasonal journeys " * 3,
]


def docs_ds():
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(DOCS), dtype=np.int64), "text": DOCS}))


def test_embedding_is_normalized_and_semantic():
    arr = pa.array(["solar energy panel", "solar panel energy",
                    "flour egg dough", ""], pa.string())
    m = embed_tokens_matrix(arr, 128)
    norms = np.linalg.norm(m, axis=1)
    assert np.allclose(norms[:3], 1.0)
    assert norms[3] == 0.0  # empty text -> zero vector
    # same bag of words -> identical embedding
    assert np.allclose(m[0], m[1])
    # unrelated text -> lower cosine than related
    assert m[0] @ m[2] < 0.5


def test_embed_text_stage(ray_session):
    out = embed_text(docs_ds(), col="text", dim=64,
                     concurrency=2).to_pandas()
    assert all(len(v) == 64 for v in out["embedding"])
    assert np.allclose([np.linalg.norm(v) for v in out["embedding"]], 1.0)


def test_build_and_search_end_to_end(ray_session, tmp_path):
    path = str(tmp_path / "ragidx")
    rec = build_rag_index(docs_ds(), path, max_tokens=24, overlap=8,
                          dim=128, run_id="base", concurrency=2)
    assert rec["graph"].get("skipped") is not True
    # idempotent resume
    rec2 = build_rag_index(docs_ds(), path, max_tokens=24, overlap=8,
                           dim=128, run_id="base", concurrency=2)
    assert rec2["graph"]["skipped"] is True

    queries = ["photovoltaic solar energy", "bake the dough with flour",
               "enterprise subscription revenue"]
    hits = rag_search(path, queries, k=3, dim=128)
    assert not hits.empty
    top = hits.sort_values(["query_id", "sim"],
                           ascending=[True, False]).groupby("query_id").head(1)
    assert list(top.sort_values("query_id")["doc_id"]) == [0, 2, 1]
    # text joins back and matches the winning doc's vocabulary
    row = top[top.query_id == 0].iloc[0]
    assert "solar" in row["chunk_text"]
    # rank column from the exact top-k merge is dense per query
    assert set(hits.groupby("query_id").size()) == {3}


def test_incremental_ingest(ray_session, tmp_path):
    path = str(tmp_path / "ragidx2")
    build_rag_index(docs_ds(), path, max_tokens=24, overlap=8, dim=128,
                    run_id="crawl0", concurrency=2)
    new = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([100], dtype=np.int64),
        "text": ["volcanic basalt columns form hexagonal patterns as "
                 "lava cools slowly over centuries " * 3]}))
    build_rag_index(new, path, max_tokens=24, overlap=8, dim=128,
                    run_id="crawl1", concurrency=2)
    hits = rag_search(path, ["hexagonal basalt lava"], k=2, dim=128)
    assert hits.sort_values("sim", ascending=False)["doc_id"].iloc[0] == 100
    # old corpus still searchable
    hits0 = rag_search(path, ["photovoltaic solar"], k=2, dim=128)
    assert hits0.sort_values("sim", ascending=False)["doc_id"].iloc[0] == 0


def test_uid_rejects_out_of_range_doc_ids(ray_session, tmp_path):
    # doc_id >= 2^43 would wrap the packed (doc_id << 20) | seq uid
    bad = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([0, 1 << 44], dtype=np.int64),
        "text": ["short text here", "another short text"],
    }))
    with pytest.raises(Exception) as ei:
        build_rag_index(bad, str(tmp_path / "ix"), max_tokens=8,
                        overlap=2, dim=32, concurrency=1)
    assert "doc_id outside" in str(ei.value)

    neg = rd.from_pandas(pd.DataFrame({
        "doc_id": np.array([-1], dtype=np.int64),
        "text": ["negative id text"],
    }))
    with pytest.raises(Exception) as ei2:
        build_rag_index(neg, str(tmp_path / "ix2"), max_tokens=8,
                        overlap=2, dim=32, concurrency=1)
    assert "doc_id outside" in str(ei2.value)
