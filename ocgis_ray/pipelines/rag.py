"""RAG-style retrieval composition: chunk -> embed -> persisted ANN
index -> search — the end-to-end shape a retrieval corpus build runs
at 100 TB, composed entirely from existing engine stages:

- :func:`ocgis_ray.stages.chunk.chunk_by_tokens` windows documents
  (no shuffle, byte-exact slices);
- :class:`HashingEmbedder` embeds chunk text by the feature-hashing
  trick (Weinberger et al. 2009): whitespace-token hashes scatter
  into ``dim`` signed buckets, L2-normalized.  A REAL deterministic
  embedding — similar token distributions get high cosine — standing
  in for a neural encoder behind the same actor seam (swap the class,
  keep the pipeline); the container ships no model weights, so this
  is the honest in-repo encoder;
- :func:`ocgis_ray.stages.ann.hnsw_index_write` persists shard-local
  HNSW graphs atomically (lineage ``part=<run_id>``, idempotent
  resume, incremental ingest);
- :func:`rag_search` embeds the query strings with the SAME kernel
  and runs the persisted-index beam search + exact top-k merge, then
  joins chunk text back via a pushed-down parquet read.

Scale notes: chunking and embedding are embarrassingly parallel; the
index build is per-shard (batch-local graphs); the only all-to-all is
the final candidate top-k merge (query-count-sized, tiny).  Chunk ids
pack (doc_id << CHUNK_SEQ_BITS) | chunk_seq so they stay int64-
joinable and invertible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.text import KERNEL_BATCH_SIZE, _tokenize_hash

CHUNK_SEQ_BITS = 20  # up to ~1M chunks per document


def embed_tokens_matrix(arr, dim: int) -> np.ndarray:
    """Arrow string column -> (n, dim) L2-normalized feature-hashing
    embedding.  Sign = token-hash bit 63, bucket = hash % dim; fully
    vectorized (one scatter-add per batch).  Empty texts embed to the
    zero vector (cosine 0 against everything)."""
    h, tok_row, _ = _tokenize_hash(arr, lower=True)
    n = len(arr)
    m = np.zeros((n, dim), dtype=np.float64)
    if len(h):
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)).astype(bool), -1.0, 1.0)
        np.add.at(m, (tok_row, bucket), sign)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class HashingEmbedder:
    """Actor stage: append a ``list<double>`` embedding column."""

    def __init__(self, col: str, dim: int, out: str = "embedding"):
        self.col = col
        self.dim = dim
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        m = embed_tokens_matrix(arr, self.dim)
        flat = pa.array(m.ravel(), pa.float64())
        offs = pa.array(np.arange(0, (t.num_rows + 1) * self.dim, self.dim,
                                  dtype=np.int32))
        return t.append_column(self.out,
                               pa.ListArray.from_arrays(offs, flat))


def embed_text(ds, col: str = "chunk_text", dim: int = 256,
               out: str = "embedding", concurrency=None,
               batch_size: int = KERNEL_BATCH_SIZE):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        HashingEmbedder, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"col": col, "dim": dim, "out": out})


def build_rag_index(docs, path: str, col: str = "text",
                    id_col: str = "doc_id", max_tokens: int = 128,
                    overlap: int = 32, dim: int = 256, M: int = 12,
                    ef_construction: int = 48, run_id: str = "base",
                    shard_size: int = 8192, concurrency=None) -> dict:
    """documents Dataset -> persisted chunk-level HNSW index at
    ``path`` (graphs under ``path/graph``, chunk texts under
    ``path/chunks`` — both lineage-managed and resumable; re-running
    a completed ``run_id`` is a no-op, a NEW run_id appends the next
    crawl increment)."""
    from ocgis_ray.stages.ann import hnsw_index_write
    from ocgis_ray.stages.chunk import chunk_by_tokens
    from ocgis_ray.state import lineage

    # resume checks FIRST: the chunk table below is materialized
    # eagerly, so a completed run_id must short-circuit before any
    # data work (the documented no-op re-run contract)
    chunks_done = run_id in lineage.completed_partitions(f"{path}/chunks")
    graph_done = run_id in lineage.completed_partitions(f"{path}/graph")
    if chunks_done and graph_done:
        return {"path": path, "dim": dim,
                "graph": {"partition": run_id, "skipped": True}}

    chunks = chunk_by_tokens(docs, col=col, id_col=id_col,
                             max_tokens=max_tokens, overlap=overlap)

    def add_uid(t: pa.Table) -> pa.Table:
        did = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        seq = t["chunk_seq"].to_numpy(zero_copy_only=False)
        if seq.size and int(seq.max()) >= (1 << CHUNK_SEQ_BITS):
            raise ValueError("chunk_seq overflows CHUNK_SEQ_BITS — "
                             "raise max_tokens or split the document")
        if did.size and (int(did.min()) < 0
                         or int(did.max()) >= (1 << (63 - CHUNK_SEQ_BITS))):
            raise ValueError(
                f"doc_id outside [0, 2^{63 - CHUNK_SEQ_BITS}) — the "
                "packed (doc_id << CHUNK_SEQ_BITS) | chunk_seq uid "
                "would wrap/collide; remap ids or lower CHUNK_SEQ_BITS")
        uid = (did << CHUNK_SEQ_BITS) | seq
        return t.append_column("chunk_uid", pa.array(uid))

    chunks = chunks.map_batches(add_uid, batch_format="pyarrow",
                                zero_copy_batch=True)
    # split single-block inputs (e.g. one small parquet file) so the
    # embed pool, chunk write and HNSW shard builds all parallelize;
    # streaming block split, not a shuffle.  Materialize: the chunk
    # table feeds TWO branches (the persisted chunk partition and the
    # embed->graph build) and Ray re-executes shared lazy subplans —
    # without this the docs are read and chunked twice.  The cached
    # blocks spill to disk past the object-store budget.
    chunks = chunks.repartition(
        target_num_rows_per_block=shard_size).materialize()
    emb = embed_text(chunks, dim=dim, concurrency=concurrency)
    if not chunks_done:
        lineage.write_partition(
            chunks.select_columns([id_col, "chunk_seq", "chunk_uid",
                                   "chunk_text", "chunk_tokens"]),
            f"{path}/chunks", run_id, meta={"dim": dim})
    rec = hnsw_index_write(
        emb.select_columns(["chunk_uid", "embedding"]),
        f"{path}/graph", id_col="chunk_uid", M=M,
        ef_construction=ef_construction, run_id=run_id,
        batch_size=shard_size, concurrency=concurrency)
    return {"path": path, "dim": dim, "graph": rec}


def rag_search(path: str, query_texts: list[str], k: int = 5,
               dim: int = 256, ef_search: int = 64,
               with_text: bool = True) -> pd.DataFrame:
    """Query strings -> top-k chunks (query_id, chunk_uid, doc_id,
    chunk_seq, sim [, chunk_text]) — queries embed with the SAME
    kernel the index used, so train/serve skew is impossible by
    construction."""
    import glob
    import os

    import pyarrow.parquet as pq

    from ocgis_ray.stages.ann import hnsw_index_search

    qmat = embed_tokens_matrix(pa.array(query_texts, pa.string()), dim)
    queries = pd.DataFrame({
        "query_id": np.arange(len(query_texts), dtype=np.int64),
        "embedding": list(qmat),
    })
    hits = hnsw_index_search(f"{path}/graph", queries, k,
                             id_col="chunk_uid",
                             ef_search=ef_search).to_pandas()
    hits["doc_id"] = hits["chunk_uid"].to_numpy(np.int64) >> CHUNK_SEQ_BITS
    hits["chunk_seq"] = (hits["chunk_uid"].to_numpy(np.int64)
                         & ((1 << CHUNK_SEQ_BITS) - 1))
    if not with_text or hits.empty:
        return hits
    files = sorted(glob.glob(os.path.join(path, "chunks", "part=*",
                                          "*.parquet")))
    uids = hits["chunk_uid"].unique().tolist()
    # pushed-down id filter: only the row groups holding the k*queries
    # result chunks leave storage, never the corpus
    text = pq.read_table(files, columns=["chunk_uid", "chunk_text"],
                         filters=[("chunk_uid", "in", uids)]).to_pandas()
    return hits.merge(text, on="chunk_uid", how="left")
