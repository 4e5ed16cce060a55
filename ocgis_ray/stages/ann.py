"""Similarity search over embedding columns (list<float>).

No reference analog (the reference's nearest-neighbor machinery is
spatial, ``/root/reference/src/ocgis/variable/geom.py:803-821``); this
is the embedding counterpart the build brief mandates:

- :func:`ann_bruteforce` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does ONE numpy matmul
  (Q x D) @ (D x B), emits a per-batch partial top-k, and a tiny final
  ``groupby(query_id)`` combine ranks.  Pages stream; only Q*k rows
  per batch reach the shuffle.
- :func:`ann_lsh` — the scale path: random-hyperplane signatures
  bucket vectors into 2^nbits cells per table; queries probe their
  buckets across ``ntables`` tables, exact-refining candidates only.
  Recall measured against brute force in tests.
- :func:`embedding_near_duplicates` — cosine >= threshold pairs via
  the same LSH buckets (embedding near-dup for dedup suites).

Ranking ties break on vec_id (deterministic output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    return np.stack(batch[col].to_pandas().to_numpy())


def load_query_vectors(sf_dir: str, vec_ids: list[int]) -> pd.DataFrame:
    """Driver-side tiny read of query vectors by id."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    q = t[t["vec_id"].isin(vec_ids)].sort_values("vec_id")
    return pd.DataFrame({"query_id": q["vec_id"].to_numpy(np.int64),
                         "embedding": q["embedding"].to_numpy()})


class _CosineTopK:
    def __init__(self, queries_ref, k: int, id_col: str, col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qid = q["query_id"]
        self.qmat = _normalize(q["mat"].astype(np.float64))
        self.k = k
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = _normalize(_batch_matrix(batch, self.col).astype(np.float64))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.qmat @ m.T  # (Q, B) — one matmul per batch
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        return pa.table({
            "query_id": pa.array(np.repeat(self.qid, k)),
            self.id_col: pa.array(ids[part.ravel()]),
            "sim": pa.array(np.take_along_axis(sims, part, axis=1).ravel()),
        })


def ann_bruteforce(ds, queries: pd.DataFrame, k: int, id_col: str = "vec_id",
                   col: str = "embedding", concurrency: int | None = 4,
                   batch_size: int = 4096):
    """Exact cosine top-k per query vector."""
    import ray

    q = {"query_id": queries["query_id"].to_numpy(np.int64),
         "mat": np.stack(queries["embedding"].to_numpy())}
    qref = ray.put(q)
    partial = ds.map_batches(
        _CosineTopK, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "id_col": id_col, "col": col},
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def _hyperplanes(dim: int, nbits: int, ntables: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(ntables, nbits, dim))


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(N, D) x (T, B, D) -> (T, N) integer bucket ids."""
    bits = (np.einsum("tbd,nd->tnb", planes, mat) > 0).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64))
    return (bits * weights[None, None, :]).sum(axis=2)


class _LshBucketStage:
    def __init__(self, planes_ref, id_col: str, col: str):
        import ray

        self.planes = ray.get(planes_ref) if not isinstance(planes_ref, np.ndarray) else planes_ref
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"table_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64())})
        m = _normalize(_batch_matrix(batch, self.col).astype(np.float64))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sig = _signatures(m, self.planes)  # (T, N)
        t_count, n = sig.shape
        return pa.table({
            "table_id": pa.array(np.repeat(np.arange(t_count, dtype=np.int64), n)),
            "bucket": pa.array(sig.astype(np.int64).ravel()),
            self.id_col: pa.array(np.tile(ids, t_count)),
        })


def ann_lsh(ds, queries: pd.DataFrame, k: int, id_col: str = "vec_id",
            col: str = "embedding", nbits: int = 10, ntables: int = 8,
            batch_size: int = 4096):
    """LSH-bucketed approximate cosine top-k.

    Pipeline: bucket rows for the data side (one pass), driver-side
    bucket ids for the queries, semi-join on (table, bucket) inside
    ``map_batches`` via broadcast of the query buckets, exact refine of
    the candidate union per query."""
    import ray

    qmat = _normalize(np.stack(queries["embedding"].to_numpy()).astype(np.float64))
    dim = qmat.shape[1]
    planes = _hyperplanes(dim, nbits, ntables)
    qsig = _signatures(qmat, planes)  # (T, Q)
    qid = queries["query_id"].to_numpy(np.int64)
    # query bucket lookup: (table, bucket) -> query ids
    qbuckets: dict[tuple[int, int], list[int]] = {}
    for t in range(ntables):
        for j, q in enumerate(qid):
            qbuckets.setdefault((t, int(qsig[t, j])), []).append(int(q))
    planes_ref = ray.put(planes)
    qb_ref = ray.put(qbuckets)

    class CandidateStage:
        def __init__(self):
            self.planes = ray.get(planes_ref)
            qb = ray.get(qb_ref)
            # per table: sorted bucket ids with query-list offsets, for
            # vectorized probe via searchsorted (no per-row Python)
            ntab = self.planes.shape[0]
            self.tab_buckets: list[np.ndarray] = []
            self.tab_qoff: list[np.ndarray] = []
            self.tab_qids: list[np.ndarray] = []
            for t in range(ntab):
                items = sorted(
                    (b, qs) for (tt, b), qs in qb.items() if tt == t
                )
                buckets = np.asarray([b for b, _ in items], dtype=np.int64)
                qids = [q for _, qs in items for q in qs]
                lens = np.asarray([len(qs) for _, qs in items], dtype=np.int64)
                off = np.concatenate([[0], np.cumsum(lens)])
                self.tab_buckets.append(buckets)
                self.tab_qoff.append(off)
                self.tab_qids.append(np.asarray(qids, dtype=np.int64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_q, out_i = [], []
            if batch.num_rows:
                m = _normalize(_batch_matrix(batch, col).astype(np.float64))
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                sig = _signatures(m, self.planes).astype(np.int64)
                for t in range(sig.shape[0]):
                    buckets = self.tab_buckets[t]
                    if buckets.size == 0:
                        continue
                    pos = np.searchsorted(buckets, sig[t])
                    pos_c = np.minimum(pos, buckets.size - 1)
                    hit = buckets[pos_c] == sig[t]
                    rows = np.nonzero(hit)[0]
                    if rows.size == 0:
                        continue
                    off = self.tab_qoff[t]
                    p = pos_c[rows]
                    counts = off[p + 1] - off[p]
                    out_i.append(np.repeat(ids[rows], counts))
                    # gather the query ids for each hit slot
                    gather = np.concatenate(
                        [self.tab_qids[t][off[j]:off[j + 1]] for j in p]
                    ) if rows.size else np.empty(0, np.int64)
                    out_q.append(gather)
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 id_col: pa.array([], pa.int64())})
            return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                             id_col: pa.array(np.concatenate(out_i))})

    from ocgis_ray.sources.io import distinct_rows

    cand = ds.map_batches(CandidateStage, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=2)
    cand = distinct_rows(cand, ["query_id", id_col])
    # exact refine: broadcast-join candidates back to vectors
    vec_pdf = ds.to_pandas()
    vec_map = {int(v): e for v, e in zip(vec_pdf[id_col], vec_pdf[col])}
    vref = ray.put(vec_map)
    qmap = {int(q): qmat[i] for i, q in enumerate(qid)}
    qmref = ray.put(qmap)

    class Refine:
        def __init__(self):
            self.vecs = ray.get(vref)
            self.qs = ray.get(qmref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sims = np.empty(len(df))
            for i, (q, v) in enumerate(zip(df["query_id"], df[id_col])):
                vv = _normalize(np.asarray(self.vecs[int(v)], dtype=np.float64)[None, :])[0]
                sims[i] = float(self.qs[int(q)] @ vv)
            df = df.copy()
            df["sim"] = sims
            return df

    refined = cand.map_batches(Refine, batch_format="pandas", concurrency=2)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return refined.groupby("query_id").map_groups(final, batch_format="pandas")


def embedding_near_duplicates(ds, threshold: float = 0.95, id_col: str = "vec_id",
                              col: str = "embedding", nbits: int = 12,
                              ntables: int = 6, batch_size: int = 4096):
    """Cosine-similarity near-dup pairs via shared LSH buckets."""
    import ray

    first = ds.take_batch(1, batch_format="pandas")
    dim = len(first[col][0])
    planes = _hyperplanes(dim, nbits, ntables, seed=13)
    planes_ref = ray.put(planes)

    bucket_rows = ds.map_batches(
        _LshBucketStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=2,
        fn_constructor_kwargs={"planes_ref": planes_ref, "id_col": id_col, "col": col},
    )

    vec_pdf = ds.to_pandas()
    vec_mat = _normalize(np.stack(vec_pdf[col].to_numpy()).astype(np.float64))
    vmap = {int(v): vec_mat[i] for i, v in enumerate(vec_pdf[id_col])}
    vref = ray.put(vmap)

    def pair_stage(g: pd.DataFrame) -> pd.DataFrame:
        # hash-bucketed apply: the fn sees many LSH buckets at once;
        # per-LSH-bucket pairing runs only where >=2 vectors collide.
        # The vector map is fetched from the local object store per
        # task (zero-copy plasma read).
        empty = pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                              "vec_b": pd.Series(dtype=np.int64),
                              "sim": pd.Series(dtype=np.float64)})
        g = g.drop_duplicates(["table_id", "bucket", id_col])
        sizes = g.groupby(["table_id", "bucket"], sort=False)[id_col].transform("size")
        g = g[sizes >= 2]
        if len(g) == 0:
            return empty
        vecs = ray.get(vref)
        frames = []
        for _, grp in g.groupby(["table_id", "bucket"], sort=False):
            ids = np.sort(np.unique(grp[id_col].to_numpy()))
            m = np.stack([vecs[int(i)] for i in ids])
            sims = m @ m.T
            ia, ib = np.triu_indices(ids.size, k=1)
            s = sims[ia, ib]
            keep = s >= threshold
            frames.append(pd.DataFrame({"vec_a": ids[ia][keep],
                                        "vec_b": ids[ib][keep], "sim": s[keep]}))
        return pd.concat(frames, ignore_index=True) if frames else empty

    from ocgis_ray.sources.io import bucketed_group_apply, distinct_rows

    pairs = bucketed_group_apply(bucket_rows, ["table_id", "bucket"], pair_stage)
    return distinct_rows(pairs, ["vec_a", "vec_b"])
