"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference guarantees uniqueness geometrically (cell-in-exactly-one
-tile, ``/root/reference/src/ocgis/spatial/base.py:776-790``) and packs
duplicate coordinates during geometry->mesh conversion
(``variable/geom.py:349,392``, ``spatial/geomc.py:868-990``).  A
training-data pipeline needs content dedup, so this module adds the
standard family as first-class Ray Data operators:

- **exact**: content hash -> hash-partitioned ``groupby`` -> keep the
  first (min id) per group.  The shuffle key is the hash, so identical
  docs co-locate; partial per-batch dedup keeps the shuffle small.
- **MinHash + LSH**: token-Horner word shingles (zero-copy byte
  view, no shingle strings) -> 128-perm minhash signature (binary-
  packed) -> threshold-tuned banded LSH bucket rows -> candidate
  pairs -> per-side signature attach (task-based bucketed join) ->
  vectorized estimated-Jaccard filter -> distributed anti-join
  survivor set.  Every hash is deterministic and process-independent.
- **SimHash**: 64-bit token-weighted signature; Hamming-<=h pairs via
  4-band pigeonhole + popcount-LUT verification.
- **n-gram Jaccard**: exact pairwise verifier (tests + small-scale
  candidate confirmation).

Determinism note: every hash here is a pure function of the content,
so retries/resume produce identical survivor sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ------------------------------------------------------------------ exact

def add_text_hash(ds, col: str = "text", out: str = "text_hash"):
    """64-bit deterministic content hash column — zero-copy full-
    content Horner+splitmix over the Arrow byte buffer
    (:func:`ocgis_ray.stages.text.string_value_hash`); no per-row
    Python objects ever materialize (the former pandas
    ``hash_array(dtype=object)`` copied every document per batch on
    the exact-dedup hot path)."""
    from ocgis_ray.stages.text import string_value_hash

    def f(t: pa.Table) -> pa.Table:
        h = string_value_hash(t[col]).view(np.int64)
        return t.append_column(out, pa.array(h, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def dedup_exact(ds, id_col: str = "doc_id", col: str = "text"):
    """Keep the min-id row per distinct content (hash-partitioned via
    the bucketed shuffle — identical hashes co-locate, keep-first runs
    vectorized per bucket).

    SQL twin: ``SELECT min(id) FROM t GROUP BY content``."""
    from ocgis_ray.sources.io import distinct_rows

    hashed = add_text_hash(ds, col=col)
    out = distinct_rows(hashed, "text_hash", order_col=id_col)
    return out.drop_columns(["text_hash"])


def soft_dedup_weights(ds, col: str = "text", alpha: float = 1.0,
                       out: str = "soft_w", count_col: str | None = None,
                       keep_first_by: str | None = None,
                       num_buckets: int | None = None):
    """SoftDeDup (He et al. 2024): instead of REMOVING duplicates,
    downweight them — every row gains a sampling weight
    ``n^-alpha`` where ``n`` is its exact-content duplicate-cluster
    size (``alpha=1`` makes each distinct document contribute unit
    total weight; ``alpha<1`` interpolates toward keeping duplicates).
    The weight column feeds loss reweighting or rate-based sampling
    (:func:`ocgis_ray.stages.reshape.sample_by_key` with per-row
    rates) without the survivor-choice bias of hard dedup.

    Scale shape: ONE hash-bucketed shuffle (same key the exact-dedup
    cascade uses) — cluster counting and weight attach happen in the
    same vectorized per-bucket pass; nothing is corpus-sized, no join
    back.  Pre-project fat columns away if only (id, weight) is
    needed downstream.

    SQL twin (alpha=1): ``1.0 / count(*) OVER (PARTITION BY content)``
    — exact IEEE equality, both sides compute one double division.
    For general alpha the engine computes ``exp(-alpha * log(n))`` via
    numpy ``power``; twin with DuckDB ``power(n, -alpha)`` and round.

    ``keep_first_by``: also HARD-dedup in the same pass — keep only
    the min-``keep_first_by`` row per cluster, carrying its cluster
    weight (the fused weights+dedup the exact-dedup oracle uses: one
    hash pass and one shuffle instead of two of each).
    """
    from ocgis_ray.sources.io import bucketed_group_apply

    hashed = add_text_hash(ds, col=col)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("text_hash", sort=False)["text_hash"].transform("size")
        cnt = n.to_numpy(np.int64)
        w = (1.0 / cnt.astype(np.float64) if alpha == 1.0
             else np.power(cnt.astype(np.float64), -float(alpha)))
        if count_col is not None:
            g[count_col] = cnt
        g[out] = w
        if keep_first_by is not None:
            g = g.sort_values(keep_first_by, kind="mergesort") \
                 .drop_duplicates("text_hash", keep="first")
        return g.drop(columns=["text_hash"])

    return bucketed_group_apply(hashed, "text_hash", per_bucket,
                                num_buckets=num_buckets)


# ------------------------------------------------------------------ shingles

def _shingle_hashes_batch(arr, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (shingle_hashes, shingles_per_row).

    Fully vectorized: per-token Horner byte hashes (case-preserving)
    from the zero-copy byte view, then a polynomial combine of each
    k-token window (never crossing row boundaries) — no shingle STRING
    is ever materialized.  Rows with < k tokens hash their full token
    sequence; empty rows hash the empty sequence (mix(0))."""
    from ocgis_ray.stages.text import _mix64, _tokenize_hash

    tok_h, tok_row, per_row = _tokenize_hash(arr, lower=False)
    n = per_row.shape[0]
    if n == 0:  # empty batch: np.repeat/reduceat reject the (0,) shapes
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    counts = np.maximum(per_row - k + 1, 1)  # short/empty rows -> 1 shingle
    total = int(counts.sum())
    # window start index (into the flat token array) for every shingle
    row_tok_start = np.concatenate([[0], np.cumsum(per_row)[:-1]])
    seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total) - np.repeat(seg_starts, counts)
    win_start = np.repeat(row_tok_start, counts) + within
    win_len = np.minimum(np.repeat(per_row, counts), k)
    h = np.zeros(total, dtype=np.uint64)
    for u in range(k):
        act = win_len > u
        h[act] = h[act] * _FNV_SHINGLE + tok_h[win_start[act] + u]
    return _mix64(h), counts


_FNV_SHINGLE = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes for ONE text (unique) — scalar twin
    of :func:`_shingle_hashes_batch`, used by the exact verifier."""
    h, _ = _shingle_hashes_batch(pa.array([text], pa.string()), k)
    return np.unique(h)


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (the brute-force verifier)."""
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


# ------------------------------------------------------------------ minhash

def _pack_sigs(sigs: np.ndarray) -> "pa.Array":
    """(N, P) uint64 signature matrix -> fixed-width binary column
    (one buffer copy, no per-row Python)."""
    sigs = np.ascontiguousarray(sigs, dtype=np.uint64)
    if sigs.shape[0] == 0:
        return pa.array([], type=pa.binary())
    width = sigs.shape[1] * 8
    offsets = np.arange(0, (sigs.shape[0] + 1) * width, width, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), sigs.shape[0],
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(sigs.tobytes())],
    )


def _unpack_sigs(col, num_perm: int) -> np.ndarray:
    """Binary signature column -> (N, P) uint64 (zero-copy view)."""
    if isinstance(col, pd.Series):
        if len(col) == 0:
            return np.empty((0, num_perm), dtype=np.uint64)
        return np.frombuffer(b"".join(col.to_numpy()), dtype=np.uint64).reshape(
            len(col), num_perm
        )
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int32)[col.offset: col.offset + len(col) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint64)
    start = off[0] // 8
    return data[start: start + len(col) * num_perm].reshape(len(col), num_perm)


class MinHashStage:
    """Actor: text -> 128-perm minhash signature (uint64 wrap hashing).

    Permutation params are generated once per actor from a fixed seed
    (identical across actors — this is shared static state, not
    per-actor randomness)."""

    def __init__(self, num_perm: int = 128, k: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**63 - 1, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
        self.b = rng.randint(0, 2**63 - 1, size=num_perm).astype(np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        x = _shingle_hashes(text, self.k)
        # (P, S) universal-ish hash with uint64 wraparound, min over shingles
        h = self.a[:, None] * x[None, :] + self.b[:, None]
        return h.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        # vectorized across the whole batch: token hashes + k-window
        # polynomial shingle hashes straight off the zero-copy byte
        # view (no shingle strings), then segment-min per doc via
        # np.minimum.reduceat — no per-doc Python anywhere.
        n = t.num_rows
        x, counts = _shingle_hashes_batch(t["text"], self.k)
        if n == 0:  # reduceat rejects empty starts
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "sig": pa.array([], pa.binary()),
            })
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        # shingle-major (S, P_chunk) layout: reduceat along axis 0 runs
        # contiguous-row mins for all perms at once (3x faster than the
        # perm-major layout; full unchunked S-major thrashes memory)
        pchunk = 32
        for p0 in range(0, self.num_perm, pchunk):
            a = self.a[None, p0 : p0 + pchunk]
            b = self.b[None, p0 : p0 + pchunk]
            h = x[:, None] * a + b  # uint64 wrap
            sigs[:, p0 : p0 + pchunk] = np.minimum.reduceat(h, starts, axis=0)
        # fixed-width binary signature column: survives Acero hash
        # joins (list columns don't) and decodes zero-copy
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sig": _pack_sigs(sigs),
            }
        )


def minhash_signatures(ds, num_perm: int = 128, k: int = 3,
                       concurrency=None):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        MinHashStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
    )


def _band_rows(t: pa.Table, bands: int, rows: int) -> pa.Table:
    """Explode signatures to (band, band_hash, doc_id) LSH rows
    (Arrow in/out — slim columns, no pandas hop)."""
    sig = _unpack_sigs(t["sig"], bands * rows)  # (N, P)
    n = sig.shape[0]
    out_band, out_hash, out_doc = [], [], []
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    for b in range(bands):
        chunk = sig[:, b * rows : (b + 1) * rows]
        # polynomial combine of the band's rows (vectorized)
        h = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(chunk.shape[1]):
                h = h * np.uint64(1099511628211) + chunk[:, j]
        out_band.append(np.full(n, b, dtype=np.int64))
        out_hash.append(h.astype(np.int64))
        out_doc.append(doc)
    return pa.table(
        {
            "band": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_hash)),
            "doc_id": pa.array(np.concatenate(out_doc)),
        }
    )


def _expand_bucket_pairs(band: np.ndarray, bhash: np.ndarray,
                         doc: np.ndarray, max_bucket: int | None = None,
                         flags: np.ndarray | None = None):
    """Vectorized within-(band, band_hash) ordered-pair expansion.

    Sorts rows by (band, band_hash, doc_id), dedupes identical
    (band, band_hash, doc_id) rows, then emits every i<j pair inside
    each group with NO per-group Python loop: each left element at
    local position p contributes ``s_eff - 1 - p`` pairs, so the pair
    lists are two ``np.repeat``/arange gathers over the whole bucket
    (a bucket can hold millions of colliding rows at crawl scale —
    the former per-group loop was the scale bottleneck).

    ``max_bucket`` keeps only the first (smallest-id) N docs per
    group, counting the truncated docs in ``n_dropped``.  ``flags``
    (aligned with the input rows) is deduped/sorted alongside and
    returned for per-side gathers.

    Returns ``(doc_sorted, a_idx, b_idx, n_dropped, flags_sorted)``
    with a/b as indices into ``doc_sorted`` (a's doc < b's doc)."""
    order = np.lexsort((doc, bhash, band))
    b_s, h_s, d_s = band[order], bhash[order], doc[order]
    f_s = flags[order] if flags is not None else None
    new = np.empty(len(order), dtype=bool)
    new[:1] = True
    new[1:] = ((b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
               | (d_s[1:] != d_s[:-1]))
    b_s, h_s, d_s = b_s[new], h_s[new], d_s[new]
    if f_s is not None:
        f_s = f_s[new]
    n = len(d_s)
    gb = np.empty(n, dtype=bool)
    gb[:1] = n > 0
    gb[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
    gid = np.cumsum(gb) - 1
    starts = np.nonzero(gb)[0]
    sizes = np.diff(np.append(starts, n))
    local = np.arange(n, dtype=np.int64) - starts[gid]
    s_eff = np.minimum(sizes, max_bucket) if max_bucket else sizes
    n_dropped = int((sizes - s_eff).sum()) if max_bucket else 0
    lcnt = np.maximum(s_eff[gid] - 1 - local, 0)
    total = int(lcnt.sum())
    if total == 0:
        z = np.empty(0, np.int64)
        return d_s, z, z, n_dropped, f_s
    a_idx = np.repeat(np.arange(n, dtype=np.int64), lcnt)
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lcnt, out=cum[1:])
    b_idx = np.arange(total, dtype=np.int64) - cum[a_idx] + a_idx + 1
    return d_s, a_idx, b_idx, n_dropped, f_s


def pick_lsh_bands(num_perm: int, threshold: float) -> tuple[int, int]:
    """(bands, rows) from the target Jaccard threshold.

    The banding S-curve midpoint is (1/bands)^(1/rows); choose the
    largest rows (fewest candidate pairs) whose midpoint still sits AT
    OR BELOW the threshold, so pairs at the threshold collide with
    high probability (the standard datasketch-style tuning)."""
    rows = 1
    for r in (2, 4, 8, 16, 32):
        if num_perm % r:
            continue
        if (r / num_perm) ** (1.0 / r) <= threshold:
            rows = r
    return num_perm // rows, rows


def lsh_candidate_pairs(sig_ds, bands: int = 16, rows: int = 8, max_bucket: int = 2000,
                        distinct: bool = True):
    """Banded LSH: bucket rows -> bucketed shuffle -> within-bucket
    pairs (vectorized over LSH buckets that actually collide — almost
    all (band, band_hash) keys are singletons and are dropped without
    per-key Python).

    Oversized buckets (> ``max_bucket``) are truncated with a log —
    the no-silent-caps rule; at 100 TB scale a bucket that large means
    a degenerate shingle (boilerplate) better handled upstream."""
    from ocgis_ray.sources.io import bucketed_group_apply, distinct_rows

    band_ds = sig_ds.map_batches(
        lambda t: _band_rows(t, bands, rows), batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pairs(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        d_s, ia, ib, n_dropped, _ = _expand_bucket_pairs(
            g["band"].to_numpy(zero_copy_only=False),
            g["band_hash"].to_numpy(zero_copy_only=False),
            g["doc_id"].to_numpy(zero_copy_only=False),
            max_bucket=max_bucket)
        if n_dropped:
            # no-silent-caps: a degenerate boilerplate bucket past
            # max_bucket loses pairings — say so in the worker log
            print(f"lsh_candidate_pairs: truncated {n_dropped} docs "
                  f"past max_bucket={max_bucket} in oversized buckets",
                  flush=True)
        return pa.table({"doc_a": pa.array(d_s[ia], type=pa.int64()),
                         "doc_b": pa.array(d_s[ib], type=pa.int64())})

    cand = bucketed_group_apply(band_ds, ["band", "band_hash"], pairs,
                                batch_format="pyarrow")
    if not distinct:
        # caller collapses duplicates itself (e.g. bucketed_pair_attach's
        # final per-(doc_a, doc_b)-bucket combine) — skip a full shuffle
        return cand
    # distinct pairs (a pair can surface from many bands)
    return distinct_rows(cand, ["doc_a", "doc_b"])


def minhash_near_duplicates(ds, threshold: float = 0.7, num_perm: int = 128,
                            k: int = 3, bands: int | None = None,
                            rows: int | None = None,
                            num_partitions: int | None = None):
    """Full MinHash-LSH near-dup pipeline: signatures -> LSH candidates
    -> signature-estimated Jaccard >= threshold.

    Returns a Dataset of (doc_a, doc_b, est_jaccard).  Estimation uses
    the standard matching-minima fraction; exact confirmation (for
    tests / borderline pairs) is :func:`ngram_jaccard`.

    Dataflow is fully distributed: the signature table (binary-packed,
    ~1KB/doc) feeds both the banding scan and two hash-shuffle
    ``Dataset.join``s that attach each candidate side's signature; the
    estimate then runs as ONE vectorized (N, P) compare per batch.  It
    is materialized once (a distributed checkpoint in the object
    store, NOT a driver collect) because two consumers read it — at
    warehouse scale this is the signatures-to-parquet checkpoint every
    production minhash pipeline writes anyway."""
    from ocgis_ray.sources.io import bucketed_pair_attach

    if bands is None and rows is None:
        bands, rows = pick_lsh_bands(num_perm, threshold)
    elif bands is None:
        bands = num_perm // rows
    elif rows is None:
        rows = num_perm // bands
    sig_ds = minhash_signatures(ds, num_perm=num_perm, k=k).materialize()
    # distinct=False: duplicate pairs (same pair from many bands) are
    # collapsed exactly by bucketed_pair_attach's final combine, which
    # buckets by (doc_a, doc_b) — paying a dedicated distinct shuffle
    # here would be a fourth all-to-all for nothing
    cand = lsh_candidate_pairs(sig_ds, bands=bands, rows=rows, distinct=False)

    # task-based bucketed attach (io.bucketed_pair_attach): ~3x cheaper
    # than two native Dataset.joins at small scale (no aggregator-actor
    # spawn); io.join_datasets is the drop-in for warehouse scale
    joined = bucketed_pair_attach(cand, sig_ds, "doc_a", "doc_b",
                                  "doc_id", "sig",
                                  num_buckets=num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        sa = _unpack_sigs(batch["sig_a"], num_perm)
        sb = _unpack_sigs(batch["sig_b"], num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        out = batch.select(["doc_a", "doc_b"]).filter(pa.array(keep))
        return out.append_column("est_jaccard", pa.array(est[keep]))

    return joined.map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)


def dedup_survivors(ds, pairs, id_col: str = "doc_id",
                    num_partitions: int | None = None):
    """Greedy survivor set: drop any doc that near-matches a smaller
    id (deterministic, no connected components needed).

    ``pairs`` is a Dataset (or small DataFrame) of (doc_a, doc_b);
    losers (the max id of each pair) are removed with a hash-shuffle
    anti-join — no driver-side id set, so the pair table can be
    arbitrarily large."""
    import ray.data as rd

    from ocgis_ray.sources.io import distinct_rows, join_datasets

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs)

    def loser_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "loser_id": pa.array(np.maximum(
                t["doc_a"].to_numpy(zero_copy_only=False),
                t["doc_b"].to_numpy(zero_copy_only=False)).astype(np.int64))
        })

    # empty pair set: map_batches never runs on a row-less Dataset, so
    # the losers side would have NO schema and the anti-join would fail
    # on the missing key — and there is nothing to drop anyway.
    # materialize() first: count() would otherwise re-execute the lazy
    # candidate pipeline a second time for the losers scan
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ds
    losers = distinct_rows(
        pairs.map_batches(loser_rows, batch_format="pyarrow",
                          zero_copy_batch=True), "loser_id")
    # repartition unifies block schemas: map_groups emits zero-column
    # blocks for empty shuffle partitions, which Arrow's join rejects
    # ("no match for key field on right side")
    losers = losers.repartition(max(2, num_partitions or 2))
    return join_datasets(ds, losers, on=(id_col,), right_on=("loser_id",),
                         join_type="left_anti", num_partitions=num_partitions)


def connected_components(pairs, id_a: str = "doc_a", id_b: str = "doc_b",
                         max_rounds: int = 25, num_buckets: int | None = None):
    """Distributed connected components over a near-dup pair graph:
    (id, component) with component = MIN doc id in the component.

    The transitive-closure dedup semantics big corpus pipelines use
    (cluster near-dup pairs, keep one doc per cluster) — stricter than
    the greedy pairwise :func:`dedup_survivors`: for pairs (1,3) and
    (3,2), greedy drops only 3 (the max of each pair) and keeps both 1
    and 2, while components see {1,2,3} as one cluster and keep 1.

    Hash-min label propagation: every round each node takes the min
    label among itself and its neighbors — two bucketed task shuffles
    per round (attach neighbor labels; combine per node), labels
    materialized between rounds (the working set is one row per doc
    APPEARING IN A PAIR, far smaller than the corpus).  Converges in
    O(component diameter) rounds — near-dup clusters are dense, so
    measured rounds are 2-4; the loop stops early on a converged round
    (changed == 0, computed as a Dataset aggregate, never a driver
    materialization) and RAISES if ``max_rounds`` is exhausted before
    convergence — silently returning split components would make
    :func:`dedup_cluster_survivors` keep several docs from one true
    cluster, the exact bug this function exists to prevent.
    """
    from ocgis_ray.sources.io import bucketed_group_apply

    def seed(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = pa.array(np.concatenate([a, b]))
        return pa.table({"id": ids, "label": ids})

    def edge_rows(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(np.concatenate([a, b])),
                         "src": pa.array(np.concatenate([b, a])),
                         "label": pa.array(np.full(2 * len(a), -1, np.int64))})

    def first_per_id(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("id")

    labels = bucketed_group_apply(
        pairs.map_batches(seed, batch_format="pyarrow",
                          zero_copy_batch=True), "id", first_per_id,
        num_buckets=num_buckets).materialize()
    edges = pairs.map_batches(edge_rows, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        nodes = g[g["src"] == -2]
        lab = pd.Series(nodes["label"].to_numpy(np.int64),
                        index=nodes["key"].to_numpy(np.int64))
        es = g[g["src"] != -2]
        out_id = np.concatenate([nodes["key"].to_numpy(np.int64),
                                 es["src"].to_numpy(np.int64)])
        out_cand = np.concatenate([nodes["label"].to_numpy(np.int64),
                                   lab.loc[es["key"].to_numpy(np.int64)]
                                   .to_numpy(np.int64)])
        out_self = np.concatenate([np.ones(len(nodes), np.int8),
                                   np.zeros(len(es), np.int8)])
        return pd.DataFrame({"id": out_id, "cand": out_cand,
                             "is_self": out_self})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.groupby("id", sort=False)
        new = gg["cand"].min()
        old = g[g["is_self"] == 1].set_index("id")["cand"]
        out = pd.DataFrame({"id": new.index.to_numpy(np.int64),
                            "label": new.to_numpy(np.int64)})
        out["changed"] = (new.to_numpy(np.int64)
                          < old.loc[new.index].to_numpy(np.int64)).astype(np.int64)
        return out

    changed = None
    for _ in range(max_rounds):
        def as_node(t: pa.Table) -> pa.Table:
            # the `changed` column from the previous round (absent in
            # round 1) rides along in `labels` and is simply not read
            return pa.table({"key": t["id"],
                             "src": pa.array(np.full(t.num_rows, -2,
                                                     np.int64)),
                             "label": t["label"]})

        unioned = labels.map_batches(as_node, batch_format="pyarrow",
                                     zero_copy_batch=True).union(edges)
        msgs = bucketed_group_apply(unioned, "key", attach,
                                    num_buckets=num_buckets)
        labels = bucketed_group_apply(msgs, "id", combine,
                                      num_buckets=num_buckets).materialize()
        changed = labels.sum("changed", ignore_nulls=True) or 0
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({changed} labels still changing — a component chain longer "
            "than max_rounds); raise max_rounds")
    return labels.map_batches(
        lambda t: pa.table({"id": t["id"], "component": t["label"]}),
        batch_format="pyarrow", zero_copy_batch=True)


def dedup_cluster_survivors(ds, pairs, id_col: str = "doc_id",
                            num_partitions: int | None = None,
                            max_rounds: int = 25,
                            num_buckets: int | None = None,
                            quality_col: str | None = None,
                            prefer: str = "max"):
    """Keep ONE doc per near-dup cluster: connected components over
    the pair graph, then a hash-shuffle anti-join removing the rest.

    Survivor choice: by default the component's MIN id (free — it IS
    the component label).  With ``quality_col`` the survivor is the
    cluster's best-quality doc instead (``prefer="max"``, e.g. a
    Gopher/classifier score, or ``"min"``, e.g. a perplexity) — the
    production near-dup semantics when duplicates differ in extraction
    quality: keep the cleanest copy, not the smallest id.  Quality
    ties break to the MIN id and NaN quality never beats a number, so
    survivor sets stay deterministic and resume-stable.  Costs one
    slim (id, quality) hash join plus one component-bucketed shuffle
    on the pair-graph working set (docs appearing in a pair — far
    smaller than the corpus).

    Transitive-closure semantics; see :func:`dedup_survivors` for the
    cheaper greedy pairwise variant."""
    from ocgis_ray.sources.io import bucketed_group_apply, join_datasets

    # see dedup_survivors: a row-less pair graph yields a schema-less
    # losers side, which the anti-join rejects; nothing to drop.
    # materialized so the count doesn't re-run the candidate pipeline
    # (label propagation re-reads the pair set every round anyway)
    import ray.data as rd

    if prefer not in ("max", "min"):
        raise ValueError(f"prefer must be 'max' or 'min', got {prefer!r}")
    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_pandas(pairs)
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ds
    comp = connected_components(pairs, max_rounds=max_rounds,
                                num_buckets=num_buckets)

    if quality_col is None:
        def loser_rows(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            comp_ = t["component"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({"loser_id": pa.array(ids[comp_ < ids])})

        losers = comp.map_batches(loser_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        def slim(t: pa.Table) -> pa.Table:
            return pa.table({"id": t[id_col], "_q": t[quality_col]})

        scored = join_datasets(
            comp, ds.map_batches(slim, batch_format="pyarrow",
                                 zero_copy_batch=True),
            on=("id",), num_partitions=num_partitions)
        sign = -1.0 if prefer == "max" else 1.0

        def losers_fn(g: pa.Table) -> pa.Table:
            g = g.combine_chunks()
            comp_ = g["component"].to_numpy(zero_copy_only=False)
            ids = g["id"].to_numpy(zero_copy_only=False)
            q = g["_q"].to_numpy(zero_copy_only=False).astype(np.float64)
            q = np.where(np.isnan(q), np.inf, sign * q)  # NaN never wins
            order = np.lexsort((ids, q, comp_))
            comp_s, ids_s = comp_[order], ids[order]
            first = np.empty(len(order), dtype=bool)
            first[:1] = True
            first[1:] = comp_s[1:] != comp_s[:-1]
            return pa.table({"loser_id": pa.array(ids_s[~first],
                                                  type=pa.int64())})

        losers = bucketed_group_apply(scored, "component", losers_fn,
                                      num_buckets=num_buckets,
                                      batch_format="pyarrow")

    # see dedup_survivors: repartition unifies away the zero-column
    # blocks map_groups emits for empty shuffle partitions
    losers = losers.repartition(max(2, num_partitions or 2))
    return join_datasets(ds, losers, on=(id_col,), right_on=("loser_id",),
                         join_type="left_anti", num_partitions=num_partitions)


# ------------------------------------------------------------------ simhash

_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    bytes_ = x.view(np.uint8).reshape(*x.shape, 8) if x.ndim else x.view(np.uint8)
    return _POPCOUNT_LUT[bytes_.reshape(x.size, 8)].sum(axis=1).reshape(x.shape)


class SimHashStage:
    """Actor: text -> 64-bit simhash (token-hash bit votes).

    Vectorized batch-wide: ONE tokenize+hash pass over the zero-copy
    byte view (``stages.text._tokenize_hash`` — ASCII-whitespace
    tokens, Horner+mix64 token hash), then 64 ``bincount`` bit votes
    over the token→row map.  No per-document Python (the round-1
    version looped docs and built a tokens×64 bit matrix per doc);
    null/empty text yields signature 0."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.text import _tokenize_hash

        h, tok_row, per_row = _tokenize_hash(t["text"], lower=False)
        n = t.num_rows
        sigs = np.zeros(n, dtype=np.uint64)
        for b in range(64):
            bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
            votes = np.bincount(tok_row, weights=bit, minlength=n)
            sigs |= (votes * 2.0 > per_row).astype(np.uint64) << np.uint64(b)
        return pa.table({"doc_id": t["doc_id"],
                         "simhash": pa.array(sigs.astype(np.int64))})


def simhash_signatures(ds, concurrency=None):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(SimHashStage, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


def simhash_near_duplicates(sig_ds, max_hamming: int = 3):
    """Pairs within Hamming distance via pigeonhole banding: the 64
    bits split into ``max_hamming + 1`` bands, so any pair with
    ``<= max_hamming`` differing bits must share at least one
    identical band (a fixed 4-band split would silently MISS pairs
    whenever ``max_hamming > 3``)."""
    nbands = max_hamming + 1
    if nbands > 64:
        raise ValueError("max_hamming must be < 64")
    w0, rem = divmod(64, nbands)
    widths = [w0 + (1 if b < rem else 0) for b in range(nbands)]
    offsets = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.uint64)

    def band_rows(t: pa.Table) -> pa.Table:
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(sig)
        bb, vv, dd = [], [], []
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        for b in range(nbands):
            mask = np.uint64((1 << widths[b]) - 1)
            bb.append(np.full(n, b, dtype=np.int64))
            vv.append(((sig >> offsets[b]) & mask).astype(np.int64))
            dd.append(doc)
        return pa.table({
            "band": pa.array(np.concatenate(bb)),
            "band_val": pa.array(np.concatenate(vv)),
            "doc_id": pa.array(np.concatenate(dd)),
            "simhash": pa.array(np.tile(sig.astype(np.int64), nbands)),
        })

    banded = sig_ds.map_batches(band_rows, batch_format="pyarrow",
                                zero_copy_batch=True)

    def pairs(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        d_s, ia, ib, _, sg = _expand_bucket_pairs(
            g["band"].to_numpy(zero_copy_only=False),
            g["band_val"].to_numpy(zero_copy_only=False),
            g["doc_id"].to_numpy(zero_copy_only=False),
            flags=g["simhash"].to_numpy(
                zero_copy_only=False).astype(np.uint64))
        ham = _hamming64(sg[ia], sg[ib])
        m = ham <= max_hamming
        return pa.table({
            "doc_a": pa.array(d_s[ia[m]], type=pa.int64()),
            "doc_b": pa.array(d_s[ib[m]], type=pa.int64()),
            "hamming": pa.array(ham[m].astype(np.int64)),
        })

    from ocgis_ray.sources.io import bucketed_group_apply, distinct_rows

    cand = bucketed_group_apply(banded, ["band", "band_val"], pairs,
                                batch_format="pyarrow")
    return distinct_rows(cand, ["doc_a", "doc_b"])


def simhash_pairs_sql(max_hamming: int = 6, col: str = "text",
                      table: str = "documents",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of ``simhash_near_duplicates(simhash_signatures(
    docs), max_hamming)``, BIT-EXACT.

    The engine's pigeonhole banding (``max_hamming + 1`` bands) is
    LOSSLESS — any pair within the Hamming bound shares at least one
    band — so its output equals the exact all-pairs predicate, which
    is what the twin states directly: recompute every 64-bit signature
    (token hashes via ``parity.sql_token_hash_list``, per-bit majority
    votes as 64 sums over the unnested token rows), then
    ``bit_count(xor(sig_a, sig_b)) <= max_hamming`` over ``a < b``.
    Zero-token docs keep signature 0 via the LEFT JOIN."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    bit_sums = ",\n           ".join(
        f"SUM((h >> {b}) & 1) AS b{b}" for b in range(64))
    sig_terms = " + ".join(
        f"(CASE WHEN 2 * coalesce(b{b}, 0) > ntok "
        f"THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64))
    return f"""
WITH sh_tok AS (
  SELECT {id_col}, {sql_token_hash_list(sql_tokens(col), lower=False)} AS hs
  FROM {table}
), sh_cnt AS (
  SELECT {id_col}, len(hs) AS ntok FROM sh_tok
), sh_bits AS (
  SELECT {id_col}, {bit_sums}
  FROM (SELECT {id_col}, unnest(hs) AS h FROM sh_tok)
  GROUP BY {id_col}
), sh_sig AS (
  SELECT c.{id_col},
         ({sig_terms}) AS sig_u
  FROM sh_cnt c LEFT JOIN sh_bits b USING ({id_col})
), sh_s AS (
  SELECT {id_col},
         CAST(CASE WHEN sig_u >= {1 << 63} THEN sig_u - {1 << 64}
              ELSE sig_u END AS BIGINT) AS sig
  FROM sh_sig
)
SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
FROM sh_s a JOIN sh_s b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
"""


def minhash_pairs_sql(threshold: float = 0.5, num_perm: int = 128,
                      k: int = 3, col: str = "text",
                      table: str = "documents",
                      id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`minhash_near_duplicates`, BIT-EXACT.

    Reproduces the whole pipeline in HUGEINT SQL: token hashes
    (``parity.sql_token_hash_list``, the proven ``_tokenize_hash``
    twin), k-window shingle Horner + splitmix64 (guarded tail exactly
    like :func:`_shingle_hashes_batch` — short rows hash their full
    token run, empty rows hash to ``mix(0) == 0``), the 128 universal
    permutation minima with the STAGE'S OWN ``(a, b)`` parameters
    baked as literals (``a * x`` needs the split 32-bit multiply —
    both operands reach 2**64 — while ``h * FNV`` in the Horner chains
    stays under 2**104 and multiplies directly), threshold-tuned
    banded LSH with the same FNV band combine, candidate pairs as a
    self-join on ``(band, band_hash)``, and the matching-minima
    Jaccard estimate ``matches / num_perm`` (division by a power of
    two — exact in IEEE double on both sides).

    The banding is probabilistic (NOT lossless like simhash's
    pigeonhole), so the twin replays the banding itself rather than
    stating an exact predicate; since every hash is a pure function of
    content, both sides drop/keep identical pairs.  ``max_bucket``
    truncation (2000) is unreachable at oracle scale and is not
    mirrored."""
    from ocgis_ray.parity import (
        SQL_P64,
        sql_mix64_list,
        sql_token_hash_list,
        sql_tokens,
        sql_umul64,
    )

    stage = MinHashStage(num_perm=num_perm, k=k)
    bands, rows = pick_lsh_bands(num_perm, threshold)
    fnv = int(_FNV_SHINGLE)

    # k-window shingle Horner over the token-hash list (guards bind
    # only on the single short-row window i=1)
    horner = "0::HUGEINT"
    for u in range(k):
        horner = (f"(CASE WHEN i + {u} <= len(hs) THEN "
                  f"(({horner}) * {fnv} + hs[i + {u}]) % {SQL_P64} "
                  f"ELSE ({horner}) END)")
    windows = (f"list_transform(range(1, greatest(len(hs) - {k - 2}, 2)), "
               f"i -> {horner})")

    perm_rows = ",\n    ".join(
        f"({p}, {int(stage.a[p])}::HUGEINT, {int(stage.b[p])}::HUGEINT)"
        for p in range(num_perm))
    band_h = "0::HUGEINT"
    for j in range(rows):
        band_h = (f"(({band_h}) * {fnv} + sig[{rows} * band + {j + 1}]) "
                  f"% {SQL_P64}")

    return f"""
WITH mh_sh AS (
  SELECT {id_col}, {sql_mix64_list(windows)} AS xs
  FROM (SELECT {id_col},
               {sql_token_hash_list(sql_tokens(col), lower=False)} AS hs
        FROM {table})
), mh_perm AS (
  SELECT * FROM (VALUES
    {perm_rows}) perms(p, pa, pb)
), mh_min AS (
  SELECT {id_col}, p,
         list_min(list_transform(xs,
           x -> ({sql_umul64('x', 'pa')} + pb) % {SQL_P64})) AS m
  FROM mh_sh CROSS JOIN mh_perm
), mh_sig AS (
  SELECT {id_col}, list(m ORDER BY p) AS sig FROM mh_min GROUP BY {id_col}
), mh_band AS (
  SELECT {id_col}, band, {band_h} AS bh
  FROM mh_sig CROSS JOIN (SELECT unnest(range(0, {bands})) AS band) bnd
), mh_pairs AS (
  SELECT DISTINCT a.{id_col} AS doc_a, b.{id_col} AS doc_b
  FROM mh_band a JOIN mh_band b
    ON a.band = b.band AND a.bh = b.bh AND a.{id_col} < b.{id_col}
), mh_est AS (
  SELECT doc_a, doc_b,
         CAST(len(list_filter(range(1, {num_perm} + 1),
              i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / {num_perm}
           AS est_jaccard
  FROM mh_pairs
  JOIN mh_sig sa ON sa.{id_col} = doc_a
  JOIN mh_sig sb ON sb.{id_col} = doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM mh_est
WHERE est_jaccard >= {threshold!r}
"""


# ------------------------------------------- incremental (crawl-over-crawl)

def minhash_dedup_incremental(new_ds, store_dir: str, threshold: float = 0.7,
                              num_perm: int = 128, k: int = 3,
                              bands: int | None = None,
                              rows: int | None = None,
                              run_id: str = "run0",
                              num_partitions: int | None = None):
    """Dedup a NEW document batch against a persisted corpus signature
    store — the production crawl-over-crawl shape: every earlier run's
    ACCEPTED signatures live as parquet partitions under ``store_dir``
    (written by this function via the lineage manifest), the new batch
    is signed once, LSH-banded TOGETHER with the store, and a new doc
    is dropped when it near-matches any stored doc or a smaller-id doc
    of its own batch.  Old docs never lose (they are already corpus).

    Orientation trick: buckets emit candidate pairs with the POTENTIAL
    LOSER always in ``doc_b`` (new-vs-old: the new id; new-vs-new: the
    max id), so after the symmetric signature-estimate verification the
    loser set is simply the distinct confirmed ``doc_b`` — no flag
    column has to survive the attach shuffle.

    Survivor signatures are appended to the store ATOMICALLY
    (``state.lineage.write_partition`` under ``part=<run_id>``); a
    re-run with a completed ``run_id`` short-circuits to a semi-join
    against the stored partition (idempotent resume).

    Returns ``(survivors_ds, record)`` where ``record`` is the lineage
    line (or the prior run's short-circuit marker)."""
    import glob as _glob
    import os

    import ray.data as rd

    from ocgis_ray.sources.io import (
        bucketed_group_apply,
        bucketed_pair_attach,
        distinct_rows,
        join_datasets,
    )
    from ocgis_ray.state import lineage

    if bands is None and rows is None:
        bands, rows = pick_lsh_bands(num_perm, threshold)
    elif bands is None:
        bands = num_perm // rows
    elif rows is None:
        rows = num_perm // bands

    if run_id in lineage.completed_partitions(store_dir):
        kept = rd.read_parquet(os.path.join(store_dir, f"part={run_id}"),
                               columns=["doc_id"])
        survivors = join_datasets(new_ds, kept, on=("doc_id",),
                                  join_type="left_semi",
                                  num_partitions=num_partitions)
        return survivors, {"partition": run_id, "status": "resumed"}

    new_sigs = minhash_signatures(new_ds, num_perm=num_perm, k=k).materialize()
    old_files = sorted(_glob.glob(os.path.join(store_dir, "part=*",
                                               "*.parquet")))

    def band_flag(flag):
        def f(t: pa.Table) -> pa.Table:
            out = _band_rows(t, bands, rows)
            return out.append_column("is_new", pa.array(
                np.full(out.num_rows, flag, np.int8)))
        return f

    banded = new_sigs.map_batches(band_flag(1), batch_format="pyarrow",
                                  zero_copy_batch=True)
    union_sigs = new_sigs
    if old_files:
        old_sigs = rd.read_parquet(old_files, columns=["doc_id", "sig"])
        banded = banded.union(old_sigs.map_batches(
            band_flag(0), batch_format="pyarrow", zero_copy_batch=True))
        union_sigs = new_sigs.union(old_sigs)

    def pairs(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        d_s, ia, ib, _, fl = _expand_bucket_pairs(
            g["band"].to_numpy(zero_copy_only=False),
            g["band_hash"].to_numpy(zero_copy_only=False),
            g["doc_id"].to_numpy(zero_copy_only=False),
            flags=g["is_new"].to_numpy(zero_copy_only=False).astype(bool))
        keep = fl[ia] | fl[ib]           # old-vs-old: already resolved
        a, b = d_s[ia[keep]], d_s[ib[keep]]
        swap = fl[ia[keep]] & ~fl[ib[keep]]       # new(a) vs old(b)
        return pa.table({
            "doc_a": pa.array(np.where(swap, b, a), type=pa.int64()),
            "doc_b": pa.array(np.where(swap, a, b), type=pa.int64()),
        })  # doc_b = potential loser

    cand = bucketed_group_apply(banded, ["band", "band_hash"], pairs,
                                batch_format="pyarrow")
    joined = bucketed_pair_attach(cand, union_sigs, "doc_a", "doc_b",
                                  "doc_id", "sig",
                                  num_buckets=num_partitions)

    def losers(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"loser_id": pa.array([], pa.int64())})
        sa = _unpack_sigs(batch["sig_a"], num_perm)
        sb = _unpack_sigs(batch["sig_b"], num_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pa.table({"loser_id": batch["doc_b"].filter(pa.array(keep))})

    loser_ds = joined.map_batches(losers, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    if loser_ds.count() == 0:
        survivors = new_ds
        kept_sigs = new_sigs
    else:
        loser_ds = distinct_rows(loser_ds, "loser_id").repartition(
            max(2, num_partitions or 2))
        survivors = join_datasets(new_ds, loser_ds, on=("doc_id",),
                                  right_on=("loser_id",),
                                  join_type="left_anti",
                                  num_partitions=num_partitions)
        kept_sigs = join_datasets(new_sigs, loser_ds, on=("doc_id",),
                                  right_on=("loser_id",),
                                  join_type="left_anti",
                                  num_partitions=num_partitions)
    rec = lineage.write_partition(kept_sigs, store_dir, run_id,
                                  meta={"op": "minhash_dedup_incremental",
                                        "threshold": threshold})
    return survivors, rec
