"""Benchmark decontamination: n-token-gram overlap against an eval set.

The GPT-3/PaLM/Llama training-data step the reference has no analog
for (SURVEY §2.7 additions): a training document is CONTAMINATED if it
shares any n-token window with a benchmark/eval document (n=13 in the
GPT-3 appendix; configurable here).  Shape:

- **build** (:func:`build_bench_ngrams`): hash every n-token window of
  the benchmark set into a sorted unique uint64 array.  Benchmarks are
  eval sets — thousands of documents, at most a few million distinct
  n-grams — so the index is a DRIVER-SIDE small artifact broadcast via
  ``ray.put`` (the same small-side-broadcast rule as the spatial-join
  layer).  ``max_ngrams`` raises (never truncates silently) if the
  "benchmark" turns out corpus-sized; at that scale use
  :func:`build_bench_bloom` (window-hash Bloom filter; size chosen
  up front, no false negatives).
- **score** (:func:`add_contamination`): one tokenize pass per batch
  (the shared ``_tokenize_hash`` kernel), a second-level Horner over
  the token hashes builds every n-window hash vectorized (n vector
  ops), row-crossing windows are masked, membership is one
  ``searchsorted`` against the broadcast index, per-doc hit counts via
  ``bincount``.
- **gate** (:func:`decontaminate`): drop docs with any hit (or keep
  below ``max_hits``).

Window hash = splitmix64(Horner_FNV(token_hashes)) — the exact
composition of the engine's token hash, reproduced bit-exactly in
HUGEINT SQL by :func:`contam_sql` (same fragments as
``text.fingerprint_sql``), so the operator is oracle-checkable with
the benchmark defined as a SQL predicate over the same table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocgis_ray.stages.text import (
    KERNEL_BATCH_SIZE,
    _FNV,
    _mix64,
    _tokenize_hash,
)


def _window_hashes(arr, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (window_hashes uint64, window_row int64)
    for every n-token window that does not cross a row boundary.

    Second-level Horner over the per-token hashes (same FNV multiplier
    and splitmix64 finalizer as the token hash itself), vectorized:
    n gather+fma passes over the batch's token array."""
    h, tok_row, _ = _tokenize_hash(arr, lower=True)
    nwin = h.size - n + 1
    if nwin <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        g = np.zeros(nwin, dtype=np.uint64)
        for u in range(n):
            g = g * _FNV + h[u: nwin + u]
    valid = tok_row[:nwin] == tok_row[n - 1:]
    return _mix64(g[valid]), tok_row[:nwin][valid]


def build_bench_ngrams(bench, n: int = 13, col: str = "text",
                       max_ngrams: int = 20_000_000) -> np.ndarray:
    """Sorted unique uint64 n-gram hashes of the benchmark set.

    ``bench`` is a list of strings or a Ray Dataset with ``col``.
    Distinct hashes are reduced per batch before the driver union, so
    driver traffic is bounded by DISTINCT benchmark n-grams — raises
    at ``max_ngrams`` rather than degrade silently (a benchmark that
    large belongs in a Bloom filter, :func:`build_bench_bloom`)."""
    if isinstance(bench, (list, tuple)):
        w, _ = _window_hashes(pa.array(list(bench), type=pa.string()), n)
        out = np.unique(w)
    else:
        def partial(t: pa.Table) -> pa.Table:
            w, _ = _window_hashes(t[col], n)
            return pa.table({"w": pa.array(np.unique(w).view(np.int64))})

        parts = bench.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=KERNEL_BATCH_SIZE).materialize()
        # guard BEFORE driver collection: the per-batch-distinct row
        # count upper-bounds the global distinct count, and the
        # materialized hashes live in the OBJECT STORE — a mistakenly
        # corpus-sized "benchmark" raises here instead of OOMing the
        # driver inside to_pandas()
        upper = parts.count()
        if upper > 4 * max_ngrams:
            raise ValueError(
                f"benchmark yields >= {upper} per-batch-distinct "
                f"{n}-gram hashes (cap {max_ngrams}); this input is "
                "corpus-sized — use build_bench_bloom instead")
        out = np.unique(
            parts.to_pandas()["w"].to_numpy(np.int64).view(np.uint64))
    if out.size > max_ngrams:
        raise ValueError(
            f"benchmark has {out.size} distinct {n}-gram hashes "
            f"(> max_ngrams={max_ngrams}); broadcast would be "
            "corpus-sized — use build_bench_bloom instead")
    return out


class ContamStage:
    """Actor: per-doc count of n-token windows present in the
    broadcast benchmark index (fetched once per actor)."""

    def __init__(self, bench_ref, n: int, col: str, out: str):
        import ray

        self.bench = (ray.get(bench_ref)
                      if not isinstance(bench_ref, np.ndarray) else bench_ref)
        self.n = n
        self.col = col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        w, w_row = _window_hashes(arr, self.n)
        counts = np.zeros(t.num_rows, dtype=np.int64)
        if w.size and self.bench.size:
            pos = np.minimum(np.searchsorted(self.bench, w),
                             self.bench.size - 1)
            member = self.bench[pos] == w
            counts = np.bincount(w_row[member],
                                 minlength=t.num_rows).astype(np.int64)
        return t.append_column(self.out, pa.array(counts))


def add_contamination(ds, bench_ngrams: np.ndarray, n: int = 13,
                      col: str = "text", out: str = "contam_ngrams",
                      concurrency=None, batch_size: int = KERNEL_BATCH_SIZE):
    """Append the contaminated-window count column."""
    import ray

    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    bench_ref = ray.put(np.ascontiguousarray(bench_ngrams, dtype=np.uint64))
    return ds.map_batches(
        ContamStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n,
                               "col": col, "out": out})


def decontaminate(ds, bench_ngrams: np.ndarray, n: int = 13,
                  col: str = "text", max_hits: int = 0,
                  concurrency=None):
    """Drop documents with more than ``max_hits`` benchmark-overlapping
    n-token windows (default: any overlap contaminates).  The count
    column is dropped from the output."""
    import pyarrow.compute as pc

    scored = add_contamination(ds, bench_ngrams, n=n, col=col,
                               out="_contam", concurrency=concurrency)

    def keep(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less_equal(t["_contam"], pa.scalar(max_hits)))
        return out.drop_columns(["_contam"])

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def build_bench_bloom(bench, n: int = 13, col: str = "text",
                      nbits: int | None = None, k: int = 10,
                      expected_ngrams: int | None = None,
                      bits_per_ngram: float = 32.0,
                      batch_size: int = KERNEL_BATCH_SIZE):
    """Bloom filter over the benchmark's n-token-window hashes — the
    corpus-sized-benchmark path :func:`build_bench_ngrams` refuses
    (its sorted-array broadcast is bounded by ``max_ngrams``; a Bloom
    filter's size is chosen up front and independent of member count).

    Distributed build: each batch windows its docs, probes a local
    filter, and emits the SPARSE set-bit indices; a distributed
    distinct bounds driver traffic by the number of DISTINCT set bits
    (same shape as ``sketch.build_bloom``, which hashes a column value
    per row — this one feeds the window-hash kernel instead, so one
    row contributes ~len(tokens) members).

    Sizing: ``nbits`` wins; else ``expected_ngrams`` (or one cheap
    counting pass over the benchmark) at ``bits_per_ngram`` bits per
    member.  The default is deliberately FAT — 32 bits/member, k=10,
    per-window FPR ~2e-6 — because the gate drops a doc on ANY hit:
    a clean doc probes once per window, so its false-drop odds are
    ~windows x FPR (a 1%-FPR "10 bits/element" filter would falsely
    drop nearly every 200-window doc).  Keep per-window FPR well
    under 1 / typical-windows-per-doc.  Bloom membership has NO false
    negatives, so decontamination against it never misses a truly
    contaminated window — false positives only ever drop clean docs
    (the safe direction for an eval-leak gate)."""
    from ocgis_ray.stages.sketch import BloomFilter

    if isinstance(bench, (list, tuple)):
        w, _ = _window_hashes(pa.array(list(bench), type=pa.string()), n)
        if nbits is None:
            nbits = max(1024, int(bits_per_ngram * (
                int(expected_ngrams) if expected_ngrams is not None
                else max(w.size, 1))))
        out = BloomFilter(nbits, k)
        out.add_hashes(w)
        return out

    if nbits is None:
        if expected_ngrams is None:
            def count_w(t: pa.Table) -> pa.Table:
                w, _ = _window_hashes(t[col], n)
                return pa.table({"nw": pa.array([w.size], type=pa.int64())})

            expected_ngrams = sum(
                r["nw"] for r in bench.map_batches(
                    count_w, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=batch_size).take_all())
        nbits = max(1024, int(bits_per_ngram * int(expected_ngrams)))

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(nbits, k)
        w, _ = _window_hashes(t[col], n)
        bits = (np.unique(bf._probes(w).ravel()) if w.size
                else np.empty(0, np.uint64))
        return pa.table({"bit": pa.array(bits.astype(np.int64))})

    from ocgis_ray.sources.io import distinct_rows

    sparse = distinct_rows(
        bench.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size),
        ["bit"])
    out = BloomFilter(nbits, k)
    for row in sparse.take_all():
        b = np.uint64(row["bit"])
        out.bits[int(b >> np.uint64(6))] |= np.uint64(1) << (b & np.uint64(63))
    return out


class BloomContamStage:
    """Actor: per-doc count of n-token windows whose hash the
    broadcast benchmark Bloom filter contains (fetched once per
    actor).  Counts upper-bound :class:`ContamStage`'s exact counts
    (no false negatives; ~FPR extra hits)."""

    def __init__(self, bloom_ref, n: int, col: str, out: str):
        import ray

        from ocgis_ray.stages.sketch import BloomFilter

        b = ray.get(bloom_ref) if not isinstance(bloom_ref, dict) else bloom_ref
        self.bloom = BloomFilter(b["nbits"], b["k"])
        self.bloom.bits = b["bits"]
        self.n = n
        self.col = col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        w, w_row = _window_hashes(arr, self.n)
        counts = np.zeros(t.num_rows, dtype=np.int64)
        if w.size:
            member = self.bloom.contains_hashes(w)
            counts = np.bincount(w_row[member],
                                 minlength=t.num_rows).astype(np.int64)
        return t.append_column(self.out, pa.array(counts))


def add_contamination_bloom(ds, bloom, n: int = 13, col: str = "text",
                            out: str = "contam_ngrams", concurrency=None,
                            batch_size: int = KERNEL_BATCH_SIZE):
    """Append the Bloom-approximate contaminated-window count column
    (``bloom`` from :func:`build_bench_bloom`)."""
    import ray

    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    bloom_ref = ray.put({"bits": bloom.bits, "nbits": bloom.nbits,
                         "k": bloom.k})
    return ds.map_batches(
        BloomContamStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"bloom_ref": bloom_ref, "n": n,
                               "col": col, "out": out})


def decontaminate_bloom(ds, bloom, n: int = 13, col: str = "text",
                        max_hits: int = 0, concurrency=None):
    """Drop documents with more than ``max_hits`` Bloom-member windows.
    Never keeps a document :func:`decontaminate` would drop (no false
    negatives); may additionally drop ~FPR of clean documents."""
    import pyarrow.compute as pc

    scored = add_contamination_bloom(ds, bloom, n=n, col=col,
                                     out="_contam", concurrency=concurrency)

    def keep(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less_equal(t["_contam"], pa.scalar(max_hits)))
        return out.drop_columns(["_contam"])

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def contam_sql(bench_pred: str, n: int = 13, col: str = "text",
               table: str = "documents", id_col: str = "doc_id",
               out: str = "contam_ngrams") -> str:
    """DuckDB twin of :func:`add_contamination`, BIT-EXACT, with the
    benchmark defined as a predicate over the same table (e.g.
    ``doc_id < 5``) so the oracle needs no side-channel literals.

    Token hashes come from ``parity.sql_token_hash_list`` (the proven
    ``_tokenize_hash`` twin); window hashes Horner the token-hash list
    (products stay under 2**104, inside HUGEINT) and finalize with the
    splitmix64 fragment.  Duplicate windows inside a doc each count,
    matching the engine's occurrence ``bincount``."""
    from ocgis_ray.parity import (
        SQL_FNV,
        SQL_P64,
        sql_mix64_list,
        sql_token_hash_list,
        sql_tokens,
    )

    horner = "hs[i]"
    for u in range(1, n):
        horner = f"((({horner}) * {SQL_FNV} + hs[i + {u}]) % {SQL_P64})"
    windows = (f"list_transform(range(1, greatest(len(hs) - {n - 2}, 1)), "
               f"i -> {horner})")
    return f"""
WITH ctoks AS (
  SELECT {id_col}, {sql_token_hash_list(sql_tokens(col), lower=True)} AS hs
  FROM {table}
), cwins AS (
  SELECT {id_col}, {sql_mix64_list(windows)} AS ws
  FROM ctoks
), cbench AS (
  SELECT DISTINCT w
  FROM (SELECT unnest(ws) AS w FROM cwins WHERE {bench_pred})
), cexp AS (
  SELECT {id_col}, unnest(ws) AS w FROM cwins
), ccnt AS (
  SELECT e.{id_col}, count(*) AS hits
  FROM cexp e JOIN cbench b ON e.w = b.w
  GROUP BY e.{id_col}
)
SELECT t.{id_col}, CAST(coalesce(c.hits, 0) AS BIGINT) AS {out}
FROM {table} t LEFT JOIN ccnt c ON t.{id_col} = c.{id_col}
"""
