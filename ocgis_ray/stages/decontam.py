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
  ``sketch.build_bloom`` on the window-hash column instead.
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
    large belongs in a Bloom filter, ``sketch.build_bloom``)."""
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
                "corpus-sized — use sketch.build_bloom over the window "
                "hashes instead")
        out = np.unique(
            parts.to_pandas()["w"].to_numpy(np.int64).view(np.uint64))
    if out.size > max_ngrams:
        raise ValueError(
            f"benchmark has {out.size} distinct {n}-gram hashes "
            f"(> max_ngrams={max_ngrams}); broadcast would be "
            "corpus-sized — use sketch.build_bloom over the window "
            "hashes instead")
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
