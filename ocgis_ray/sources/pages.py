"""Deterministic Common-Crawl-style pages table (url, warc_ts, html,
text, lang) synthesized from the driver's ``documents`` parquet.

The engine's input contract (BASELINE.json ``input_hint``) is a pages
table of exactly this shape.  No external data exists in the sandbox,
so pages are derived *deterministically* from ``documents`` — every
derivation below is a pure arithmetic/string function implemented twice
with identical operation order: once as vectorized numpy/pyarrow
kernels (the engine) and once as DuckDB SQL fragments (the oracle).
This is what lets the driver's side-by-side correctness gate hash-match
spatial results exactly.

This plays the role of the reference's synthetic test fixtures
(``/root/reference/src/ocgis/test/test_simple/make_test_data.py:35-120``
builds an analytic 4x4 CF grid): deterministic inputs with closed-form
expected values.

Each document expands to ``reps`` pages (default 4).  A page's
"geocode" — the lon/lat its url resolves to — is a deterministic hash
of ``page_id`` with built-in skew: 40% of pages cluster in 5 hot city
boxes (popular-domain skew per the north star), 60% spread worldwide.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REPS = 4
TS_BASE = np.datetime64("2024-01-01T00:00:00", "us")
SECONDS_PER_YEAR = 31536000

HOT_CENTERS_LON = np.array([-122.4, -74.0, 0.1, 139.7, 151.2])
HOT_CENTERS_LAT = np.array([37.8, 40.7, 51.5, 35.7, -33.9])
HOT_FRACTION_MOD = 4  # page_id % 10 < 4  =>  hot page (40%)

PAGE_COLUMNS = ["page_id", "doc_id", "rep", "url", "warc_ts", "html", "text", "lang", "source", "n_chars"]


# ---------------------------------------------------------------- engine side

def synthesize_pages_batch(batch: pa.Table, reps: int = REPS) -> pa.Table:
    """documents batch -> pages batch (vectorized, Arrow in/out).

    Runs inside ``map_batches(batch_format="pyarrow")``; the row
    expansion is the engine's ``flat_map`` analog done columnar.
    """
    n = batch.num_rows
    idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    rep = np.tile(np.arange(reps, dtype=np.int64), n)
    return _build_pages(batch, idx, rep, reps)


def _build_pages(batch: pa.Table, idx: np.ndarray, rep: np.ndarray, reps: int) -> pa.Table:
    """Shared kernel: doc rows (selected by ``idx``) + rep numbers ->
    pages columns.  ``batch`` must carry doc_id/text/lang/source/n_chars."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)[idx]
    page_id = doc_id * np.int64(reps) + rep

    page_id_a = pa.array(page_id)
    rep_str = pc.cast(pa.array(rep), pa.string())
    page_str = pc.cast(page_id_a, pa.string())
    site_str = pc.cast(pa.array(page_id % 1000), pa.string())

    text0 = batch["text"].take(pa.array(idx))
    text = pc.binary_join_element_wise("p", rep_str, " ", text0, "")
    url = pc.binary_join_element_wise(
        "https://site-", site_str, ".example.com/p/", page_str, ""
    )
    html_str = pc.binary_join_element_wise(
        "<html><head><title>page-",
        page_str,
        "</title></head><body><article>",
        text,
        "</article></body></html>",
        "",
    )
    html = pc.cast(html_str, pa.binary())
    warc_ts = TS_BASE + ((page_id * 7777789) % SECONDS_PER_YEAR) * np.int64(1_000_000)

    return pa.table(
        {
            "page_id": page_id_a,
            "doc_id": pa.array(doc_id),
            "rep": pa.array(rep),
            "url": url,
            "warc_ts": pa.array(warc_ts),
            "html": html,
            "text": text,
            "lang": batch["lang"].take(pa.array(idx)),
            "source": batch["source"].take(pa.array(idx)),
            "n_chars": batch["n_chars"].take(pa.array(idx)),
        }
    )


class PagesSynthesizer:
    """Actor stage for RANGE-driven synthesis: input batches are page
    ids from ``ray.data.range``, the documents table is broadcast once
    (``ray.put``) and fetched per actor in ``__init__``.

    Why range-driven: a documents->pages ``map_batches`` expansion
    inherits the READ's row count for task bundling (Ray bundles
    ``min_rows_per_bundled_input = batch_size`` *input* rows per task,
    blind to the 400x expansion), so a small documents file collapses
    the whole synthesis+extract into one task.  Driving by page-id
    range gives exact output-row task shaping."""

    def __init__(self, docs_ref, reps: int):
        import ray

        docs: pa.Table = ray.get(docs_ref) if not isinstance(docs_ref, pa.Table) else docs_ref
        self.docs = docs.combine_chunks()
        self.reps = reps
        # doc_id must be dense 0..n-1 for positional lookup; the full
        # O(n) check (not just endpoints) catches interior gaps/dupes
        # that would silently mis-synthesize pages
        did = self.docs["doc_id"].to_numpy()
        if not np.array_equal(did, np.arange(len(did), dtype=did.dtype)):
            raise ValueError("documents doc_id must be dense 0..n-1 (sorted)")

    def __call__(self, batch: pa.Table) -> pa.Table:
        page_id = batch["id"].to_numpy(zero_copy_only=False)
        idx = page_id // self.reps
        rep = page_id % self.reps
        return _build_pages(self.docs, idx, rep, self.reps)


def materialize_pages_parquet(
    sf_dir: str, reps: int, out_dir: str, num_blocks: int = 64,
    concurrency: int = 8,
) -> str:
    """Synthesize the pages table IN PARALLEL and persist it as
    partitioned parquet (write-tmp-then-rename, idempotent).  This is
    the bench input: the real deployment reads an existing pages table
    from storage, so benchmarks measure read->...->rollup from parquet,
    not in-process synthesis."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    final = os.path.join(out_dir, f"pages_reps{reps}")
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).sort_by("doc_id")
    ref = ray.put(docs)
    n_pages = docs.num_rows * reps
    ds = rd.range(n_pages, override_num_blocks=num_blocks)
    ds = ds.map_batches(
        PagesSynthesizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"docs_ref": ref, "reps": reps},
    )
    tmp = final + "_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("")
    return final


def pages_dataset(sf_dir: str, reps: int = REPS, parallelism: int = -1):
    """documents.parquet -> lazy pages Dataset.

    The ``RequestDataset`` analog (``driver/request/core.py:19-537``):
    a declarative source that prunes at the read and synthesizes lazily.
    """
    from ocgis_ray.sources.io import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return ds.map_batches(
        lambda b: synthesize_pages_batch(b, reps=reps),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def coords_from_page_id(page_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fake geocoder: page_id -> (lon, lat) degrees.

    Operation order matches :func:`lon_sql` / :func:`lat_sql` exactly
    (all intermediates are int64 / float64 with identical expression
    trees), so cell assignment agrees with the DuckDB oracle bit for
    bit."""
    page_id = np.asarray(page_id, dtype=np.int64)
    hot = page_id % 10
    cidx = (page_id // 10) % 5
    g = (page_id * 2654435761) % 1048576
    gx = (g % 1024).astype(np.float64)
    gy = ((g // 1024) % 1024).astype(np.float64)
    lon_hot = HOT_CENTERS_LON[cidx] + gx / 1024.0 * 0.2 - 0.1
    lat_hot = HOT_CENTERS_LAT[cidx] + gy / 1024.0 * 0.2 - 0.1
    lon_cold = ((page_id * 97003 + 17) % 360000).astype(np.float64) / 1000.0 - 180.0
    lat_cold = ((page_id * 57923 + 31) % 170000).astype(np.float64) / 1000.0 - 85.0
    is_hot = hot < HOT_FRACTION_MOD
    lon = np.where(is_hot, lon_hot, lon_cold)
    lat = np.where(is_hot, lat_hot, lat_cold)
    return lon, lat


# ---------------------------------------------------------------- oracle side

def lon_sql(pid: str = "page_id") -> str:
    centers = " ".join(
        f"WHEN {i} THEN {float(HOT_CENTERS_LON[i])!r}" for i in range(5)
    )
    return (
        f"CASE WHEN ({pid} % 10) < {HOT_FRACTION_MOD} THEN "
        f"(CASE ({pid} // 10) % 5 {centers} END) "
        f"+ ((({pid} * 2654435761) % 1048576) % 1024) / 1024.0 * 0.2 - 0.1 "
        f"ELSE (({pid} * 97003 + 17) % 360000) / 1000.0 - 180.0 END"
    )


def lat_sql(pid: str = "page_id") -> str:
    centers = " ".join(
        f"WHEN {i} THEN {float(HOT_CENTERS_LAT[i])!r}" for i in range(5)
    )
    return (
        f"CASE WHEN ({pid} % 10) < {HOT_FRACTION_MOD} THEN "
        f"(CASE ({pid} // 10) % 5 {centers} END) "
        f"+ (((({pid} * 2654435761) % 1048576) // 1024) % 1024) / 1024.0 * 0.2 - 0.1 "
        f"ELSE (({pid} * 57923 + 31) % 170000) / 1000.0 - 85.0 END"
    )


def pages_cte(reps: int = REPS) -> str:
    """``pages AS (...)`` CTE over the pre-registered ``documents`` view,
    byte-equivalent to :func:`synthesize_pages_batch` (minus the html
    column, which the oracle never needs — extraction is checked by the
    engine's own byte-identity tests)."""
    pid = f"(doc_id * {reps} + rep)"
    return f"""pages AS (
  SELECT {pid} AS page_id, doc_id, rep, lang, source, n_chars,
         'p' || CAST(rep AS VARCHAR) || ' ' || text AS text,
         'https://site-' || CAST({pid} % 1000 AS VARCHAR) || '.example.com/p/' || CAST({pid} AS VARCHAR) AS url,
         TIMESTAMP '2024-01-01 00:00:00' + to_seconds(({pid} * 7777789) % {SECONDS_PER_YEAR}) AS warc_ts
  FROM documents, range({reps}) t(rep)
)"""


def geo_cte(reps: int = REPS) -> str:
    """``WITH pages AS (...), geo AS (... lon, lat ...)`` prefix for
    spatial oracle queries."""
    return (
        f"WITH {pages_cte(reps)},\ngeo AS (\n"
        f"  SELECT *, {lon_sql()} AS lon, {lat_sql()} AS lat FROM pages\n)"
    )
