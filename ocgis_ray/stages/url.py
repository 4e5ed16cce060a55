"""URL operations for web-corpus pipelines: parse, domain rollup,
URL-level dedup.

First-class training-data-pipeline operators over the pages table's
``url`` column (no reference analog).  Parsing is fully vectorized —
one substring scan for ``://``, searchsorted delimiter lookups, and a
single fancy-gather per output column — and mirrors a specific,
documented DuckDB expression set (see :func:`parse_url_sql`) so the
columns are hash-exact oracle-checkable:

- ``url_scheme``  = text before the FIRST ``://`` (whole URL if none)
- ``url_host``    = rest up to the first ``/`` (all of rest if none)
- ``url_path``    = rest after the host (includes the leading ``/``,
  query string and fragment — the raw tail, not a normalized path)
- ``url_domain``  = last two dot-labels of the host (the registered-
  domain heuristic; a public-suffix list is a data file away)

All cut points are ASCII delimiters, so byte slicing equals DuckDB's
character-based ``strpos``/``substr`` exactly even for multi-byte
URLs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocgis_ray.stages.quality import _find_substring_starts, _gather_strings
from ocgis_ray.stages.text import _string_byte_view

URL_COLUMNS = ("url_scheme", "url_host", "url_path", "url_domain")


def parse_url_arrays(url_arr) -> dict[str, pa.Array]:
    """Vectorized URL parse (see module docstring for the grammar)."""
    import pyarrow.compute as pc

    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    data, off = _string_byte_view(url_arr)
    n = len(off) - 1
    row_start, row_end = off[:-1], off[1:]

    # first "://" per row (the byte view is window-rebased, so every
    # hit belongs to a real row)
    hits = _find_substring_starts(data, b"://")
    sep = np.full(n, -1, dtype=np.int64)
    if len(hits):
        hrow = np.searchsorted(off[1:], hits, side="right")
        ok = (hits + 3) <= row_end[hrow]
        hits, hrow = hits[ok], hrow[ok]
        # hits ascending => first per row wins with reversed assignment
        sep[hrow[::-1]] = hits[::-1]
    has = sep >= 0

    scheme_start = row_start
    scheme_len = np.where(has, sep - row_start, row_end - row_start)
    rest_start = np.where(has, sep + 3, row_end)  # no scheme -> rest ''
    rest_end = np.where(has, row_end, rest_start)

    slash = np.nonzero(data == ord("/"))[0]
    first_slash = slash[np.minimum(np.searchsorted(slash, rest_start),
                                   max(len(slash) - 1, 0))] if len(slash) \
        else np.full(n, -1, dtype=np.int64)
    host_end = np.where(
        (len(slash) > 0) & (first_slash >= rest_start) & (first_slash < rest_end),
        first_slash, rest_end)
    host_start = rest_start
    path_start, path_end = host_end, rest_end

    dots = np.nonzero(data == ord("."))[0]
    lo = np.searchsorted(dots, host_start)
    hi = np.searchsorted(dots, host_end)
    two_plus = (hi - lo) >= 2
    dom_start = host_start.copy()
    if len(dots):
        idx = np.maximum(hi - 2, 0)
        dom_start = np.where(two_plus, dots[np.minimum(idx, len(dots) - 1)] + 1,
                             host_start)

    null_mask = None
    if url_arr.null_count:
        null_mask = pc.is_null(url_arr).to_numpy(zero_copy_only=False)
    return {
        "url_scheme": _gather_strings(data, scheme_start, scheme_len, null_mask),
        "url_host": _gather_strings(data, host_start, host_end - host_start, null_mask),
        "url_path": _gather_strings(data, path_start, path_end - path_start, null_mask),
        "url_domain": _gather_strings(data, dom_start, host_end - dom_start, null_mask),
    }


def parse_url(ds, col: str = "url"):
    """Append ``url_scheme/url_host/url_path/url_domain`` columns."""

    def f(t: pa.Table) -> pa.Table:
        for name, arr in parse_url_arrays(t[col]).items():
            t = t.append_column(name, arr)
        return t

    from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def parse_url_sql(col: str = "url") -> dict[str, str]:
    """DuckDB twins of :func:`parse_url_arrays` — ``strpos``-based
    first-occurrence cuts (NOT ``split_part``, whose part-2 stops at
    the SECOND separator for multi-``://`` strings)."""
    sep = f"strpos({col}, '://')"
    rest = (f"(CASE WHEN {sep} > 0 THEN substr({col}, {sep} + 3) "
            f"WHEN {col} IS NULL THEN NULL ELSE '' END)")
    host = (f"(CASE WHEN strpos({rest}, '/') > 0 "
            f"THEN substr({rest}, 1, strpos({rest}, '/') - 1) ELSE {rest} END)")
    return {
        "url_scheme": (f"CASE WHEN {sep} > 0 THEN substr({col}, 1, {sep} - 1) "
                       f"ELSE {col} END"),
        "url_host": host,
        "url_path": f"substr({rest}, length({host}) + 1)",
        "url_domain": f"array_to_string(string_split({host}, '.')[-2:], '.')",
    }


def domain_rollup(ds, col: str = "url", value_specs: dict | None = None):
    """Pages per registered domain (+ optional aggregates) — parse,
    then the repo's standard partial+bucketed-combine rollup."""
    from ocgis_ray.stages.tiles import grouped_aggregate

    specs = {"n_pages": (None, "count")}
    if value_specs:
        specs.update(value_specs)
    return grouped_aggregate(parse_url(ds, col), ["url_domain"], specs)


def dedup_by_url(ds, col: str = "url", id_col: str = "page_id"):
    """Keep the first (min ``id_col``) row per exact URL — the standard
    crawl-dedup first pass; hash-bucketed shuffle, no driver state.

    NULL urls pass through untouched (pandas ``drop_duplicates``
    treats NaN keys as equal, which would silently collapse every
    missing-metadata document into one survivor): each NULL row gets a
    per-row sentinel key ``"\\x00" + id`` — URLs cannot contain NUL —
    so ONE distinct pass handles both populations.  The former
    union-of-branches shape left empty pandas blocks on the null side
    (Ray's size estimator warns per batch on 0-row object columns) and
    mixed arrow/pandas block types downstream."""
    import pyarrow.compute as pc

    from ocgis_ray.sources.io import distinct_rows

    def add_key(t: pa.Table) -> pa.Table:
        sentinel = pc.binary_join_element_wise(
            pa.scalar("\x00"), pc.cast(t[id_col], pa.string()), "")
        return t.append_column(
            "_url_key", pc.if_else(pc.is_valid(t[col]), t[col], sentinel))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    return distinct_rows(keyed, "_url_key",
                         order_col=id_col).drop_columns(["_url_key"])
