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


# ---------------------------------------------------------------------
# URL normalization + blocklist filtering (the C4/RefinedWeb URL gate)
# ---------------------------------------------------------------------

# tracking parameter names removed by normalize_url (exact, lowercase)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid")


def normalize_url_arrays(url_arr) -> pa.Array:
    """Canonicalize URLs for dedup/join keys — one pass, fully
    vectorized, with a DuckDB twin (:func:`normalize_url_sql`) that
    mirrors every step exactly:

    1. rows WITHOUT a ``scheme://`` prefix pass through unchanged;
    2. scheme and host are lowercased (path/query keep case);
    3. default ports stripped: ``:80`` when http, ``:443`` when https;
    4. the fragment (``#...``) is stripped;
    5. query parameters whose name (the token before ``=``, lowercased)
       starts with ``utm_`` or is in :data:`TRACKING_PARAMS` are
       removed, as are empty tokens (``a&&b`` -> ``a&b``); a query
       left empty loses its ``?``.
    """
    import pyarrow.compute as pc

    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    parts = parse_url_arrays(url_arr)
    has = pc.match_substring_regex(url_arr, "^[^:/?#]+://")
    scheme = pc.utf8_lower(parts["url_scheme"])
    host = pc.utf8_lower(parts["url_host"])
    host = pc.if_else(
        pc.and_(pc.equal(scheme, "http"), pc.ends_with(host, ":80")),
        pc.replace_substring_regex(host, ":80$", ""), host)
    host = pc.if_else(
        pc.and_(pc.equal(scheme, "https"), pc.ends_with(host, ":443")),
        pc.replace_substring_regex(host, ":443$", ""), host)

    tail = pc.replace_substring_regex(parts["url_path"], "(?s)#.*$", "")
    ex = pc.extract_regex(tail, "(?s)^(?P<p>[^?]*)(?P<q>\\?.*)?$")
    path = pc.struct_field(ex, "p")
    q = pc.struct_field(ex, "q")

    qbody = pc.utf8_slice_codeunits(pc.fill_null(q, ""), 1)
    lists = pc.split_pattern(qbody, "&")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    name = pc.utf8_lower(
        pc.struct_field(pc.extract_regex(flat, "(?s)^(?P<n>[^=]*)"), "n"))
    drop = pc.or_(pc.starts_with(name, "utm_"),
                  pc.is_in(name, value_set=pa.array(TRACKING_PARAMS)))
    drop = pc.or_(drop, pc.equal(flat, ""))
    keepm = pc.invert(drop).to_numpy(zero_copy_only=False)
    kept = flat.filter(pa.array(keepm))
    counts = np.bincount(parent[keepm], minlength=len(url_arr))
    offsets = np.zeros(len(url_arr) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                       kept.combine_chunks()
                                       if isinstance(kept, pa.ChunkedArray)
                                       else kept)
    joined = pc.binary_join(rebuilt, "&")
    q2 = pc.if_else(pc.equal(joined, ""), pa.scalar(""),
                    pc.binary_join_element_wise("?", joined, ""))

    norm = pc.binary_join_element_wise(scheme, "://", host, path, q2, "")
    return pc.if_else(has, norm, url_arr)


def normalize_url(ds, col: str = "url", out: str = "url_norm"):
    """Append the canonical URL (see :func:`normalize_url_arrays`)."""

    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out, normalize_url_arrays(t[col]))

    from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def normalize_url_sql(col: str = "url") -> str:
    """DuckDB twin of :func:`normalize_url_arrays` (hash-exact)."""
    frags = parse_url_sql(col)
    scheme = f"lower({frags['url_scheme']})"
    host0 = f"lower({frags['url_host']})"
    host = (f"(CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
            f"THEN left({host0}, length({host0}) - 3) "
            f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
            f"THEN left({host0}, length({host0}) - 4) ELSE {host0} END)")
    tail = f"regexp_replace({frags['url_path']}, '(?s)#.*$', '')"
    path = f"regexp_extract({tail}, '(?s)^([^?]*)', 1)"
    qbody = (f"(CASE WHEN strpos({tail}, '?') > 0 "
             f"THEN substr({tail}, strpos({tail}, '?') + 1) ELSE '' END)")
    names = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    # array_to_string of an EMPTY list is NULL in DuckDB — coalesce
    joined = (f"coalesce(array_to_string(list_filter(string_split({qbody},"
              f" '&'), "
              f"x -> NOT (starts_with(lower(string_split(x, '=')[1]), 'utm_') "
              f"OR lower(string_split(x, '=')[1]) IN ({names}) "
              f"OR x = '')), '&'), '')")
    q2 = f"(CASE WHEN {joined} = '' THEN '' ELSE '?' || {joined} END)"
    return (f"(CASE WHEN regexp_matches({col}, '^[^:/?#]+://') "
            f"THEN {scheme} || '://' || {host} || {path} || {q2} "
            f"ELSE {col} END)")


class UrlFilterStage:
    """Broadcast URL blocklist gate: drops rows whose host/domain is
    blocked or whose URL matches any blocked pattern.

    ``blocked`` entries match the registered domain (``example.com``
    blocks every subdomain via the ``url_domain`` heuristic) OR the
    exact host (``ads.example.com`` blocks only that host).  Patterns
    are RE2, pre-joined into ONE alternation compiled once per worker
    (the set + pattern ship as a ``ray.put`` ref through
    ``tuning.task_stage``'s per-worker cache — UT1-class lists ride
    the object store, not the task closure)."""

    def __init__(self, spec_ref, col: str = "url"):
        import ray

        blocked, patterns = (ray.get(spec_ref)
                             if isinstance(spec_ref, ray.ObjectRef)
                             else spec_ref)
        self.col = col
        self.blocked = pa.array(sorted(blocked)) if blocked else None
        self.pattern = "|".join(f"(?:{p})" for p in patterns) \
            if patterns else None

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        url = t[self.col]
        bad = pa.array(np.zeros(t.num_rows, dtype=bool))
        if self.blocked is not None:
            parts = parse_url_arrays(url)
            host = pc.utf8_lower(parts["url_host"])
            dom = pc.utf8_lower(parts["url_domain"])
            bad = pc.or_kleene(pc.is_in(host, value_set=self.blocked),
                               pc.is_in(dom, value_set=self.blocked))
        if self.pattern is not None:
            bad = pc.or_kleene(bad, pc.match_substring_regex(
                url, self.pattern))
        return t.filter(pc.fill_null(pc.invert(bad), True))


def url_filter(ds, blocked_domains=(), blocked_patterns=(),
               col: str = "url"):
    """Drop rows with blocklisted URLs (see :class:`UrlFilterStage`).
    NULL urls are kept (no URL evidence = no block)."""
    import ray

    from ocgis_ray.stages.text import KERNEL_BATCH_SIZE
    from ocgis_ray.tuning import task_stage

    spec_ref = ray.put((frozenset(d.lower() for d in blocked_domains),
                        tuple(blocked_patterns)))
    return ds.map_batches(
        task_stage(UrlFilterStage, spec_ref=spec_ref, col=col),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=KERNEL_BATCH_SIZE)
