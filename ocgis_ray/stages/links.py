"""Outlink / anchor-text extraction from raw HTML — the web link
graph as a first-class pipeline product.

The reference's join inputs are static vector layers; a web corpus's
"layer" of record is the hyperlink graph, and every real crawl
pipeline derives it from the pages themselves (WAT files are to links
what WET files are to text).  This module extracts ``href`` targets +
anchor text from the ``html`` column fully vectorized — one Arrow
``split_pattern`` on the raw bytes plus a handful of RE2 kernels over
the flattened segments, no Python-per-row — resolves them against the
page URL (RFC-3986-lite, documented below), and rolls them up into
host-level edges that feed :func:`ocgis_ray.stages.graph.pagerank`
and per-target anchor aggregates.

Extraction grammar (deliberately simple and EXACTLY specified so the
catalog oracle can replay ground truth analytically):

- a link is any ``href=`` attribute occurrence, double-quoted,
  single-quoted, or unquoted (``href=/x``, terminated by whitespace
  or ``>``);
- the anchor text is the segment between the tag-closing ``>`` and
  the next ``<`` (first text node only), with the five common HTML
  entities unescaped (``&amp;`` last, so ``&amp;lt;`` stays ``&lt;``)
  and surrounding whitespace trimmed;
- fragments are stripped (``a#b`` -> ``a``); links that are empty
  after that, or whose scheme is javascript/mailto/data/tel, are
  dropped.

Resolution against the page URL (scheme/host/path split re-uses
:func:`ocgis_ray.stages.url.parse_url_arrays`):

- ``scheme://...``      absolute, kept verbatim
- ``//host/path``       protocol-relative: base scheme + ``:`` + href
- ``/path``             root-relative: base scheme://host + href
- ``path``              relative: scheme://host + base-dir + href,
  where base-dir is the page path up to and including its last ``/``
  (query string dropped; ``/`` when the path is empty).  No ``..``
  normalization — targets keep the textual join, like WAT records do.

Scale design: extraction is a stateless per-batch map (the segment
explosion never leaves the task), so the only wide steps are the
rollups — ``host_edges`` and ``anchor_rollup`` ride the repo's
partial+bucketed ``grouped_aggregate`` (hot hosts collapse to one
partial row per batch before the shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocgis_ray.stages.url import parse_url_arrays

# order matters: &amp; must unescape LAST so "&amp;lt;" -> "&lt;"
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))
_DROP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")
_ABS_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*://"

LINK_COLUMNS = ("src_host", "href", "anchor", "dst_url", "dst_host",
                "is_internal", "link_pos")


def _utf8(arr: pa.Array) -> pa.Array:
    """binary -> string; invalid UTF-8 falls back to a per-row
    lossy decode (real crawls carry mojibake; the fast path is the
    common case)."""
    try:
        return pc.cast(arr, pa.string())
    except pa.ArrowInvalid:
        rows = arr.to_pylist()
        return pa.array(
            [None if r is None else
             (r if isinstance(r, str) else r.decode("utf-8", "replace"))
             for r in rows], pa.string())


def _group_ordinals(parent: np.ndarray) -> np.ndarray:
    """0,1,2,... within each run of equal (sorted) parent indices."""
    n = len(parent)
    if not n:
        return np.empty(0, dtype=np.int32)
    starts = np.flatnonzero(np.r_[True, parent[1:] != parent[:-1]])
    reps = np.diff(np.r_[starts, n])
    return (np.arange(n) - np.repeat(starts, reps)).astype(np.int32)


def outlink_arrays(html_arr, url_arr) -> tuple[dict[str, pa.Array], np.ndarray]:
    """Vectorized link extraction over one batch.

    Returns ``(columns, parent)`` where ``columns`` holds the
    :data:`LINK_COLUMNS` arrays of the exploded link table and
    ``parent`` maps each link to its source row (ascending), for
    gathering carry columns with ``pc.take``.
    """
    if isinstance(html_arr, pa.ChunkedArray):
        html_arr = html_arr.combine_chunks()
    if isinstance(url_arr, pa.ChunkedArray):
        url_arr = url_arr.combine_chunks()
    needle = b"href=" if pa.types.is_binary(html_arr.type) \
        or pa.types.is_large_binary(html_arr.type) else "href="
    lists = pc.split_pattern(html_arr, needle)
    seg = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    # the first segment of every row is the text BEFORE its first
    # href= (or the whole row when it has none) — never a link
    keep = np.zeros(len(parent), dtype=bool)
    if len(parent):
        keep[1:] = parent[1:] == parent[:-1]
    seg = seg.filter(pa.array(keep))
    parent = parent[keep]

    # href value: double-quoted | single-quoted | unquoted
    dq = pc.struct_field(pc.extract_regex(seg, '^"(?P<v>[^"]*)"'), "v")
    sq = pc.struct_field(pc.extract_regex(seg, "^'(?P<v>[^']*)'"), "v")
    uq = pc.struct_field(
        pc.extract_regex(seg, "^(?P<v>[^\\s\"'>][^\\s>]*)"), "v")
    href = pc.coalesce(dq, sq, uq)
    # anchor: first text node after the tag close, per quote style
    anc = pc.coalesce(
        pc.struct_field(pc.extract_regex(seg, '^"[^"]*"[^>]*>(?P<v>[^<]*)'), "v"),
        pc.struct_field(pc.extract_regex(seg, "^'[^']*'[^>]*>(?P<v>[^<]*)"), "v"),
        pc.struct_field(
            pc.extract_regex(seg, "^[^\\s\"'>][^\\s>]*[^>]*>(?P<v>[^<]*)"), "v"))

    href = _utf8(href)
    anchor = _utf8(anc)
    href = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(href, "(?s)#.*$", ""))
    low = pc.utf8_lower(href)
    bad = pc.or_kleene(pc.is_null(href), pc.equal(href, ""))
    for sch in _DROP_SCHEMES:
        bad = pc.or_kleene(bad, pc.starts_with(low, sch))
    ok = pc.fill_null(pc.invert(bad), False)
    href = href.filter(ok)
    anchor = anchor.filter(ok)
    parent = parent[ok.to_numpy(zero_copy_only=False)]

    base = pc.take(url_arr, pa.array(parent, pa.int64()))
    parts = parse_url_arrays(base)
    scheme, host = parts["url_scheme"], parts["url_host"]
    root = pc.binary_join_element_wise(scheme, "://", host, "")
    path = pc.replace_substring_regex(parts["url_path"], "(?s)[?#].*$", "")
    base_dir = pc.replace_substring_regex(path, "[^/]*$", "")
    base_dir = pc.if_else(pc.equal(base_dir, ""), pa.scalar("/"), base_dir)

    is_abs = pc.match_substring_regex(href, _ABS_RE)
    is_pr = pc.starts_with(href, "//")
    is_root = pc.and_(pc.starts_with(href, "/"), pc.invert(is_pr))
    dst_url = pc.if_else(
        is_abs, href,
        pc.if_else(
            is_pr, pc.binary_join_element_wise(scheme, ":", href, ""),
            pc.if_else(
                is_root, pc.binary_join_element_wise(root, href, ""),
                pc.binary_join_element_wise(root, base_dir, href, ""))))
    dst_host = pc.struct_field(
        pc.extract_regex(dst_url, _ABS_RE + "(?P<h>[^/?#]*)"), "h")

    anchor = pc.utf8_trim_whitespace(pc.fill_null(anchor, ""))
    for ent, ch in _ENTITIES:
        anchor = pc.replace_substring(anchor, ent, ch)

    cols = {
        "src_host": host,
        "href": href,
        "anchor": anchor,
        "dst_url": dst_url,
        "dst_host": pc.fill_null(dst_host, ""),
        "is_internal": pc.equal(pc.fill_null(dst_host, ""), host),
        "link_pos": pa.array(_group_ordinals(parent), pa.int32()),
    }
    return cols, parent


def extract_outlinks(ds, html_col: str = "html", url_col: str = "url",
                     carry: tuple[str, ...] = ("page_id",),
                     batch_size: int = 512):
    """Explode pages into one row per outlink (``carry`` columns +
    :data:`LINK_COLUMNS`).  Stateless zero-copy Arrow map; rows with
    null html emit nothing."""

    def f(t: pa.Table) -> pa.Table:
        cols, parent = outlink_arrays(t[html_col], t[url_col])
        idx = pa.array(parent, pa.int64())
        out: dict[str, pa.Array | pa.ChunkedArray] = {
            c: pc.take(t[c], idx) for c in carry}
        out.update(cols)
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def add_outlink_stats(ds, html_col: str = "html", url_col: str = "url"):
    """Append per-page ``n_outlinks`` / ``n_internal`` / ``n_external``
    (external = resolved host differs from the page host, including
    hostless ``dst_url`` rows from non-URL bases)."""

    def f(t: pa.Table) -> pa.Table:
        cols, parent = outlink_arrays(t[html_col], t[url_col])
        n = t.num_rows
        total = np.bincount(parent, minlength=n)
        internal = np.zeros(n, dtype=np.int64)
        im = cols["is_internal"].to_numpy(zero_copy_only=False)
        if len(parent):
            internal = np.bincount(parent, weights=im.astype(np.float64),
                                   minlength=n).astype(np.int64)
        t = t.append_column("n_outlinks", pa.array(total, pa.int64()))
        t = t.append_column("n_internal", pa.array(internal, pa.int64()))
        return t.append_column("n_external",
                               pa.array(total - internal, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=512)


def host_edges(link_ds, min_links: int = 1):
    """Host-level link graph from the exploded link table:
    ``(src, dst, n_links)``, ready for
    :func:`ocgis_ray.stages.graph.pagerank` (``src``/``dst`` naming
    matches its edge schema).  Self-loops are kept — callers that
    want the cross-host graph filter ``src != dst``."""
    from ocgis_ray.stages.tiles import grouped_aggregate

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["src" if c == "src_host" else "dst" if c == "dst_host" else c
             for c in t.column_names])

    edges = grouped_aggregate(
        link_ds.select_columns(["src_host", "dst_host"]),
        keys=["src_host", "dst_host"], spec={"n_links": (None, "count")})
    edges = edges.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)
    if min_links > 1:
        edges = edges.filter(expr=f"n_links >= {min_links}")
    return edges


def add_inlink_counts(pages_ds, link_ds, url_col: str = "url"):
    """Join the per-target inlink signals back onto the pages:
    ``n_refs`` / ``n_src_hosts`` per page URL, 0 when nothing links
    to it.  The join's build side is the anchor rollup — three slim
    columns at link-target cardinality — hash-partitioned against the
    pages on URL (one wide exchange of the slim side; the fat page
    rows cross once, as any URL-keyed join must)."""
    from ocgis_ray.sources.io import join_datasets

    roll = anchor_rollup(link_ds)
    joined = join_datasets(pages_ds, roll, on=(url_col,),
                           right_on=("dst_url",), join_type="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        for c in ("n_refs", "n_src_hosts"):
            i = t.schema.get_field_index(c)
            t = t.set_column(i, c, pc.fill_null(
                pc.cast(t[c], pa.int64()), 0))
        return t

    return joined.map_batches(fill, batch_format="pyarrow",
                              zero_copy_batch=True)


def anchor_rollup(link_ds):
    """Per link TARGET: ``n_refs`` (inlinks) and ``n_src_hosts``
    (distinct referring hosts — the classic spam-resistant inlink
    signal).  Two bucketed grouped aggregates: the first collapses to
    distinct (dst_url, src_host) pairs, the second counts them, so no
    stage ever sees more than the distinct-pair working set."""
    from ocgis_ray.stages.tiles import grouped_aggregate

    pairs = grouped_aggregate(
        link_ds.select_columns(["dst_url", "src_host"]),
        keys=["dst_url", "src_host"], spec={"n_refs": (None, "count")})
    return grouped_aggregate(
        pairs, keys=["dst_url"],
        spec={"n_refs": ("n_refs", "sum"), "n_src_hosts": (None, "count")})
