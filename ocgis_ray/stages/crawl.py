"""Crawl-snapshot diff — incremental processing between two crawls.

A recurring crawl produces snapshot tables; the incremental pipeline
wants to touch only what moved.  ``crawl_diff`` classifies every URL
across two snapshots (``added`` / ``removed`` / ``changed`` /
``unchanged``) and ``incremental_updates`` returns the new snapshot's
rows that actually need reprocessing — the front gate for the
incremental dedup/cleaning paths (``dedup.minhash_dedup_incremental``,
``state.lineage`` resume).

Scale design: the diff never touches page payloads — both sides are
projected to (key, ts, content-hash) BEFORE the join, so the full
outer join exchanges three slim columns per snapshot; the fat new-side
rows move only in ``incremental_updates``'s final semi-join, and only
the added/changed subset.  The content hash is the repo's Horner+
splitmix whole-string hash (``text.string_value_hash``), so a DuckDB
twin can replay the classification bit-exact
(``parity.sql_string_hash``).

Snapshot key semantics: each side is expected to hold ONE row per key
(crawl snapshots are URL-deduped; run ``url.dedup_by_url`` first if
not).  Duplicate keys would cross-multiply in the join, like in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DIFF_STATUSES = ("added", "removed", "changed", "unchanged")


def _slim(ds, key: str, ts_col: str | None, content_col: str | None,
          side: str):
    """Project to (key, <side>_ts, <side>_hash)."""

    def f(t: pa.Table) -> pa.Table:
        cols: dict = {key: t[key]}
        if ts_col is not None:
            cols[f"{side}_ts"] = t[ts_col]
        if content_col is not None:
            from ocgis_ray.stages.text import string_value_hash

            h = string_value_hash(t[content_col].combine_chunks()
                                  if isinstance(t[content_col],
                                                pa.ChunkedArray)
                                  else t[content_col])
            cols[f"{side}_hash"] = pa.array(h.astype(np.int64))
        # presence marker survives the outer join even when ts/hash
        # are absent (int8: null on the missing side)
        cols[f"{side}_present"] = pa.array(
            np.ones(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crawl_diff(old_ds, new_ds, key: str = "url",
               ts_col: str | None = "warc_ts",
               content_col: str | None = "text",
               num_partitions: int | None = None):
    """Full-outer diff of two snapshots on ``key``.

    Returns (key, status, old_ts, new_ts, old_hash, new_hash) with
    ``status`` in :data:`DIFF_STATUSES`; ``changed`` means both sides
    exist and the content hashes differ (when ``content_col`` is None,
    ts inequality decides instead; with neither, both-sides rows are
    ``unchanged``)."""
    from ocgis_ray.sources.io import join_datasets

    old_slim = _slim(old_ds, key, ts_col, content_col, "old")
    new_slim = _slim(new_ds, key, ts_col, content_col, "new")
    joined = join_datasets(old_slim, new_slim, on=(key,),
                           join_type="full_outer",
                           num_partitions=num_partitions)

    has_hash = content_col is not None
    has_ts = ts_col is not None

    def classify(t: pa.Table) -> pa.Table:
        in_old = pc.is_valid(t["old_present"])
        in_new = pc.is_valid(t["new_present"])
        if has_hash:
            same = pc.equal(t["old_hash"], t["new_hash"])
        elif has_ts:
            same = pc.equal(t["old_ts"], t["new_ts"])
        else:
            same = pa.array(np.ones(t.num_rows, dtype=bool))
        status = pc.if_else(
            pc.invert(in_old), pa.scalar("added"),
            pc.if_else(
                pc.invert(in_new), pa.scalar("removed"),
                pc.if_else(pc.fill_null(same, False),
                           pa.scalar("unchanged"), pa.scalar("changed"))))
        t = t.drop_columns(["old_present", "new_present"])
        return t.append_column("status", status)

    return joined.map_batches(classify, batch_format="pyarrow",
                              zero_copy_batch=True)


def incremental_updates(old_ds, new_ds, key: str = "url",
                        ts_col: str | None = "warc_ts",
                        content_col: str | None = "text",
                        num_partitions: int | None = None):
    """New-snapshot rows that need reprocessing (status added or
    changed), full schema.  The diff runs on slim projections; the fat
    rows cross the wire once, in the final semi-join, and only for the
    added/changed keys."""
    from ocgis_ray.sources.io import join_datasets

    diff = crawl_diff(old_ds, new_ds, key=key, ts_col=ts_col,
                      content_col=content_col,
                      num_partitions=num_partitions)
    todo = diff.filter(expr="status == 'added' or status == 'changed'") \
        .select_columns([key])
    return join_datasets(new_ds, todo, on=(key,), join_type="left_semi",
                         num_partitions=num_partitions)


def crawl_diff_sql(old_cte: str, new_cte: str, key: str = "url",
                   ts_col: str | None = "warc_ts",
                   content_col: str | None = "text") -> str:
    """DuckDB twin of :func:`crawl_diff` over two CTE/table names —
    same Horner hash (``parity.sql_string_hash``), same CASE order."""
    from ocgis_ray.parity import sql_signed64 as signed64
    from ocgis_ray.parity import sql_string_hash

    def side(name, tag):
        sel = [f"{key}"]
        if ts_col is not None:
            sel.append(f"{ts_col} AS {tag}_ts")
        if content_col is not None:
            sel.append(
                f"{signed64(f'({sql_string_hash(content_col)})')} "
                f"AS {tag}_hash")
        return f"SELECT {', '.join(sel)} FROM {name}"

    if content_col is not None:
        same = "o.old_hash = n.new_hash"
    elif ts_col is not None:
        same = "o.old_ts = n.new_ts"
    else:
        same = "TRUE"
    cols = [f"coalesce(o.{key}, n.{key}) AS {key}"]
    if ts_col is not None:
        cols += ["o.old_ts", "n.new_ts"]
    if content_col is not None:
        cols += ["o.old_hash", "n.new_hash"]
    return (
        f"WITH o AS ({side(old_cte, 'old')}), n AS ({side(new_cte, 'new')})\n"
        f"SELECT {', '.join(cols)},\n"
        f"  CASE WHEN o.{key} IS NULL THEN 'added'\n"
        f"       WHEN n.{key} IS NULL THEN 'removed'\n"
        f"       WHEN {same} THEN 'unchanged'\n"
        f"       ELSE 'changed' END AS status\n"
        f"FROM o FULL OUTER JOIN n ON o.{key} = n.{key}"
    )
