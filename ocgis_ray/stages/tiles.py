"""Tiling service: per-cell rollups, histograms, salting, clip areas.

Replaces the reference's tile machinery — ``get_tile_schema``
(``/root/reference/src/ocgis/calc/tile.py:6-20``), the GridChunker's
spatial decomposition (``spatial/grid_chunker.py``), and the tiled
calculation loop (``util/large_array.py:15-225``) — with cell-id keyed
Ray Data aggregation.  A "tile" is a quadgrid cell id; tile
uniqueness is free because every page hashes to exactly one cell (the
reference needs jittered split polygons + ``no_touching`` aborts for
the same guarantee, ``spatial/base.py:776-790``).

Scale design:
- **partial aggregation**: per-batch pandas groupby inside
  ``map_batches`` emits one row per (key, batch) BEFORE the global
  ``groupby`` — the all-to-all shuffle moves partials, not pages.
  This is also the skew story for aggregates: a hot cell's million
  pages become one partial row per batch.
- **salting** (for ``map_groups``-style per-tile work that can't be
  partially aggregated): ``cell_histogram`` + ``salt_plan`` compute a
  histogram-driven salt factor per hot cell; ``add_salt`` appends a
  deterministic ``salt`` column (pure function of page_id, preserving
  resume determinism — SURVEY §7.5).
"""

from __future__ import annotations


def _ap() -> int:
    from ocgis_ray.tuning import auto_pool

    return auto_pool()

import numpy as np
import pandas as pd
import pyarrow as pa

def grouped_aggregate(ds, keys: list[str] | str, spec: dict, batch_size: int = 65536,
                      num_buckets: int | None = None):
    """Generic partial+final grouped aggregate.

    ``spec``: ``{out_col: (in_col, kind)}`` with kinds count/sum/min/
    max/sumsq.  Returns a Dataset with ``keys`` + out columns.

    Scale design: the global shuffle only ever sees per-batch partials,
    and the final combine is a BUCKETED hash shuffle — partials carry a
    ``_bucket = hash(keys) % num_buckets`` column, the ``groupby`` runs
    on that small int key (cheap range sort), and the per-key combine
    happens VECTORIZED (pandas groupby) inside each bucket.  Ray Data's
    builtin ``groupby().aggregate()`` degrades to per-key Python with
    high-cardinality keys (~700 rows/s on 10k tile ids); this path
    measures ~100x faster and is exactly the partitioned-combine the
    north rule's groupby-aggregate-sort shuffle needs.  Bucket count
    bounds reducer parallelism; hot KEYS are already collapsed to one
    partial row per batch so bucket skew is bounded by key count, not
    row count."""
    from ocgis_ray.tuning import auto_buckets

    num_buckets = auto_buckets(num_buckets)
    keys = [keys] if isinstance(keys, str) else list(keys)

    def partial_with_bucket(t: pa.Table) -> pa.Table:
        # zero-copy Arrow partial: derive the aggregation inputs,
        # hash-aggregate per key, append the shuffle bucket — the
        # former pandas version converted every block (all columns)
        # per batch.  pandas groupby drops null-key rows; mirror that.
        import pyarrow.compute as pc

        if any(t[k].null_count for k in keys):
            m = None
            for k in keys:
                v = pc.is_valid(t[k])
                m = v if m is None else pc.and_(m, v)
            t = t.filter(m)
        cols = {k: t[k] for k in keys}
        aggs = []
        for out, (col, kind) in spec.items():
            if kind == "count":
                cols[out] = (pa.array(np.ones(t.num_rows, np.int64))
                             if col is None
                             else pc.cast(pc.is_valid(t[col]), pa.int64()))
                aggs.append((out, "sum"))
            elif kind == "sum":
                cols[out] = t[col]
                aggs.append((out, "sum"))
            elif kind == "sumsq":
                c = pc.cast(t[col], pa.float64())
                cols[out] = pc.multiply(c, c)
                aggs.append((out, "sum"))
            elif kind in ("min", "max"):
                cols[out] = t[col]
                aggs.append((out, kind))
            else:
                raise ValueError(f"unknown partial kind {kind!r}")
        g = pa.table(cols).group_by(keys, use_threads=False).aggregate(aggs)
        out_cols = {k: g[k] for k in keys}
        for out, (_, kind) in spec.items():
            suffix = "sum" if kind in ("count", "sum", "sumsq") else kind
            out_cols[out] = g[f"{out}_{suffix}"]
        res = pa.table(out_cols)
        from ocgis_ray.sources.io import bucket_key_hash

        h = bucket_key_hash(res, keys)
        return res.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    partial = ds.map_batches(
        partial_with_bucket, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size
    )

    how = {}
    for out, (_, kind) in spec.items():
        how[out] = "sum" if kind in ("count", "sum", "sumsq") else kind

    val_cols = list(spec)

    def combine(g: pd.DataFrame) -> pa.Table:
        # sort partials by (keys, values) BEFORE summing: block arrival
        # order varies run to run, and float partial sums in arrival
        # order differ in the last ulp — which flips a downstream
        # round() exactly on a .5 boundary (observed once at sf0.1 on
        # the area-weighted rollup).  Sorting makes every combine a
        # pure function of the data.
        out = (
            g.drop(columns=["_bucket"])
            .sort_values(keys + val_cols, kind="mergesort")
            .groupby(keys, as_index=False, sort=False)
            .agg(how)
        )
        # Arrow blocks out: pandas blocks defeat Ray's schema-dedup
        # fast path (see bucketed_group_apply)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return partial.groupby("_bucket").map_groups(combine, batch_format="pandas")


def tile_rollup(
    ds,
    cell_col: str = "cell_r8",
    extra_keys: list[str] | None = None,
    batch_size: int = 65536,
):
    """The north star's per-tile page rollup: groupby cell ->
    n_pages, total n_chars, distinct-ish stats — partial+final, then
    range-sorted by tile id for ordered output (the
    groupby-aggregate-sort of the north rule)."""
    keys = [cell_col] + (extra_keys or [])
    out = grouped_aggregate(
        ds,
        keys,
        {
            "n_pages": (None, "count"),
            "sum_chars": ("n_chars", "sum"),
            "min_ts": ("warc_ts", "min"),
            "max_ts": ("warc_ts", "max"),
        },
        batch_size=batch_size,
    )
    return out.repartition(1).sort(cell_col)  # small result: local sort


def tile_pyramid(ds, spec: dict, res: int, to_res: int = 0,
                 cell_col: str | None = None, res_col: str = "res",
                 cell_out: str = "cell", num_buckets: int | None = None):
    """Multi-resolution tile-rollup pyramid (map-tile overview levels):
    one Dataset with ``(res, cell, <aggregates>)`` rows for every
    resolution ``to_res..res`` — the zoom-level pre-aggregation a tile
    service serves from.

    Scale shape: the RAW data is read exactly once (the finest-level
    :func:`grouped_aggregate`); each coarser level re-aggregates the
    PREVIOUS level's rollup (occupied-cell-sized, shrinking ~4x per
    level) via :func:`ocgis_ray.grid.parent` — never the input.  Only
    mergeable kinds are valid (count/sum/sumsq re-merge as sum,
    min/max as themselves); a mean is sum/count downstream.

    Exactness: ``parent(encode(p, r)) == encode(p, r-1)`` bit-for-bit
    (cell sizes are exact binary, and binary-fp rounding is invariant
    under powers of two), so every level equals a direct groupby of
    the raw points at that resolution — the DuckDB-twin property the
    parity test asserts per level."""
    from ocgis_ray import grid

    if not (grid.RES_MIN <= to_res <= res <= grid.RES_MAX):
        raise ValueError(f"need {grid.RES_MIN} <= to_res <= res <= "
                         f"{grid.RES_MAX}, got to_res={to_res} res={res}")
    cell_col = cell_col or f"cell_r{res}"
    merge_spec = {
        out: (out, "sum" if kind in ("count", "sum", "sumsq") else kind)
        for out, (_, kind) in spec.items()}
    outs = list(spec)

    def relabel(src: str, r: int):
        def f(t: pa.Table) -> pa.Table:
            cols = {res_col: pa.array(np.full(t.num_rows, r, np.int64)),
                    cell_out: pa.array(t[src].to_numpy(
                        zero_copy_only=False).astype(np.int64))}
            for out in outs:
                cols[out] = t[out]
            return pa.table(cols)
        return f

    def to_parent(src: str, r: int):
        def f(t: pa.Table) -> pa.Table:
            p = grid.parent(t[src].to_numpy(zero_copy_only=False), r, r - 1)
            cols = {"_pcell": pa.array(p)}
            for out in outs:
                cols[out] = t[out]
            return pa.table(cols)
        return f

    levels = []
    # each level's rollup is consumed by TWO branches (its relabel and
    # the next coarser aggregate) and Ray Data does not dedupe shared
    # lazy subplans — materialize each occupied-cell-sized rollup so
    # the RAW data is scanned exactly once, not once per level
    cur = grouped_aggregate(ds, cell_col, spec,
                            num_buckets=num_buckets).materialize()
    src = cell_col
    for r in range(res, to_res - 1, -1):
        levels.append(cur.map_batches(relabel(src, r),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True))
        if r > to_res:
            parented = cur.map_batches(to_parent(src, r),
                                       batch_format="pyarrow",
                                       zero_copy_batch=True)
            cur = grouped_aggregate(parented, "_pcell", merge_spec,
                                    num_buckets=num_buckets).materialize()
            src = "_pcell"
    out = levels[0]
    if len(levels) > 1:
        out = out.union(*levels[1:])
    return out


def cell_histogram(ds, cell_col: str = "cell_r7", batch_size: int = 65536) -> pd.DataFrame:
    """Small driver-side histogram of pages per cell (itself computed
    with partial aggregation — cheap even on the full input)."""
    hist = grouped_aggregate(ds, [cell_col], {"n": (None, "count")}, batch_size)
    return hist.to_pandas()


def salt_plan(hist: pd.DataFrame, cell_col: str = "cell_r7", rows_per_salt: int = 100_000) -> dict[int, int]:
    """cell -> number of salt buckets (only hot cells appear)."""
    hot = hist[hist["n"] > rows_per_salt]
    return {
        int(c): int(np.ceil(n / rows_per_salt))
        for c, n in zip(hot[cell_col], hot["n"])
    }


class SaltStage:
    """Appends a deterministic ``salt`` int64 column: 0 for cold cells,
    ``hash(page_id) % n_salts(cell)`` for hot ones.  Deterministic in
    page_id so resume/retry re-derives identical partitions."""

    def __init__(self, plan_ref, cell_col: str = "cell_r7"):
        import ray

        self.plan: dict[int, int] = (
            ray.get(plan_ref) if not isinstance(plan_ref, dict) else plan_ref
        )
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell = batch[self.cell_col].to_numpy(zero_copy_only=False)
        page_id = batch["page_id"].to_numpy(zero_copy_only=False)
        salt = np.zeros(batch.num_rows, dtype=np.int64)
        if self.plan:
            uniq = np.unique(cell)
            nsalts = np.asarray(
                [self.plan.get(int(c), 1) for c in uniq], dtype=np.int64
            )
            per_row = nsalts[np.searchsorted(uniq, cell)]
            mixed = (page_id * 2654435761) % 9576890767
            salt = np.where(per_row > 1, mixed % per_row, 0)
        return batch.append_column("salt", pa.array(salt))


_SALT_CACHE: dict = {}


def add_salt(ds, plan: dict[int, int], cell_col: str = "cell_r7"):
    """Stateless-task salting: the plan ships once per worker via a
    broadcast ref + module cache (keyed by ref identity — Ray reuses
    worker processes across executions).  A fixed actor pool here paid
    ~1 s of per-execution actor spawn for a stage whose state is one
    small dict (measured: salted rollup 1.7 s -> 0.7 s warm at sf0.1);
    elastic tasks also stop the pool from reserving CPUs against the
    surrounding read/shuffle stages."""
    import ray

    plan_ref = ray.put(plan)
    key = (plan_ref.hex(), cell_col)

    def salt_task(batch: pa.Table) -> pa.Table:
        w = _SALT_CACHE.get("w")
        if w is None or _SALT_CACHE.get("key") != key:
            w = _SALT_CACHE["w"] = SaltStage(plan_ref, cell_col)
            _SALT_CACHE["key"] = key
        return w(batch)

    return ds.map_batches(salt_task, batch_format="pyarrow",
                          zero_copy_batch=True)


