"""Sized parquet reads + generic bucketed group-apply helpers.

Two systemic Ray Data costs this module manages:

1. **Block count vs file size.**  Ray's default parallelism heuristic
   splits even a 2 MB parquet into ``num_cpus * 2`` blocks; every
   all-to-all (groupby/sort) then pays a fixed per-block exchange cost
   that dwarfs the work (measured: 100k-row groupby 7.1s at 64 blocks
   vs 0.57s at 8).  :func:`read_parquet_sized` picks
   ``override_num_blocks`` from the FILE SIZE (~one block per
   ``target_block_bytes``), which is exactly what a 100 TB read does
   naturally — there the default heuristic is already size-driven.

2. **Per-group Python overhead in groupby().map_groups.**  Ray calls
   the UDF once per distinct key; with 10^4+ keys that is ~700 rows/s.
   :func:`bucketed_group_apply` shuffles on ``hash(keys) % B`` (small
   int key -> cheap exchange) and hands the UDF a whole bucket so the
   per-key work can run vectorized (pandas groupby) inside.
   :func:`distinct_rows` builds exact dedup on top of it.

These are the engine's equivalents of the reference's decomposition
tuning (``/root/reference/src/ocgis/vmachine/mpi.py:294-354`` picks the
split dimension; we pick block counts and shuffle keys).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_BLOCK_BYTES = 32 * 1024 * 1024


def stripped_schema(first_file: str, columns: list[str] | None = None):
    """File schema with pandas metadata removed (None when the file
    carries none): schemas holding the b'pandas' dict are unhashable
    to Ray's schema-dedup fast path ("Failed to hash the schemas" on
    every block).  When ``columns`` is given the schema is subset to
    them in order — Ray validates blocks against the USER schema
    as-is, so it must match the projected layout exactly.  Shared by
    :func:`read_parquet_sized` and ``stages.reorder.read_morton_pruned``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    file_schema = pq.read_schema(first_file)
    if not file_schema.metadata:
        return None
    schema = file_schema.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def read_parquet_sized(
    path: str,
    columns: list[str] | None = None,
    filter=None,
    target_block_bytes: int = DEFAULT_BLOCK_BYTES,
    min_blocks: int | None = None,
    max_blocks: int = 512,
):
    """``ray.data.read_parquet`` with size-derived block count.

    ``min_blocks`` defaults to ``min(cpus, uncompressed_size // 1 MiB)``
    so a small-but-expensive input (one 14 MB documents file feeding a
    minhash scan) still fans out across the node — a single-block read
    pins every downstream map stage to ONE task (measured: signature
    scan 3.8s -> 1.5s).  Tiny files stay at 1-2 blocks so the per-block
    exchange cost of later groupbys stays negligible."""
    import ray.data as rd

    def uncompressed(fp: str) -> int:
        # block sizing must use IN-MEMORY bytes: repetitive text
        # columns compress >10x on disk and file-size-based counts
        # would under-parallelize the read by the same factor
        import pyarrow.parquet as pq

        md = pq.ParquetFile(fp).metadata
        return sum(md.row_group(i).total_byte_size for i in range(md.num_row_groups))

    first_file = None
    hive_layout = False
    if isinstance(path, (list, tuple)):
        # explicit file list (e.g. a checkpoint dir whose manifest
        # would trip a directory scan)
        path = list(path)
        size = sum(uncompressed(p) for p in path if os.path.isfile(p)) or None
        first_file = next((p for p in path if os.path.isfile(p)), None)
        # a list drawn from part=*/ dirs is hive-partitioned too — a
        # user schema would drop the partition columns
        hive_layout = any("=" in os.path.dirname(p) for p in path)
    elif os.path.isfile(path):
        size = uncompressed(path)
        first_file = path
    elif os.path.isdir(path):
        # recurse: hive/partitioned layouts (e.g. lineage's part=*/
        # dirs) keep their files in subdirectories — a top-level-only
        # scan would report size 0 and pin the read to ONE block
        size = 0
        for root, _dirs, files in os.walk(path):
            if "=" in os.path.relpath(root, path):
                hive_layout = True
            for f in sorted(files):
                if f.endswith(".parquet"):
                    size += uncompressed(os.path.join(root, f))
                    if first_file is None:
                        first_file = os.path.join(root, f)
        if size == 0:
            size = None  # no files found: fall back to Ray's heuristic
    else:
        size = None
    # Strip pandas metadata from the read schema (see stripped_schema).
    # Skipped for hive layouts, where a user-supplied schema would drop
    # the partition columns.
    schema = None
    if first_file is not None and not hive_layout:
        schema = stripped_schema(first_file, columns)
    kwargs = {}
    if size is not None:
        if min_blocks is None:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8)) if \
                ray.is_initialized() else 8
            min_blocks = max(1, min(cpus, size // (1024 * 1024)))
        nb = int(np.clip((size + target_block_bytes - 1) // target_block_bytes,
                         min_blocks, max_blocks))
        kwargs["override_num_blocks"] = nb
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    if schema is not None:
        kwargs["schema"] = schema
    return rd.read_parquet(path, **kwargs)


def join_datasets(left, right, on, right_on=None, join_type: str = "inner",
                  num_partitions: int | None = None, left_suffix: str | None = None,
                  right_suffix: str | None = None):
    """``Dataset.join`` with cluster-aware partition/aggregator sizing.

    Ray's hash-shuffle join reserves ``0.125 CPU x num_partitions`` of
    long-lived aggregator actors PER JOIN; a pipeline with two joins
    plus an actor-pool map stage deadlocks a small cluster (the
    aggregators and the pool together ask for more CPUs than exist and
    none can release).  Scale partitions with the cluster and cap each
    join's aggregator reservation at ~1/8 of the cluster so several
    concurrent shuffle stages still fit — on a 256-node cluster the
    same formula yields hundreds of partitions, which is what a 100 TB
    join wants."""
    import ray

    # blocks that arrived via pandas conversions carry pandas schema
    # metadata (a dict) that makes schemas unhashable — the shuffle
    # aggregators then log "Failed to hash the schemas" per block and
    # lose Ray's schema-dedup fast path.  Stripping metadata is a
    # zero-copy schema-only op.
    def _strip(t):
        return t.replace_schema_metadata(None)

    left = left.map_batches(_strip, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(_strip, batch_format="pyarrow",
                              zero_copy_batch=True)
    total = int(ray.cluster_resources().get("CPU", 8)) or 8
    if num_partitions is None:
        # each partition is a long-lived aggregator actor whose startup
        # is pure fixed cost (measured: a 2-join pipeline at 32
        # partitions spends 4.6s spawning actors vs 1.0s at 8 on the
        # same data) — default to cpus/4 and let 100 TB callers pass an
        # explicit count sized to their data
        num_partitions = max(2, min(64, total // 4))
    agg_cpus = max(0.01, min(0.125, (total / 8.0) / num_partitions))
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions,
        on=on, right_on=right_on,
        left_suffix=left_suffix, right_suffix=right_suffix,
        aggregator_ray_remote_args={"num_cpus": agg_cpus},
    )


def skew_join(left, right, on: str, right_on: str | None = None,
              join_type: str = "inner", hot_values=None, hot_k: int = 32,
              salt: int = 16, num_partitions: int | None = None):
    """Hash join resilient to hot keys (salted replication).

    A plain hash join sends EVERY row of a hot key to one aggregator
    partition — at web scale one popular domain can be 10% of the
    corpus and that partition becomes the pipeline.  This helper
    spreads each hot key's probe rows across ``salt`` partitions and
    replicates the (typically few) build rows of those keys to every
    salt, so the join on ``(key, _sj_salt)`` balances:

    - **left** (probe, the big/skewed side): rows whose key is hot get
      ``_sj_salt = arange % salt`` within each batch (placement-only —
      any assignment yields the same join OUTPUT, so resume stability
      of the salt itself is not required); cold rows get salt 0.
    - **right** (build): hot-key rows are replicated once per salt;
      cold rows get salt 0.  Replication factor = salt x hot build
      rows — keep the hot build side per key small or lower ``salt``.

    ``hot_values``: explicit hot-key list, or None to auto-detect the
    top ``hot_k`` left keys with the bounded-memory Misra-Gries sketch
    (one extra pass over ``left``; pass the list when you already know
    the skew).  ``join_type``: ``inner`` or ``left_outer`` (left rows
    are never replicated so left-outer stays exact; right/full outer
    would emit a missing right row once per salt — rejected)."""
    import pyarrow.compute as pc

    if join_type not in ("inner", "left_outer"):
        raise ValueError(
            f"skew_join supports inner/left_outer, not {join_type!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    right_on = right_on or on
    if hot_values is None:
        from ocgis_ray.stages.sketch import heavy_hitters

        hot_values = heavy_hitters(left, on, k=hot_k).to_pandas()[
            "value"].tolist()
    hot = list(hot_values)

    def salt_left(t: pa.Table) -> pa.Table:
        if hot:
            m = pc.is_in(t[on], value_set=pa.array(hot)).to_numpy(
                zero_copy_only=False)
            s = np.where(m, np.arange(t.num_rows) % salt, 0)
        else:
            s = np.zeros(t.num_rows, dtype=np.int64)
        return t.append_column("_sj_salt", pa.array(s.astype(np.int64)))

    def replicate_right(t: pa.Table) -> pa.Table:
        base = t.append_column(
            "_sj_salt", pa.array(np.zeros(t.num_rows, dtype=np.int64)))
        if not hot or salt == 1:
            return base
        m = pc.is_in(t[right_on], value_set=pa.array(hot)).to_numpy(
            zero_copy_only=False)
        idx = np.nonzero(m)[0]
        if not idx.size:
            return base
        rep = t.take(pa.array(np.repeat(idx, salt - 1), pa.int64()))
        rep = rep.append_column("_sj_salt", pa.array(np.tile(
            np.arange(1, salt, dtype=np.int64), idx.size)))
        return pa.concat_tables([base, rep])

    lhs = left.map_batches(salt_left, batch_format="pyarrow",
                           zero_copy_batch=True)
    rhs = right.map_batches(replicate_right, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = join_datasets(lhs, rhs, on=[on, "_sj_salt"],
                        right_on=[right_on, "_sj_salt"],
                        join_type=join_type,
                        num_partitions=num_partitions)
    return out.drop_columns(["_sj_salt"])


def ensure_list_column(t, col: str, value_type=None):
    """Normalize a column to a plain Arrow list array.

    Ray Data converts pandas object columns of UNIFORM-length arrays
    to its fixed-shape tensor extension type, which parquet-serializes
    as ``STRUCT(data, shape)`` — a schema surprise for any downstream
    SQL reader (and it varies per block with the data).  This rebuilds
    the column as ``list<value_type>`` regardless of which form the
    block arrived in."""
    import numpy as np
    import pyarrow as pa

    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # large_list (pandas round-trips / >2GB offsets) is REBUILT too —
    # passing it through would recreate the per-block inconsistency
    if pa.types.is_list(arr.type) and (
            value_type is None or arr.type.value_type == value_type):
        return t
    rows = arr.to_numpy(zero_copy_only=False)
    if value_type is None:
        value_type = (arr.type.value_type
                      if pa.types.is_large_list(arr.type) else pa.int32())
    vt = value_type
    npdt = vt.to_pandas_dtype()
    # null rows (to_numpy yields None) become empty lists with the
    # validity mask preserved — len(None) was a TypeError (round-3
    # advice)
    mask = None
    if arr.null_count:
        isnull = np.fromiter((x is None for x in rows), dtype=bool,
                             count=len(rows))
        # offsets is length n+1: a null at slot i marks list i null
        mask = np.zeros(len(rows) + 1, dtype=bool)
        mask[:-1] = isnull
        rows = [() if x is None else x for x in rows]
    lens = np.fromiter((len(x) for x in rows), dtype=np.int64,
                       count=len(rows))
    flat = (np.concatenate([np.asarray(x, dtype=npdt) for x in rows])
            if len(rows) and lens.sum() else np.empty(0, dtype=npdt))
    offsets = np.zeros(len(rows) + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    new = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32(), mask=mask), pa.array(flat, vt))
    return t.set_column(t.schema.get_field_index(col), col, new)


def _bucket_column_hash(col) -> np.ndarray:
    """Per-row uint64 hash of one Arrow column without a pandas hop.

    Strings/binary hash zero-copy over the byte buffer (Horner +
    splitmix, ``text.string_value_hash``); numeric/temporal/bool hash
    their 64-bit word through splitmix.  Exotic types (list, struct)
    fall back to a pandas hash of THAT COLUMN only."""
    import pyarrow as pa

    from ocgis_ray.stages.text import _mix64, string_value_hash

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        return string_value_hash(col)
    try:
        v = col.to_numpy(zero_copy_only=False)
    except (pa.ArrowInvalid, NotImplementedError, TypeError):
        v = None
    if v is not None and v.dtype != object:
        if v.dtype.kind in "mM":
            v = v.view("i8")
        if v.dtype.kind == "b":
            v = v.astype(np.uint64)
        elif v.dtype.kind == "f":
            # canonicalize NaN so nulls hash consistently
            v = np.nan_to_num(v.astype(np.float64), nan=-0.5).view(np.uint64)
        elif v.dtype.kind in "iu":
            v = v.astype(np.int64).view(np.uint64)
        else:
            v = None
        if v is not None:
            return _mix64(v)
    return pd.util.hash_pandas_object(
        col.to_pandas(), index=False).to_numpy(np.uint64)


def bucket_key_hash(t, keys: list[str]) -> np.ndarray:
    """Combined uint64 row hash over ``keys`` (order-sensitive)."""
    from ocgis_ray.stages.text import _mix64

    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = _mix64(h * np.uint64(1099511628211) + _bucket_column_hash(t[k]))
    return h


def bucketed_group_apply(ds, keys: list[str] | str, fn,
                         num_buckets: int | None = None,
                         batch_format: str = "pandas"):
    """Apply ``fn(bucket_df)`` once per hash bucket of ``keys``.

    ``fn`` receives ALL rows whose key hashes to the bucket (possibly
    many distinct keys) and is responsible for its own per-key pandas
    groupby.  The ``_bucket`` column is dropped before ``fn`` runs.
    ``num_buckets=None`` sizes by the live cluster
    (``tuning.auto_buckets``); scale-bound callers pass it explicitly.
    """
    from ocgis_ray.tuning import auto_buckets

    num_buckets = auto_buckets(num_buckets)
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        # zero-copy Arrow stage: the former pandas version round-
        # tripped the WHOLE block (fat text columns included) through
        # pandas just to hash the slim key columns — this hashes the
        # key arrays directly (Horner over the string byte buffer /
        # splitmix over numeric words) and appends one int64 column
        h = bucket_key_hash(t, keys)
        b = (h % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_bucket", pa.array(b))

    def apply(g: pd.DataFrame):
        g = g.drop(columns=["_bucket"])
        out = fn(g)
        # emit ARROW blocks: pandas blocks downstream defeat Ray's
        # schema-dedup fast path (PandasBlockSchema is unhashable —
        # one "Failed to hash the schemas" warning PER TASK) and every
        # consumer pays the conversion later anyway; metadata=None so
        # the pandas provenance dict never reaches a shuffle
        if isinstance(out, pd.DataFrame):
            tbl = pa.Table.from_pandas(out, preserve_index=False)
            if not len(out):
                # an EMPTY frame's object columns infer as Arrow
                # `null`, which poisons downstream schema unification
                # (hash-join partitions mixing null/string blocks fail
                # outright) — recover real types from the bucket's
                # input rows for any column the output shares with it
                gsch = pa.Schema.from_pandas(g, preserve_index=False)
                fields = [
                    pa.field(f.name, gsch.field(f.name).type)
                    if pa.types.is_null(f.type) and f.name in gsch.names
                    else f
                    for f in tbl.schema]
                tbl = tbl.cast(pa.schema(fields))
            out = tbl.replace_schema_metadata(None)
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(apply, batch_format=batch_format)
    )


def topk_by_group(ds, group_col: str, sort_cols: list[str], ascending: list[bool],
                  k: int, rank_col: str = "rank", num_buckets: int | None = None):
    """Top-k rows per group with a 1-based ``rank`` column.

    The scalable final-combine shape for kNN/ANN: groups co-locate via
    the hash-bucket shuffle and the per-group head(k) runs as ONE
    vectorized pandas sort+groupby per bucket — ``groupby(...)
    .map_groups`` would invoke Python once per group (~700 groups/s,
    measured), which collapses at 10^4+ queries."""

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col] + sort_cols,
                          ascending=[True] + list(ascending), kind="mergesort")
        g = g.groupby(group_col, sort=False).head(k).copy()
        g[rank_col] = (g.groupby(group_col, sort=False).cumcount() + 1).astype(np.int64)
        return g

    return bucketed_group_apply(ds, group_col, per_bucket, num_buckets=num_buckets)


def distinct_rows(ds, keys: list[str] | str,
                  order_col: str | list[str] | None = None,
                  num_buckets: int | None = None):
    """Exact distinct-by-keys keeping the first row (lexicographic-min
    ``order_col``, a column or column list, if given) — the scalable
    dedup shape: identical keys co-locate via
    the bucket shuffle, the keep-first happens vectorized per bucket."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            g = g.sort_values(order_col, kind="mergesort")
        return g.drop_duplicates(keys, keep="first")

    return bucketed_group_apply(ds, keys, keep_first, num_buckets=num_buckets)


def bucketed_pair_attach(pairs, lookup, left_key: str, right_key: str,
                         id_col: str, value_col: str,
                         num_buckets: int | None = None):
    """Attach ``lookup[value_col]`` to BOTH sides of a pair Dataset —
    the task-based twin of two hash-shuffle ``Dataset.join``s.

    Returns (left_key, right_key, <value_col>_a, <value_col>_b).

    Why this exists alongside :func:`join_datasets`: each native join
    spawns a pool of long-lived aggregator actors whose startup is
    pure fixed cost (~2s/join on this host) — at small scale two
    bucketed TASK shuffles (union -> per-key attach -> per-pair
    combine) are ~3x cheaper, while at warehouse scale the actor
    joins amortize and stream better.  Both shapes are provided;
    callers pick by scale."""
    import pyarrow.compute as pc

    # value type from the (materialized) lookup schema so explode can
    # emit typed null placeholders — the union then has ONE Arrow
    # schema end to end (object/pandas blocks defeat Ray's schema
    # dedup and box every binary value into a Python object)
    sch = lookup.schema()
    val_type = dict(zip(sch.names, sch.types))[value_col]

    def explode(t: pa.Table) -> pa.Table:
        a = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(a)
        return pa.table({
            "_k": pa.array(np.concatenate([a, b])),
            "_a": pa.array(np.concatenate([a, a])),
            "_b": pa.array(np.concatenate([b, b])),
            "_side": pa.array(np.concatenate([np.zeros(n, np.int8),
                                              np.ones(n, np.int8)])),
            "_val": pa.nulls(2 * n, type=val_type),
        })

    def tag_lookup(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "_k": pc.cast(t[id_col], pa.int64()),
            "_a": pa.array(np.full(n, -1, np.int64)),
            "_b": pa.array(np.full(n, -1, np.int64)),
            "_side": pa.array(np.full(n, -1, np.int8)),
            "_val": pc.cast(t[value_col], val_type),
        })

    unioned = pairs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True).union(
        lookup.map_batches(tag_lookup, batch_format="pyarrow",
                           zero_copy_batch=True)
    )

    def attach(g: pa.Table) -> pa.Table:
        # vectorized per-bucket lookup: keep-first on duplicate lookup
        # ids (np.unique's return_index = first occurrence), then one
        # searchsorted per side row; misses become NULL values (the
        # join-semantics twin of the former pandas reindex)
        g = g.combine_chunks()
        side = g["_side"].to_numpy(zero_copy_only=False)
        k = g["_k"].to_numpy(zero_copy_only=False)
        lk_idx = np.nonzero(side == -1)[0]
        uk, first = np.unique(k[lk_idx], return_index=True)
        src = lk_idx[first]
        s_idx = np.nonzero(side >= 0)[0]
        if uk.size:
            pos = np.minimum(np.searchsorted(uk, k[s_idx]), uk.size - 1)
            found = uk[pos] == k[s_idx]
            take = pa.array(src[pos], type=pa.int64(),
                            mask=~found)  # mask=True -> null
            vals = pc.take(g["_val"].combine_chunks(), take)
        else:
            vals = pa.nulls(s_idx.size, type=val_type)
        sel = pa.array(s_idx)
        return pa.table({
            "_a": pc.take(g["_a"], sel),
            "_b": pc.take(g["_b"], sel),
            "_side": pc.take(g["_side"], sel),
            "_val": vals,
        })

    attached = bucketed_group_apply(unioned, "_k", attach,
                                    num_buckets=num_buckets,
                                    batch_format="pyarrow")

    def combine(g: pa.Table) -> pa.Table:
        # one row per (a, b): dedupe each side's (band-duplicated)
        # rows, then zip the two sides — both lexsorted by (a, b), so
        # they align positionally (explode emits both sides for every
        # pair; duplicate rows carry identical values)
        g = g.combine_chunks()
        a = g["_a"].to_numpy(zero_copy_only=False)
        b = g["_b"].to_numpy(zero_copy_only=False)
        side = g["_side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, b, a))
        a_s, b_s, sd_s = a[order], b[order], side[order]
        keep = np.empty(len(order), dtype=bool)
        keep[:1] = True
        keep[1:] = ((a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
                    | (sd_s[1:] != sd_s[:-1]))
        idx0 = order[keep & (sd_s == 0)]
        idx1 = order[keep & (sd_s == 1)]
        if idx0.size != idx1.size or not (
                np.array_equal(a[idx0], a[idx1])
                and np.array_equal(b[idx0], b[idx1])):
            raise AssertionError(
                "bucketed_pair_attach: side rows out of alignment "
                f"({idx0.size} left vs {idx1.size} right) — a pair is "
                "missing one exploded side")
        vals = g["_val"].combine_chunks()
        return pa.table({
            left_key: pa.array(a[idx0]),
            right_key: pa.array(b[idx0]),
            f"{value_col}_a": pc.take(vals, pa.array(idx0)),
            f"{value_col}_b": pc.take(vals, pa.array(idx1)),
        })

    return bucketed_group_apply(attached, ["_a", "_b"], combine,
                                num_buckets=num_buckets,
                                batch_format="pyarrow")
