"""Row-shape transforms: melt (wide->long), union-all, size estimates.

- ``melt``: the reference's melted record iteration
  (``/root/reference/src/ocgis/collection/field.py:636-750``,
  ``variable/iterator.py``) flattens a field to header-standardized
  rows; columnar analog is an unpivot over value columns.  DuckDB twin:
  ``UNPIVOT``/stacked ``UNION ALL`` selects.
- ``union_all``: ``MultiRequestDataset`` concatenation
  (``driver/request/multi_request.py``) == ``Dataset.union``.
- ``request_size``: the dry-run size estimate (``ops/core.py:218-289``)
  == schema + pruned byte/row counts off the lazy plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Wide -> long: one output row per (row, value column)."""

    if not value_cols:
        raise ValueError("melt needs at least one value column")

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out: dict[str, pa.Array] = {}
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), len(value_cols)))
        for c in id_cols:
            out[c] = t[c].take(idx)
        # the cast to plain string DOES materialize the repeats (the
        # downstream hash-compare needs a non-dictionary column); the
        # dictionary is just the cheapest way to build them in C
        codes = np.repeat(np.arange(len(value_cols), dtype=np.int32), n)
        out[var_name] = pa.DictionaryArray.from_arrays(
            pa.array(codes), pa.array(value_cols, pa.string())
        ).cast(pa.string())
        vals = [pa.chunked_array([t[c]]).cast(pa.float64()) for c in value_cols]
        out[value_name] = pa.concat_arrays(
            [v.combine_chunks() for v in vals]
        )
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def union_all(*datasets):
    """Concatenate Datasets (schema-aligned union-all)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def request_size(ds) -> dict:
    """Size accounting in ONE streaming pass: each block reduces to a
    (rows, bytes) pair inside ``map_batches`` and only the tiny
    partials cross to the driver.  ``materialize()`` would pin a full
    snapshot in the object store just to read two numbers (a memory
    cliff for a size probe at 100 TB); ``count()`` + ``size_bytes()``
    on the lazy Dataset would each be a full execution."""
    import pyarrow as pa

    columns = list(ds.schema().names)

    def size_partial(t: pa.Table) -> pa.Table:
        return pa.table({"rows": pa.array([t.num_rows], pa.int64()),
                         "bytes": pa.array([t.nbytes], pa.int64())})

    parts = ds.map_batches(size_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    return {
        "rows": int(parts["rows"].sum()),
        "bytes": int(parts["bytes"].sum()),
        "columns": columns,
    }


_HASH_MULT = np.uint64(2654435761)
_HASH_MOD = np.uint64(1 << 32)


def _key_hash(raw: np.ndarray, salt: int, op: str) -> np.ndarray:
    """The shared multiplicative key hash (guarded): integer keys
    only (float truncation diverges from DuckDB's rounding CAST),
    non-negative only (CAST AS UBIGINT raises where numpy wraps) —
    any divergence here breaks the documented bit-exact SQL parity,
    so fail loudly instead."""
    if not (np.issubdtype(raw.dtype, np.integer)
            or np.issubdtype(raw.dtype, np.bool_)):
        raise ValueError(f"{op} requires an integer key column "
                         f"(got {raw.dtype}: float CASTs round in SQL "
                         "but truncate in numpy)")
    if np.issubdtype(raw.dtype, np.signedinteger) and raw.size \
            and raw.min() < 0:
        raise ValueError(f"{op} requires non-negative keys "
                         "(the SQL twin cannot wrap)")
    with np.errstate(over="ignore"):
        return (raw.astype(np.uint64) * _HASH_MULT + np.uint64(salt)) % _HASH_MOD


def sample_by_key(ds, key_col: str, rate: float, salt: int = 0):
    """Deterministic hash sampling: keep a row iff
    ``(key * 2654435761 + salt) % 2^32 < rate * 2^32`` — stable under
    resume/retry (pure function of the key), cheap (no shuffle), and
    SQL-mirrorable (the multiplicative hash is exact integer math).
    The training-data-pipeline sampling operator (the reference has
    none — its data is grid-complete by construction, SURVEY §2.6)."""
    threshold = np.uint64(int(rate * (1 << 32)))

    def f(t: pa.Table) -> pa.Table:
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), salt,
                      "sample_by_key")
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_key_sql_pred(key_expr: str, rate: float, salt: int = 0) -> str:
    """DuckDB predicate twin of :func:`sample_by_key` (exact integer
    math, bit-identical decisions).  The key reduces mod 2^32 BEFORE
    the multiply — (k*M) mod 2^32 depends only on k mod 2^32, and
    DuckDB (unlike numpy) raises on uint64 overflow."""
    threshold = int(rate * (1 << 32))
    return (f"(((CAST({key_expr} AS UBIGINT) % 4294967296) * 2654435761"
            f" + {salt}) % 4294967296) < {threshold}")


def sample_by_weight(ds, key_col: str, weight_col: str, salt: int = 0,
                     scale: float = 1.0):
    """Deterministic PER-ROW-rate sampling: keep a row iff
    ``hash(key, salt) < clip(weight * scale, 0, 1) * 2^32`` — the same
    multiplicative hash as :func:`sample_by_key`, thresholded by a
    weight COLUMN instead of a constant.  Feed it
    :func:`ocgis_ray.stages.dedup.soft_dedup_weights` output to turn
    SoftDeDup weights into an actual sampled corpus (each duplicate
    cluster contributes ~``scale`` expected survivors at ``alpha=1``),
    or any per-row quality/importance score.  Stable under
    resume/retry, no shuffle; NULL/NaN weights drop the row.

    SQL twin: :func:`sample_by_weight_sql_pred` (same double->floor
    integer threshold, bit-identical decisions)."""

    def f(t: pa.Table) -> pa.Table:
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), salt,
                      "sample_by_weight")
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.nan_to_num(w * float(scale), nan=0.0)
        thr = np.floor(np.clip(w, 0.0, 1.0) * float(1 << 32)).astype(np.uint64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_weight_sql_pred(key_expr: str, weight_expr: str,
                              salt: int = 0, scale: float = 1.0) -> str:
    """DuckDB predicate twin of :func:`sample_by_weight` (exact same
    double multiply/clip/floor, then integer compare).  NaN weights
    map to 0 (row dropped) on BOTH sides — DuckDB NaN is not NULL, so
    a bare coalesce would keep NaN rows the engine drops."""
    h = (f"(((CAST({key_expr} AS UBIGINT) % 4294967296) * 2654435761"
         f" + {salt}) % 4294967296)")
    w0 = f"coalesce(CAST({weight_expr} AS DOUBLE) * {scale!r}, 0.0)"
    w = f"(CASE WHEN isnan({w0}) THEN 0.0 ELSE {w0} END)"
    thr = f"CAST(floor(least(greatest({w}, 0.0), 1.0) * 4294967296.0) AS UBIGINT)"
    return f"{h} < {thr}"


def stratified_sample(ds, key_col: str, group_col: str,
                      rates: dict, default_rate: float = 0.0,
                      salt: int = 0):
    """Per-group deterministic sampling — the data-MIXING operator a
    training corpus needs (e.g. keep 100% of books, 10% of web, 1% of
    logs).  Same multiplicative hash as :func:`sample_by_key`, with
    the threshold looked up per row from ``rates[group]``; stable
    under resume, no shuffle, SQL-mirrorable
    (:func:`stratified_sample_sql_pred`)."""
    import numpy as np
    import pyarrow as pa

    thresholds = {g: np.uint64(int(r * (1 << 32))) for g, r in rates.items()}
    default_t = np.uint64(int(default_rate * (1 << 32)))

    def f(t: pa.Table) -> pa.Table:
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), salt,
                      "stratified_sample")
        groups = t[group_col].to_pandas()
        thr = groups.map(thresholds).fillna(default_t).to_numpy(np.uint64)
        return t.filter(pa.array(h < thr))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample_sql_pred(key_expr: str, group_expr: str,
                               rates: dict, default_rate: float = 0.0,
                               salt: int = 0) -> str:
    """DuckDB predicate twin of :func:`stratified_sample` (group
    names quote-escaped; an empty rates dict degrades to the plain
    default-rate threshold — CASE with zero WHEN arms is a parse
    error)."""
    h = (f"(((CAST({key_expr} AS UBIGINT) % 4294967296) * 2654435761"
         f" + {salt}) % 4294967296)")
    default_thr = int(default_rate * (1 << 32))
    if not rates:
        return f"{h} < {default_thr}"

    def lit(g) -> str:
        # numeric group keys must be numeric SQL literals: quoting
        # them would make DuckDB compare an int column against
        # VARCHAR (error or mismatch) while the engine's dict lookup
        # matches the numeric key
        if isinstance(g, (bool, np.bool_)):
            return "TRUE" if g else "FALSE"
        if isinstance(g, (int, np.integer)):
            return str(int(g))
        if isinstance(g, (float, np.floating)):
            return repr(float(g))
        return "'" + str(g).replace("'", "''") + "'"

    cases = " ".join(
        f"WHEN {lit(g)} THEN {int(r * (1 << 32))}" for g, r in rates.items())
    return f"{h} < (CASE {group_expr} {cases} ELSE {default_thr} END)"


def cap_per_group(ds, group_col: str, k: int, id_col: str,
                  order_col: str | None = None, salt: int = 0,
                  decide_on_slim: bool = False,
                  num_buckets: int | None = None):
    """Keep at most ``k`` rows per group — the RefinedWeb-style
    per-domain/per-source cap.  Survivors are the ``k`` rows with the
    smallest ``(order, id)`` where ``order`` is ``order_col`` if given
    (e.g. a quality rank: keep the best k) or else the deterministic
    multiplicative hash of ``id_col`` (a stable "random" k, identical
    across runs/retries/partitionings).  SQL twin:
    :func:`cap_per_group_sql` (row_number() over the same ordering).

    Scale shape: ``decide_on_slim=False`` ships full rows through one
    hash-bucket shuffle (``topk_by_group``) — right when rows are
    slim or the output feeds another shuffle anyway.
    ``decide_on_slim=True`` runs the cap on a (group, id[, order])
    projection and semi-joins survivors back, so fat text crosses the
    wire once and only for survivors — right at web-corpus row sizes
    (~10-100 KB) with small caps."""
    from ocgis_ray.sources.io import join_datasets, topk_by_group

    def add_h(t: pa.Table) -> pa.Table:
        h = _key_hash(t[id_col].to_numpy(zero_copy_only=False), salt,
                      "cap_per_group")
        return t.append_column("_cap_h", pa.array(h.astype(np.int64)))

    order_cols = [order_col or "_cap_h", id_col]
    if decide_on_slim:
        slim = ds.select_columns(
            [group_col, id_col] + ([order_col] if order_col else []))
        if order_col is None:
            slim = slim.map_batches(add_h, batch_format="pyarrow",
                                    zero_copy_batch=True)
        keep = topk_by_group(slim, group_col, order_cols, [True, True],
                             k, num_buckets=num_buckets)
        return join_datasets(ds, keep.select_columns([id_col]),
                             on=(id_col,), join_type="left_semi")
    work = ds if order_col is not None else ds.map_batches(
        add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = topk_by_group(work, group_col, order_cols, [True, True], k,
                        num_buckets=num_buckets)
    return out if order_col is not None else out.drop_columns(["_cap_h"])


def cap_per_group_sql(table: str, group_col: str, k: int, id_col: str,
                      order_expr: str | None = None, salt: int = 0,
                      extra_cols: str = "") -> str:
    """DuckDB twin of :func:`cap_per_group`: the surviving
    (group, id) rows via ``row_number()`` over the identical
    ``(order, id)`` ordering — the default order replays the engine's
    multiplicative hash bit-exact (uint32 range, so the engine's
    int64 view orders the same way)."""
    oe = order_expr or (
        f"(((CAST({id_col} AS UBIGINT) % 4294967296) * 2654435761"
        f" + {salt}) % 4294967296)")
    return (f"SELECT {group_col}, {id_col}{extra_cols} FROM "
            f"(SELECT *, row_number() OVER (PARTITION BY {group_col} "
            f"ORDER BY {oe}, {id_col}) AS _cap_rn FROM {table}) "
            f"WHERE _cap_rn <= {k}")


def pack_sequences(ds, id_col: str, size_col: str, budget: int,
                   num_buckets: int | None = None):
    """Greedy sequence packing: group documents into packs whose
    ``size_col`` totals stay <= ``budget`` (the fixed-token-window
    batching step before LLM training).  Documents hash into buckets
    (deterministic, resume-stable), are sorted by id within the
    bucket, and packed sequentially — any grouping under the budget is
    a valid packing, so bucketing loses nothing while keeping the
    operator embarrassingly parallel.  A document LARGER than the
    budget gets a pack of its own (callers chunk upstream if needed).

    Adds ``pack_bucket`` and ``pack_seq`` columns; a pack is the
    composite key (pack_bucket, pack_seq)."""
    import pandas as pd

    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.tuning import auto_buckets

    nb = auto_buckets(num_buckets)

    def with_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[[id_col]].reset_index(drop=True), index=False).to_numpy(np.uint64)
        df = df.copy()
        df["pack_bucket"] = (h % np.uint64(nb)).astype(np.int64)
        return df

    def pack_one(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        sizes = g[size_col].to_numpy(np.int64)
        cs = np.cumsum(sizes)
        n = len(sizes)
        seq = np.empty(n, dtype=np.int64)
        i, base, p = 0, 0, 0
        while i < n:
            # O(packs * log n): furthest j whose cumsum stays in budget
            j = int(np.searchsorted(cs, base + budget, side="right"))
            j = max(j, i + 1)  # oversized doc -> its own pack
            seq[i:j] = p
            base = int(cs[j - 1])
            i, p = j, p + 1
        g["pack_seq"] = seq
        return g

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        # a shuffle bucket may hold several pack_bucket values — the
        # greedy run must reset per pack_bucket for (pack_bucket,
        # pack_seq) to stay deterministic under ANY num_buckets.
        # explicit iteration (not groupby.apply on the grouping
        # column, which pandas 3 excludes from the group frames)
        parts = []
        for b, grp in g.groupby("pack_bucket", sort=True):
            packed = pack_one(grp.drop(columns=["pack_bucket"]))
            packed["pack_bucket"] = b
            parts.append(packed)
        return pd.concat(parts, ignore_index=True)

    # the pack_bucket id doubles as the pack namespace, making
    # (pack_bucket, pack_seq) globally unique without coordination
    return bucketed_group_apply(
        ds.map_batches(with_bucket, batch_format="pandas"),
        ["pack_bucket"], pack, num_buckets=nb)


def deterministic_shuffle(ds, key_col: str, salt: int = 0,
                          mix: bool = True,
                          tiebreak_cols: list[str] | None = None):
    """Seed-stable global shuffle: order rows by ``splitmix64(key ^
    salt)`` — the shuffle a TRAINING pipeline wants instead of
    ``random_shuffle()``:

    - **resume-stable**: the order is a pure function of (key, salt),
      so a restarted epoch or a re-run shard reads the same sequence;
    - **seedable**: a new ``salt`` is a fresh permutation per epoch;
    - **streaming**: ``Dataset.sort`` range-partitions by the hash —
      no driver-side permutation array, no full in-memory
      materialization (``random_shuffle`` is documented as the
      slow/materializing path in Ray).

    ``mix=True`` uses the full 64-bit splitmix (uniform for
    adversarial keys); ``mix=False`` uses the 32-bit multiplicative
    hash shared with ``sample_by_key`` — engine math is
    ``(uint64(key) * 2654435761 + salt) mod 2^32`` and the exact SQL
    twin is ``sample_by_key``'s fragment, ``ORDER BY ((CAST(key AS
    UBIGINT) % 4294967296) * 2654435761 + salt) % 4294967296, key``
    (the pre-mod on the key is a no-op mod 2^32, making the UBIGINT
    product overflow-safe).  Ties (hash collisions) break on the key
    itself, so the order is total and engine-independent."""
    import pyarrow as pa

    def add_key(t: pa.Table) -> pa.Table:
        raw = t[key_col].to_numpy(zero_copy_only=False)
        if mix:
            from ocgis_ray.stages.text import _mix64

            h = _mix64(raw.astype(np.uint64) ^ np.uint64(salt))
            h = (h >> np.uint64(1)).astype(np.int64)  # int64-safe
        else:
            h = _key_hash(raw, salt, "deterministic_shuffle").astype(np.int64)
        return t.append_column("_shuffle_key", pa.array(h))

    keyed = ds.map_batches(add_key, batch_format="pyarrow",
                           zero_copy_batch=True)
    # ``tiebreak_cols``: when key_col is not unique per row (e.g. a
    # pack key shared by every doc in a pack), equal sort keys have NO
    # defined order under Ray's sort — pass the unique id to keep the
    # order a pure function of the data
    out = keyed.sort(["_shuffle_key", key_col] + list(tiebreak_cols or []))
    return out.drop_columns(["_shuffle_key"])


def assign_split(ds, group_col: str, rates: dict[str, float],
                 salt: int = 0, out: str = "split"):
    """Deterministic GROUP-AWARE train/val/test split: every row whose
    ``group_col`` value matches gets the same label, so near-duplicates
    clustered by domain/source can never leak across the split — the
    standard web-corpus leakage guard (split by url host, not by row).

    ``rates`` maps label -> fraction (must sum to 1; dict order fixes
    the cumulative bucket order).  Label = first cumulative threshold
    exceeding ``(string_value_hash(group) + salt) mod 2^32`` — pure
    function of the group value, so it is shuffle-free, resume-stable,
    and identical on any engine (``assign_split_sql_expr`` twin)."""
    import pyarrow as pa

    fr = np.array(list(rates.values()), dtype=np.float64)
    if fr.min() < 0 or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"rates must be >=0 and sum to 1, got {rates}")
    labels = np.array(list(rates), dtype=object)
    # cumulative integer thresholds on 2^32; the last label absorbs
    # the rounding remainder (searchsorted right of the last bound)
    bounds = np.floor(np.cumsum(fr)[:-1] * (1 << 32)).astype(np.uint64)

    def f(t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.text import string_value_hash

        arr = t[group_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        u = (string_value_hash(arr) + np.uint64(salt)) % np.uint64(1 << 32)
        idx = np.searchsorted(bounds, u, side="right")
        return t.append_column(out, pa.array(labels[idx], pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def assign_split_sql_expr(group_expr: str, rates: dict[str, float],
                          salt: int = 0) -> str:
    """DuckDB CASE twin of :func:`assign_split` (same full-content
    string hash via ``parity.sql_string_hash``, same cumulative
    integer thresholds)."""
    from ocgis_ray.parity import sql_string_hash

    fr = np.array(list(rates.values()), dtype=np.float64)
    if fr.min() < 0 or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"rates must be >=0 and sum to 1, got {rates}")
    labels = list(rates)
    bounds = np.floor(np.cumsum(fr)[:-1] * (1 << 32)).astype(np.uint64)
    h = f"(({sql_string_hash(group_expr)} + {salt}) % 4294967296)"
    arms = " ".join(
        f"WHEN {h} < {int(b)} THEN '{str(lab).replace(chr(39), chr(39) * 2)}'"
        for lab, b in zip(labels[:-1], bounds))
    last = str(labels[-1]).replace("'", "''")
    if not arms:  # single label
        return f"'{last}'"
    return f"(CASE {arms} ELSE '{last}' END)"


def stratified_sample_flag(ds, key_col: str, group_col: str, rates: dict,
                           default_rate: float = 0.0, salt: int = 0,
                           out: str = "mix_keep"):
    """The sampling DECISION as a 0/1 column instead of a filter —
    lets the choice ride an oracle-checked query and lets callers
    split keep/drop streams from one pass."""
    thresholds = {g: np.uint64(int(r * (1 << 32))) for g, r in rates.items()}
    default_t = np.uint64(int(default_rate * (1 << 32)))

    def f(t: pa.Table) -> pa.Table:
        h = _key_hash(t[key_col].to_numpy(zero_copy_only=False), salt,
                      "stratified_sample_flag")
        thr = t[group_col].to_pandas().map(thresholds) \
            .fillna(default_t).to_numpy(np.uint64)
        return t.append_column(out, pa.array((h < thr).astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_exact_k(ds, key_col: str, k: int, salt: int = 0):
    """Deterministic EXACT-k uniform sample: the k rows with the
    smallest ``splitmix64(key ^ salt)`` (bottom-k sampling — the
    order-statistics trick behind KMV sketches).  Properties a
    training/eval pipeline wants that ``rate``-based sampling lacks:

    - exactly ``k`` rows, whatever the input size;
    - resume-stable and seedable (pure function of key + salt; a new
      ``salt`` is a fresh draw);
    - NO shuffle: each batch keeps its local bottom-k (<= k rows per
      batch leave the worker), one tiny final merge.

    Keys must be unique for exactness (duplicate keys ride together).
    Integer keys hash directly; string keys hash by full content
    (:func:`ocgis_ray.stages.text.string_value_hash`); float keys are
    rejected — truncation would silently collide distinct keys.
    Returns the sampled Dataset (row order = hash order)."""
    import pyarrow as pa

    from ocgis_ray.stages.text import _mix64, string_value_hash

    if k < 1:
        raise ValueError("k must be >= 1")

    def key_hash(arr: pa.ChunkedArray) -> np.ndarray:
        typ = arr.type
        if pa.types.is_integer(typ):
            return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return string_value_hash(arr)
        raise TypeError(
            f"sample_exact_k key column {key_col!r} has type {typ}; "
            "only integer or string keys are supported (float keys "
            "would truncate and collide)")

    def local(t: pa.Table) -> pa.Table:
        raw = key_hash(t[key_col])
        h = _mix64(raw ^ np.uint64(salt)).astype(np.int64)
        t = t.append_column("_sk", pa.array(h))
        if t.num_rows <= k:
            return t
        idx = np.argpartition(h, k)[:k]
        return t.take(pa.array(np.sort(idx), pa.int64()))

    partials = ds.map_batches(local, batch_format="pyarrow",
                              zero_copy_batch=True)
    # final merge: global bottom-k over <= k-per-block partials
    out = partials.sort("_sk").limit(k)
    return out.drop_columns(["_sk"])


def plan_mixture(available: dict, weights: dict, budget: float) -> dict:
    """Water-filling mixture planner: per-group keep RATES that hit a
    token ``budget`` at target proportions ``weights`` (the static
    data-mixing step of a DoReMi/Pile-style recipe; feed the rates to
    :func:`stratified_sample`).

    ``available[g]`` = tokens on hand per group (from a rollup, e.g.
    ``token_rollup_by_lang``); ``weights[g]`` = desired mixture
    fractions (normalized internally).  A group that cannot supply its
    target share saturates at rate 1.0 and its unmet share
    redistributes among the unsaturated groups in proportion to their
    weights (exact water-filling, iterated to fixpoint ≤ #groups
    rounds).  If the budget exceeds the total supply every rate is
    1.0 (and the mixture is whatever the data has — logged via the
    returned ``_unmet`` entry when nonzero)."""
    groups = [g for g in weights if available.get(g, 0) > 0]
    wsum = float(sum(weights[g] for g in groups))
    if not groups or wsum <= 0:
        return {"_unmet": float(budget)}
    w = {g: weights[g] / wsum for g in groups}
    target = {g: w[g] * float(budget) for g in groups}
    rates = {g: 0.0 for g in groups}
    active = set(groups)
    remaining = float(budget)
    while active and remaining > 1e-9:
        aw = sum(w[g] for g in active)
        sat = set()
        for g in active:
            want = remaining * w[g] / aw
            if available[g] <= want + 1e-9:
                rates[g] = 1.0
                sat.add(g)
        if not sat:
            for g in active:
                want = remaining * w[g] / aw
                rates[g] = min(1.0, rates[g] + want / available[g])
            remaining = 0.0
            break
        remaining -= sum(available[g] for g in sat)
        active -= sat
    got = sum(rates[g] * available[g] for g in groups)
    out = dict(rates)
    unmet = float(budget) - got
    if unmet > max(1.0, 1e-6 * budget):
        out["_unmet"] = unmet
    return out
