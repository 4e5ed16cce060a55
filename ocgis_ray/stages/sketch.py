"""Bounded-memory streaming summaries: hopping windows, heavy hitters,
approximate distinct.

The reference has no sketch library (its scale ceiling was one MPI
node); these are the operators a 10^12-row pages/events table needs
where an exact groupby would shuffle the full key set.  All three are
mergeable partial summaries — each batch emits a SMALL fixed-size
partial, the combine is associative, and nothing driver-side ever sees
raw rows:

- :func:`hopping_window_rollup` — overlapping time windows via a
  vectorized per-batch expansion (each row lands in ``size/hop``
  windows) feeding the standard partial+final grouped aggregate.
- :func:`heavy_hitters` — Misra-Gries: per-batch exact counts
  truncated to ``capacity`` entries MG-style, summed by key (bounded
  cardinality: <= capacity live keys per partial), final MG trim.
  Guarantee: every value with frequency > N/capacity survives, and
  estimates undercount by at most N/capacity (tested against exact).
- :func:`approx_distinct` — HyperLogLog with 2^p registers: per-batch
  sparse (register, rank) rows, distributed elementwise-max merge
  through the partial+final grouped aggregate (driver sees <= 2^p
  rows), standard bias-corrected estimate (+-~1.04/sqrt(2^p)).
- :func:`build_bloom` / :func:`bloom_filter_rows` — broadcast Bloom
  membership (no-shuffle semi/anti join against a big key set: no
  false negatives, ~1% FPR at 10 bits/element).
- :func:`quantile_reservoir` — rank-stratified per-batch samples ->
  merged weighted quantiles (the bounded-memory path; exact quantiles
  stay in ``calc.quantile_rollup``).
- :func:`quantile_sketch_rollup` — per-GROUP mergeable t-digest-style
  quantiles: the documented scale path for per-tile percentiles where
  the exact bucketed sort (``calc.quantile_rollup``) cannot be helped
  by salting (COVERAGE.md "Skew handling").  A hot tile's million
  values become <= ``max_centroids`` (mean, weight) centroid rows per
  batch before the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


# ---------------------------------------------------------- hopping windows

def hopping_window_rollup(ds, ts_col: str, size_s: int, hop_s: int,
                          keys: list[str] | None = None,
                          value_col: str | None = None):
    """Overlapping (hopping) time-window aggregate: window ``w`` covers
    ``[w, w + size_s)`` and windows start every ``hop_s`` seconds
    (``size_s`` must be a multiple of ``hop_s``; ``size == hop`` is a
    tumbling window, already covered by the temporal rollups).

    Each row is expanded to its ``size_s // hop_s`` member windows
    with one vectorized repeat (the expansion factor is the only
    amplification — partial aggregation collapses it before the
    shuffle).  Returns per-(keys..., window_start) ``n`` and
    ``sum_v``/``value_col`` sums with ``window_start`` as epoch
    seconds."""
    if size_s % hop_s != 0:
        raise ValueError("size_s must be a multiple of hop_s")
    fanout = size_s // hop_s
    keys = list(keys or [])

    def expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t[ts_col].null_count:
            # exclude null timestamps (a NaT would otherwise cast to
            # INT64_MIN and land in garbage windows)
            t = t.filter(pc.is_valid(t[ts_col]))
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        # last window start covering the row, then step back
        w0 = (epoch // hop_s) * hop_s
        # every generated window covers the row by construction:
        # the smallest start is w0 - (fanout-1)*hop and
        # start + size = w0 + hop > epoch — no filter needed
        starts = (w0[:, None] - hop_s * np.arange(fanout)[None, :]).ravel()
        idx = np.repeat(np.arange(len(epoch)), fanout)
        cols = {"window_start": starts}
        for k in keys:
            cols[k] = t[k].to_numpy(zero_copy_only=False)[idx]
        if value_col is not None:
            cols["_v"] = t[value_col].to_numpy(zero_copy_only=False)[idx]
        return pa.table(cols)

    from ocgis_ray.stages.tiles import grouped_aggregate

    expanded = ds.map_batches(expand, batch_format="pyarrow",
                              zero_copy_batch=True)
    spec = {"n": (None, "count")}
    if value_col is not None:
        spec["sum_v"] = ("_v", "sum")
    return grouped_aggregate(expanded, keys + ["window_start"], spec)


# ------------------------------------------------------------ heavy hitters

def _mg_trim(values: np.ndarray, counts: np.ndarray,
             capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries truncation: keep the top ``capacity`` entries after
    subtracting the (capacity+1)-th count (the classic decrement step,
    vectorized)."""
    if len(values) <= capacity:
        return values, counts
    order = np.argsort(-counts, kind="stable")
    dec = counts[order[capacity]]
    keep = order[:capacity]
    kept = counts[keep] - dec
    pos = kept > 0
    return values[keep][pos], kept[pos]


def heavy_hitters(ds, col: str, k: int, capacity: int | None = None,
                  batch_size: int = 65536):
    """Approximate top-k frequent values (Misra-Gries, mergeable).

    ``capacity`` (default ``8 * k``) bounds every partial summary; the
    error of any estimate is at most N/capacity (undercount only), so
    any value with true frequency > N/capacity is guaranteed present.
    Dataflow: per-batch exact counts -> MG trim -> bucketed sum by
    value (cardinality <= capacity x batches, tiny rows) -> final MG
    trim + top-k on the driver-side small result."""
    capacity = 8 * k if capacity is None else capacity

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vc = pc.value_counts(t[col])
        v, c = _mg_trim(vc.field("values").to_numpy(zero_copy_only=False),
                        vc.field("counts").to_numpy(zero_copy_only=False),
                        capacity)
        return pa.table({"value": pa.array(v),
                         "est": pa.array(c.astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)

    from ocgis_ray.stages.tiles import grouped_aggregate

    summed = grouped_aggregate(partials, ["value"],
                               {"est": ("est", "sum")})

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        v, c = _mg_trim(df["value"].to_numpy(),
                        df["est"].to_numpy(np.int64), capacity)
        out = pd.DataFrame({"value": v, "est": c})
        out = out.sort_values(["est", "value"],
                              ascending=[False, True]).head(k)
        return out.reset_index(drop=True)

    return summed.repartition(1).map_batches(finalize,
                                             batch_format="pandas")


# ------------------------------------------------------- approx distinct

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_row_ranks(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-hash (register index, rank) pairs."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rank = leading zeros of the remaining 64-p bits + 1; the OR above
    # plants a stop bit so rank is capped at 64-p+1 without branches
    fl = np.full(len(hashes), 64, dtype=np.int64)
    nz = rest != 0
    # bit_length via float log2 is unsafe >= 2^53; use a 4-step binary
    # count of leading zeros instead
    x = rest.copy()
    lz = np.zeros(len(hashes), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = x < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        x[mask] = x[mask] << np.uint64(shift)
    fl[nz] = lz[nz]
    return idx, fl + 1


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Register maxima for one batch of 64-bit hashes."""
    m = 1 << p
    idx, rank = _hll_row_ranks(hashes, p)
    regs = np.zeros(m, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def _hash64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """64-bit hashes of the NON-NULL values, in a dtype-stable domain.

    Nulls are EXCLUDED (SQL count(distinct)/membership semantics) and
    must be dropped BEFORE the numpy conversion: a null in an int64
    batch otherwise flips the whole batch to float64, and
    hash_array(5.0) != hash_array(5) — one null row would silently
    change every value's hash domain for that batch (a measured
    986/1000 false-negative Bloom failure)."""
    import pandas.util as pu

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.drop_null()
    return pu.hash_array(
        arr.to_numpy(zero_copy_only=False)).astype(np.uint64)


def _valid_mask(arr) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.is_valid(arr).to_numpy(zero_copy_only=False)


def approx_distinct(ds, col: str, p: int = 12,
                    batch_size: int = 65536) -> int:
    """HyperLogLog distinct count: per-batch sparse (register, rank)
    rows, distributed max-merge (grouped aggregate — the driver sees
    <= 2^p rows regardless of input size), bias-corrected estimate.
    Standard error ~1.04/sqrt(2^p) (~1.6% at p=12); small-range
    correction uses linear counting.  Returns an int."""
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        # one (reg, rank) ROW PAIR set per batch; zero registers are
        # omitted so sparse batches stay sparse
        if t.num_rows == 0:
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        regs = _hll_registers(_hash64(t[col]), p)
        nz = np.flatnonzero(regs)
        return pa.table({"reg": pa.array(nz),
                         "rank": pa.array(regs[nz])})

    from ocgis_ray.stages.tiles import grouped_aggregate

    # distributed elementwise-max merge: per-block partial maxima
    # combine inside grouped_aggregate, so the driver only ever sees
    # <= 2^p final rows — batches scale to 10^12 rows without the
    # driver accumulating one register vector per batch
    merged = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=batch_size),
        ["reg"], {"rank": ("rank", "max")}).take_all()
    s_nz = sum(np.power(2.0, -float(r["rank"])) for r in merged)
    est = _hll_estimate(np.array([s_nz]), np.array([len(merged)]), m)
    return int(est[0])


def _hll_estimate(s_nz: np.ndarray, nnz: np.ndarray, m: int) -> np.ndarray:
    """Bias-corrected HLL estimates, vectorized across groups.
    ``s_nz`` = per-group sum of 2^-rank over NONZERO registers,
    ``nnz`` = per-group count of nonzero registers."""
    zeros = m - nnz
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / (s_nz + zeros)  # zero registers add 2^0 each
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(np.maximum(m / np.maximum(zeros, 1), 1.0))
    est = np.where(small, lin, est)
    return np.round(est).astype(np.int64)


def approx_distinct_by(ds, keys: list[str] | str, col: str, p: int = 12,
                       out_col: str = "approx_distinct",
                       batch_size: int = 65536,
                       num_buckets: int | None = None):
    """Per-group HyperLogLog distinct count — ``SELECT keys,
    approx_count_distinct(col) GROUP BY keys`` at any group
    cardinality (unique users per host, distinct hosts per tile...).

    Dataflow: one slim (keys, register, rank) row per input row; the
    register max-merge runs through :func:`tiles.grouped_aggregate`,
    so each batch collapses to <= groups-in-batch x 2^p partial rows
    BEFORE the shuffle and hot groups cannot skew it (a group's
    million rows become at most 2^p partials per batch); the final
    estimate is one vectorized pass per key-hash bucket.  Returns a
    Dataset ``keys + [out_col]``.

    Standard error ~1.04/sqrt(2^p) per group (~1.6% at p=12).  With
    many groups the shuffle carries up to 2^p rows per group — drop
    ``p`` to 10 (~3% error, 1/4 the rows) when groups are millions.
    Null ``col`` values do not count; groups whose values are ALL
    null produce no output row.  Deterministic: estimates are a pure
    function of the value set, independent of partitioning."""
    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.stages.tiles import grouped_aggregate

    keys = [keys] if isinstance(keys, str) else list(keys)
    m = 1 << p

    def rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows and t[col].null_count:
            t = t.filter(pc.is_valid(t[col]))
        if t.num_rows == 0:
            return pa.table({**{k: t[k] for k in keys},
                             "reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        idx, rank = _hll_row_ranks(_hash64(t[col]), p)
        return pa.table({**{k: t[k] for k in keys},
                         "reg": pa.array(idx), "rank": pa.array(rank)})

    merged = grouped_aggregate(
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=batch_size),
        keys + ["reg"], {"rank": ("rank", "max")}, batch_size=batch_size,
        num_buckets=num_buckets)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_pw"] = np.power(2.0, -g["rank"].to_numpy(np.float64))
        gg = g.groupby(keys, sort=False)
        s_nz = gg["_pw"].sum()
        nnz = gg.size()
        out = s_nz.index.to_frame(index=False)
        out[out_col] = _hll_estimate(s_nz.to_numpy(np.float64),
                                     nnz.to_numpy(np.int64), m)
        return out

    return bucketed_group_apply(merged, keys, estimate,
                                num_buckets=num_buckets)


# ----------------------------------------------------------- bloom filter

class BloomFilter:
    """Plain vectorized Bloom filter over 64-bit hashes: ``nbits``
    bits, ``k`` probes derived by double hashing (h1 + i*h2 — Kirsch &
    Mitzenmacher, the standard trick).  Mergeable by OR.  No false
    negatives; false-positive rate ~ (1 - e^{-kn/m})^k."""

    def __init__(self, nbits: int, k: int = 4):
        self.nbits = int(nbits)
        self.k = int(k)
        self.bits = np.zeros((self.nbits + 63) // 64, dtype=np.uint64)

    def _probes(self, h: np.ndarray) -> np.ndarray:
        h1 = h % np.uint64(self.nbits)
        h2 = (h >> np.uint64(33)) | np.uint64(1)  # odd -> full-period
        idx = np.empty((self.k, len(h)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.nbits)
        return idx

    def add_hashes(self, h: np.ndarray) -> None:
        idx = self._probes(h).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._probes(h)
        hit = np.ones(len(h), dtype=bool)
        for i in range(self.k):
            word = self.bits[(idx[i] >> np.uint64(6)).astype(np.int64)]
            hit &= (word >> (idx[i] & np.uint64(63))) & np.uint64(1) != 0
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert other.nbits == self.nbits and other.k == self.k
        self.bits |= other.bits
        return self


def build_bloom(ds, col: str, nbits: int | None = None, k: int = 4,
                expected_n: int | None = None,
                batch_size: int = 65536) -> BloomFilter:
    """Build a Bloom filter over ``col`` distributedly: each batch
    emits its SPARSE set-bit indices (<= k * batch_size int64 rows —
    bounded per batch whatever ``nbits`` is; a dense per-batch bit
    array would scale O(n^2) in total partial bytes), deduplicated by
    a distributed distinct so the driver materializes at most the
    number of DISTINCT set bits.  Size defaults to ~10 bits/expected
    element (~1% FPR at k=4).  Nulls are not members.  NOTE: when
    neither ``nbits`` nor ``expected_n`` is given, sizing runs
    ``ds.count()`` — one extra (metadata-cheap for parquet reads, but
    full for computed pipelines) pass; pass ``expected_n`` to skip
    it."""
    if nbits is None:
        n = expected_n if expected_n is not None else ds.count()
        nbits = max(1024, 10 * int(n))

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(nbits, k)
        if t.num_rows:
            h = _hash64(t[col])
            bits = np.unique(bf._probes(h).ravel()) if len(h) else \
                np.empty(0, np.uint64)
        else:
            bits = np.empty(0, np.uint64)
        return pa.table({"bit": pa.array(bits.astype(np.int64))})

    from ocgis_ray.sources.io import distinct_rows

    sparse = distinct_rows(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=batch_size),
        ["bit"])
    out = BloomFilter(nbits, k)
    for row in sparse.take_all():
        b = np.uint64(row["bit"])
        out.bits[int(b >> np.uint64(6))] |= np.uint64(1) << (b & np.uint64(63))
    return out


def bloom_filter_rows(ds, col: str, bloom: BloomFilter,
                      keep_hits: bool = True):
    """Semi/anti membership at scale WITHOUT a shuffle join: broadcast
    the filter once (``ray.put``), test every batch vectorized.
    ``keep_hits=False`` is the anti-join shape — guaranteed to keep
    every true non-member (no false negatives), dropping at most the
    FPR fraction of them."""
    import ray

    bref = ray.put({"bits": bloom.bits, "nbits": bloom.nbits,
                    "k": bloom.k})

    def f(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        bf = BloomFilter(b["nbits"], b["k"])
        bf.bits = b["bits"]
        hit = np.zeros(t.num_rows, dtype=bool)
        if t.num_rows:
            valid = _valid_mask(t[col])
            if valid.any():
                # _hash64 drops nulls, so its output aligns with the
                # valid rows in order; null rows are never members
                hit[valid] = bf.contains_hashes(_hash64(t[col]))
        return t.filter(pa.array(hit if keep_hits else ~hit))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------- quantile reservoir

def quantile_reservoir(ds, col: str, qs: list[float],
                       reservoir_per_batch: int = 256,
                       batch_size: int = 65536) -> dict[float, float]:
    """Approximate quantiles from a deterministic per-batch reservoir:
    each batch contributes an evenly-spaced sample of its SORTED
    values (rank-stratified — unlike uniform sampling this bounds the
    within-batch rank error at 1/(2*reservoir) immediately), the
    driver merges <= n_batches * reservoir values.  Exact quantiles
    (``calc.quantile_rollup``) stay the oracle path; this is the
    bounded-memory path for columns where even the per-group sort is
    too wide."""
    def partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.sort(v[~np.isnan(v)])
        if v.size == 0:
            return pa.table({"val": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        r = min(reservoir_per_batch, v.size)
        # rank-stratified picks: the (i+0.5)/r quantile of this batch
        pick = np.minimum((np.arange(r) + 0.5) / r * v.size,
                          v.size - 1).astype(np.int64)
        return pa.table({"val": pa.array(v[pick]),
                         "w": pa.array(np.full(r, v.size / r))})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=batch_size).take_all()
    if not rows:
        return {q: float("nan") for q in qs}
    vals = np.array([r["val"] for r in rows])
    ws = np.array([r["w"] for r in rows])
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    cum = np.cumsum(ws)
    total = cum[-1]
    out = {}
    for q in qs:
        j = int(np.searchsorted(cum, q * total))
        out[q] = float(vals[min(j, len(vals) - 1)])
    return out


# --------------------------------------------------- per-group t-digest

def _factorize_keys(df: pd.DataFrame, keys: list[str]):
    """Dense int64 group codes + one representative row per group."""
    if len(keys) == 1:
        codes, uni = pd.factorize(df[keys[0]], use_na_sentinel=False)
        uni_df = pd.DataFrame({keys[0]: uni})
    else:
        codes, uni = pd.MultiIndex.from_frame(df[keys]).factorize(
            use_na_sentinel=False)
        uni_df = uni.to_frame(index=False)
        uni_df.columns = keys
    return codes.astype(np.int64), uni_df


def _digest_compress(g: np.ndarray, v: np.ndarray, w: np.ndarray,
                     vmin: np.ndarray, vmax: np.ndarray, K: int):
    """(group, value, weight) rows -> <= ``K`` t-digest centroids per
    group, vectorized across ALL groups in one pass.

    Bin assignment follows the t-digest scale function
    ``k(q) = asin(2q - 1)/pi + 1/2`` (Dunning & Ertl 2019): each row's
    within-group mid-rank quantile maps through ``k`` to one of ``K``
    equal-k bins, so bins are NARROW at the tails (tail accuracy
    ~1/K^2) and wide in the middle — the defining t-digest property —
    and the (mean, weight) reduction per (group, bin) is two
    bincounts.  ``g`` must be dense codes ``0..ngroups-1`` (all
    present); returns rows sorted by (group, mean) plus per-group
    exact min/max arrays indexable by code."""
    order = np.lexsort((v, g))
    g, v, w = g[order], v[order], w[order]
    vmin, vmax = vmin[order], vmax[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    counts = np.diff(np.append(starts, g.size))
    W = np.bincount(g, weights=w)
    cw = np.cumsum(w)
    base = np.concatenate(([0.0], cw))[starts]
    cwg = cw - np.repeat(base, counts)
    qmid = np.clip((cwg - 0.5 * w) / W[g], 0.0, 1.0)
    kq = np.arcsin(2.0 * qmid - 1.0) / np.pi + 0.5
    b = np.minimum((kq * K).astype(np.int64), K - 1)
    key = g * K + b
    uk, inv = np.unique(key, return_inverse=True)
    ws = np.bincount(inv, weights=w)
    means = np.bincount(inv, weights=w * v) / ws
    gmin = np.minimum.reduceat(vmin, starts)
    gmax = np.maximum.reduceat(vmax, starts)
    return uk // K, means, ws, gmin, gmax


def _digest_quantiles(g: np.ndarray, v: np.ndarray, w: np.ndarray,
                      gmin: np.ndarray, gmax: np.ndarray,
                      qs: list[float]):
    """Centroid rows (sorted by group, mean; dense codes, all present)
    -> (ngroups x len(qs)) estimates + per-group total weight.

    Standard t-digest interpolation, vectorized across groups: each
    group's centroids become points (mid-rank quantile, mean) framed
    by exact (0, min) / (1, max) sentinels, and ONE global
    ``np.interp`` over the monotone key ``group + quantile`` answers
    every (group, q) pair at once."""
    ngroups = gmin.size
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    counts = np.diff(np.append(starts, g.size))
    W = np.bincount(g, weights=w, minlength=ngroups)
    cw = np.cumsum(w)
    base = np.concatenate(([0.0], cw))[starts]
    cwg = cw - np.repeat(base, counts)
    centers = (cwg - 0.5 * w) / W[g]
    eps = 1e-9
    out_len = counts + 2
    pos0 = np.cumsum(out_len) - out_len
    xp = np.empty(int(out_len.sum()))
    fp = np.empty_like(xp)
    gid = np.arange(ngroups, dtype=np.float64)
    xp[pos0] = gid
    fp[pos0] = gmin
    xp[pos0 + out_len - 1] = gid + (1.0 - eps)
    fp[pos0 + out_len - 1] = gmax
    rank = np.arange(g.size) - np.repeat(starts, counts)
    mid = pos0[g] + 1 + rank
    xp[mid] = g + np.clip(centers, 2 * eps, 1.0 - 2 * eps)
    fp[mid] = v
    tq = (gid[:, None] + np.asarray(qs, dtype=np.float64)[None, :]).ravel()
    return np.interp(tq, xp, fp).reshape(ngroups, len(qs)), W


def _compress_frame(df: pd.DataFrame, keys: list[str], vcol: str,
                    wcol: str | None, vmin_col: str | None,
                    vmax_col: str | None, K: int) -> pd.DataFrame:
    """One frame of raw values or centroid rows -> compressed centroid
    rows (keys + mean/w/vmin/vmax), dropping NaN values."""
    v = df[vcol].to_numpy(dtype=np.float64)
    m = ~np.isnan(v)
    if not m.all():
        df = df.iloc[np.flatnonzero(m)]
        v = v[m]
    if not len(df):
        return pd.DataFrame({**{k: df[k] for k in keys},
                             "mean": v, "w": v, "vmin": v, "vmax": v})
    g, uni = _factorize_keys(df, keys)
    w = (np.ones(len(df)) if wcol is None
         else df[wcol].to_numpy(dtype=np.float64))
    vmin = v if vmin_col is None else df[vmin_col].to_numpy(np.float64)
    vmax = v if vmax_col is None else df[vmax_col].to_numpy(np.float64)
    cg, means, ws, gmin, gmax = _digest_compress(g, v, w, vmin, vmax, K)
    out = uni.iloc[cg].reset_index(drop=True)
    out["mean"] = means
    out["w"] = ws
    out["vmin"] = gmin[cg]
    out["vmax"] = gmax[cg]
    return out


def quantile_sketch_rollup(ds, keys, value_col: str, qs: list[float],
                           max_centroids: int = 128,
                           batch_size: int = 65536,
                           num_buckets: int | None = None):
    """Mergeable per-group quantile sketch — the scale path for
    per-tile percentiles that exact ``calc.quantile_rollup`` computes
    via a full-group bucketed sort (which salting cannot split, since
    an exact quantile needs the whole group; SURVEY §7.5).

    Three stages, shuffle sees only centroids: (1) per-batch compress
    to <= ``max_centroids`` (mean, weight) centroids per group, (2) a
    wider re-compress pass that merges partials from ~hundreds of
    batches (bounds hot-group centroid rows entering the shuffle),
    (3) bucketed final merge + quantile interpolation (exact min/max
    sentinels ride every centroid row, so p0/p100 are exact).

    Error: rank error ~O(1/max_centroids) mid-range and
    ~O(1/max_centroids^2) at the tails per the t-digest scale
    function; estimates depend on how rows batch (like any
    insertion-order-dependent digest) but the bound holds for every
    partitioning.  Returns keys + ``p{100q}`` columns + ``cnt``.

    Reference analog: ``freq_perc``/``daily_perc`` percentiles
    (``/root/reference/src/ocgis/calc/library/statistics.py``) at
    cardinalities where their in-memory per-group sort cannot run.
    """
    from ocgis_ray.tuning import auto_buckets

    keys = [keys] if isinstance(keys, str) else list(keys)
    num_buckets = auto_buckets(num_buckets)
    K = int(max_centroids)
    if K < 8:
        raise ValueError("max_centroids must be >= 8")
    qcols = [f"p{100 * q:g}" for q in qs]

    def _to_arrow(out: pd.DataFrame, t: pa.Table,
                  extra: dict) -> pa.Table:
        # Arrow blocks keep Ray's schema-dedup fast path (pandas
        # outputs defeat it); typed empty guard for all-NaN batches
        if len(out) == 0:
            arrs = {k: pa.array([], t.schema.field(k).type) for k in keys}
            arrs.update({c: pa.array([], pa.float64())
                         for c in ("mean", "w", "vmin", "vmax")})
            arrs.update({c: pa.array([], ty) for c, ty in extra.items()})
            return pa.table(arrs)
        # pandas schema metadata is a dict — it breaks Ray's schema
        # hash (one "Failed to hash the schemas" warning per task)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    def partial(t: pa.Table) -> pa.Table:
        out = _compress_frame(t.to_pandas(), keys, value_col,
                              None, None, None, K)
        return _to_arrow(out, t, {})

    def recompress(t: pa.Table) -> pa.Table:
        out = _compress_frame(t.to_pandas(), keys, "mean", "w",
                              "vmin", "vmax", K)
        h = pd.util.hash_pandas_object(
            out[keys].reset_index(drop=True), index=False)
        out["_bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return _to_arrow(out, t, {"_bucket": pa.int64()})

    cent = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
    cent = cent.map_batches(recompress, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + ["mean"], kind="stable")
        g, uni = _factorize_keys(df, keys)
        est, W = _digest_quantiles(
            g, df["mean"].to_numpy(np.float64),
            df["w"].to_numpy(np.float64),
            df.groupby(g, sort=True)["vmin"].min().to_numpy(np.float64),
            df.groupby(g, sort=True)["vmax"].max().to_numpy(np.float64),
            qs)
        out = uni
        for j, c in enumerate(qcols):
            out[c] = est[:, j]
        out["cnt"] = W.astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return cent.groupby("_bucket").map_groups(combine,
                                              batch_format="pandas")


# ----------------------------------------------------- count-min sketch

class CountMinSketch:
    """Count-min (Cormode & Muthukrishnan 2005): ``depth x width``
    counters, per-value probes by double hashing (same Kirsch-
    Mitzenmacher derivation as :class:`BloomFilter`).  Estimates are
    the row-wise MINIMUM — never an undercount; overcount bounded by
    ``e*N/width`` per row with prob ``1 - e^-depth``.  Mergeable by
    elementwise SUM, which is what the distributed build exploits."""

    def __init__(self, width: int = 4096, depth: int = 4):
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    def _slots(self, h: np.ndarray) -> np.ndarray:
        h1 = h % np.uint64(self.width)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        idx = np.empty((self.depth, len(h)), dtype=np.int64)
        for d in range(self.depth):
            idx[d] = ((h1 + np.uint64(d) * h2)
                      % np.uint64(self.width)).astype(np.int64)
        return idx

    def add_hashes(self, h: np.ndarray, counts: np.ndarray) -> None:
        idx = self._slots(h)
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], counts)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._slots(h)
        est = self.table[0][idx[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][idx[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (other.width, other.depth) == (self.width, self.depth)
        self.table += other.table
        return self


def count_min(ds, col: str, width: int = 4096, depth: int = 4,
              batch_size: int = 65536) -> CountMinSketch:
    """Build a count-min sketch over ``col`` distributedly: each batch
    emits SPARSE (slot, cnt) rows (<= depth x distinct-in-batch —
    bounded per batch whatever ``width`` is), a grouped aggregate sums
    per slot, and the driver materializes at most ``depth * width``
    rows.  Nulls are not counted (SQL count semantics)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        cms = CountMinSketch(width, depth)
        if t.num_rows:
            vc = pc.value_counts(t[col])
            vals = vc.field("values")
            cnts = vc.field("counts").to_numpy(zero_copy_only=False)
            valid = _valid_mask(vals)
            h = _hash64(vals)
            idx = cms._slots(h)
            cnts = cnts[valid].astype(np.int64)
            slots = (idx + (np.arange(depth, dtype=np.int64)[:, None]
                            * width)).ravel()
            all_cnts = np.tile(cnts, depth)
            # within-batch slot collisions sum here, not on the shuffle
            uniq, inv = np.unique(slots, return_inverse=True)
            summed = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(summed, inv, all_cnts)
            return pa.table({"slot": pa.array(uniq),
                             "cnt": pa.array(summed)})
        return pa.table({"slot": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})

    from ocgis_ray.stages.tiles import grouped_aggregate

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    summed = grouped_aggregate(partials, ["slot"], {"cnt": ("cnt", "sum")})
    out = CountMinSketch(width, depth)
    for row in summed.take_all():
        s = int(row["slot"])
        out.table[s // width, s % width] += int(row["cnt"])
    return out


def cms_add_estimate(ds, col: str, cms: CountMinSketch,
                     out_col: str = "freq_est"):
    """Append each row's estimated ``col`` frequency — broadcast once
    (``ray.put``), probe vectorized; the frequency-based gate shape
    (e.g. drop boilerplate values seen > K times) WITHOUT a
    corpus-sized exact count shuffle.  Null values estimate 0."""
    import ray

    ref = ray.put({"table": cms.table, "width": cms.width,
                   "depth": cms.depth})

    def f(t: pa.Table) -> pa.Table:
        b = ray.get(ref)
        sk = CountMinSketch(b["width"], b["depth"])
        sk.table = b["table"]
        est = np.zeros(t.num_rows, dtype=np.int64)
        if t.num_rows:
            valid = _valid_mask(t[col])
            if valid.any():
                est[valid] = sk.estimate_hashes(_hash64(t[col]))
        return t.append_column(out_col, pa.array(est))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
