"""Calculation library: grouped set functions, thresholds, windows,
run-lengths, and string-expression kernels.

The Ray re-expression of the reference's calculation engine
(``/root/reference/src/ocgis/calc/engine.py:48-157``) and function
library: set functions mean/min/max/median/std/sum
(``calc/library/statistics.py:355-425``), threshold counts
(``calc/library/thresholds.py:6-61``), duration/run-length indices
(``calc/library/index/duration.py:10-153``), freeze-thaw-style state
machines (``calc/library/index/freeze_thaw.py:9-110``), moving windows
(``calc/library/statistics.py:12-135``), elementwise multivariate math
(``calc/library/math.py``), and string-expression functions
(``calc/eval_function.py:9-170``).

Where the reference conforms arrays to a 5-D (realization, time,
level, y, x) layout and reduces per temporal group, this engine
derives group-key columns and reduces with partial+final aggregation
(``ocgis_ray.stages.tiles.grouped_aggregate``) — the shuffle only
moves per-batch partials.  Order-dependent functions (duration,
moving window, state machines) use ``groupby().map_groups`` with an
in-group sort by timestamp; the ordering assumption is *within group
only* (no cross-partition order is relied on).

Float outputs that feed the DuckDB oracle are rounded (ROUND_DIGITS)
on BOTH sides to absorb summation-order ulp differences — the
deterministic-combine answer to the reference's documented parallel
FP caveat (``doc/parallel.rst`` "Spatial Averaging in Parallel").
"""

from __future__ import annotations

import ast

import numpy as np

from ocgis_ray.parity import sql_round
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.tiles import grouped_aggregate

ROUND_DIGITS = 4


# --------------------------------------------------------------- set functions

def stats_rollup(ds, keys, value_col: str, round_digits: int = ROUND_DIGITS):
    """Grouped mean/min/max/sum/std/count of ``value_col``.

    std is the sample standard deviation (ddof=1) finalized from
    (sum, sumsq, count) partials — matching DuckDB ``stddev_samp``
    within rounding."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    agg = grouped_aggregate(
        ds,
        keys,
        {
            "cnt": (value_col, "count"),
            "sum_v": (value_col, "sum"),
            "sumsq_v": (value_col, "sumsq"),
            "min_v": (value_col, "min"),
            "max_v": (value_col, "max"),
        },
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["cnt"].to_numpy(dtype=np.float64)
        s = df["sum_v"].to_numpy(dtype=np.float64)
        ss = df["sumsq_v"].to_numpy(dtype=np.float64)
        mean = s / n
        var = np.where(n > 1, (ss - s * s / n) / (n - 1), np.nan)
        out = df[keys].copy()
        out["mean_v"] = sql_round(mean, round_digits)
        out["std_v"] = sql_round(np.sqrt(np.maximum(var, 0.0)), round_digits)
        out["sum_v"] = sql_round(s, round_digits)
        out["min_v"] = df["min_v"]
        out["max_v"] = df["max_v"]
        out["cnt"] = df["cnt"]
        return out

    return agg.map_batches(finalize, batch_format="pandas")


def quantile_rollup(ds, keys, value_col: str, q, out_col="q_v",
                    round_digits: int = ROUND_DIGITS):
    """Exact grouped percentile (``freq_perc``/median analog) —
    linear interpolation, identical to DuckDB ``quantile_cont``.
    Exact quantiles are inherently a full-group operation, so groups
    co-locate via the hash-bucket shuffle and ALL groups in a bucket
    compute in one vectorized pandas pass (per-group ``map_groups``
    runs ~700 groups/s); for huge single groups a t-digest sketch
    would replace this.

    ``q`` may be a sequence (with a matching ``out_col`` sequence):
    every quantile is computed in ONE pass over the input — N
    thresholds cost one upstream execution, not N (the CCNet tertile
    case)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    from ocgis_ray.sources.io import bucketed_group_apply

    qs = [float(q)] if np.isscalar(q) else [float(x) for x in q]
    outs = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(qs) != len(outs):
        raise ValueError("q and out_col lengths differ")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)[value_col]
        out = None
        for qq, name in zip(qs, outs):
            s = gb.quantile(qq, interpolation="linear").reset_index()
            s[name] = sql_round(s.pop(value_col).to_numpy(np.float64),
                                round_digits)
            out = s if out is None else out.merge(s, on=keys, how="inner")
        return out

    return bucketed_group_apply(ds, keys, per_bucket)


def threshold_rollup(ds, keys, value_col: str, lower=None, upper=None,
                     out_col: str = "n_meeting"):
    """Count of values meeting the predicate per group — the
    ``between``/``threshold`` analog (``calc/library/thresholds.py``).
    Pure partial+final (sum of booleans)."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = t[value_col]
        m = pc.is_valid(v)
        if lower is not None:
            m = pc.and_(m, pc.greater_equal(v, pa.scalar(float(lower))))
        if upper is not None:
            m = pc.and_(m, pc.less_equal(v, pa.scalar(float(upper))))
        return t.append_column("_meets", pc.cast(m, pa.int64()))

    flagged = ds.map_batches(add_flag, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(flagged, keys, {out_col: ("_meets", "sum")})


# ----------------------------------------------------- order-dependent kernels

def duration_rollup(ds, entity_keys, ts_col: str, value_col: str, threshold: float,
                    out_col: str = "max_run"):
    """Longest consecutive run of ``value > threshold`` per entity in
    timestamp order (``calc/library/index/duration.py:10-153``).

    Entity-bucketed shuffle; the run-length encode is vectorized
    across ALL of a bucket's entities in one numpy pass (a run breaks
    where the entity OR the flag changes).  Entities with no
    qualifying value are omitted (matching the SQL gaps-and-islands
    oracle)."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = entity_keys + [ts_col] + [c for c in ("event_id",) if c in g.columns]
        g = g.sort_values(sort_cols)
        flag = (g[value_col].to_numpy(dtype=np.float64) > threshold)
        ent = pd.util.hash_pandas_object(
            g[entity_keys].reset_index(drop=True), index=False
        ).to_numpy()
        # run boundaries: entity change OR flag change
        boundary = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            boundary[1:] = (ent[1:] != ent[:-1]) | (flag[1:] != flag[:-1])
        starts = np.flatnonzero(boundary)
        lengths = np.diff(np.append(starts, len(g)))
        qualifying = flag[starts]
        runs = pd.DataFrame({
            **{k: g[k].to_numpy()[starts[qualifying]] for k in entity_keys},
            "run_len": lengths[qualifying],
        })
        if len(runs) == 0:
            return runs.rename(columns={"run_len": out_col})
        out = runs.groupby(entity_keys, as_index=False, sort=False)["run_len"].max()
        out[out_col] = out.pop("run_len").astype(np.int64)
        return out

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def moving_window(ds, entity_keys, ts_col: str, value_col: str, window: int,
                  out_col: str = "moving_mean", round_digits: int = ROUND_DIGITS,
                  tiebreak_col: str | None = None):
    """Trailing moving mean over the previous ``window`` rows per
    entity in timestamp order (``calc/library/statistics.py:12-135``,
    ``calc/library/math.py:48-109``).  SQL twin: ``AVG(v) OVER
    (PARTITION BY entity ORDER BY ts, tiebreak ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    # Scale path: shuffle on an entity-hash BUCKET (small int key ->
    # cheap range sort) and run the rolling window VECTORIZED across
    # all of a bucket's entities at once (pandas groupby-rolling) —
    # Ray's per-group map_groups on raw entity keys pays per-group
    # Python overhead that dominates with many entities.  Bucketing
    # itself is the shared Arrow key-hash stage (the former local
    # pandas add_bucket round-tripped every block through pandas).
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(entity_keys + sort_cols)
        rolled = (
            g.groupby(entity_keys, sort=False)[value_col]
            .rolling(window, min_periods=1)
            .mean()
            .to_numpy()
        )
        g = g.copy()
        g[out_col] = sql_round(rolled, round_digits)
        return g

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def window_ops(ds, entity_keys, order_cols, specs: dict):
    """General per-entity window functions — the SQL
    ``fn(x) OVER (PARTITION BY entity ORDER BY order_cols)`` family
    the engine lacked as a NAMED operator (duration/convolve/session
    ops each hand-rolled their own ordered pass; this is the reusable
    front end over the same bucketed machinery).

    ``specs``: ``{out_col: (kind, in_col[, param])}`` with kinds
    ``row_number`` / ``rank`` / ``dense_rank`` (``in_col`` ignored;
    rank ties are rows equal on ALL ``order_cols``), ``lag`` /
    ``lead`` (``param`` = offset, default 1; SQL-NULL fill via
    NaN/NaT), ``delta`` (value minus lag-1), ``cumsum`` / ``cummax``
    / ``cummin``.  Returns the input rows + out columns.

    Scale design: one entity-bucketed shuffle
    (``bucketed_group_apply``); inside a bucket every entity computes
    in the same vectorized pass — boundaries via one hash-diff, rank
    runs via order-col diffs, shift/cum* via a C-speed pandas groupby
    on dense codes.  Deterministic: rows order by entity + order_cols
    (+ ``event_id`` tiebreak when present, the repo convention).
    NaNs in an order column start a new rank run (SQL ordering treats
    NULLs as equal; order on non-null keys where that matters)."""
    entity_keys = ([entity_keys] if isinstance(entity_keys, str)
                   else list(entity_keys))
    order_cols = ([order_cols] if isinstance(order_cols, str)
                  else list(order_cols))
    kinds = {"row_number", "rank", "dense_rank", "lag", "lead",
             "delta", "cumsum", "cummax", "cummin"}
    for out, sp in specs.items():
        if sp[0] not in kinds:
            raise ValueError(f"unknown window kind {sp[0]!r} for {out!r}")
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = entity_keys + order_cols + [
            c for c in ("event_id",)
            if c in g.columns and c not in order_cols]
        g = g.sort_values(sort_cols, kind="stable").copy()
        n = len(g)
        ent = pd.util.hash_pandas_object(
            g[entity_keys].reset_index(drop=True), index=False
        ).to_numpy()
        new_ent = np.ones(n, dtype=bool)
        if n > 1:
            new_ent[1:] = ent[1:] != ent[:-1]
        starts = np.flatnonzero(new_ent)
        counts = np.diff(np.append(starts, n))
        rn = np.arange(n) - np.repeat(starts, counts)  # 0-based
        codes = np.cumsum(new_ent) - 1                 # dense entity ids
        new_rank = None  # lazily: entity change OR any order col change

        def rank_runs() -> np.ndarray:
            nonlocal new_rank
            if new_rank is None:
                nr = new_ent.copy()
                for c in order_cols:
                    oc = g[c].to_numpy()
                    if n > 1:
                        nr[1:] |= ~(oc[1:] == oc[:-1])
                new_rank = nr
            return new_rank

        for out, sp in specs.items():
            kind, col = sp[0], (sp[1] if len(sp) > 1 else None)
            param = sp[2] if len(sp) > 2 else None
            if kind == "row_number":
                g[out] = (rn + 1).astype(np.int64)
            elif kind == "rank":
                s2 = np.flatnonzero(rank_runs())
                g[out] = np.repeat(rn[s2] + 1,
                                   np.diff(np.append(s2, n))).astype(np.int64)
            elif kind == "dense_rank":
                seq = np.cumsum(rank_runs())
                g[out] = (seq - np.repeat(seq[starts] - 1, counts)
                          ).astype(np.int64)
            elif kind in ("lag", "lead"):
                k = 1 if param is None else int(param)
                g[out] = g.groupby(codes, sort=False)[col].shift(
                    k if kind == "lag" else -k).to_numpy()
            elif kind == "delta":
                prev = g.groupby(codes, sort=False)[col].shift(1)
                g[out] = (g[col] - prev).to_numpy()
            else:  # cumsum / cummax / cummin
                g[out] = getattr(
                    g.groupby(codes, sort=False)[col], kind)().to_numpy()
        return g

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def sessionize(ds, entity_keys, ts_col: str, gap_seconds: float,
               out_col: str = "session_id"):
    """Gap-based sessionization: within each entity (timestamp order),
    a new session starts when the gap to the previous event exceeds
    ``gap_seconds``.  Session ids are a per-entity 0-based sequence —
    unique only within ``entity_keys`` (group on
    ``entity_keys + [session_id]``), deterministic and stable under
    resume.  The engine's session-
    window primitive (ray_guide streaming-shaped workloads; no
    reference analog — the reference is pure batch, SURVEY §2.8).

    SQL twin: gaps-and-islands with ``lag(ts)`` + a running sum of
    new-session flags."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = entity_keys + [ts_col] + [c for c in ("event_id",) if c in g.columns]
        g = g.sort_values(sort_cols).copy()
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        ent = pd.util.hash_pandas_object(
            g[entity_keys].reset_index(drop=True), index=False
        ).to_numpy()
        new_entity = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_entity[1:] = ent[1:] != ent[:-1]
        gap = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            gap[1:] = (ts[1:] - ts[:-1]) > gap_seconds * 1_000_000
        new_session = new_entity | gap
        # per-entity sequential session number (0-based)
        seq = np.cumsum(new_session)  # global running count
        # subtract the running count at each entity's first row
        first_of_entity = np.where(new_entity)[0]
        base = np.repeat(seq[first_of_entity], np.diff(np.append(first_of_entity, len(g))))
        g[out_col] = (seq - base).astype(np.int64)
        return g

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def freq_duration_rollup(ds, entity_keys, ts_col: str, value_col: str,
                         threshold: float, out_len: str = "run_len",
                         out_count: str = "n_runs"):
    """Frequency-of-durations (``calc/library/index/duration.py``
    ``freq_duration``): per entity, how many qualifying runs of each
    length occurred.  Same vectorized RLE as :func:`duration_rollup`,
    grouped by (entity, run length)."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = entity_keys + [ts_col] + [c for c in ("event_id",) if c in g.columns]
        g = g.sort_values(sort_cols)
        flag = g[value_col].to_numpy(dtype=np.float64) > threshold
        ent = pd.util.hash_pandas_object(
            g[entity_keys].reset_index(drop=True), index=False
        ).to_numpy()
        boundary = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            boundary[1:] = (ent[1:] != ent[:-1]) | (flag[1:] != flag[:-1])
        starts = np.flatnonzero(boundary)
        lengths = np.diff(np.append(starts, len(g)))
        q = flag[starts]
        runs = pd.DataFrame({
            **{k: g[k].to_numpy()[starts[q]] for k in entity_keys},
            out_len: lengths[q].astype(np.int64),
        })
        if len(runs) == 0:
            runs[out_count] = pd.Series([], dtype=np.int64)
            return runs
        out = runs.groupby(entity_keys + [out_len], as_index=False, sort=False).size()
        out[out_count] = out.pop("size").astype(np.int64)
        return out

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def convolve_1d(ds, entity_keys, ts_col: str, value_col: str, kernel,
                out_col: str = "convolved", mode: str = "same",
                round_digits: int = ROUND_DIGITS, tiebreak_col: str | None = None):
    """1-D convolution along the time axis per entity
    (``calc/library/math.py:48-109``): ``mode='same'`` pads (edge rows
    keep partial sums), ``'valid'`` nulls the rows without full kernel
    support — mirroring the reference's valid-mode masking."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)
    kernel = np.asarray(kernel, dtype=np.float64)
    sort_cols = entity_keys + [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    from ocgis_ray.sources.io import bucketed_group_apply

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols).copy()
        out = np.full(len(g), np.nan)
        start = 0
        for _, grp in g.groupby(entity_keys, sort=False):
            v = grp[value_col].to_numpy(dtype=np.float64)
            c = np.convolve(v, kernel, mode="same")
            if len(c) > len(v):
                # numpy 'same' returns max(len(v), len(kernel)) — for
                # an entity shorter than the kernel, keep the centered
                # len(v) slice instead of crashing the assignment
                o = (len(c) - len(v)) // 2
                c = c[o:o + len(v)]
            if mode == "valid":
                half = (len(kernel) - 1) // 2
                c[:half] = np.nan
                if len(kernel) - 1 - half > 0:
                    c[len(v) - (len(kernel) - 1 - half):] = np.nan
            out[start : start + len(v)] = c
            start += len(v)
        g[out_col] = sql_round(out, round_digits)
        return g

    return bucketed_group_apply(ds, entity_keys, per_bucket)


def state_machine(ds, entity_keys, ts_col: str, fn, batch_format: str = "pandas"):
    """Sequential per-entity state machine along the time axis — the
    ``freezethaw`` plugin surface (``calc/library/index/freeze_thaw.py``).
    ``fn(sorted_group_df) -> df``; runs under ``map_groups``."""
    entity_keys = [entity_keys] if isinstance(entity_keys, str) else list(entity_keys)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.sort_values(ts_col))

    return ds.groupby(entity_keys).map_groups(per_group, batch_format=batch_format)


# ------------------------------------------------------------ expression eval

_ALLOWED_FUNCS = {
    "exp": np.exp, "log": np.log, "log10": np.log10, "abs": np.abs,
    "power": np.power, "sqrt": np.sqrt, "sin": np.sin, "cos": np.cos,
    "tan": np.tan, "floor": np.floor, "ceil": np.ceil,
}
_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Call, ast.Name, ast.Load,
    ast.Constant, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod,
    ast.USub, ast.UAdd, ast.FloorDiv,
)


def compile_expression(expr: str):
    """``"out = log(v + 1) * 2"`` -> (out_name, kernel(cols) -> ndarray).

    The ``EvalFunction`` analog (``calc/eval_function.py:9-170``) with
    the same whitelist idea (``constants.py:132``) but a real AST
    validator instead of ``eval`` on a regex-scrubbed string."""
    if "=" not in expr:
        raise ValueError("expression must be 'out = f(...)'")
    out_name, rhs = (s.strip() for s in expr.split("=", 1))
    tree = ast.parse(rhs, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(f"disallowed syntax: {type(node).__name__}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _ALLOWED_FUNCS:
                raise ValueError("only whitelisted functions allowed")
    code = compile(tree, "<calc-expr>", "eval")
    names = {
        n.id for n in ast.walk(tree)
        if isinstance(n, ast.Name) and n.id not in _ALLOWED_FUNCS
    }

    def kernel(cols: dict[str, np.ndarray]) -> np.ndarray:
        env = dict(_ALLOWED_FUNCS)
        for n in names:
            env[n] = cols[n]
        return eval(code, {"__builtins__": {}}, env)  # noqa: S307 — AST-validated

    kernel.names = frozenset(names)  # referenced columns, for projection
    return out_name, kernel


def eval_function(ds, expr: str, round_digits: int | None = ROUND_DIGITS):
    """Apply a string expression as a vectorized per-batch column."""
    out_name, kernel = compile_expression(expr)

    def f(t: pa.Table) -> pa.Table:
        # convert ONLY the referenced columns — the batch may carry
        # fat unrelated columns that must not pay a numpy round-trip
        cols = {name: t[name].to_numpy(zero_copy_only=False)
                for name in t.column_names if name in kernel.names}
        v = np.asarray(kernel(cols), dtype=np.float64)
        if round_digits is not None:
            v = sql_round(v, round_digits)
        return t.append_column(out_name, pa.array(v))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def multivariate_map(ds, out_col: str, fn, in_cols: list[str],
                     round_digits: int | None = ROUND_DIGITS):
    """Elementwise multivariate function with optional conditional
    masking — the ``heat_index`` pattern (``calc/library/index/
    heat_index.py:6-36``, plumbing ``calc/base.py:771-925``).
    ``fn(*arrays) -> ndarray`` (may contain NaN for masked rows; NaN
    becomes null in Arrow)."""

    def f(t: pa.Table) -> pa.Table:
        arrays = [t[c].to_numpy(zero_copy_only=False) for c in in_cols]
        v = np.asarray(fn(*arrays), dtype=np.float64)
        if round_digits is not None:
            v = sql_round(v, round_digits)
        return t.append_column(out_col, pa.array(v, from_pandas=True))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
