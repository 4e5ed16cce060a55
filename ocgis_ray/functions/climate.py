"""Climate-index library — the ICCLIM-contrib analog at breadth.

The reference ships ~50 ECA&D indices through a registration seam
(``/root/reference/src/ocgis/contrib/library_icclim.py``,
``calc/library/register.py:10-43``).  This module provides the same
shape over the events table: a REGISTRY of per-entity series indices
(``register_index``) and :func:`climate_indices`, which evaluates every
requested index in ONE bucketed shuffle — the entity's ordered series
is materialized exactly once per group, all indices read it.

Index semantics (value plays the daily-variable role, ts the day):

- ``tg`` / ``tx`` / ``tn``      mean / max / min  (ECA&D TG, TX, TN)
- ``su`` / ``tr``               count value >  threshold  (SU, TR)
- ``fd`` / ``id_``              count value <  threshold  (FD, ID)
- ``dtr``                       mean over days of daily max-min (DTR)
- ``cdd`` / ``cwd``             longest run below/at-or-above wet_thr
                                in (ts, event_id) order (CDD, CWD)
- ``prcptot``                   sum of values >= wet_thr  (PRCPTOT)
- ``r95ptot``                   sum of values > the entity's own 95th
                                percentile (R95pTOT, whole-series base)
- ``tx90p`` / ``tg10p``         count above q90 / below q10 (own base)
- ``fzth``                      freeze-thaw cycles: threshold crossings
                                of the ordered series (freeze_thaw.py)
- ``etr``                       max - min (ETR, intra-period range)
- ``hd17`` / ``gd4``            heating / growing degree sums:
                                sum max(0, thr-v) / max(0, v-thr)
- ``rr1``                       wet-entry count (value >= wet_thr)
- ``sdii``                      mean value over wet entries (SDII)
- ``csu`` / ``cfd``             longest run above su_thr / below fd_thr
- ``vdtr``                      mean |day-to-day change| of the daily
                                range (vDTR)
- ``wsdi`` / ``csdi``           total entries in runs of >= spell_min
                                consecutive values above q90 / below
                                q10 (warm/cold spell duration)
- ``rx1day`` / ``rx5day``       max daily total / max calendar-5-day
                                total (RX1day, RX5day)
- ``r10mm`` / ``r20mm``         days with daily total >= threshold
- ``r99ptot``                   sum of values > own 99th percentile
- ``r75p``                      count above own 75th percentile
- ``txn`` / ``tnx``             min of daily max / max of daily min
- ``txx`` / ``tnn``             max of daily max / min of daily min
- ``txm`` / ``tnm``             mean of daily max / mean of daily min
- ``sd``                        mean daily total (snow-depth analog)
- ``sd1``/``sd5cm``/``sd50cm``  days with daily total >= threshold
- ``tn10p`` / ``tn90p``         days with daily min below q10 / above
                                q90 of the entity's own daily-min base
- ``tx10p`` / ``tg90p``         days with daily max below q10 / daily
                                mean above q90 (own daily bases)
- ``r95p`` / ``r99p``           counts above own q95 / q99
- ``cd``/``cw``/``wd``/``ww``   compound cold/warm x dry/wet day
                                counts vs own daily medians (ECA&D
                                CD, CW, WD, WW)

Every index has an exact DuckDB twin assembled by
:func:`climate_indices_sql` (gaps-and-islands for the run lengths,
``quantile_cont`` for percentile bases); float outputs round via
``sql_round`` on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

from ocgis_ray.parity import sql_round

ROUND = 4

# thresholds tuned to the synthetic events value range (0..490, median ~35)
DEFAULTS = {"su_thr": 60.0, "fd_thr": 10.0, "tr_thr": 120.0, "id_thr": 5.0,
            "wet_thr": 30.0}

#: name -> fn(values_sorted, days_sorted, params) -> scalar
_INDEX_FUNCS: dict[str, Callable] = {}

#: indices whose SQL twin lives in the per-entity daily-scalar CTE
#: (dayq/dayx); see the fourth-tranche registrations below
_DAYX_NAMES = frozenset({
    "txm", "tnm", "txx", "tnn", "sd", "sd1", "sd5cm", "sd50cm",
    "tn10p", "tn90p", "tx10p", "tg90p", "cd", "cw", "wd", "ww",
})


def register_index(name: str, fn: Callable) -> None:
    """Plugin seam: add a per-entity series index (the
    ``FunctionRegistry.append`` analog)."""
    _INDEX_FUNCS[name] = fn


def index_names() -> list[str]:
    return sorted(_INDEX_FUNCS)


def _pctl(v: np.ndarray, q: float, p: dict | None) -> float:
    """np.percentile with the same per-entity memo discipline as
    :func:`_daily`: q90/q10/q95/q99 are each read by two kernels, so
    the memo halves the percentile work per entity (the sort inside
    percentile dominates the small per-entity kernels)."""
    if p is None:
        return np.percentile(v, q)
    cache = p.setdefault("_pctl_cache", {})
    key = (id(v), q)
    hit = cache.get(key)
    if hit is None:
        # the array rides in the value so its id() stays pinned for
        # the cache's (per-entity) lifetime; multiple base arrays
        # (whole series, daily mean, daily total) coexist
        hit = cache[key] = (v, np.percentile(v, q))
    return hit[1]


def _max_run(mask: np.ndarray) -> int:
    """Longest consecutive True run (vectorized RLE)."""
    if mask.size == 0 or not mask.any():
        return 0
    m = np.concatenate([[False], mask, [False]])
    edges = np.flatnonzero(m[1:] != m[:-1])
    return int((edges[1::2] - edges[0::2]).max())


def _cents(v: np.ndarray) -> np.ndarray:
    """Exact integer cents (values are 2-decimal): float sums at scale
    cross rounding boundaries between numpy and SQL accumulation
    orders; integer sums are exact on both sides.  Half-away-from-zero
    (copysign) to match DuckDB's ``round()`` for NEGATIVE half-cent
    values too — ``floor(v*100+0.5)`` would round -12.5 cents to -12
    while SQL rounds to -13."""
    return np.copysign(np.floor(np.abs(v) * 100.0 + 0.5), v).astype(np.int64)


def _tg(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    return float(sql_round((_cents(v).sum() / 100.0) / v.size, ROUND))


register_index("tg", _tg)
register_index("tx", lambda v, d, p: float(v.max()))
register_index("tn", lambda v, d, p: float(v.min()))
register_index("su", lambda v, d, p: int((v > p["su_thr"]).sum()))
register_index("fd", lambda v, d, p: int((v < p["fd_thr"]).sum()))
register_index("tr", lambda v, d, p: int((v > p["tr_thr"]).sum()))
register_index("id_", lambda v, d, p: int((v < p["id_thr"]).sum()))
register_index("cdd", lambda v, d, p: _max_run(v < p["wet_thr"]))
register_index("cwd", lambda v, d, p: _max_run(v >= p["wet_thr"]))
register_index(
    "prcptot",
    lambda v, d, p: float(sql_round(
        _cents(v[v >= p["wet_thr"]]).sum() / 100.0, ROUND)),
)


def _dtr(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    # d arrives sorted (series sorted by ts) -> day segments are
    # contiguous; shares the memoized daily reduceat aggregates
    rng_c = _day_ranges_cents(v, d, p)
    return float(sql_round((rng_c.sum() / 100.0) / rng_c.size, ROUND))


def _r95ptot(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    q = _pctl(v, 95.0, p)
    return float(sql_round(_cents(v[v > q]).sum() / 100.0, ROUND))


def _tx90p(v: np.ndarray, d: np.ndarray, p: dict) -> int:
    return int((v > _pctl(v, 90.0, p)).sum())


def _spell_total(mask: np.ndarray, min_len: int) -> int:
    """Total entries inside runs of >= min_len consecutive True —
    the WSDI/CSDI spell measure (ECA&D: spells of 6+ days)."""
    if mask.size == 0 or not mask.any():
        return 0
    m = np.concatenate([[False], mask, [False]])
    edges = np.flatnonzero(m[1:] != m[:-1])
    lens = edges[1::2] - edges[0::2]
    return int(lens[lens >= min_len].sum())


def _day_ranges_cents(v: np.ndarray, d: np.ndarray,
                      p: dict | None = None) -> np.ndarray:
    """Per-day (max-min) in exact integer cents; d arrives ts-sorted
    so day segments are contiguous.  Built on the memoized daily
    aggregates — dmax/dmin come from the same reduceat segmentation
    the standalone computation used, so values are bit-identical."""
    _, _, dmax, dmin, _ = _daily(v, d, p)
    return _cents(dmax - dmin)


def _vdtr(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    """Mean absolute day-to-day difference of the daily range (vDTR)."""
    rc = _day_ranges_cents(v, d, p)
    if rc.size < 2:
        return 0.0
    diffs = np.abs(np.diff(rc))
    return float(sql_round((diffs.sum() / 100.0) / diffs.size, ROUND))


def _sdii(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    """Simple daily intensity: mean value over wet entries (SDII)."""
    wet = v >= p["wet_thr"]
    n = int(wet.sum())
    if n == 0:
        return 0.0
    return float(sql_round((_cents(v[wet]).sum() / 100.0) / n, ROUND))


def _fzth(v: np.ndarray, d: np.ndarray, p: dict) -> int:
    """Freeze-thaw cycle count (calc/library/index/freeze_thaw.py):
    number of threshold crossings of the ordered series — a real
    vectorized implementation of the state-machine index (the generic
    plugin surface is ``calc.state_machine``)."""
    above = v > p["fzth_thr"]
    return int((above[1:] != above[:-1]).sum())


DEFAULTS["fzth_thr"] = 35.0
DEFAULTS["hd_thr"] = 35.0   # heating-degree base (HD17 analog)
DEFAULTS["gd_thr"] = 20.0   # growing-degree base (GD4 analog)
DEFAULTS["spell_min"] = 6   # WSDI/CSDI minimum spell length
register_index("fzth", _fzth)
register_index("dtr", _dtr)
register_index("r95ptot", _r95ptot)
register_index("tx90p", _tx90p)
# second ECA&D tranche (contrib/library_icclim.py parity at breadth)
register_index("etr", lambda v, d, p: float(v.max() - v.min()))
register_index("hd17", lambda v, d, p: float(sql_round(
    np.maximum(0, int(round(p["hd_thr"] * 100.0)) - _cents(v)).sum()
    / 100.0, ROUND)))
register_index("gd4", lambda v, d, p: float(sql_round(
    np.maximum(0, _cents(v) - int(round(p["gd_thr"] * 100.0))).sum()
    / 100.0, ROUND)))
register_index("rr1", lambda v, d, p: int((v >= p["wet_thr"]).sum()))
register_index("sdii", _sdii)
register_index("csu", lambda v, d, p: _max_run(v > p["su_thr"]))
register_index("cfd", lambda v, d, p: _max_run(v < p["fd_thr"]))
register_index("vdtr", _vdtr)
register_index("tg10p", lambda v, d, p: int((v < _pctl(v, 10.0, p)).sum()))
register_index("wsdi", lambda v, d, p: _spell_total(
    v > _pctl(v, 90.0, p), p["spell_min"]))
register_index("csdi", lambda v, d, p: _spell_total(
    v < _pctl(v, 10.0, p), p["spell_min"]))


# third ECA&D tranche: daily-total precipitation family + day-extreme
# temperature family (contrib/library_icclim.py RX1day/RX5day/R10mm/
# R20mm/R99pTOT/R75p/TXn/TNx analogs over the events series)

DEFAULTS["r10_thr"] = 100.0   # daily-total "heavy" threshold (R10mm)
DEFAULTS["r20_thr"] = 200.0   # daily-total "very heavy" threshold (R20mm)


def _daily(v: np.ndarray, d: np.ndarray, p: dict | None = None):
    """(day_int64, day_sum_cents, day_max, day_min, day_count) — d
    arrives ts-sorted so day segments are contiguous (see _dtr).

    Two dozen kernels read the same daily aggregates; when ``p`` is the
    per-entity params dict :func:`climate_indices` passes (a fresh
    copy per entity), the tuple is computed once and memoized in it.
    The cache is validated against the array identities so direct
    kernel calls with a shared dict stay correct."""
    if p is not None:
        hit = p.get("_daily_cache")
        if hit is not None and hit[0] is v and hit[1] is d:
            return hit[2]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    bounds = np.concatenate([starts, [v.size]])
    out = (d[starts].astype(np.int64),
           np.add.reduceat(_cents(v), starts),
           np.maximum.reduceat(v, starts),
           np.minimum.reduceat(v, starts),
           np.diff(bounds).astype(np.int64))
    if p is not None:
        p["_daily_cache"] = (v, d, out)
    return out


def _rx1day(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    _, sums, _, _, _ = _daily(v, d, p)
    return float(sql_round(sums.max() / 100.0, ROUND))


def _rx5day(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    """Max CALENDAR-5-day precipitation total: for each present day d,
    the sum over present days in [d-4, d] (missing days contribute 0,
    matching the SQL RANGE frame)."""
    days, sums, _, _, _ = _daily(v, d, p)
    prefix = np.concatenate([[0], np.cumsum(sums)])
    lo = np.searchsorted(days, days - 4, side="left")
    win = prefix[np.arange(1, days.size + 1)] - prefix[lo]
    return float(sql_round(win.max() / 100.0, ROUND))


def _r_nn(thr_key: str):
    def fn(v: np.ndarray, d: np.ndarray, p: dict) -> int:
        _, sums, _, _, _ = _daily(v, d, p)
        return int((sums >= int(round(p[thr_key] * 100.0))).sum())
    return fn


def _r99ptot(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    q = _pctl(v, 99.0, p)
    return float(sql_round(_cents(v[v > q]).sum() / 100.0, ROUND))


def _txn(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    _, _, dmax, _, _ = _daily(v, d, p)
    return float(dmax.min())


def _tnx(v: np.ndarray, d: np.ndarray, p: dict) -> float:
    _, _, _, dmin, _ = _daily(v, d, p)
    return float(dmin.max())


register_index("rx1day", _rx1day)
register_index("rx5day", _rx5day)
register_index("r10mm", _r_nn("r10_thr"))
register_index("r20mm", _r_nn("r20_thr"))
register_index("r99ptot", _r99ptot)
register_index("r75p", lambda v, d, p: int((v > _pctl(v, 75.0, p)).sum()))
register_index("txn", _txn)
register_index("tnx", _tnx)


# fourth ECA&D tranche (completes the ~50-index contrib surface,
# contrib/library_icclim.py:1-509): snow-pack analogs over daily
# totals (SD/SD1/SD5cm/SD50cm), percentile-days over the DAILY series
# (TN10p/TN90p/TX10p/TG90p — the whole-entry tx90p/tg10p already
# exist), daily-extreme means (TXm/TNm) and extremes (TXx/TNn),
# whole-series percentile-day counts (R95p/R99p), and the CD/CW/WD/WW
# compound climatology (cold/warm x dry/wet vs the entity's own daily
# medians).

DEFAULTS["sd1_thr"] = 30.0    # daily-total "snow day" floor (SD1 analog)
DEFAULTS["sd5_thr"] = 100.0   # SD5cm analog
DEFAULTS["sd50_thr"] = 250.0  # SD50cm analog


def _day_mean_tot(v: np.ndarray, d: np.ndarray, p: dict):
    """(day_mean, day_total) as float64 — both derived from the exact
    integer-cent daily sums with the same IEEE ops as the SQL twin
    (``(sum_c / 100.0) / dcnt`` and ``sum_c / 100.0``).  Memoized like
    :func:`_daily` so the arrays keep a stable identity — that is what
    lets :func:`_pctl` share the compound indices' median work (cd/cw/
    wd/ww each read the same two medians)."""
    if p is not None:
        hit = p.get("_dmt_cache")
        if hit is not None and hit[0] is v:
            return hit[1]
    _, sums, _, _, cnt = _daily(v, d, p)
    out = ((sums / 100.0) / cnt, sums / 100.0)
    if p is not None:
        p["_dmt_cache"] = (v, out)
    return out


def _txm(v, d, p):
    _, _, dmax, _, _ = _daily(v, d, p)
    c = _cents(dmax)
    return float(sql_round((c.sum() / 100.0) / c.size, ROUND))


def _tnm(v, d, p):
    _, _, _, dmin, _ = _daily(v, d, p)
    c = _cents(dmin)
    return float(sql_round((c.sum() / 100.0) / c.size, ROUND))


def _sd(v, d, p):
    _, sums, _, _, _ = _daily(v, d, p)
    return float(sql_round((sums.sum() / 100.0) / sums.size, ROUND))


def _sd_nn(thr_key: str):
    def fn(v, d, p):
        _, sums, _, _, _ = _daily(v, d, p)
        return int((sums >= int(round(p[thr_key] * 100.0))).sum())
    return fn


def _day_pctl_count(which: str, q: float, above: bool):
    """Count of days whose daily min/max/mean is above/below the
    entity's own q-th percentile of that daily series."""
    def fn(v, d, p):
        _, _, dmax, dmin, _ = _daily(v, d, p)
        series = {"min": dmin, "max": dmax}.get(which)
        if series is None:
            series = _day_mean_tot(v, d, p)[0]
        thr = np.percentile(series, q)
        return int((series > thr).sum() if above else (series < thr).sum())
    return fn


def _compound(cold: bool, wet: bool):
    """CD/CW/WD/WW: days cold/warm (daily mean vs its median) x
    dry/wet (daily total vs its median)."""
    def fn(v, d, p):
        dmean, dtot = _day_mean_tot(v, d, p)
        med_mean = _pctl(dmean, 50.0, p)
        med_tot = _pctl(dtot, 50.0, p)
        t = (dmean < med_mean) if cold else (dmean >= med_mean)
        r = (dtot >= med_tot) if wet else (dtot < med_tot)
        return int((t & r).sum())
    return fn


register_index("txm", _txm)
register_index("tnm", _tnm)
register_index("txx", lambda v, d, p: float(_daily(v, d, p)[2].max()))
register_index("tnn", lambda v, d, p: float(_daily(v, d, p)[3].min()))
register_index("sd", _sd)
register_index("sd1", _sd_nn("sd1_thr"))
register_index("sd5cm", _sd_nn("sd5_thr"))
register_index("sd50cm", _sd_nn("sd50_thr"))
register_index("tn10p", _day_pctl_count("min", 10.0, above=False))
register_index("tn90p", _day_pctl_count("min", 90.0, above=True))
register_index("tx10p", _day_pctl_count("max", 10.0, above=False))
register_index("tg90p", _day_pctl_count("mean", 90.0, above=True))
register_index("r95p", lambda v, d, p: int((v > _pctl(v, 95.0, p)).sum()))
register_index("r99p", lambda v, d, p: int((v > _pctl(v, 99.0, p)).sum()))
register_index("cd", _compound(cold=True, wet=False))
register_index("cw", _compound(cold=True, wet=True))
register_index("wd", _compound(cold=False, wet=False))
register_index("ww", _compound(cold=False, wet=True))


def climate_indices(ds, entity_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", indices: list[str] | None = None,
                    order_tiebreak: str = "event_id", **params):
    """Evaluate the registered indices per entity in one bucketed pass.

    The shuffle carries only (entity, ts, tiebreak, value); within a
    bucket, each entity's series is sorted once and every index reads
    the same arrays."""
    p = dict(DEFAULTS)
    p.update(params)
    names = indices if indices is not None else index_names()
    missing = [n for n in names if n not in _INDEX_FUNCS]
    if missing:
        raise KeyError(f"unregistered indices {missing}; have {index_names()}")
    from ocgis_ray.sources.io import bucketed_group_apply

    slim = ds.select_columns([entity_col, ts_col, order_tiebreak, value_col])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([entity_col, ts_col, order_tiebreak], kind="mergesort")
        rows = []
        for ent, grp in g.groupby(entity_col, sort=False):
            v = grp[value_col].to_numpy(np.float64)
            d = grp[ts_col].to_numpy("datetime64[D]")
            rows.append([ent] + [_INDEX_FUNCS[n](v, d, p) for n in names])
        return pd.DataFrame(rows, columns=[entity_col] + list(names))

    return bucketed_group_apply(slim, entity_col, per_bucket)


def climate_indices_sql(table: str = "events", entity_col: str = "user_id",
                        ts_col: str = "ts", value_col: str = "value",
                        indices: list[str] | None = None,
                        order_tiebreak: str = "event_id", **params) -> str:
    """DuckDB twin of :func:`climate_indices` (same thresholds, same
    rounding, gaps-and-islands run lengths in the same order)."""
    p = dict(DEFAULTS)
    p.update(params)
    names = indices if indices is not None else index_names()
    unknown = [n for n in names if n not in _INDEX_FUNCS]
    if unknown:
        # mirror climate_indices: a typo'd name must not silently
        # drop a column from the parity comparison (or emit broken SQL)
        raise KeyError(f"unregistered indices {unknown}; have {index_names()}")
    e, t, v = entity_col, ts_col, value_col
    sel = []
    for n in names:
        if n == "tg":
            sel.append(f"round((sum(CAST(round({v} * 100.0) AS BIGINT)) / 100.0)"
                       f" / count(*), {ROUND}) AS tg")
        elif n == "tx":
            sel.append(f"max({v}) AS tx")
        elif n == "tn":
            sel.append(f"min({v}) AS tn")
        # count-valued indices: DuckDB's sum() over integers yields
        # HUGEINT (float64 through fetchdf) while the engine emits
        # int64 — CAST AS BIGINT so both sides agree on dtype (the
        # driver's value hash is dtype-sensitive; round-2 red row)
        elif n == "su":
            sel.append(f"CAST(sum(CASE WHEN {v} > {p['su_thr']!r} THEN 1 ELSE 0 END) AS BIGINT) AS su")
        elif n == "fd":
            sel.append(f"CAST(sum(CASE WHEN {v} < {p['fd_thr']!r} THEN 1 ELSE 0 END) AS BIGINT) AS fd")
        elif n == "tr":
            sel.append(f"CAST(sum(CASE WHEN {v} > {p['tr_thr']!r} THEN 1 ELSE 0 END) AS BIGINT) AS tr")
        elif n == "id_":
            sel.append(f"CAST(sum(CASE WHEN {v} < {p['id_thr']!r} THEN 1 ELSE 0 END) AS BIGINT) AS id_")
        elif n == "prcptot":
            sel.append(f"round(sum(CASE WHEN {v} >= {p['wet_thr']!r} THEN"
                       f" CAST(round({v} * 100.0) AS BIGINT) ELSE 0 END)"
                       f" / 100.0, {ROUND}) AS prcptot")
        elif n == "dtr":
            sel.append(f"round(day_rng_avg, {ROUND}) AS dtr")
        elif n == "r95ptot":
            sel.append(f"round(sum(CASE WHEN {v} > q95 THEN"
                       f" CAST(round({v} * 100.0) AS BIGINT) ELSE 0 END)"
                       f" / 100.0, {ROUND}) AS r95ptot")
        elif n == "tx90p":
            sel.append(f"CAST(sum(CASE WHEN {v} > q90 THEN 1 ELSE 0 END) AS BIGINT) AS tx90p")
        elif n == "fzth":
            sel.append("CAST(max(fzth_cnt) AS BIGINT) AS fzth")
        elif n in ("cdd", "cwd", "csu", "cfd"):
            # an entity with NO qualifying run is absent from the runs
            # CTE -> LEFT JOIN NULL; the engine's _max_run returns 0
            sel.append(f"coalesce(max(run_len_{n}), 0) AS {n}")
        elif n == "etr":
            sel.append(f"max({v}) - min({v}) AS etr")
        elif n == "hd17":
            hc = int(round(p["hd_thr"] * 100.0))
            sel.append(f"round(sum(greatest(0, {hc} - CAST(round({v} * 100.0)"
                       f" AS BIGINT))) / 100.0, {ROUND}) AS hd17")
        elif n == "gd4":
            gc = int(round(p["gd_thr"] * 100.0))
            sel.append(f"round(sum(greatest(0, CAST(round({v} * 100.0)"
                       f" AS BIGINT) - {gc})) / 100.0, {ROUND}) AS gd4")
        elif n == "rr1":
            sel.append(f"CAST(sum(CASE WHEN {v} >= {p['wet_thr']!r} THEN 1 ELSE 0 END) AS BIGINT) AS rr1")
        elif n == "sdii":
            sel.append(
                f"coalesce(round((sum(CASE WHEN {v} >= {p['wet_thr']!r} THEN"
                f" CAST(round({v} * 100.0) AS BIGINT) ELSE 0 END) / 100.0)"
                f" / nullif(sum(CASE WHEN {v} >= {p['wet_thr']!r} THEN 1"
                f" ELSE 0 END), 0), {ROUND}), 0.0) AS sdii")
        elif n == "vdtr":
            sel.append("max(vdtr_val) AS vdtr")
        elif n == "tg10p":
            sel.append(f"CAST(sum(CASE WHEN {v} < q10 THEN 1 ELSE 0 END) AS BIGINT) AS tg10p")
        elif n in ("wsdi", "csdi"):
            sel.append(f"CAST(coalesce(max(spell_{n}_tot), 0) AS BIGINT) AS {n}")
        elif n == "rx1day":
            sel.append(f"round(max(rx1_c) / 100.0, {ROUND}) AS rx1day")
        elif n == "rx5day":
            sel.append("max(rx5day_v) AS rx5day")
        elif n == "r10mm":
            sel.append("CAST(max(r10_cnt) AS BIGINT) AS r10mm")
        elif n == "r20mm":
            sel.append("CAST(max(r20_cnt) AS BIGINT) AS r20mm")
        elif n == "r99ptot":
            sel.append(f"round(sum(CASE WHEN {v} > q99 THEN"
                       f" CAST(round({v} * 100.0) AS BIGINT) ELSE 0 END)"
                       f" / 100.0, {ROUND}) AS r99ptot")
        elif n == "r75p":
            sel.append(f"CAST(sum(CASE WHEN {v} > q75 THEN 1 ELSE 0 END) AS BIGINT) AS r75p")
        elif n == "txn":
            sel.append("max(txn_v) AS txn")
        elif n == "tnx":
            sel.append("max(tnx_v) AS tnx")
        elif n == "r95p":
            sel.append(f"CAST(sum(CASE WHEN {v} > q95 THEN 1 ELSE 0 END) AS BIGINT) AS r95p")
        elif n == "r99p":
            sel.append(f"CAST(sum(CASE WHEN {v} > q99 THEN 1 ELSE 0 END) AS BIGINT) AS r99p")
        elif n in _DAYX_NAMES:
            sel.append(f"max({n}_v) AS {n}")
    run_cmp = {
        "cdd": f"{v} < {p['wet_thr']!r}",
        "cwd": f"{v} >= {p['wet_thr']!r}",
        "csu": f"{v} > {p['su_thr']!r}",
        "cfd": f"{v} < {p['fd_thr']!r}",
    }
    dayx_needed = [n for n in names if n in _DAYX_NAMES]
    if len(sel) != len(names):
        # registered engine-side indices without a SQL twin (user
        # plugins) must not silently vanish from the oracle columns
        missing = [n for n in names
                   if not any(f" AS {n}" in x or x.endswith(n) for x in sel)]
        raise KeyError(f"no SQL twin for registered indices {missing}; "
                       "omit them from `indices` for oracle generation")
    runs_needed = [n for n in names if n in run_cmp]
    runs_ctes = ""
    runs_joins = ""
    if "fzth" in names:
        flag = f"CASE WHEN {v} > {p['fzth_thr']!r} THEN 1 ELSE 0 END"
        runs_ctes += f""",
fz AS (
  SELECT {e}, sum(CASE WHEN prev IS NOT NULL AND flag != prev THEN 1 ELSE 0 END) AS fzth_cnt
  FROM (SELECT {e}, {flag} AS flag,
               lag({flag}) OVER (PARTITION BY {e} ORDER BY {t}, {order_tiebreak}) AS prev
        FROM {table})
  GROUP BY {e}
)"""
        runs_joins += f" LEFT JOIN fz USING ({e})"
    for n in runs_needed:
        cmp = run_cmp[n]
        runs_ctes += f""",
isl_{n} AS (
  SELECT {e}, flag,
         row_number() OVER (PARTITION BY {e} ORDER BY {t}, {order_tiebreak})
       - row_number() OVER (PARTITION BY {e}, flag ORDER BY {t}, {order_tiebreak}) AS grp
  FROM (SELECT {e}, {t}, {order_tiebreak}, CASE WHEN {cmp} THEN 1 ELSE 0 END AS flag FROM {table})
),
runs_{n} AS (
  SELECT {e}, coalesce(max(cnt), 0) AS run_len_{n}
  FROM (SELECT {e}, count(*) AS cnt FROM isl_{n} WHERE flag = 1 GROUP BY {e}, grp)
  GROUP BY {e}
)"""
        runs_joins += f" LEFT JOIN runs_{n} USING ({e})"
    spell_cmp = {"wsdi": f"{v} > q90", "csdi": f"{v} < q10"}
    for n in (x for x in names if x in spell_cmp):
        runs_ctes += f""",
isl_{n} AS (
  SELECT {e}, flag,
         row_number() OVER (PARTITION BY {e} ORDER BY {t}, {order_tiebreak})
       - row_number() OVER (PARTITION BY {e}, flag ORDER BY {t}, {order_tiebreak}) AS grp
  FROM (SELECT {e}, {t}, {order_tiebreak},
               CASE WHEN {spell_cmp[n]} THEN 1 ELSE 0 END AS flag FROM base)
),
spell_{n} AS (
  SELECT {e}, sum(CASE WHEN cnt >= {p['spell_min']} THEN cnt ELSE 0 END) AS spell_{n}_tot
  FROM (SELECT {e}, count(*) AS cnt FROM isl_{n} WHERE flag = 1 GROUP BY {e}, grp)
  GROUP BY {e}
)"""
        runs_joins += f" LEFT JOIN spell_{n} USING ({e})"
    if "rx5day" in names:
        # calendar-5-day windows anchored at each PRESENT day: the
        # integer-day RANGE frame sums present days in [d-4, d]
        # (missing days contribute 0 on both sides)
        runs_ctes += f""",
rx5 AS (
  SELECT {e}, round(max(win_c) / 100.0, {ROUND}) AS rx5day_v
  FROM (SELECT {e},
               sum(sum_c) OVER (PARTITION BY {e} ORDER BY dayi
                                RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS win_c
        FROM (SELECT {e}, datediff('day', DATE '1970-01-01', day) AS dayi,
                     sum_c FROM days))
  GROUP BY {e}
)"""
        runs_joins += f" LEFT JOIN rx5 USING ({e})"
    if "vdtr" in names:
        runs_ctes += f""",
vd AS (
  SELECT {e},
         coalesce(round((sum(abs(rng_c - prev)) / 100.0)
                        / nullif(count(prev), 0), {ROUND}), 0.0) AS vdtr_val
  FROM (SELECT {e}, rng_c,
               lag(rng_c) OVER (PARTITION BY {e} ORDER BY day) AS prev
        FROM days)
  GROUP BY {e}
)"""
        runs_joins += f" LEFT JOIN vd USING ({e})"
    if dayx_needed:
        # per-entity scalars over the DAILY series: own-base quantiles
        # first (dayq), then one counting/averaging pass (dayx).
        # (sum_c / 100.0) / dcnt and sum_c / 100.0 are the exact IEEE
        # ops the engine's _day_mean_tot performs on the same int64s.
        sd1c = int(round(p["sd1_thr"] * 100.0))
        sd5c = int(round(p["sd5_thr"] * 100.0))
        sd50c = int(round(p["sd50_thr"] * 100.0))
        dayx_cols = {
            "txm": f"round((sum(dmax_c) / 100.0) / count(*), {ROUND}) AS txm_v",
            "tnm": f"round((sum(dmin_c) / 100.0) / count(*), {ROUND}) AS tnm_v",
            "txx": "max(dmax) AS txx_v",
            "tnn": "min(dmin) AS tnn_v",
            "sd": f"round((sum(sum_c) / 100.0) / count(*), {ROUND}) AS sd_v",
            "sd1": f"CAST(sum(CASE WHEN sum_c >= {sd1c} THEN 1 ELSE 0 END) AS BIGINT) AS sd1_v",
            "sd5cm": f"CAST(sum(CASE WHEN sum_c >= {sd5c} THEN 1 ELSE 0 END) AS BIGINT) AS sd5cm_v",
            "sd50cm": f"CAST(sum(CASE WHEN sum_c >= {sd50c} THEN 1 ELSE 0 END) AS BIGINT) AS sd50cm_v",
            "tn10p": "CAST(sum(CASE WHEN dmin < dq10_min THEN 1 ELSE 0 END) AS BIGINT) AS tn10p_v",
            "tn90p": "CAST(sum(CASE WHEN dmin > dq90_min THEN 1 ELSE 0 END) AS BIGINT) AS tn90p_v",
            "tx10p": "CAST(sum(CASE WHEN dmax < dq10_max THEN 1 ELSE 0 END) AS BIGINT) AS tx10p_v",
            "tg90p": "CAST(sum(CASE WHEN (sum_c / 100.0) / dcnt > dq90_mean THEN 1 ELSE 0 END) AS BIGINT) AS tg90p_v",
            "cd": "CAST(sum(CASE WHEN (sum_c / 100.0) / dcnt < dmed_mean AND sum_c / 100.0 < dmed_tot THEN 1 ELSE 0 END) AS BIGINT) AS cd_v",
            "cw": "CAST(sum(CASE WHEN (sum_c / 100.0) / dcnt < dmed_mean AND sum_c / 100.0 >= dmed_tot THEN 1 ELSE 0 END) AS BIGINT) AS cw_v",
            "wd": "CAST(sum(CASE WHEN (sum_c / 100.0) / dcnt >= dmed_mean AND sum_c / 100.0 < dmed_tot THEN 1 ELSE 0 END) AS BIGINT) AS wd_v",
            "ww": "CAST(sum(CASE WHEN (sum_c / 100.0) / dcnt >= dmed_mean AND sum_c / 100.0 >= dmed_tot THEN 1 ELSE 0 END) AS BIGINT) AS ww_v",
        }
        picked = ",\n         ".join(dayx_cols[n] for n in dayx_needed)
        runs_ctes += f""",
dayq AS (
  SELECT {e},
         quantile_cont(dmin, 0.10) AS dq10_min,
         quantile_cont(dmin, 0.90) AS dq90_min,
         quantile_cont(dmax, 0.10) AS dq10_max,
         quantile_cont((sum_c / 100.0) / dcnt, 0.90) AS dq90_mean,
         quantile_cont((sum_c / 100.0) / dcnt, 0.50) AS dmed_mean,
         quantile_cont(sum_c / 100.0, 0.50) AS dmed_tot
  FROM days GROUP BY {e}
),
dayx AS (
  SELECT days.{e} AS {e},
         {picked}
  FROM days JOIN dayq USING ({e}) GROUP BY days.{e}
)"""
        runs_joins += f" LEFT JOIN dayx USING ({e})"
    group_extra = "".join(f", run_len_{n}" for n in runs_needed)
    group_extra += "".join(f", spell_{n}_tot" for n in names if n in spell_cmp)
    if "fzth" in names:
        group_extra += ", fzth_cnt"
    if "dtr" in names:
        group_extra += ", day_rng_avg"
    if "vdtr" in names:
        group_extra += ", vdtr_val"
    if "rx1day" in names:
        group_extra += ", rx1_c"
    if "rx5day" in names:
        group_extra += ", rx5day_v"
    if "r10mm" in names:
        group_extra += ", r10_cnt"
    if "r20mm" in names:
        group_extra += ", r20_cnt"
    if "txn" in names:
        group_extra += ", txn_v"
    if "tnx" in names:
        group_extra += ", tnx_v"
    group_extra += "".join(f", {n}_v" for n in dayx_needed)
    r10c = int(round(p["r10_thr"] * 100.0))
    r20c = int(round(p["r20_thr"] * 100.0))
    base = f"""
WITH base AS (
  SELECT {e}, {t}, {order_tiebreak}, {v},
         CAST({t} AS DATE) AS day,
         quantile_cont({v}, 0.95) OVER (PARTITION BY {e}) AS q95,
         quantile_cont({v}, 0.90) OVER (PARTITION BY {e}) AS q90,
         quantile_cont({v}, 0.10) OVER (PARTITION BY {e}) AS q10,
         quantile_cont({v}, 0.99) OVER (PARTITION BY {e}) AS q99,
         quantile_cont({v}, 0.75) OVER (PARTITION BY {e}) AS q75
  FROM {table}
),
days AS (
  SELECT {e}, day, CAST(round((max({v}) - min({v})) * 100.0) AS BIGINT) AS rng_c,
         sum(CAST(round({v} * 100.0) AS BIGINT)) AS sum_c,
         max({v}) AS dmax, min({v}) AS dmin,
         CAST(round(max({v}) * 100.0) AS BIGINT) AS dmax_c,
         CAST(round(min({v}) * 100.0) AS BIGINT) AS dmin_c,
         count(*) AS dcnt
  FROM base GROUP BY {e}, day
),
day_stats AS (
  SELECT {e}, (sum(rng_c) / 100.0) / count(*) AS day_rng_avg,
         max(sum_c) AS rx1_c, min(dmax) AS txn_v, max(dmin) AS tnx_v,
         sum(CASE WHEN sum_c >= {r10c} THEN 1 ELSE 0 END) AS r10_cnt,
         sum(CASE WHEN sum_c >= {r20c} THEN 1 ELSE 0 END) AS r20_cnt
  FROM days GROUP BY {e}
){runs_ctes}
SELECT b.{e} AS {e}, {", ".join(sel)}
FROM base b LEFT JOIN day_stats USING ({e}){runs_joins}
GROUP BY b.{e}{group_extra}
ORDER BY b.{e}
"""
    return base
