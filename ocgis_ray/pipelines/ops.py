"""Declarative operations front end — the ``OcgOperations`` analog.

The reference's primary user API is a single declarative call
(``/root/reference/src/ocgis/ops/core.py``: dataset + selection
geometry + temporal subsets + calculations + output format, validated
parameters, then ``execute()``).  ``OcgRayOperations`` offers the same
shape over the Ray engine: a user of the reference maps their call
onto this one-to-one:

    ocgis.OcgOperations(dataset=rd, geom='state_boundaries',
                        select_ugid=[25], calc=[{'func': 'mean', ...}],
                        calc_grouping=['month'], spatial_operation='clip',
                        aggregate=True, output_format='csv').execute()

    OcgRayOperations(sf_dir, geom='us_states48', select_ugid=[25],
                     calc=[{'func': 'mean', 'field': 'n_chars',
                            'name': 'mean_chars'}],
                     calc_grouping=('month',), spatial_operation='clip',
                     aggregate=True, output_format='pandas').execute()

Validation happens eagerly in ``__init__`` (the AbstractParameter
analog); ``execute()`` composes the stage pipeline lazily and only
consumes per the output format.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

_CALC_FUNCS = {"mean", "min", "max", "sum", "count", "std", "median",
               "wmean"}
_SPATIAL_OPS = {"intersects", "clip"}
_OUTPUT_FORMATS = {"dataset", "pandas", "parquet", "csv", "geojson",
                   "csv-shp"}
_GROUPINGS = {"year", "month", "day", "hour", "season"}


@dataclass
class OcgRayOperations:
    """Declarative pipeline spec over the pages table.

    Parameters mirror the reference's (``ops/parms/definition.py``):

    - ``sf_dir``: data root (the RequestDataset uri analog)
    - ``geom``: cabinet layer name (GeomCabinet key analog)
    - ``select_ugid``: restrict the selection geometries by ugid
    - ``select_name``: restrict by geometry name (the
      ``geom_select_sql_where`` attribute-filter analog,
      ``ops/parms/definition.py``); composes with ``select_ugid``
    - ``spatial_operation``: 'intersects' (subset) | 'clip' (for point
      data clip == intersects; retained for call parity)
    - ``aggregate``: True -> one rollup row per selection geometry
      (spatial aggregation analog); False -> per-(ugid, tile) rollup
      when ``calc`` given, else the joined rows
    - ``agg_selection``: True -> dissolve ALL selection geometries
      into one (the reference's ``agg_selection``,
      ``ops/parms/definition.py``): rows matching ANY geometry are
      kept ONCE (semi join, no per-ugid duplication) under ugid 0
    - ``time_range`` / ``time_region``: temporal subsets
    - ``calc``: list of {'func', 'field', 'name'} (calculation library)
    - ``calc_grouping``: temporal group keys ('year','month',...,'season')
    - ``spatial_reorder``: True -> row output ordered by ascending
      longitude from ``-180`` (the reference's ``spatial_reorder``
      parameter, ``ops/engine.py:561-570`` driving ``Grid.reorder``).
      Row outputs only — grouped calcs are order-free; requesting both
      raises, matching the reference's constraint that reorder applies
      to field data
    - ``output_format``: dataset | pandas | parquet | csv
    - ``prefix`` / ``output_dir``: sink naming for file formats
    """

    sf_dir: str
    geom: str | None = None
    select_ugid: list[int] | None = None
    select_name: list[str] | None = None
    spatial_operation: str = "intersects"
    aggregate: bool = False
    agg_selection: bool = False
    time_range: tuple[str, str] | None = None
    time_region: dict[str, list[int]] | None = None
    #: first-temporal-slice switch (the reference's ``snippet``,
    #: ``ops/parms/definition.py:1198``): keep the earliest row per
    #: selection geometry (per ugid; one global row without a geom),
    #: deterministic page_id tiebreak.  Row outputs only.
    snippet: bool = False
    calc: list[dict[str, Any]] | None = None
    calc_grouping: tuple[str, ...] = ()
    spatial_reorder: bool = False
    #: destination points for regridding — DataFrame(target_id, lon,
    #: lat), the reference's ``regrid_destination``
    #: (``ops/parms/definition.py:1015-1067``); the result is the
    #: per-target interpolated mean field of the (single) calc field
    #: over the subset rows
    regrid_destination: Any = None
    #: ``{'regrid_method': 'auto'|'bilinear'|'nearest_stod'|'patch',
    #: 'res': <grid res>}`` — the ``regrid_options`` analog
    #: (definition.py:1069-1101: unknown keys raise).  'auto' picks
    #: bilinear (point destinations carry no bounds; the reference's
    #: auto picks conservative only when bounds exist — polygon-
    #: destination conservative regridding lives in stages/regrid)
    regrid_options: dict | None = None
    output_format: str = "dataset"
    prefix: str = "ocgis_ray_output"
    output_dir: str = "/tmp/ocgis_ray"
    reps: int = 4
    #: progress hook ``fn(fraction, message)`` — the reference's
    #: callback parameter (``ops/parms/definition.py:103-117``)
    callback: Any = None

    def __post_init__(self) -> None:
        if self.spatial_operation not in _SPATIAL_OPS:
            raise ValueError(f"spatial_operation must be one of {_SPATIAL_OPS}")
        if self.snippet and (self.calc or self.aggregate):
            raise ValueError(
                "snippet returns the first time slice of ROW output; "
                "it cannot combine with calc/aggregate (the reference "
                "applies snippet before calculations are requested)")
        if self.spatial_reorder and (self.calc or self.aggregate):
            raise ValueError(
                "spatial_reorder orders ROW output; it has no effect "
                "on grouped calc/aggregate results — drop one")
        if self.output_format not in _OUTPUT_FORMATS:
            raise ValueError(f"output_format must be one of {_OUTPUT_FORMATS}")
        month_groups = [g for g in self.calc_grouping
                        if isinstance(g, (tuple, list))]
        if month_groups:
            from ocgis_ray.stages.temporal import _month_group_lut

            _month_group_lut(month_groups)  # validates months/overlap
            if "season" in self.calc_grouping:
                raise ValueError(
                    "custom month groups replace the named 'season' "
                    "grouping — pass one or the other")
        for g in self.calc_grouping:
            if isinstance(g, (tuple, list)):
                continue  # custom month group, validated above
            if g not in _GROUPINGS:
                raise ValueError(f"unknown calc_grouping {g!r}; have {_GROUPINGS}")
        for c in self.calc or []:
            if c.get("func") not in _CALC_FUNCS:
                # registered series indices (the library_icclim-through-
                # calc path of the reference) are valid calc funcs too
                from ocgis_ray.functions.climate import index_names

                if c.get("func") not in index_names():
                    raise ValueError(
                        f"unknown calc func {c.get('func')!r} (not a "
                        f"builtin {sorted(_CALC_FUNCS)} or registered "
                        f"index {index_names()})")
            if "field" not in c:
                raise ValueError("calc entries need a 'field'")
            if c.get("func") == "wmean" and "weight" not in c:
                raise ValueError(
                    "calc func 'wmean' needs a 'weight' field (the "
                    "reference's weighted spatial mean, "
                    "variable/geom.py:870-1075)")
        if self.geom is not None:
            from ocgis_ray.sources import cabinet

            if self.geom not in cabinet.layer_names():
                raise ValueError(
                    f"unknown geom {self.geom!r}; have {cabinet.layer_names()}"
                )
        if self.regrid_options is not None and self.regrid_destination is None:
            raise ValueError("regrid_options without regrid_destination")
        if self.regrid_destination is not None:
            opts = dict(self.regrid_options or {})
            allowed = {"regrid_method", "res"}
            unknown = set(opts) - allowed
            if unknown:
                # the reference raises on unknown regrid_options keys
                # (definition.py:1077-1081)
                raise ValueError(f"regrid_options keys {sorted(unknown)} "
                                 f"not allowed; have {sorted(allowed)}")
            method = opts.get("regrid_method", "auto")
            if method not in ("auto", "bilinear", "nearest_stod", "patch"):
                raise ValueError(
                    f"unknown regrid_method {method!r} (auto|bilinear|"
                    "nearest_stod|patch; conservative needs polygon "
                    "destinations — use stages.regrid directly)")
            cols = set(getattr(self.regrid_destination, "columns", ()))
            if not {"target_id", "lon", "lat"} <= cols:
                raise ValueError("regrid_destination needs columns "
                                 "target_id, lon, lat")
            if self.aggregate or self.calc_grouping:
                raise ValueError(
                    "regrid_destination produces the destination-grid "
                    "field; combine it with a single calc 'field' (or "
                    "none for n_chars), not aggregate/calc_grouping")
            if self.calc and len(self.calc) > 1:
                raise ValueError("regrid_destination takes at most one "
                                 "calc entry (the value field)")

    # -- pipeline assembly -------------------------------------------

    def _dataset(self):
        from ocgis_ray.sources.pages import pages_dataset
        from ocgis_ray.stages import temporal
        from ocgis_ray.stages.geocode import geocode

        ds = pages_dataset(self.sf_dir, reps=self.reps).drop_columns(["html"])
        if self.time_range is not None:
            ds = temporal.time_range_filter(ds, "warc_ts", *self.time_range)
        if self.time_region is not None:
            ds = temporal.time_region_filter(ds, "warc_ts", self.time_region)
        ds = geocode(ds)
        if self.geom is not None:
            from ocgis_ray.stages.spatial_join import spatial_join

            polys = self._selection_polys()
            # for point data, clip == intersects (SURVEY §2.2)
            if self.agg_selection:
                from ocgis_ray.stages.spatial_join import semi_join_tagged

                ds = semi_join_tagged(ds, polys, ugid_out=0, concurrency=2)
            else:
                ds = spatial_join(ds, polys, how="inner", concurrency=2)
        if self.calc_grouping:
            month_groups = [g for g in self.calc_grouping
                            if isinstance(g, (tuple, list))]
            parts = tuple(g for g in self.calc_grouping
                          if not isinstance(g, (tuple, list)) and g != "season")
            if parts:
                ds = temporal.add_time_parts(ds, "warc_ts", parts=parts)
            if "season" in self.calc_grouping:
                ds = temporal.add_season(ds, "warc_ts")
            elif month_groups:
                # arbitrary month-group seasons (the reference's
                # calc_grouping=[[12,1,2],...]); out-of-group rows drop
                ds = temporal.add_month_groups(ds, "warc_ts", month_groups)
        return ds

    def _selection_polys(self):
        """The selection geometries after select_ugid / select_name
        filtering (shared by the join stage and the vector sinks)."""
        from ocgis_ray.sources import cabinet

        polys = cabinet.layer(self.geom)
        if self.select_ugid is not None:
            polys = [p for p in polys if p.ugid in self.select_ugid]
            if not polys:
                raise ValueError("select_ugid matched no geometries")
        if self.select_name is not None:
            wanted = set(self.select_name)
            polys = [p for p in polys if p.name in wanted]
            if not polys:
                raise ValueError("select_name matched no geometries")
        return polys

    def _group_keys(self) -> list[str]:
        keys: list[str] = []
        if self.geom is not None:
            keys.append("ugid")
        if not self.aggregate:
            keys.append("cell_r8")
        for g in self.calc_grouping:
            if isinstance(g, (tuple, list)):
                if "season" not in keys:  # all month groups -> one col
                    keys.append("season")
            else:
                keys.append(g)
        return keys

    def _progress(self, frac: float, msg: str) -> None:
        if self.callback is not None:
            self.callback(frac, msg)

    def execute(self):
        """Run the pipeline; return type follows ``output_format``."""
        self._progress(0.0, "assembling pipeline")
        ds = self._dataset()
        self._progress(0.3, "dataset assembled")
        if self.regrid_destination is not None:
            result = self._regrid(ds)
            self._progress(0.7, "regrid composed; converting output")
            out = self._convert(result)
            self._progress(1.0, "complete")
            return out
        if self.calc:
            # ALL calc entries compile into ONE bucketed group-apply —
            # one shuffle, one pass, whatever the calc list length (the
            # reference's engine also runs its calc library per group
            # in one sweep, ops/engine.py).  Only the group keys and
            # referenced fields cross the shuffle.
            import numpy as np
            import pandas as pd

            from ocgis_ray.parity import sql_round
            from ocgis_ray.sources.io import bucketed_group_apply

            keys = self._group_keys()
            # no geom, no grouping: ONE global rollup row (a constant
            # group key — not per-rep rows, which nobody asked for)
            global_rollup = not keys
            if global_rollup:
                keys = ["_all"]
            specs = [
                (c["func"], c["field"],
                 c.get("name", f"{c['func']}_{c['field']}"),
                 c.get("weight"))
                for c in self.calc
            ]
            fields = sorted({f for _, f, _, _ in specs}
                            | {w for _, _, _, w in specs if w})
            from ocgis_ray.functions.climate import (DEFAULTS as _IDX_DEFAULTS,
                                                     _INDEX_FUNCS)

            has_index = any(f in _INDEX_FUNCS for f, _, _, _ in specs)
            need = {k for k in keys if k != "_all"} | set(fields)
            if has_index:
                need |= {"warc_ts", "page_id"}  # ordered-series indices
            slim = ds.select_columns(sorted(need))
            if global_rollup:
                import pyarrow as _pa

                slim = slim.map_batches(
                    lambda t: t.append_column(
                        "_all", _pa.array(np.zeros(t.num_rows, np.int8))),
                    batch_format="pyarrow", zero_copy_batch=True)

            def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
                gb = g.groupby(keys, sort=False)
                gb_ordered = None
                if has_index:
                    g2 = g.sort_values(keys + ["warc_ts", "page_id"],
                                       kind="mergesort")
                    gb_ordered = g2.groupby(keys, sort=False)
                cols = {}
                for func, fld, name, weight in specs:
                    if func == "wmean":
                        # weighted mean sum(w*x)/sum(w): integer-valued
                        # float sums are exact, so the 6-decimal round
                        # matches the SQL twin regardless of sum order
                        s = gb.apply(lambda grp: float(sql_round(
                            (grp[fld].to_numpy(np.float64)
                             * grp[weight].to_numpy(np.float64)).sum()
                            / grp[weight].to_numpy(np.float64).sum(), 6)))
                    elif func in _INDEX_FUNCS:
                        fn = _INDEX_FUNCS[func]
                        s = gb_ordered.apply(
                            lambda grp: fn(
                                grp[fld].to_numpy(np.float64),
                                grp["warc_ts"].to_numpy("datetime64[D]"),
                                _IDX_DEFAULTS))
                    elif func == "count":
                        # count(field): non-null count, matching the
                        # oracle/grouped_aggregate 'count' semantics
                        s = gb[fld].count()
                    elif func == "median":
                        s = gb[fld].median().map(lambda v: float(sql_round(v, 4)))
                    elif func in ("mean", "std"):
                        s = getattr(gb[fld], func)()
                        s = s.map(lambda v: float(sql_round(v, 4)))
                    else:
                        s = getattr(gb[fld], func)()
                    cols[name] = s
                return pd.DataFrame(cols).reset_index()

            result = bucketed_group_apply(slim, keys, per_bucket)
            if global_rollup:
                result = result.drop_columns(["_all"])
        elif self.aggregate and self.geom is not None:
            from ocgis_ray.stages.tiles import grouped_aggregate

            result = grouped_aggregate(
                ds, ["ugid"],
                {"n_pages": (None, "count"), "sum_chars": ("n_chars", "sum")},
            )
        elif self.aggregate:
            raise ValueError(
                "aggregate=True needs a geom (spatial rollup) or a "
                "calc list (what to aggregate) — plain rows would be "
                "returned unaggregated otherwise")
        else:
            result = ds
            if self.snippet:
                import pandas as pd

                from ocgis_ray.sources.io import bucketed_group_apply

                key = "ugid" if self.geom is not None else None

                def first_rows(g: pd.DataFrame) -> pd.DataFrame:
                    g = g.sort_values(["warc_ts", "page_id"],
                                      kind="mergesort")
                    return (g.drop_duplicates("ugid", keep="first")
                            if key else g.head(1))

                if key:
                    part = bucketed_group_apply(result, [key], first_rows)
                    pdf = part.to_pandas().sort_values(
                        ["warc_ts", "page_id"]).drop_duplicates("ugid")
                else:
                    # global first slice: per-block head via the same
                    # group-apply on a constant key, tiny final reduce
                    import pyarrow as _pa

                    keyed = result.map_batches(
                        lambda t: t.append_column(
                            "_one", _pa.array([0] * t.num_rows,
                                              _pa.int8())),
                        batch_format="pyarrow", zero_copy_batch=True)
                    part = bucketed_group_apply(keyed, ["_one"],
                                                lambda g: g.sort_values(
                                                    ["warc_ts", "page_id"])
                                                .head(1))
                    pdf = part.to_pandas().sort_values(
                        ["warc_ts", "page_id"]).head(1)
                    pdf = pdf.drop(columns=["_one"])
                import ray.data as rd

                result = rd.from_pandas(pdf.reset_index(drop=True))
            if self.spatial_reorder:
                from ocgis_ray.stages.reorder import spatial_reorder

                result = spatial_reorder(result, order="lon")
        self._progress(0.7, "pipeline composed; converting output")
        out = self._convert(result)
        self._progress(1.0, "complete")
        return out

    def _regrid(self, ds):
        """Destination-point regrid: per-cell mean field of the value
        column over the (already subset) rows -> weight generation by
        the chosen method -> sparse apply.  The RegridOperation analog
        (``regrid/base.py``) for point destinations."""
        import numpy as np
        import pyarrow as pa

        from ocgis_ray import grid
        from ocgis_ray.stages.regrid import (apply_weights, bilinear_weights,
                                             nearest_stod_weights,
                                             patch_weights)
        from ocgis_ray.stages.tiles import grouped_aggregate

        opts = dict(self.regrid_options or {})
        method = opts.get("regrid_method", "auto")
        if method == "auto":
            method = "bilinear"
        res = int(opts.get("res", 6))
        value_col = self.calc[0]["field"] if self.calc else "n_chars"
        out_name = (self.calc[0].get("name", value_col)
                    if self.calc else value_col)

        def add_cell(t: pa.Table) -> pa.Table:
            cell = grid.encode(t["lon"].to_numpy(zero_copy_only=False),
                               t["lat"].to_numpy(zero_copy_only=False), res)
            return t.append_column("_rg_cell", pa.array(cell))

        cells = grouped_aggregate(
            ds.select_columns(["lon", "lat", value_col]).map_batches(
                add_cell, batch_format="pyarrow", zero_copy_batch=True),
            "_rg_cell", {"_s": (value_col, "sum"), "_n": (None, "count")})

        def mean_field(t: pa.Table) -> pa.Table:
            return pa.table({"_rg_cell": t["_rg_cell"], "_v": pa.array(
                t["_s"].to_numpy(zero_copy_only=False).astype(np.float64)
                / t["_n"].to_numpy(zero_copy_only=False))})

        field = cells.map_batches(mean_field, batch_format="pyarrow",
                                  zero_copy_batch=True)
        gen = {"bilinear": bilinear_weights,
               "nearest_stod": nearest_stod_weights,
               "patch": patch_weights}[method]
        w = gen(self.regrid_destination[["target_id", "lon", "lat"]], res)
        out = apply_weights(field, w, src_col="_rg_cell", value_col="_v",
                            out_col=out_name)
        return out.map_batches(
            lambda t: t.rename_columns(
                ["target_id" if c == "dst" else c for c in t.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)

    def _convert(self, result):
        import os

        if self.output_format == "dataset":
            return result
        if self.output_format == "pandas":
            return result.to_pandas()
        out = os.path.join(self.output_dir, self.prefix)
        os.makedirs(self.output_dir, exist_ok=True)
        if self.output_format == "parquet":
            result.write_parquet(out)
        elif self.output_format == "geojson":
            return self._write_geojson(result, out + ".geojson")
        elif self.output_format == "csv-shp":
            return self._write_csv_shp(result, out)
        else:
            result.write_csv(out)
        return out

    def _write_geojson(self, result, path: str) -> str:
        """Vector output (reference ``GeoJsonConverter``): aggregate
        results become the SELECTION polygons with the computed values
        as feature properties (requires one row per ugid — grouped
        results would duplicate geometry per group row; the reference's
        melted csv-shp is the format for those); row results become
        streamed POINT features."""
        from ocgis_ray.sources.geojson import (write_geojson,
                                               write_geojson_points)

        cols = set(result.schema().names)
        if self.geom is not None and "ugid" in cols and "lon" not in cols:
            pdf = result.to_pandas()
            if pdf["ugid"].duplicated().any():
                raise ValueError(
                    "geojson output needs one row per ugid (aggregate "
                    "without calc_grouping); grouped rows melt into "
                    "csv-shp instead")
            def jsonable(v):
                if hasattr(v, "isoformat"):  # Timestamp/datetime columns
                    return v.isoformat()
                return v.item() if hasattr(v, "item") else v

            extra = {
                int(r["ugid"]): {k: jsonable(v)
                                 for k, v in r.items() if k != "ugid"}
                for _, r in pdf.iterrows()
            }
            polys = [p for p in self._selection_polys()
                     if int(p.ugid) in extra]
            return write_geojson(polys, path, extra_props=extra)
        if "lon" not in cols or "lat" not in cols:
            raise ValueError(
                "geojson row output needs lon/lat columns (point "
                "features); this result has neither geometry nor points")
        return write_geojson_points(result, path)

    def _write_csv_shp(self, result, out_base: str) -> str:
        """The reference's ``csv-shp`` combo (``conv/csv_.py``
        CsvShapefileConverter): the tabular result as CSV plus the
        selection geometries as a UGID-linked ESRI shapefile — the
        melted format for grouped/calc outputs."""
        from ocgis_ray.sources.geojson import write_shapefile

        if self.geom is None:
            raise ValueError("csv-shp needs a selection geometry (geom=)")
        result.write_csv(out_base)
        write_shapefile(self._selection_polys(), out_base + "_gid.shp")
        return out_base
