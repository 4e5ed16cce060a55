"""As-of (temporal nearest-before) join.

Not in the reference (its only join is spatial — SURVEY §2.4), but a
required custom-operator shape for event pipelines (build brief:
"as-of join, range join, windowed aggregate").  Implementation is the
broadcast pattern: the (small) reference series ships once via
``ray.put`` sorted by (key, ts); each batch resolves matches with one
``np.searchsorted`` per key — vectorized, no shuffle.  For two LARGE
sides the same kernel runs per key-bucket after a hash partition
(``io.bucketed_group_apply`` + ``pd.merge_asof``) — same dataflow, the
build side stops being broadcastable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class AsofStage:
    """Actor: attach the latest series row with ``series.on <= row.on``
    (within the same ``by`` key if given); no match -> nulls."""

    def __init__(self, series_ref, on: str, by: str | None):
        import ray

        p = ray.get(series_ref) if not isinstance(series_ref, dict) else series_ref
        self.on_col = on
        self.by_col = by
        self.on = p["on"]
        self.by = p["by"]
        self.values = p["values"]
        if self.by is not None:
            keys, starts = np.unique(self.by, return_index=True)
            order = np.argsort(starts)
            bounds = np.append(starts[order], len(self.by))
            self.key_slices = {
                k: (bounds[i], bounds[i + 1]) for i, k in enumerate(keys[order])
            }

    def __call__(self, t: pa.Table) -> pa.Table:
        ts = (
            t[self.on_col].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        n = len(ts)
        out_idx = np.full(n, -1, dtype=np.int64)
        if self.by is None:
            out_idx = np.searchsorted(self.on, ts, side="right") - 1
        else:
            bvals = t[self.by_col].to_numpy(zero_copy_only=False)
            for k in pd.unique(bvals):
                sl = self.key_slices.get(k)
                if sl is None:
                    continue
                lo, hi = sl
                m = bvals == k
                pos = np.searchsorted(self.on[lo:hi], ts[m], side="right") - 1
                out_idx[m] = np.where(pos >= 0, pos + lo, -1)
        valid = out_idx >= 0
        for c, vals in self.values.items():
            col = np.where(valid, vals[np.maximum(out_idx, 0)].astype(np.float64), np.nan)
            t = t.append_column(c, pa.array(col, from_pandas=True))
        return t


def asof_join(ds, series: pd.DataFrame, on: str = "ts", by: str | None = None,
              value_cols: list[str] | None = None, concurrency=None):
    """Broadcast as-of join of ``ds`` against a small sorted series.

    ``series`` columns: ``[by?, on, *value_cols]`` (numeric values).
    Rows with no series point at-or-before get null values (filter for
    SQL-ASOF-inner parity)."""
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    import ray

    value_cols = value_cols or [c for c in series.columns if c not in (on, by)]
    sort_cols = ([by] if by else []) + [on]
    series = series.sort_values(sort_cols).reset_index(drop=True)
    ref = ray.put({
        "on": series[on].to_numpy(dtype="datetime64[us]").astype(np.int64),
        "by": series[by].to_numpy() if by else None,
        "values": {c: series[c].to_numpy() for c in value_cols},
    })
    return ds.map_batches(
        AsofStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"series_ref": ref, "on": on, "by": by},
    )
