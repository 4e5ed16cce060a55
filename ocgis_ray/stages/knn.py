"""kNN: nearest pages to query points by great-circle distance.

Generalizes the reference's 1-NN ``select_nearest``/``get_nearest``
(``/root/reference/src/ocgis/variable/geom.py:803-821``,
``spatial/spatial_subset.py:152-155``) to top-k per query, two ways:

- :func:`knn_bruteforce` — the exact baseline: broadcast query matrix,
  per-batch vectorized haversine (Q x B), **partial top-k per batch**
  (each batch emits at most Q*k candidate rows), tiny final combine.
  The shuffle moves k rows per (query, batch), never pages.
- :func:`knn_cells` — the scale path: expanding cell-ring gather
  (``grid.disk``, the ``h3.grid_disk`` analog) prefilters pages to
  cells near each query before the exact refine; falls back to wider
  rings until k candidates exist.  Same results as brute force
  (verified in tests) at a fraction of the distance evaluations.

Ranking is by (distance, page_id) so ties are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray import grid
from ocgis_ray.geometry import haversine_km


class _BruteForceStage:
    """Actor: per batch, haversine to all queries, emit local top-k."""

    def __init__(self, queries_ref, k: int, id_col: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, dict) else queries_ref
        self.qid = q["query_id"]
        self.qlon = q["lon"]
        self.qlat = q["lat"]
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        if len(lon) == 0:
            return _empty_knn(self.id_col)
        # (Q, B) distance matrix — vectorized numpy broadcast
        d = haversine_km(
            self.qlon[:, None], self.qlat[:, None], lon[None, :], lat[None, :]
        )
        k = min(self.k, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qid, k)
        rows_id = ids[part.ravel()]
        rows_d = np.take_along_axis(d, part, axis=1).ravel()
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                self.id_col: pa.array(rows_id),
                "dist_km": pa.array(rows_d),
            }
        )


def _empty_knn(id_col: str) -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            id_col: pa.array([], type=pa.int64()),
            "dist_km": pa.array([], type=pa.float64()),
        }
    )


def _final_topk(k: int, id_col: str):
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist_km", id_col]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return per_group


def knn_bruteforce(ds, queries: pd.DataFrame, k: int, id_col: str = "page_id",
                   concurrency: int | None = 4, batch_size: int = 16384):
    """Exact top-k per query.  ``queries``: DataFrame with columns
    (query_id, lon, lat) — small, broadcast once via ``ray.put``."""
    import ray

    q = {
        "query_id": queries["query_id"].to_numpy(dtype=np.int64),
        "lon": queries["lon"].to_numpy(dtype=np.float64),
        "lat": queries["lat"].to_numpy(dtype=np.float64),
    }
    qref = ray.put(q)
    partial = ds.map_batches(
        _BruteForceStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "id_col": id_col},
    )
    return partial.groupby("query_id").map_groups(
        _final_topk(k, id_col), batch_format="pandas"
    )


class _CellRingStage:
    """Actor: keep only pages whose cell is inside any query's current
    ring set; tags candidates with the query ids they may serve."""

    def __init__(self, cellsets_ref, id_col: str, cell_col: str):
        import ray

        cs = ray.get(cellsets_ref) if not isinstance(cellsets_ref, dict) else cellsets_ref
        self.qids = cs["query_id"]
        self.cells = cs["cells"]  # list of int64 arrays, aligned with qids
        self.id_col = id_col
        self.cell_col = cell_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell = batch[self.cell_col].to_numpy(zero_copy_only=False)
        outs = []
        for qid, qcells in zip(self.qids, self.cells):
            m = np.isin(cell, qcells)
            if m.any():
                sub = batch.filter(pa.array(m))
                outs.append(sub.append_column("query_id", pa.array(
                    np.full(sub.num_rows, qid, dtype=np.int64))))
        if not outs:
            e = batch.slice(0, 0)
            return e.append_column("query_id", pa.array([], type=pa.int64()))
        return pa.concat_tables(outs)


def knn_cells(ds, queries: pd.DataFrame, k: int, id_col: str = "page_id",
              res: int = 7, init_ring: int = 1, max_ring: int = 64,
              cell_col: str | None = None, batch_size: int = 16384):
    """Cell-ring-accelerated exact kNN.

    Gathers candidates within an expanding Chebyshev cell disk per
    query and refines exactly, doubling the radius until the kth-best
    exact distance is PROVABLY inside the disk's guaranteed-coverage
    radius: any point outside a disk of ring ``r`` is separated by at
    least ``r * cell_size`` degrees in lat or lon, i.e. at least
    ``r * cs * 111.194 * cos(phi_max)`` km (phi_max = the worst
    latitude reachable in the lon-separation case).  Exactness is
    therefore guaranteed, not just likely; tests additionally compare
    against :func:`knn_bruteforce`."""
    cell_col = cell_col or f"cell_r{res}"
    import ray

    qid = queries["query_id"].to_numpy(dtype=np.int64)
    qlon = queries["lon"].to_numpy(dtype=np.float64)
    qlat = queries["lat"].to_numpy(dtype=np.float64)
    qcell = grid.encode(qlon, qlat, res)
    cs = grid.cell_size(res)

    def coverage_km(ring: int, lat: float) -> float:
        phi_max = min(89.9, abs(lat) + (ring + 1) * cs)
        return ring * cs * 111.194 * np.cos(np.radians(phi_max))

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        q = int(g["query_id"].iloc[0])
        i = int(np.nonzero(qid == q)[0][0])
        d = haversine_km(g["lon"].to_numpy(), g["lat"].to_numpy(), qlon[i], qlat[i])
        out = pd.DataFrame(
            {"query_id": q, id_col: g[id_col].to_numpy(), "dist_km": d}
        )
        out = out.sort_values(["dist_km", id_col]).head(k)
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    ring = init_ring
    while True:
        cellsets = {
            "query_id": qid,
            "cells": [grid.disk(int(c), res, ring) for c in qcell],
        }
        csref = ray.put(cellsets)
        cand = ds.map_batches(
            _CellRingStage,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=2,
            fn_constructor_kwargs={
                "cellsets_ref": csref,
                "id_col": id_col,
                "cell_col": cell_col,
            },
        )
        result = cand.groupby("query_id").map_groups(refine, batch_format="pandas")
        rp = result.to_pandas()
        if ring >= max_ring:
            return result
        ok = True
        for i, q in enumerate(qid):
            mine = rp[rp["query_id"] == int(q)]
            if len(mine) < k or mine["dist_km"].max() > coverage_km(ring, qlat[i]):
                ok = False
                break
        if ok:
            return result
        ring *= 2
