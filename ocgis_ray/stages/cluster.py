"""Distributed k-means over embedding columns + cluster-balanced
curation sampling.

The k-means variants in :mod:`ocgis_ray.stages.ann` train on a bounded
driver-side SAMPLE (right for a coarse quantizer).  Embedding-space
data curation — SemDeDup cluster structure, SSL-prototypes
prototypicality pruning, DataComp cluster-balanced subset selection —
wants centroids fit on the FULL corpus.  This module runs true Lloyd's
iterations as Ray Data passes:

- **fit** (:func:`kmeans_fit`): init from a bounded sample
  (deterministic seed), then per iteration ONE streaming pass —
  broadcast centroids, per-batch assignment (one matmul) reduced to
  per-cluster partial (sum-vector, count, sse) rows, a k-row bucketed
  combine, driver-side centroid update.  Per-iteration driver state is
  ``k x d`` — model-sized, never corpus-sized.  Empty clusters keep
  their previous centroid (the deterministic convention).
- **assign** (:func:`kmeans_assign`): broadcast-centroid task stage
  appending ``cluster`` (argmax cosine, lowest-index tiebreak) and
  ``centroid_sim``.
- **curate** (:func:`cluster_balanced_sample`): per-cluster top-``n``
  via the bucketed ``topk_by_group`` combine — ``keep="prototypical"``
  (highest centroid similarity: SSL-prototypes keep-the-center) or
  ``keep="diverse"`` (lowest: SemDeDup-style keep-the-edges) — the
  cluster-balanced subset a curation pipeline feeds to training.

Determinism: init and assignment tiebreaks are exact; centroid UPDATE
sums are floating-point and associative-only-in-theory, so refits are
bit-identical for a fixed block layout and agree to ~1e-12 across
layouts (inertia is monotone either way — tested).

Reference seam: like regrid weight generation, a corpus-level fitted
artifact applied per element (``/root/reference/src/ocgis/calc/engine.py``
registry analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    return np.stack(batch[col].to_pandas().to_numpy())


def kmeans_fit(ds, k: int, col: str = "embedding", iters: int = 10,
               init_n: int = 4096, seed: int = 23, tol: float = 1e-6,
               num_buckets: int | None = None) -> dict:
    """Spherical k-means on the FULL dataset; returns
    ``{"centroids": (k', d) float64 (unit rows), "inertia": [per-iter
    mean 1 - cos], "k": k'}``.  ``k'`` < ``k`` when the init sample
    has fewer distinct rows.  Early-stops when inertia improves by
    less than ``tol``."""
    import ray

    from ocgis_ray.sources.io import bucketed_group_apply

    # Lloyd's scans the input once per iteration — checkpoint the
    # (slim) embedding projection to the object store first so each
    # iteration is a pure scan, not a re-execution of upstream lineage
    ds = ds.select_columns([col]).materialize()
    init = ds.limit(init_n).to_pandas()
    if not len(init):
        raise ValueError("kmeans_fit: empty dataset")
    mat = _normalize(np.stack(init[col].to_numpy()).astype(np.float64))
    # distinct sample rows only: duplicates would let greedy maxmin
    # emit identical centroids once the distinct points run out (the
    # duplicate centroid then starves forever under the lowest-index
    # argmax tiebreak) — k' = min(k, distinct rows), as documented
    mat = np.unique(mat, axis=0)
    # greedy farthest-point (maxmin) init on the sample: deterministic
    # and separation-robust — uniform init regularly drops two seeds
    # into one blob and merges true clusters (a measured failure);
    # seed picks the anchor row
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(mat))
    first = int(rng.integers(len(mat)))
    chosen = [first]
    max_sim = mat @ mat[first]
    for _ in range(1, k_eff):
        nxt = int(np.argmin(max_sim))  # most dissimilar to chosen set
        chosen.append(nxt)
        np.maximum(max_sim, mat @ mat[nxt], out=max_sim)
    cent = mat[chosen].copy()
    d = cent.shape[1]

    def make_partial(cent_ref):
        def partial(t: pa.Table) -> pd.DataFrame:
            c = ray.get(cent_ref)
            rows = []
            if t.num_rows:
                m = _normalize(_batch_matrix(t, col).astype(np.float64))
                sims = m @ c.T
                assign = np.argmax(sims, axis=1)  # first max = lowest idx
                best = np.take_along_axis(sims, assign[:, None], 1)[:, 0]
                for cl in np.unique(assign):
                    sel = assign == cl
                    rows.append((int(cl), m[sel].sum(axis=0),
                                 int(sel.sum()),
                                 float((1.0 - best[sel]).sum())))
            # an empty batch still emits one NEUTRAL row (cluster -1,
            # zero vector): an empty object Series types as Arrow null
            # and poisons the shuffle with a heterogeneous schema
            if not rows:
                rows.append((-1, np.zeros(d), 0, 0.0))
            return pd.DataFrame(rows,
                                columns=["cluster", "vsum", "cnt", "sse"])

        return partial

    inertia = []
    for _ in range(iters):
        cent_ref = ray.put(cent)
        partials = ds.map_batches(make_partial(cent_ref),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)

        def combine(g: pd.DataFrame) -> pd.DataFrame:
            out = []
            for cl, grp in g.groupby("cluster", sort=True):
                out.append((cl, np.sum(np.stack(grp["vsum"].to_numpy()),
                                       axis=0),
                            int(grp["cnt"].sum()), float(grp["sse"].sum())))
            return pd.DataFrame(out,
                                columns=["cluster", "vsum", "cnt", "sse"])

        # <= k rows x (d+2) — the model update itself
        agg = bucketed_group_apply(partials, "cluster", combine,
                                   num_buckets=num_buckets).to_pandas()
        agg = agg[agg["cluster"] >= 0]  # drop empty-batch neutral rows
        total = max(int(agg["cnt"].sum()), 1)
        inertia.append(float(agg["sse"].sum()) / total)
        new = cent.copy()  # empty clusters keep their centroid
        cl = agg["cluster"].to_numpy(np.int64)
        sums = np.stack(agg["vsum"].to_numpy()).reshape(len(agg), d)
        new[cl] = _normalize(sums / np.maximum(
            agg["cnt"].to_numpy(np.float64)[:, None], 1.0))
        cent = new
        if len(inertia) >= 2 and inertia[-2] - inertia[-1] < tol:
            break
    return {"centroids": cent, "inertia": inertia, "k": cent.shape[0]}


class _AssignStage:
    def __init__(self, cent_ref, col: str, out: str, sim_out: str):
        import ray

        self.cent = (ray.get(cent_ref)
                     if not isinstance(cent_ref, np.ndarray) else cent_ref)
        self.col = col
        self.out = out
        self.sim_out = sim_out

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            t = t.append_column(self.out, pa.array([], pa.int64()))
            return t.append_column(self.sim_out, pa.array([], pa.float64()))
        m = _normalize(_batch_matrix(t, self.col).astype(np.float64))
        sims = m @ self.cent.T
        assign = np.argmax(sims, axis=1).astype(np.int64)
        best = np.take_along_axis(sims, assign[:, None], 1)[:, 0]
        t = t.append_column(self.out, pa.array(assign))
        return t.append_column(self.sim_out, pa.array(best))


def kmeans_assign(ds, model: dict | np.ndarray, col: str = "embedding",
                  out: str = "cluster", sim_out: str = "centroid_sim",
                  batch_size: int = 4096):
    """Append nearest-centroid id + cosine similarity (stateless task
    stage, centroids broadcast once)."""
    import ray

    from ocgis_ray.tuning import task_stage

    cent = model["centroids"] if isinstance(model, dict) else model
    ref = ray.put(np.ascontiguousarray(cent))
    return ds.map_batches(
        task_stage(_AssignStage, cent_ref=ref, col=col, out=out,
                   sim_out=sim_out),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


def cluster_balanced_sample(ds, model: dict, n_per_cluster: int,
                            id_col: str = "vec_id",
                            col: str = "embedding",
                            keep: str = "prototypical",
                            num_buckets: int | None = None):
    """Cluster-balanced subset: assign, then keep ``n_per_cluster``
    rows per cluster — ``keep="prototypical"`` takes the highest
    centroid similarity (SSL-prototypes), ``keep="diverse"`` the
    lowest (SemDeDup keep-the-edges).  Ties break on ``id_col``
    ascending (deterministic).  Scales as one assignment pass + the
    bucketed top-k combine (`topk_by_group`)."""
    from ocgis_ray.sources.io import topk_by_group

    if keep not in ("prototypical", "diverse"):
        raise ValueError(f"keep must be prototypical|diverse, got {keep!r}")
    assigned = kmeans_assign(ds, model, col=col)
    asc = keep == "diverse"
    out = topk_by_group(assigned, "cluster", ["centroid_sim", id_col],
                        ascending=[asc, True], k=n_per_cluster,
                        num_buckets=num_buckets)
    return out.drop_columns(["rank"])
