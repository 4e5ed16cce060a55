"""Benchmark harness — prints ONE JSON line with headline + per-query
wall times.

Headline: the flagship pipeline (pages synthesis -> html extraction
actor pool -> geocode -> broadcast spatial join -> tile rollup -> sort)
at ``BENCH_REPS`` pages per document over $GRAFT_SF_DIR.

Usage:
    python bench.py               # single run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling     # same job at 8 vs 32 cpus in fresh
                                  # processes; prints throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_REPS = int(os.environ.get("GRAFT_BENCH_REPS", "50"))


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import logging

    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def run_flagship() -> tuple[float, int, int]:
    import pyarrow.parquet as pq

    from ocgis_ray.pipelines.flagship import flagship

    n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
    n_pages = n_docs * BENCH_REPS  # total pages streamed through the pipeline
    conc = max(2, NUM_CPUS // 2)
    t0 = time.perf_counter()
    roll = flagship(
        SF_DIR,
        reps=BENCH_REPS,
        extract_concurrency=conc,
        probe_concurrency=max(2, NUM_CPUS // 4),
    )
    pdf = roll.to_pandas()
    wall = time.perf_counter() - t0
    return wall, n_pages, int(pdf["n_pages"].sum())


def run_queries() -> dict[str, float]:
    """A representative per-operator timing set (sf0.1 driver tables)."""
    from ocgis_ray.pipelines import catalog

    names = [
        "tile_rollup_r8",
        "spatial_join_inner",
        "knn_pages",
        "pricing_summary_lineitem",
        "events_user_rollup",
        "moving_window_events",
        "dedup_exact_documents",
        "minhash_near_dup",
        "ann_bruteforce",
        "text_stats_documents",
    ]
    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        res = catalog.QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def single_run() -> dict:
    _init_ray()
    # warm the page cache so we measure compute + shuffle, not cold disk
    import pyarrow.parquet as pq

    for t in ("documents", "events", "lineitem", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    wall, n_pages, join_rows = run_flagship()
    qtimes = run_queries()
    import ray

    result = {
        "metric": "flagship_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": n_pages,
        "join_rows": join_rows,
        "pages_per_sec": round(n_pages / wall, 1),
        "bench_reps": BENCH_REPS,
    }
    ray.shutdown()
    return result


def scaling_run() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "pages_per_sec_8": r_lo["pages_per_sec"],
        "pages_per_sec_32": r_hi["pages_per_sec"],
        "pages": r_hi["pages"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(scaling_run()))
    else:
        print(json.dumps(single_run()))
