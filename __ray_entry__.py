"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementation lives in ``ocgis_ray`` (see SURVEY.md §2/§7); the query
catalog with its generated oracle SQL is
``ocgis_ray/pipelines/catalog.py``.  Nothing here (or in the library)
calls ``ray.init()`` / ``ray.shutdown()`` — the caller owns the
session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# the driver may import this module from any CWD; make the repo root
# (this file's directory) importable so `ocgis_ray` resolves
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def _tune() -> None:
    # DataContext knobs only (never ray.init — the caller owns the
    # session): reservation off so small sessions don't throttle the
    # busy operator, 32MiB bundles so map tasks match read blocks;
    # idempotent (see ocgis_ray/tuning.py)
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages synthesis ->
    html extraction (byte-identity asserted) -> geocode -> broadcast
    spatial join -> per-(ugid, tile) rollup -> sort."""
    _tune()
    from ocgis_ray.pipelines.flagship import flagship

    # conservative pool sizes: entry() must run under ANY session size
    # (two actor pools reserving >= session CPUs starves the read/
    # aggregate tasks and stalls the pipeline)
    return flagship("/root/testdata/sf0.001", extract_concurrency=1, probe_concurrency=1)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (exactly 50 — the driver records at most 50 rows)."""
    _tune()
    from ocgis_ray.pipelines.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (generated from the
    same constants/vertex arrays the engine uses).  Rows-only queries
    (minhash/simhash LSH dedup, langid, fingerprints) intentionally
    have no entry."""
    _tune()
    from ocgis_ray.pipelines.catalog import ORACLES

    return {name: fn() for name, fn in ORACLES.items()}
