"""CF-netCDF -> parquet ingest shim (round-3 verdict item 4).

The engine's north rule re-targets storage to parquet; a reference
user migrating real CF files needs an ingest path.  This CLI converts
a NetCDF classic file (pure-numpy reader, no netCDF4 dependency) into
the engine's long-form cells parquet via the CF dimension-map roles
(``ocgis_ray.sources.cf``), after which every existing operator
(bbox subset, polygon aggregate, apply_weights, cells_to_polygons)
consumes it directly.

Usage:
    python tools/nc_to_parquet.py <in.nc> <out.parquet>
    python tools/nc_to_parquet.py --fixture <out.nc>   # write the
        reference-style 4x4 quadrant CF fixture (for smoke tests)

Large files: the converter buffers ONE file in memory (the classic
format is header + contiguous arrays), so per-invocation memory is
bounded by the largest file, not the archive; at real archive scale
run one CLI invocation per file (files are the natural partition —
the same shape as the reference's one-request-per-file driver) and
point ``read_parquet`` at the output directory.
"""

from __future__ import annotations

import sys


def main() -> None:
    args = sys.argv[1:]
    if not args or len(args) > 3:
        print(__doc__)
        sys.exit(2)
    sys.path.insert(0, ".")
    if args[0] == "--fixture":
        from ocgis_ray.sources.cf import make_quadrant_fixture

        make_quadrant_fixture(args[1])
        print(f"wrote fixture {args[1]}")
        return
    import pyarrow.parquet as pq

    from ocgis_ray.sources.cf import cf_to_table

    src, dst = args[0], args[1]
    t = cf_to_table(src)
    pq.write_table(t, dst)
    print(f"{src} -> {dst}: {t.num_rows} rows, "
          f"columns {t.column_names}")


if __name__ == "__main__":
    main()
