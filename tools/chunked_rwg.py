"""Chunked regrid-weight generation CLI — the ``ocli chunked-rwg``
analog (``/root/reference/src/ocgis/ocli.py:39-305``,
``spatial/grid_chunker.py:697-820,301-459``).

The reference tiles the destination grid, generates ESMF weights per
tile into chunk files with a resume index, merges the chunks into one
weight file, and ``smm``-applies it.  Here the destination is a cell
grid at ``--dst-res``, the source the pages cell grid at ``--src-res``,
and the weights are CONTAINMENT FRACTIONS (a dst cell's area share per
intersecting src cell — exact, since both grids are nested binary
quadgrids) — the conservative-regrid analog the north star prescribes.

Subcommands (mirroring the reference's lifecycle):

    chunk   write per-tile weight parquet chunks + lineage manifest
            (resume skips complete tiles — the index-file analog)
    merge   concatenate chunk files into one merged weight table
            (create_merged_weight_file analog)
    apply   smm: apply merged weights to the pages table
            (regrid/base.py:937-992 analog)

Run ``python tools/chunked_rwg.py chunk --out /tmp/rwg`` then
``merge`` then ``apply``.  The script owns its Ray session (guarded —
under ``ray job submit`` the session already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def weights_for_tile(tile_ix: int, src_res: int, dst_res: int, n_tiles_x: int):
    """(src_cell, dst_cell, w) rows for one destination lon-band tile.

    dst_res <= src_res (coarsening): each dst cell exactly contains
    4^(src_res-dst_res) src cells, weight = 1/4^(src_res-dst_res) —
    exact conservative fractions on the nested quadgrid."""
    import pandas as pd

    from ocgis_ray import grid

    n_ix_d = 1 << dst_res
    n_iy_d = n_ix_d >> 1
    span = n_ix_d // n_tiles_x
    ix0, ix1 = tile_ix * span, (tile_ix + 1) * span
    shift = src_res - dst_res
    frac = 1.0 / (4 ** shift)
    dxs, dys = np.meshgrid(np.arange(ix0, ix1), np.arange(n_iy_d), indexing="ij")
    dst = grid.pack(dxs.ravel(), dys.ravel())
    # expand each dst cell into its children at src_res
    cx, cy = np.meshgrid(np.arange(1 << shift), np.arange(1 << shift),
                         indexing="ij")
    src = grid.pack(
        (dxs.ravel()[:, None] << shift) + cx.ravel()[None, :],
        (dys.ravel()[:, None] << shift) + cy.ravel()[None, :],
    )
    n_children = 4 ** shift
    return pd.DataFrame({
        "src": src.ravel().astype(np.int64),
        "dst": np.repeat(dst, n_children).astype(np.int64),
        "w": np.full(src.size, frac),
    })


def cmd_chunk(args) -> None:
    import ray.data as rd

    from ocgis_ray.state import lineage

    done = lineage.completed_partitions(args.out)
    for t in range(args.n_tiles):
        part = f"tile_{t:03d}"
        if part in done:
            print(f"skip {part} (complete)")
            continue
        w = weights_for_tile(t, args.src_res, args.dst_res, args.n_tiles)
        rec = lineage.write_partition(rd.from_pandas(w), args.out, part,
                                      meta={"tile": t})
        print(json.dumps(rec))


def cmd_merge(args) -> None:
    import ray.data as rd

    from ocgis_ray.state import lineage

    done = sorted(lineage.completed_partitions(args.out))
    if len(done) != args.n_tiles:
        raise SystemExit(f"only {len(done)}/{args.n_tiles} chunks complete; "
                         "re-run `chunk` first (resume skips finished tiles)")
    import glob

    files = sorted(
        f for p in done
        for f in glob.glob(os.path.join(args.out, f"part={p}", "*.parquet"))
    )
    merged = rd.read_parquet(files)
    out = os.path.join(args.out, "merged")
    merged.write_parquet(out)
    print(json.dumps({"merged": out, "rows": merged.count()}))


def cmd_apply(args) -> None:
    import pandas as pd

    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.regrid import apply_weights

    weights = pd.read_parquet(os.path.join(args.out, "merged"))
    ds = geocode(pages_dataset(args.sf_dir).drop_columns(["html"]))
    res = apply_weights(ds, weights, src_col=f"cell_r{args.src_res}",
                        value_col="n_chars")
    out = os.path.join(args.out, "applied")
    res.write_parquet(out)
    print(json.dumps({"applied": out, "rows": res.count()}))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", choices=["chunk", "merge", "apply"])
    p.add_argument("--out", default="/tmp/ocgis_ray_rwg")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--src-res", type=int, default=7)
    p.add_argument("--dst-res", type=int, default=5)
    p.add_argument("--n-tiles", type=int, default=8)
    args = p.parse_args()
    if args.dst_res >= args.src_res:
        raise SystemExit("--dst-res must be < --src-res (coarsening weights)")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()
    {"chunk": cmd_chunk, "merge": cmd_merge, "apply": cmd_apply}[args.command](args)
    ray.shutdown()


if __name__ == "__main__":
    main()
