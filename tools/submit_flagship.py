"""Job entrypoint for the flagship pipeline — the ``ray job submit``
target (north rule: "run via ray job submit on a fixed-size multi-node
Ray cluster").

On a real cluster this script is submitted as-is:

    ray job submit --working-dir . -- python tools/submit_flagship.py \\
        --sf-dir s3://bucket/pages --out /mnt/out --partitions 256

In the sandbox it runs against the local testdata.  The job is
RESUMABLE: output is partitioned parquet with a lineage manifest;
re-submitting after a failure skips completed partitions
(``ocgis_ray.state.lineage``).

The script owns its Ray session (guarded init — under ``ray job
submit`` the session already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/flagship_out")
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--layer", default="world_regions")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # attach to the submitting cluster when one exists (ray job
        # submit sets RAY_ADDRESS on the driver); only boot a local
        # capped instance when there is no cluster to join — a fresh
        # job-driver process is NEVER ray.is_initialized(), so
        # address="local" here would silently run the multi-node job
        # single-node
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr != "local":
            ray.init(address=addr, logging_level="ERROR")
        else:
            try:
                ray.init(address="auto", logging_level="ERROR")
            except ConnectionError:
                ray.init(address="local", num_cpus=args.num_cpus,
                         include_dashboard=False, logging_level="ERROR")
    from ocgis_ray.pipelines.flagship import flagship_partitioned
    from ocgis_ray.state import lineage
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()
    t0 = time.perf_counter()
    records = flagship_partitioned(
        args.sf_dir, args.out, n_partitions=args.partitions,
        resume=not args.no_resume, reps=args.reps, layer_name=args.layer,
    )
    manifest = lineage.read_manifest(args.out)
    print(json.dumps({
        "status": "complete",
        "out": args.out,
        "partitions_total": args.partitions,
        "partitions_run_now": len(records),
        "partitions_complete": len(manifest),
        "rows_total": sum(r.get("rows", 0) for r in manifest),
        "wall_sec": round(time.perf_counter() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
