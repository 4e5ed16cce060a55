"""Job entrypoint for the corpus-cleaning pipeline — the ``ray job
submit`` target for the training-data cascade:

    ray job submit --working-dir . -- python tools/clean_corpus.py \\
        --in-dir /mnt/corpus --out /mnt/cleaned --partitions 256 \\
        --url-col url

Two resumable phases (see ``ocgis_ray.pipelines.cleaning``): row-local
filters shard-at-a-time with a lineage manifest, then the global dedup
over the checkpoint.  Re-submitting after a failure skips completed
work.  The script owns its Ray session (guarded init — under ``ray job
submit`` the session already exists)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default="/tmp/clean_corpus_out")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--url-col", default=None)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--filter-steps", default="gopher,pii",
                    help="comma list; c4 needs newline-structured text")
    ap.add_argument("--dedup-steps", default="url_dedup,exact_dedup,near_dup")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS")
        if addr and addr != "local":
            ray.init(address=addr, logging_level="ERROR")
        else:
            try:
                ray.init(address="auto", logging_level="ERROR")
            except ConnectionError:
                ray.init(address="local", num_cpus=args.num_cpus,
                         include_dashboard=False, logging_level="ERROR")
    from ocgis_ray.tuning import tune_data_context

    tune_data_context()
    from ocgis_ray.pipelines.cleaning import clean_corpus_partitioned

    t0 = time.time()
    records = clean_corpus_partitioned(
        args.in_dir, args.out, id_col=args.id_col, text_col=args.text_col,
        url_col=args.url_col, n_partitions=args.partitions,
        resume=not args.no_resume,
        filter_steps=tuple(s for s in args.filter_steps.split(",") if s),
        dedup_steps=tuple(s for s in args.dedup_steps.split(",") if s),
        minhash_threshold=args.threshold)
    print(json.dumps({
        "out": args.out, "partitions_written": len(records),
        "rows": sum(r.get("rows", 0) for r in records),
        "wall_sec": round(time.time() - t0, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
