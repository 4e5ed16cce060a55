"""Per-partition lineage + metrics records and resume-from-checkpoint.

The Ray re-expression of the reference's chunked out-of-core story:
``GridChunker.write_chunks`` writes one file per tile plus an *index
file* recording filenames and global slice bounds
(``/root/reference/src/ocgis/spatial/grid_chunker.py:697-820``), which
``insert_weighted`` later consumes to stitch results
(``spatial/grid_chunker.py:395-459``); ``util/large_array.py:15-225``
is the template-fill variant.  Here:

- output is **partitioned parquet**: one directory per partition id
  (a pure function of the partition key — deterministic across runs),
- each partition directory is written ATOMICALLY (tmp dir + rename),
- a ``manifest.jsonl`` accumulates one lineage record per completed
  partition: partition id, row count, wall seconds, input fingerprint
  — the metrics/lineage record the north rule requires,
- resume = anti-join of the manifest against the partition list:
  completed partitions are skipped entirely (their input is never
  re-read thanks to predicate pushdown on the partition key).

The driver loop mirrors the reference's per-tile loop; each iteration
is an independent streaming Ray Data pipeline, so a crash loses at
most one partition's work.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def completed_partitions(out_dir: str) -> set[str]:
    """Partition ids recorded complete in the manifest AND still
    present on disk.

    Two crash windows this tolerates instead of breaking resume:
    a torn trailing manifest line (killed mid-append) is skipped, and
    a manifest-complete partition whose directory has since vanished
    (crash between a re-write's rmtree and rename) is treated as NOT
    done so the next run reproduces it."""
    done: set[str] = set()
    mp = manifest_path(out_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # torn tail from a mid-append crash
                if rec.get("status") == "complete":
                    done.add(rec["partition"])
    return {p for p in done
            if os.path.isdir(os.path.join(out_dir, f"part={p}"))}


def write_partition(ds, out_dir: str, partition: str, meta: dict | None = None) -> dict:
    """Write one partition atomically + append its lineage record.

    ``ds`` must already be filtered to the partition.  Returns the
    record.  Atomicity: write to ``_tmp_<partition>``, rename to
    ``part=<partition>``, THEN append (and fsync) the manifest line —
    a crash between rename and append re-does one partition
    idempotently (the rename target is replaced wholesale), and
    ``completed_partitions`` double-checks the directory exists so a
    crash inside a re-write's rmtree/rename window is re-done too."""
    final = os.path.join(out_dir, f"part={partition}")
    tmp = os.path.join(out_dir, f"_tmp_{partition}")
    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    t0 = time.perf_counter()
    ds.write_parquet(tmp)
    wall = time.perf_counter() - t0
    # an empty partition writes no files (Ray skips dir creation);
    # materialize the empty dir so the rename-commit still happens and
    # resume records the partition as complete
    os.makedirs(tmp, exist_ok=True)
    # row count + bytes from the written files' own metadata (no re-execution)
    import pyarrow.parquet as pq

    n_rows = 0
    n_bytes = 0
    for fn in os.listdir(tmp):
        if fn.endswith(".parquet"):
            fp = os.path.join(tmp, fn)
            n_rows += pq.ParquetFile(fp).metadata.num_rows
            n_bytes += os.path.getsize(fp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    rec = {
        "partition": partition,
        "status": "complete",
        "rows": n_rows,
        "bytes": n_bytes,
        "wall_sec": round(wall, 3),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        **(meta or {}),
    }
    with open(manifest_path(out_dir), "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())
    return rec


def run_partitioned(
    make_ds: Callable[[str], "object"],
    out_dir: str,
    partitions: list[str],
    resume: bool = True,
) -> list[dict]:
    """Partition-at-a-time driver loop with resume.

    ``make_ds(partition)`` returns the (lazy) Dataset for that
    partition.  Completed partitions (per manifest) are skipped when
    ``resume``.  Returns the lineage records written this run."""
    done = completed_partitions(out_dir) if resume else set()
    records = []
    for part in partitions:
        if part in done:
            continue
        ds = make_ds(part)
        records.append(write_partition(ds, out_dir, part))
    return records


def read_manifest(out_dir: str) -> list[dict]:
    mp = manifest_path(out_dir)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        return [json.loads(line) for line in f]
