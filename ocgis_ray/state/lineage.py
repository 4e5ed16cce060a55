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
    if str(partition).endswith(".old"):
        # reserved by compact_partitions' rename-aside protocol — the
        # orphan sweep would delete or rename a live partition by
        # this name
        raise ValueError(
            f"partition id {partition!r} ends with '.old', which the "
            "compaction rename-aside protocol reserves; pick another "
            "run/partition id")
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


def partition_files(out_dir: str, partition: str) -> list[str]:
    d = os.path.join(out_dir, f"part={partition}")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, fn) for fn in os.listdir(d)
                  if fn.endswith(".parquet"))


def compact_partitions(out_dir: str, target_bytes: int = 128 * 1024 * 1024,
                       min_files: int = 2,
                       partitions: list[str] | None = None) -> list[dict]:
    """Merge a partition's many small parquet files into
    ~``target_bytes`` files — the table-maintenance pass a resumable
    100 TB job needs: every incremental run / retried shard appends
    files, readers pay a per-file open (and object stores a
    per-request) cost, and a partition that accreted 500 x 2 MB files
    scans 10x slower than the same bytes in 8 files.

    Eligibility: >= ``min_files`` files AND mean file size below
    ``target_bytes / 2`` (already-compact partitions are never
    rewritten, so the pass is idempotent and safe to run on a cron).
    The rewrite uses a RENAME-ASIDE protocol so the original
    partition is never the only live copy: the verified tmp dir
    replaces ``part=<id>`` via ``rename(final, final.old)`` ->
    ``rename(tmp, final)`` -> ``rmtree(final.old)``.  A crash at any
    point leaves at least one complete copy on disk, and the orphan
    sweep at the top of the next run repairs it: a ``part=<id>.old``
    whose target is missing is renamed back (crash between the two
    renames); one whose target exists is deleted (crash before the
    cleanup); a stale ``_tmp_compact_*`` is removed and rebuilt.  A
    crash between rename and manifest append only loses the
    compaction RECORD, not data.  Row counts are re-read from the
    rewritten footers and must match the originals exactly (a
    mismatch raises BEFORE the swap, keeping the source intact).
    Completed-partition status never changes: compaction appends a
    ``status="compacted"`` metrics record; resume logic keys on
    ``status="complete"`` rows only."""
    import ray.data as rd

    # orphan sweep: repair any interrupted rename-aside swap first
    for name in (os.listdir(out_dir) if os.path.isdir(out_dir) else []):
        if not (name.startswith("part=") and name.endswith(".old")):
            continue
        aside = os.path.join(out_dir, name)
        final = os.path.join(out_dir, name[:-len(".old")])
        if os.path.exists(final):
            shutil.rmtree(aside)          # crash before cleanup rmtree
        else:
            os.rename(aside, final)       # crash between the two renames

    done = completed_partitions(out_dir) if partitions is None \
        else set(partitions)
    records: list[dict] = []
    for part in sorted(done):
        files = partition_files(out_dir, part)
        if len(files) < min_files:
            continue
        total = sum(os.path.getsize(f) for f in files)
        if total / len(files) >= target_bytes / 2:
            continue
        import pyarrow.parquet as pq

        want_rows = sum(pq.ParquetFile(f).metadata.num_rows
                        for f in files)
        n_out = max(1, -(-total // target_bytes))
        tmp = os.path.join(out_dir, f"_tmp_compact_{part}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.perf_counter()
        # partitioning=None: the default hive inference would graft a
        # "part" column out of the part=<id> directory name into the
        # rewritten files
        (rd.read_parquet(files, override_num_blocks=n_out,
                         partitioning=None)
         .write_parquet(tmp, min_rows_per_file=max(1, want_rows // n_out)))
        os.makedirs(tmp, exist_ok=True)
        got_rows = sum(pq.ParquetFile(os.path.join(tmp, fn)).metadata.num_rows
                       for fn in os.listdir(tmp) if fn.endswith(".parquet"))
        if got_rows != want_rows:
            shutil.rmtree(tmp)
            raise AssertionError(
                f"compaction of part={part} would change row count "
                f"{want_rows} -> {got_rows}; source left untouched")
        final = os.path.join(out_dir, f"part={part}")
        aside = final + ".old"
        if os.path.exists(aside):
            shutil.rmtree(aside)
        os.rename(final, aside)
        os.rename(tmp, final)
        shutil.rmtree(aside)
        rec = {
            "partition": part,
            "status": "compacted",
            "rows": got_rows,
            "files_before": len(files),
            "files_after": len(partition_files(out_dir, part)),
            "bytes": sum(os.path.getsize(f)
                         for f in partition_files(out_dir, part)),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(manifest_path(out_dir), "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        records.append(rec)
    return records
