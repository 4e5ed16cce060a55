"""JSONL (newline-delimited JSON) ingest/egress — the interchange
format public LLM corpora actually ship in (Dolma, RedPajama, The
Pile all distribute ``.jsonl``/``.jsonl.gz``/``.jsonl.zst``).

Reference analog: the CSV driver (``/root/reference/src/ocgis/driver/
csv_.py``) is the reference's text-interchange seam; JSONL is that
seam for web corpora.  Reads ride ``ray.data.read_json`` (Arrow's
streaming JSON reader — vectorized, never a per-row Python
``json.loads``) with the same size-derived block policy as
:func:`ocgis_ray.sources.io.read_parquet_sized`; gzip members
decompress transparently by file extension via Arrow.

Writes emit one ``.jsonl`` (or ``.jsonl.gz``) file per block —
streaming, resumable when routed through
:func:`ocgis_ray.state.lineage.write_partition`.
"""

from __future__ import annotations

import os

DEFAULT_BLOCK_BYTES = 32 * 1024 * 1024


def read_jsonl(paths, columns: list[str] | None = None,
               target_block_bytes: int = DEFAULT_BLOCK_BYTES,
               max_blocks: int = 512, **read_kwargs):
    """Sized JSONL read -> Dataset.

    ``columns`` prunes AFTER parse (JSON rows are not columnar on
    disk — unlike parquet there is nothing to push down; convert to
    parquet once with :func:`jsonl_to_parquet` if the pipeline reads
    the file more than once)."""
    import ray
    import ray.data as rd

    files = [paths] if isinstance(paths, str) else list(paths)
    # JSON text expands ~1.3-2x in memory; disk size is a fine proxy
    total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    cpus = int(ray.cluster_resources().get("CPU", 8)) if \
        ray.is_initialized() else 8
    blocks = max(1, min(max_blocks,
                        -(-total // target_block_bytes),
                        max(1, total // (1 << 20))))
    blocks = max(blocks, min(cpus, max(1, total // (1 << 20))))
    ds = rd.read_json(files, override_num_blocks=blocks, **read_kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def write_jsonl(ds, path: str, compress: bool = False, **kwargs):
    """Dataset -> directory of ``.jsonl[.gz]`` files (one per block)."""
    arrow_open_stream_args = (
        {"compression": "gzip"} if compress else None)
    ds.write_json(path,
                  arrow_open_stream_args=arrow_open_stream_args, **kwargs)


def jsonl_to_parquet(paths, out_path: str,
                     columns: list[str] | None = None, **kwargs) -> int:
    """One-shot ingest conversion: JSONL -> parquet (column pruning +
    row-group pushdown become available to every later read).
    Returns the row count."""
    ds = read_jsonl(paths, columns=columns, **kwargs)
    ds = ds.materialize()
    ds.write_parquet(out_path)
    return ds.count()
