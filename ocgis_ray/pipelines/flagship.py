"""The flagship pipeline — the ``OcgOperations(...).execute()`` analog.

Reference lifecycle (``/root/reference/src/ocgis/ops/engine.py:53-385``):
request-dataset load -> subsets -> per-geometry spatial subset ->
calculation -> converter append-loop.  Here that collapses into ONE
streaming dataflow (SURVEY §3.1):

    read_parquet(documents)                # pruned columns
      -> map_batches(synthesize_pages)     # url/warc_ts/html/text/lang
      -> map_batches(HtmlExtractor, actor pool)   # html -> text, byte-identical
      -> [assert text_extracted == text]
      -> project html away                 # fat column never reaches a shuffle
      -> map_batches(geocode)              # lon/lat + cell_r7/8/9
      -> map_batches(SpatialJoinProbe, actor pool, broadcast index)
      -> partial-agg -> groupby(ugid, cell_r8) -> sort   # the one big shuffle
      -> write_parquet / return

Stage sizing (32-cpu node defaults): extract actors get small batches
(html is fat), the probe gets large ones (slim rows); both pools leave
cpus free for the read + shuffle stages (ray_guide: a pool that
reserves every CPU serializes the pipeline).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocgis_ray.sources.cabinet import layer as load_layer
from ocgis_ray.sources.pages import pages_dataset
from ocgis_ray.stages.extract import HtmlExtractor
from ocgis_ray.stages.geocode import geocode
from ocgis_ray.stages.spatial_join import spatial_join
from ocgis_ray.stages.tiles import grouped_aggregate

# fat columns never reach a shuffle (SURVEY §7.5): html AND text die
# right after the byte-identity check
SLIM_COLUMNS_DROP = ["html", "text", "text_extracted"]


def flagship(
    sf_dir: str,
    reps: int = 4,
    layer_name: str = "world_regions",
    rollup_cell: str = "cell_r8",
    extract_concurrency=None,
    probe_concurrency=None,
    verify_extraction: bool = True,
    extract_batch_size: int = 16384,
    probe_batch_size: int = 32768,
):
    """Full pipeline -> per-(ugid, tile) rollup Dataset (lazy).

    Batch sizing: the driver dispatches one actor task per batch, and
    that dispatch loop is single-threaded — small batches serialize the
    whole pipeline behind the scheduler (measured: batch 2048 at 2M
    pages gave INVERSE cpu scaling).  Default batches are sized for
    ~10-20MB of synthetic html; REAL Common-Crawl html (~100KB/row)
    needs extract_batch_size ~256-1024 to keep batches in the same
    byte range — size by bytes, not rows."""
    from ocgis_ray.tuning import auto_pool

    extract_concurrency = auto_pool() if extract_concurrency is None else extract_concurrency
    probe_concurrency = auto_pool() if probe_concurrency is None else probe_concurrency
    ds = pages_dataset(sf_dir, reps=reps)
    ds = ds.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=extract_concurrency,
        batch_size=extract_batch_size,
    )
    if verify_extraction:
        def check(t):
            # fill_null(True): a null on either side IS a violation —
            # pc.sum would silently skip the nulls pc.equal emits
            bad = pc.sum(pc.cast(pc.fill_null(pc.invert(
                pc.equal(t["text_extracted"], t["text"])), True), "int64")
            ).as_py()
            if bad:
                raise ValueError(f"extraction byte-identity violated on {bad} rows")
            return t

        ds = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.drop_columns(SLIM_COLUMNS_DROP)
    ds = geocode(ds)
    joined = spatial_join(
        ds,
        load_layer(layer_name),
        how="inner",
        res=7,
        concurrency=probe_concurrency,
        batch_size=probe_batch_size,
    )
    rollup = grouped_aggregate(
        joined,
        ["ugid", rollup_cell],
        {
            "n_pages": (None, "count"),
            "sum_chars": ("n_chars", "sum"),
            "min_ts": ("warc_ts", "min"),
            "max_ts": ("warc_ts", "max"),
        },
    )
    # the rollup is small (one row per (ugid, tile)); a range-partition
    # sort across many tiny blocks costs seconds of pure overhead —
    # coalesce to one block first so the sort is a single local sort.
    # At 100 TB the rollup is still ~10^6 rows (tiles x polygons), so
    # this stays driver-safe; a truly huge ordered output would use
    # sort() on the un-coalesced Dataset instead.
    return rollup.repartition(1).sort(["ugid", rollup_cell])


class FusedPageWorker:
    """One actor pool running extract -> byte-identity check -> slim
    projection -> geocode -> spatial-join probe per batch.

    Why fused: every operator boundary round-trips its blocks through
    the object store; with fat html/text columns that IPC serializes
    the whole node (measured: separate extract+probe pools gave NO
    speedup from 8->32 cpus because ~10GB of intermediate blocks
    bottlenecked on plasma).  Fused, the fat columns live only inside
    the worker; only slim join rows (~100B/page) are emitted.  The
    composable per-stage API remains for pipelines that need the
    intermediates."""

    def __init__(self, index_ref, keep_touches: bool = True, verify: bool = True,
                 analyze: bool = True, extractor: str = "regex"):
        from ocgis_ray.stages.dom import make_extractor

        self.extractor = make_extractor(extractor)
        from ocgis_ray.stages.spatial_join import SpatialJoinProbe

        self.probe = SpatialJoinProbe(index_ref, how="inner", keep_touches=keep_touches)
        self.verify = verify
        self.analyze = analyze

    def __call__(self, t):
        from ocgis_ray.stages.geocode import geocode_batch
        from ocgis_ray.stages.text import text_stats_arrays

        t = self.extractor(t)
        if self.verify:
            # fill_null(True): a null on either side IS a violation —
            # pc.sum would silently skip the nulls pc.equal emits
            bad = pc.sum(pc.cast(pc.fill_null(pc.invert(
                pc.equal(t["text_extracted"], t["text"])), True), "int64")
            ).as_py()
            if bad:
                raise ValueError(f"extraction byte-identity violated on {bad} rows")
        if self.analyze:
            # per-page text analysis on the EXTRACTED text (the
            # training-data-prep stage) — byte-LUT vectorized kernels;
            # language ID stays a separate operator (its per-token
            # scoring is Python-loop-bound and belongs off the hot path
            # until a vectorized model replaces it)
            stats = text_stats_arrays(t["text_extracted"])
            isnull = stats.pop("_null_mask", None)
            t = t.append_column("token_count", pa.array(
                stats["token_count"], mask=isnull)
                if isnull is not None else pa.array(stats["token_count"]))
            t = t.append_column("quality", pa.array(
                stats["quality_score"], mask=isnull)
                if isnull is not None else pa.array(stats["quality_score"]))
        t = t.drop_columns([c for c in ("html", "text", "text_extracted") if c in t.column_names])
        t = geocode_batch(t)
        return self.probe(t)


_WORKER_CACHE: dict = {}


def flagship_from_parquet(
    pages_path: str,
    layer_name: str = "world_regions",
    rollup_cell: str = "cell_r8",
    extract_concurrency=None,
    verify_extraction: bool = True,
    extract_batch_size: int = 8192,
    use_actors: bool = False,
    analyze: bool = True,
    extractor: str = "regex",
):
    # NOTE: no probe_* knobs — the probe runs INSIDE the fused worker
    # (FusedPageWorker), so extract_concurrency/extract_batch_size
    # govern the whole fused stage
    """Flagship over a MATERIALIZED pages parquet table — the bench /
    production shape (the real deployment reads pages from storage;
    see ``ocgis_ray.sources.pages.materialize_pages_parquet``).  Block
    counts come from the files' uncompressed size, and the per-page
    stages run FUSED in a single actor pool (see FusedPageWorker) so
    fat html/text columns never cross an operator boundary."""
    from ocgis_ray.sources.io import read_parquet_sized

    # 16 MiB read blocks (not the 32 MiB default): the streaming
    # executor bundles ~3 consecutive 21 MB blocks into one ~70 MB
    # fused-stage task at 32 MiB, leaving a 32-core node running one
    # ragged 22-task wave (measured: 5.8-7.3 s vs 2.5-2.6 s warm at
    # 16 MiB/8192 on the 2M-page corpus — the fat-bundle tasks also
    # spike peak heap).  Finer blocks = more, shorter tasks = every
    # core fed; on a multi-node cluster the same sizing keeps shuffle
    # metadata small while saturating readers.
    ds = read_parquet_sized(
        pages_path,
        columns=["page_id", "url", "warc_ts", "html", "text", "lang", "n_chars"],
        target_block_bytes=16 * 1024 * 1024,
        max_blocks=1024,
    )
    return flagship_from_dataset(
        ds, layer_name=layer_name, rollup_cell=rollup_cell,
        extract_concurrency=extract_concurrency,
        verify_extraction=verify_extraction,
        extract_batch_size=extract_batch_size, use_actors=use_actors,
        analyze=analyze, extractor=extractor)


def flagship_from_warc(
    warc_path,
    layer_name: str = "world_regions",
    rollup_cell: str = "cell_r8",
    page_id: str = "url",
    extract_batch_size: int = 8192,
    analyze: bool = True,
    extractor: str = "regex",
):
    """Flagship over raw WARC crawl files (the real Common-Crawl
    container): streaming WARC read -> WET adaptation
    (``sources.warc.warc_to_pages``) -> the same fused stage as the
    parquet path.  The adapter's extracted text becomes the stored
    ground truth, so the fused stage's byte-identity verification
    exercises the per-row invariant end to end."""
    from ocgis_ray.sources.warc import read_warc, warc_to_pages

    pages = warc_to_pages(read_warc(warc_path), page_id=page_id,
                          extractor=extractor)
    return flagship_from_dataset(
        pages, layer_name=layer_name, rollup_cell=rollup_cell,
        extract_batch_size=extract_batch_size, analyze=analyze,
        extractor=extractor)


def flagship_from_dataset(
    ds,
    layer_name: str = "world_regions",
    rollup_cell: str = "cell_r8",
    extract_concurrency=None,
    verify_extraction: bool = True,
    extract_batch_size: int = 8192,
    use_actors: bool = False,
    analyze: bool = True,
    extractor: str = "regex",
):
    """The fused flagship tail over an already-loaded pages Dataset
    (shared by the parquet and WARC front ends)."""
    import ray

    from ocgis_ray.stages.spatial_join import build_index
    from ocgis_ray.tuning import auto_pool

    extract_concurrency = (auto_pool() if extract_concurrency is None
                           else extract_concurrency)
    index_ref = ray.put(build_index(load_layer(layer_name), res=7))
    if use_actors:
        joined = ds.map_batches(
            FusedPageWorker,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=extract_concurrency,
            batch_size=extract_batch_size,
            fn_constructor_kwargs={"index_ref": index_ref, "verify": verify_extraction,
                                   "analyze": analyze, "extractor": extractor},
        )
    else:
        # stateless-task mode: same init-once-per-worker state (module
        # cache + zero-copy plasma fetch of the index), but the task
        # pool is ELASTIC — no fixed actor reservation to balance
        # against the read stage, which matters when read and compute
        # contend for the same node (ray_guide: a pool that reserves
        # every CPU starves the read)
        verify = verify_extraction
        # cache key must include the broadcast-index identity: Ray
        # reuses worker processes across Dataset executions, so a
        # second flagship call in the same session (different layer /
        # res) must not probe the previous call's index
        cache_key = (index_ref.hex(), verify, analyze, extractor)

        def fused_task(t):
            w = _WORKER_CACHE.get("w")
            if w is None or _WORKER_CACHE.get("key") != cache_key:
                w = _WORKER_CACHE["w"] = FusedPageWorker(
                    index_ref, verify=verify, analyze=analyze,
                    extractor=extractor,
                )
                _WORKER_CACHE["key"] = cache_key
            return w(t)

        joined = ds.map_batches(
            fused_task,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=extract_batch_size,
        )
    spec = {
        "n_pages": (None, "count"),
        "sum_chars": ("n_chars", "sum"),
        "min_ts": ("warc_ts", "min"),
        "max_ts": ("warc_ts", "max"),
    }
    if analyze:
        spec["sum_tokens"] = ("token_count", "sum")
        spec["sum_quality"] = ("quality", "sum")
    # the partial-agg batch size must match the fused stage's: Ray
    # FUSES the two map operators and bundles input rows to the larger
    # batch_size — the default 65536 collapsed a 500k-row DOM-extract
    # corpus into 8 tasks (5.7 effective cores of a 32-core node;
    # measured 13.2 s -> 3.2 s with matched sizing)
    rollup = grouped_aggregate(joined, ["ugid", rollup_cell], spec,
                               batch_size=extract_batch_size)
    return rollup.repartition(1).sort(["ugid", rollup_cell])


def flagship_partitioned(
    sf_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    resume: bool = True,
    reps: int = 4,
    layer_name: str = "world_regions",
):
    """Resumable variant: doc_id-range partitions of the JOINED rows
    (not the rollup — the partition outputs are the resumable
    intermediate a tiled computation re-reads), each written atomically
    with a lineage record (``ocgis_ray.state.lineage``).  Ranges push
    down to parquet row groups, so resumed runs skip completed
    partitions without reading their input.  Slim columns only: html
    AND text are dropped before the join so no fat column reaches the
    shuffle or the partition files."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ocgis_ray.state import lineage

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    n_docs = meta.num_rows
    step = max(1, (n_docs + n_partitions - 1) // n_partitions)

    def make_ds(part: str):
        lo = int(part) * step
        hi = lo + step
        from ocgis_ray.sources.io import read_parquet_sized
        from ocgis_ray.sources.pages import synthesize_pages_batch

        docs = read_parquet_sized(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "source", "n_chars"],
            filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
        )
        ds = docs.map_batches(
            lambda b: synthesize_pages_batch(b, reps=reps),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.drop_columns(["html", "text"])
        ds = geocode(ds)
        return spatial_join(
            ds, load_layer(layer_name),
            how="inner", res=7, concurrency=2, batch_size=8192,
        )

    parts = [str(i) for i in range(n_partitions)]
    return lineage.run_partitioned(make_ds, out_dir, parts, resume=resume)
