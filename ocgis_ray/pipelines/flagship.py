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

import pyarrow.compute as pc

from ocgis_ray.sources.cabinet import layer as load_layer
from ocgis_ray.sources.pages import pages_dataset
from ocgis_ray.stages.extract import HtmlExtractor
from ocgis_ray.stages.geocode import geocode
from ocgis_ray.stages.spatial_join import spatial_join
from ocgis_ray.stages.tiles import grouped_aggregate

SLIM_COLUMNS_DROP = ["html", "text_extracted"]


def flagship(
    sf_dir: str,
    reps: int = 4,
    layer_name: str = "world_regions",
    rollup_cell: str = "cell_r8",
    extract_concurrency: int | None = 4,
    probe_concurrency: int | None = 4,
    verify_extraction: bool = True,
):
    """Full pipeline -> per-(ugid, tile) rollup Dataset (lazy)."""
    ds = pages_dataset(sf_dir, reps=reps)
    ds = ds.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=extract_concurrency,
        batch_size=2048,
    )
    if verify_extraction:
        def check(t):
            bad = pc.sum(
                pc.cast(pc.invert(pc.equal(t["text_extracted"], t["text"])), "int64")
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
        batch_size=8192,
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


def flagship_partitioned(
    sf_dir: str,
    out_dir: str,
    n_partitions: int = 8,
    resume: bool = True,
    **kwargs,
):
    """Resumable variant: doc_id-range partitions, each written
    atomically with a lineage record (``ocgis_ray.state.lineage``).
    Ranges push down to parquet row groups, so resumed runs skip
    completed partitions without reading their input."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ocgis_ray.state import lineage

    meta = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata
    n_docs = meta.num_rows
    step = max(1, (n_docs + n_partitions - 1) // n_partitions)

    def make_ds(part: str):
        lo = int(part) * step
        hi = lo + step
        import ray.data as rd

        from ocgis_ray.sources.pages import synthesize_pages_batch

        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "source", "n_chars"],
            filter=(pads.field("doc_id") >= lo) & (pads.field("doc_id") < hi),
        )
        ds = docs.map_batches(
            lambda b: synthesize_pages_batch(b, reps=kwargs.get("reps", 4)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.drop_columns(["html"])
        ds = geocode(ds)
        return spatial_join(
            ds, load_layer(kwargs.get("layer_name", "world_regions")),
            how="inner", res=7, concurrency=2, batch_size=8192,
        )

    parts = [str(i) for i in range(n_partitions)]
    return lineage.run_partitioned(make_ds, out_dir, parts, resume=resume)
