"""Flagship pipeline + driver contract."""

import numpy as np
import pytest


def test_entry_contract(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    pdf = res.to_pandas()
    assert len(pdf) > 0
    assert {"ugid", "cell_r8", "n_pages", "sum_chars"} <= set(pdf.columns)
    # rollup conservation: per-ugid totals match the join counts
    assert (pdf["n_pages"] > 0).all()


def test_queries_and_oracles_consistent():
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 30
    assert set(oracles) <= set(qs)
    # every oracle is a non-trivial SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_flagship_rollup_conserves_join_rows(ray_session, sf_dir):
    from ocgis_ray.pipelines.flagship import flagship
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.sources.pages import pages_dataset
    from ocgis_ray.stages.geocode import geocode
    from ocgis_ray.stages.spatial_join import spatial_join

    roll = flagship(sf_dir, extract_concurrency=1, probe_concurrency=1).to_pandas()
    ds = geocode(pages_dataset(sf_dir).drop_columns(["html"]))
    join_rows = spatial_join(ds, layer("world_regions"), how="inner", concurrency=2).count()
    assert roll["n_pages"].sum() == join_rows
    # sorted output
    assert roll.sort_values(["ugid", "cell_r8"]).equals(roll.reset_index(drop=True))


def test_flagship_detects_corruption(ray_session, sf_dir, monkeypatch):
    """The byte-identity assert stage actually fires."""
    import pyarrow as pa

    from ocgis_ray.pipelines import flagship as fl

    class BadExtractor:
        def __init__(self, *a, **k):
            pass

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.append_column(
                "text_extracted", pa.array(["CORRUPT"] * t.num_rows)
            )

    monkeypatch.setattr(fl, "HtmlExtractor", BadExtractor)
    with pytest.raises(Exception, match="byte-identity|RayTaskError|ValueError"):
        fl.flagship(sf_dir, extract_concurrency=1, probe_concurrency=1).to_pandas()


def test_fused_worker_matches_composable(ray_session, sf_dir):
    """FusedPageWorker (bench path) emits the same (page_id, ugid)
    join rows as the composable stage pipeline."""
    import pyarrow.parquet as pq

    from ocgis_ray.pipelines.flagship import FusedPageWorker
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.sources.pages import synthesize_pages_batch
    from ocgis_ray.stages.geocode import geocode_batch
    from ocgis_ray.stages.spatial_join import SpatialJoinProbe, build_index

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pages = synthesize_pages_batch(docs)
    idx = build_index(layer("world_regions"), res=7)

    fused = FusedPageWorker(idx)(pages)
    composable = SpatialJoinProbe(idx, how="inner")(
        geocode_batch(pages.drop_columns(["html"]))
    )
    a = sorted(zip(fused["page_id"].to_pylist(), fused["ugid"].to_pylist()))
    b = sorted(zip(composable["page_id"].to_pylist(), composable["ugid"].to_pylist()))
    assert a == b
    # analysis columns present and sane
    assert "token_count" in fused.column_names
    assert "quality" in fused.column_names


def test_flagship_from_parquet(ray_session, sf_dir, tmp_path):
    from ocgis_ray.pipelines.flagship import flagship, flagship_from_parquet
    from ocgis_ray.sources.pages import materialize_pages_parquet

    p = materialize_pages_parquet(sf_dir, 4, str(tmp_path), num_blocks=4, concurrency=2)
    roll = flagship_from_parquet(p).to_pandas()
    base = flagship(sf_dir, extract_concurrency=1, probe_concurrency=1).to_pandas()
    # same tiles, same counts as the composable flagship
    a = roll[["ugid", "cell_r8", "n_pages", "sum_chars"]].reset_index(drop=True)
    b = base[["ugid", "cell_r8", "n_pages", "sum_chars"]].reset_index(drop=True)
    assert a.equals(b)


def test_fused_worker_corruption_detected(ray_session, sf_dir):
    import pyarrow as pa
    import pytest as _pytest

    from ocgis_ray.pipelines.flagship import FusedPageWorker
    from ocgis_ray.sources.cabinet import layer
    from ocgis_ray.stages.spatial_join import build_index

    idx = build_index(layer("world_regions"), res=7)
    w = FusedPageWorker(idx)
    bad = pa.table({
        "page_id": pa.array([1], pa.int64()),
        "html": pa.array([b"<article>real</article>"], pa.binary()),
        "text": pa.array(["tampered"]),
        "n_chars": pa.array([8], pa.int64()),
        "warc_ts": pa.array([0], pa.int64()),
    })
    with _pytest.raises(ValueError, match="byte-identity"):
        w(bad)
