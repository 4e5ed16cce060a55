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
