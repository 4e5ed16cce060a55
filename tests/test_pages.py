"""Pages synthesis: determinism + bit-exact DuckDB parity."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from ocgis_ray import grid
from ocgis_ray.sources import pages as P


def _docs(sf_dir):
    return pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_synthesis_deterministic(sf_dir):
    a = P.synthesize_pages_batch(_docs(sf_dir))
    b = P.synthesize_pages_batch(_docs(sf_dir))
    assert a.equals(b)


def test_synthesis_parity_with_sql(sf_dir):
    t = P.synthesize_pages_batch(_docs(sf_dir))
    lon, lat = P.coords_from_page_id(t["page_id"].to_numpy())
    c8 = grid.encode(lon, lat, 8)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    sql = P.geo_cte() + (
        f"\nSELECT page_id, url, text, lon, lat, {grid.encode_sql('lon', 'lat', 8)} AS c8 "
        "FROM geo ORDER BY page_id"
    )
    o = con.execute(sql).fetch_arrow_table()
    order = np.argsort(t["page_id"].to_numpy())
    assert (t["url"].to_numpy(zero_copy_only=False)[order] == o["url"].to_numpy(zero_copy_only=False)).all()
    assert (t["text"].to_numpy(zero_copy_only=False)[order] == o["text"].to_numpy(zero_copy_only=False)).all()
    assert (lon[order] == o["lon"].to_numpy()).all()  # EXACT, not approx
    assert (lat[order] == o["lat"].to_numpy()).all()
    assert (c8[order] == o["c8"].to_numpy()).all()


def test_skew_exists(sf_dir):
    t = P.synthesize_pages_batch(_docs(sf_dir))
    page_id = t["page_id"].to_numpy()
    lon, lat = P.coords_from_page_id(page_id)
    c7 = grid.encode(lon, lat, 7)
    _, counts = np.unique(c7, return_counts=True)
    # hot-city skew: the top cell holds >5% of all pages
    assert counts.max() > 0.05 * len(page_id)


def test_html_wraps_text(sf_dir):
    t = P.synthesize_pages_batch(_docs(sf_dir))
    html = t["html"][0].as_py()
    text = t["text"][0].as_py().encode()
    assert html.startswith(b"<html><head><title>page-")
    assert b"<article>" + text + b"</article>" in html
