"""flagship_from_warc: the WARC front end must produce the same
rollup as the parquet front end over the same pages."""

import numpy as np
import pandas as pd
import pytest


def test_warc_front_end_matches_parquet(tmp_path, ray_session):
    import duckdb
    import ray

    from ocgis_ray.pipelines.flagship import (flagship_from_parquet,
                                              flagship_from_warc)
    from ocgis_ray.sources.pages import materialize_pages_parquet
    from ocgis_ray.sources.warc import write_warc

    raw_path = materialize_pages_parquet(
        "/root/testdata/sf0.001", reps=2, out_dir=str(tmp_path / "pq"),
        num_blocks=4, concurrency=2)
    con = duckdb.connect()
    # the synth n_chars is DOCUMENT metadata (page text gains a rep
    # suffix) which a WARC container cannot carry; align the parquet
    # side to the WET definition (codepoints of the page text) so both
    # front ends derive sum_chars identically
    pq_path = str(tmp_path / "pq_wet.parquet")
    con.execute(
        f"COPY (SELECT * REPLACE (length(text) AS n_chars) "
        f"FROM '{raw_path}/*.parquet') TO '{pq_path}' (FORMAT PARQUET)")
    rows = con.execute(
        f"SELECT url, warc_ts, html FROM '{pq_path}' "
        f"ORDER BY url").fetchall()
    # two WARC files, CC layout
    half = len(rows) // 2
    for j, chunk in enumerate((rows[:half], rows[half:])):
        write_warc(str(tmp_path / f"crawl-{j}.warc.gz"),
                   ((u, ts.isoformat(), bytes(h)) for u, ts, h in chunk))

    a = flagship_from_parquet(pq_path).to_pandas()
    b = flagship_from_warc(str(tmp_path)).to_pandas()
    # identical rollups: same groups, counts, char sums, ts ranges
    cols = ["ugid", "cell_r8", "n_pages", "sum_chars", "min_ts", "max_ts",
            "sum_tokens"]
    pd.testing.assert_frame_equal(
        a[cols].reset_index(drop=True), b[cols].reset_index(drop=True))
    assert len(a) > 0


def test_warc_to_pages_hash_mode_and_bad_urls(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from ocgis_ray.sources.warc import warc_to_pages

    t = pd.DataFrame({
        "url": ["https://real.example.org/article?x=1"],
        "warc_ts": ["2026-01-01T00:00:00Z"],
        "html": [b"<html><article>hi</article></html>"],
    })
    ds = rd.from_arrow(pa.table({
        "url": pa.array(t["url"], pa.string()),
        "warc_ts": pa.array(t["warc_ts"], pa.string()),
        "html": pa.array(t["html"], pa.binary()),
    }))
    # url mode raises on non-synthetic urls
    with pytest.raises(Exception, match="/p/<id>|no /p/"):
        warc_to_pages(ds, page_id="url").to_pandas()
    out = warc_to_pages(ds, page_id="hash").to_pandas()
    assert out.loc[0, "text"] == "hi"
    assert out.loc[0, "n_chars"] == 2
    assert np.issubdtype(out["page_id"].dtype, np.integer)
    with pytest.raises(ValueError, match="url|hash"):
        warc_to_pages(ds, page_id="nope")


def test_warc_dom_extractor_end_to_end(tmp_path, ray_session):
    """flagship_from_warc(extractor="dom") over a MESSY (non-regex)
    crawl fixture: the WARC front end must equal the parquet front end
    over the same messy pages, with the byte-identity invariant
    enforced against the DOM extractor on both paths."""
    import duckdb

    from ocgis_ray.pipelines.flagship import (flagship_from_parquet,
                                              flagship_from_warc)
    from ocgis_ray.sources.messy import materialize_messy_pages_parquet
    from ocgis_ray.sources.warc import write_warc

    pq_path = materialize_messy_pages_parquet(
        "/root/testdata/sf0.001", reps=2, out_dir=str(tmp_path / "pq"),
        num_blocks=4, concurrency=2)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT url, warc_ts, html FROM '{pq_path}/*.parquet' "
        f"ORDER BY url").fetchall()
    assert len(rows) == 1000
    half = len(rows) // 2
    for j, chunk in enumerate((rows[:half], rows[half:])):
        write_warc(str(tmp_path / f"crawl-{j}.warc.gz"),
                   ((u, ts.isoformat(), bytes(h)) for u, ts, h in chunk))

    a = flagship_from_parquet(pq_path, extractor="dom").to_pandas()
    b = flagship_from_warc(str(tmp_path), extractor="dom").to_pandas()
    cols = ["ugid", "cell_r8", "n_pages", "sum_chars", "min_ts", "max_ts",
            "sum_tokens"]
    pd.testing.assert_frame_equal(
        a[cols].reset_index(drop=True), b[cols].reset_index(drop=True))
    assert len(a) > 0 and a["n_pages"].sum() > 0

    # cross-extractor guard: the regex extractor CANNOT reproduce the
    # messy corpus's ground truth (no <article> marker) — the
    # byte-identity gate must fire, proving the invariant is real
    with pytest.raises(Exception, match="byte-identity"):
        flagship_from_parquet(pq_path, extractor="regex").to_pandas()
