"""WARC source: round-trip through the real container format (plain
and per-record-gzip), streaming block bounds, HTTP-head stripping,
non-response skipping, multi-file parallel read."""

import os

import numpy as np
import pytest


def _recs(n, start=0):
    return [(f"https://ex{i}.org/p", f"2026-01-0{1 + i % 9}T00:00:00Z",
             (f"<html><body>doc {i} " + "x" * (i % 200) + "</body></html>")
             .encode())
            for i in range(start, start + n)]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip(tmp_path, ray_session, gz):
    from ocgis_ray.sources.warc import read_warc, write_warc

    recs = _recs(37)
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    assert write_warc(path, recs, gzip_members=gz) == 37
    out = read_warc(path).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 37
    exp = sorted(recs)
    assert list(out["url"]) == [r[0] for r in exp]
    assert list(out["warc_ts"]) == [r[1] for r in exp]
    # payload BYTES survive exactly (the per-row invariant)
    assert [bytes(b) for b in out["html"]] == [r[2] for r in exp]


def test_streaming_blocks_and_small_chunks(tmp_path, ray_session):
    """Tiny chunk size + tiny rows_per_block forces the incremental
    parser through every resume path (header split across chunks,
    payload split, gzip member split)."""
    from ocgis_ray.sources.warc import WarcDatasource
    import ray

    recs = _recs(23)
    path = str(tmp_path / "s.warc.gz")
    from ocgis_ray.sources.warc import write_warc

    write_warc(path, recs)
    ds = ray.data.read_datasource(
        WarcDatasource(path, rows_per_block=4, chunk_bytes=97))
    out = ds.to_pandas()
    assert len(out) == 23
    assert out["html"].map(len).gt(0).all()


def test_skips_non_response_records(tmp_path, ray_session):
    from ocgis_ray.sources.warc import _gzip_member, read_warc

    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    resp_body = b"HTTP/1.1 200 OK\r\n\r\n<html>ok</html>"
    resp = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x.org\r\n"
            b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
            b"Content-Length: " + str(len(resp_body)).encode()
            + b"\r\n\r\n" + resp_body + b"\r\n\r\n")
    path = tmp_path / "m.warc.gz"
    path.write_bytes(_gzip_member(info) + _gzip_member(resp))
    out = read_warc(str(path)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "url"] == "https://x.org"
    assert bytes(out.loc[0, "html"]) == b"<html>ok</html>"


def test_multi_file_and_extraction_pipeline(tmp_path, ray_session):
    """WARC -> html -> the engine's extraction stage: the source slots
    into the pages pipeline surface."""
    from ocgis_ray.sources.warc import read_warc, write_warc

    for j in range(3):
        write_warc(str(tmp_path / f"part{j}.warc.gz"), _recs(10, start=10 * j))
    ds = read_warc(str(tmp_path))
    assert ds.count() == 30
    import pyarrow as pa

    def to_text(t: pa.Table) -> pa.Table:
        html = [x.as_py().decode() for x in t["html"]]
        text = [h.split("<body>")[1].split("</body>")[0] for h in html]
        return t.append_column("text", pa.array(text, pa.string()))

    out = ds.map_batches(to_text, batch_format="pyarrow").to_pandas()
    assert out["text"].str.startswith("doc ").all()


def test_malformed_raises(tmp_path, ray_session):
    from ocgis_ray.sources.warc import read_warc

    path = tmp_path / "bad.warc"
    path.write_bytes(b"NOT A WARC\r\n\r\npayload")
    with pytest.raises(Exception, match="malformed WARC|WARC"):
        read_warc(str(path)).to_pandas()


def test_truncated_warc_raises(tmp_path, ray_session):
    from ocgis_ray.sources.warc import _gzip_member, read_warc

    body = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.org\r\n"
           b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(body)).encode()
           + b"\r\n\r\n" + body + b"\r\n\r\n")
    # plain file cut mid-payload
    p = tmp_path / "cut.warc"
    p.write_bytes(rec + rec[: len(rec) // 2])
    with pytest.raises(Exception, match="truncated WARC"):
        read_warc(str(p)).to_pandas()
    # gzip member cut mid-deflate-stream: surfaces either as the Arrow
    # gzip codec's own error (Ray auto-decompresses .gz by extension)
    # or as the parser's trailing-bytes check
    gz = _gzip_member(rec)
    p2 = tmp_path / "cut.warc.gz"
    p2.write_bytes(gz + gz[: len(gz) // 2])
    with pytest.raises(Exception,
                       match="truncated WARC|[Tt]runcated compressed"):
        read_warc(str(p2)).to_pandas()


def test_directory_read_skips_foreign_files(tmp_path, ray_session):
    from ocgis_ray.sources.warc import read_warc, write_warc

    write_warc(str(tmp_path / "a.warc.gz"), _recs(5))
    (tmp_path / "manifest.json").write_text("{}")
    (tmp_path / "side.parquet").write_bytes(b"PAR1 not a warc PAR1")
    out = read_warc(str(tmp_path)).to_pandas()
    assert len(out) == 5


def test_one_byte_chunks_gzip_probe(tmp_path, ray_session):
    import ray

    from ocgis_ray.sources.warc import WarcDatasource, write_warc

    path = str(tmp_path / "tiny.warc.gz")
    write_warc(path, _recs(3))
    ds = ray.data.read_datasource(
        WarcDatasource(path, rows_per_block=2, chunk_bytes=1))
    assert ds.count() == 3
