"""WARC source/sink — the real Common-Crawl container format.

The north-star input is "Common-Crawl-style web pages"; crawls ship as
WARC/1.0 files (ISO 28500): a sequence of records, each a header block
(``WARC/1.0`` + ``Name: value`` lines + blank line), a
``Content-Length``-delimited payload, and a ``\\r\\n\\r\\n`` trailer.
Common Crawl stores each record as its OWN GZIP MEMBER so readers can
split/seek without decompressing the whole file — the writer and
reader here support both that layout and plain uncompressed WARC.

- :class:`WarcDatasource` (``read_warc``): a Ray
  ``FileBasedDatasource`` — files parallelize across read tasks,
  records within a file stream through an incremental parser that
  yields Arrow blocks every ``rows_per_block`` rows, so a 1 GB crawl
  file never materializes as one row.  ``response`` records are
  parsed into ``(url, warc_ts, html)`` — the engine's pages schema
  (``TESTDATA.md``) — with the HTTP response headers stripped from
  the payload; other record types (warcinfo, request, metadata) are
  skipped.
- :func:`write_warc`: deterministic spec-shaped writer used by tests
  and fixture synthesis (stdlib gzip; fixed mtime=0 so bytes are
  reproducible).

Reference seam: ``DriverNetcdf``/``DriverVector``'s pluggable-source
role (``/root/reference/src/ocgis/driver/nc.py``) — a third container
format behind the same Dataset-of-pages surface.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pyarrow as pa

_CRLF = b"\r\n"


# ------------------------------------------------------------------ writer

def _http_response(body: bytes) -> bytes:
    head = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + _CRLF + _CRLF)
    return head + body


def _warc_record(url: str, ts: str, body: bytes, rec_id: int) -> bytes:
    payload = _http_response(body)
    head = (b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:" + f"{rec_id:032x}".encode() + b">\r\n"
            b"WARC-Date: " + ts.encode() + _CRLF +
            b"WARC-Target-URI: " + url.encode() + _CRLF +
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF + _CRLF)
    return head + payload + _CRLF + _CRLF


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (zlib's gzip wrapper writes
    mtime=0 / no filename, unlike the gzip module — bytes are
    reproducible)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def write_warc(path: str, records, gzip_members: bool = True) -> int:
    """Write ``records`` (iterable of ``(url, warc_ts, html_bytes)``)
    as a WARC file — one gzip member per record when ``gzip_members``
    (the Common Crawl layout), else plain.  Returns record count."""
    n = 0
    with open(path, "wb") as f:
        for i, (url, ts, body) in enumerate(records):
            raw = _warc_record(str(url), str(ts), bytes(body), i)
            f.write(_gzip_member(raw) if gzip_members else raw)
            n += 1
    return n


# ------------------------------------------------------------------ parser

class _RecordParser:
    """Incremental WARC record parser over a byte stream (plain or
    concatenated-gzip-members).  Feed chunks; yields
    ``(headers: dict, payload: bytes)``."""

    def __init__(self):
        self._buf = bytearray()
        self._gz = None          # lazy: decided on first bytes
        self._plain = None
        self._pre = bytearray()  # holds bytes until the format probe

    def feed(self, chunk: bytes) -> Iterator[tuple[dict, bytes]]:
        if self._plain is None:
            # hold bytes until 2 are available — a 1-byte first chunk
            # must not latch a gzip stream as plain
            self._pre.extend(chunk)
            if len(self._pre) < 2:
                return
            self._plain = not self._pre.startswith(b"\x1f\x8b")
            chunk, self._pre = bytes(self._pre), bytearray()
        if self._plain:
            self._buf.extend(chunk)
        else:
            data = chunk
            while data:
                if self._gz is None:
                    self._gz = zlib.decompressobj(16 + zlib.MAX_WBITS)
                self._buf.extend(self._gz.decompress(data))
                data = self._gz.unused_data  # next gzip member
                if data:
                    self._gz = None
                elif self._gz.eof:
                    self._gz = None
        yield from self._drain()

    def finish(self, path: str = "<stream>") -> None:
        """Raise if the stream ended mid-record — silent tail loss in
        a reader whose header path raises would be worse."""
        if self._gz is not None and not self._gz.eof:
            raise ValueError(f"truncated WARC (mid gzip member): {path}")
        if self._buf or self._pre:
            raise ValueError(
                f"truncated WARC ({len(self._buf) + len(self._pre)} "
                f"unparsed trailing bytes): {path}")

    def _drain(self) -> Iterator[tuple[dict, bytes]]:
        while True:
            end = self._buf.find(_CRLF + _CRLF)
            if end < 0:
                return
            head = bytes(self._buf[:end]).decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines or not lines[0].startswith("WARC/"):
                raise ValueError(f"malformed WARC header: {lines[:1]!r}")
            hdrs = {}
            for ln in lines[1:]:
                k, _, v = ln.partition(":")
                hdrs[k.strip().lower()] = v.strip()
            clen = int(hdrs.get("content-length", "0"))
            need = end + 4 + clen + 4  # header + blank + payload + trailer
            if len(self._buf) < need:
                return
            payload = bytes(self._buf[end + 4: end + 4 + clen])
            del self._buf[:need]
            yield hdrs, payload


def _strip_http(payload: bytes) -> bytes:
    """Drop the HTTP response head from a ``msgtype=response`` payload."""
    sep = payload.find(_CRLF + _CRLF)
    return payload[sep + 4:] if sep >= 0 else payload


_SCHEMA = pa.schema([("url", pa.string()),
                     ("warc_ts", pa.string()),
                     ("html", pa.binary())])


def _records_to_block(rows: list) -> pa.Table:
    return pa.table([pa.array([r[0] for r in rows], pa.string()),
                     pa.array([r[1] for r in rows], pa.string()),
                     pa.array([r[2] for r in rows], pa.binary())],
                    schema=_SCHEMA)


try:  # Datasource needs ray at import; keep the module importable bare
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC reader: response records ->
        (url, warc_ts, html) rows, one Arrow block per
        ``rows_per_block`` records — bounded memory per task no
        matter the file size."""

        _FILE_EXTENSIONS = ["warc", "warc.gz"]

        def __init__(self, paths, rows_per_block: int = 512,
                     chunk_bytes: int = 4 << 20, **kwargs):
            # suffix-matched by Ray's _has_file_extension — a directory
            # read must skip co-located parquet/manifest files instead
            # of feeding them to the record parser
            kwargs.setdefault("file_extensions", ["warc", "warc.gz"])
            super().__init__(paths, **kwargs)
            self._rows_per_block = rows_per_block
            self._chunk_bytes = chunk_bytes

        def _read_stream(self, f, path: str):
            parser = _RecordParser()
            rows: list = []
            while True:
                chunk = f.read(self._chunk_bytes)
                if not chunk:
                    break
                for hdrs, payload in parser.feed(chunk):
                    if hdrs.get("warc-type") != "response":
                        continue
                    rows.append((hdrs.get("warc-target-uri", ""),
                                 hdrs.get("warc-date", ""),
                                 _strip_http(payload)))
                    if len(rows) >= self._rows_per_block:
                        yield _records_to_block(rows)
                        rows = []
            parser.finish(path)  # truncated trailing record = ERROR
            if rows:
                yield _records_to_block(rows)

except ImportError:  # pragma: no cover
    WarcDatasource = None


def read_warc(paths, rows_per_block: int = 512, **read_kwargs):
    """WARC file(s)/dir -> ``Dataset[(url, warc_ts, html)]``.  Files
    parallelize across Ray read tasks; records stream within each."""
    import ray

    return ray.data.read_datasource(
        WarcDatasource(paths, rows_per_block=rows_per_block), **read_kwargs)


def warc_to_pages(ds, page_id: str = "url", batch_size: int = 2048,
                  extractor: str = "regex"):
    """Adapt WARC rows to the engine's pages schema — the WET step:

    - ``page_id``: parsed from the synthetic ``/p/<id>`` url tail
      (``page_id="url"``), or derived as the full-url content hash
      (``page_id="hash"``) for real crawls whose urls carry no id;
    - ``warc_ts``: ISO-8601 string -> timestamp[us] (``T``/space and
      trailing ``Z`` both accepted);
    - ``text``: WET extraction from ``html`` via the selected
      ``extractor`` — ``"regex"`` (the synthetic ``<article>``
      kernel) or ``"dom"`` (``stages.dom.DomExtractor``, real tag
      soup).  The fused flagship stage re-extracts with the SAME
      extractor and enforces byte identity against this column, so
      the per-row invariant is exercised end to end;
    - ``n_chars``: codepoint length of ``text``; ``lang``: empty
      (langid is a downstream operator).
    """
    import pyarrow.compute as pc

    from ocgis_ray.stages.dom import DomExtractor
    from ocgis_ray.stages.extract import HtmlExtractor
    from ocgis_ray.tuning import task_stage

    if page_id not in ("url", "hash"):
        raise ValueError(f"page_id must be url|hash, got {page_id!r}")
    if extractor not in ("regex", "dom"):
        raise ValueError(f"unknown extractor {extractor!r} (regex|dom)")

    extract = task_stage(
        {"regex": HtmlExtractor, "dom": DomExtractor}[extractor])

    def adapt(t: pa.Table) -> pa.Table:
        if page_id == "url":
            ids = pc.struct_field(
                pc.extract_regex(t["url"], r"/p/(?P<id>[0-9]+)$"), "id")
            if ids.null_count and ids.null_count > t["url"].null_count:
                raise ValueError(
                    "warc_to_pages(page_id='url'): url has no /p/<id> "
                    "tail; use page_id='hash' for real crawl urls")
            ids = pc.cast(ids, pa.int64())
        else:
            import numpy as np

            from ocgis_ray.stages.text import string_value_hash

            ids = pa.array(
                string_value_hash(t["url"]).view(np.int64))
        ts = pc.utf8_rtrim(t["warc_ts"], characters="Z")
        ts = pc.replace_substring(ts, "T", " ", max_replacements=1)
        ts = pc.strptime(ts, format="%Y-%m-%d %H:%M:%S", unit="us")
        t = extract(t)
        text = t["text_extracted"]
        out = pa.table({
            "page_id": ids,
            "url": t["url"],
            "warc_ts": ts,
            "html": t["html"],
            "text": text,
            "lang": pa.array([""] * t.num_rows, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })
        return out

    return ds.map_batches(adapt, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
