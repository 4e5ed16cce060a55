"""Outlink / anchor-text extraction (stages/links.py).

Parity model: a deliberately slow pure-Python re.findall parser
implementing the same documented grammar — the vectorized Arrow path
must agree on arbitrary tag soup, and on the messy fixture the result
must equal the analytic expectation from the template arithmetic.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd
from ocgis_ray.sources.messy import messy_html_batch
from ocgis_ray.sources.pages import synthesize_pages_batch
from ocgis_ray.stages.links import (LINK_COLUMNS, add_inlink_counts,
                                    add_outlink_stats, anchor_rollup,
                                    extract_outlinks, host_edges,
                                    outlink_arrays)

_HREF_RE = re.compile(
    r"href=(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>][^\s>]*))", re.S)
_ANCHOR_RE = re.compile(r"[^>]*>([^<]*)", re.S)
_ENT = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def _py_links(html: bytes, url: str) -> list[tuple[str, str]]:
    """Slow reference: (dst_url, anchor) per kept link."""
    m_base = re.match(r"([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)", url)
    scheme, host, path = m_base.groups()
    path = re.sub(r"(?s)[?#].*$", "", path)
    base_dir = re.sub(r"[^/]*$", "", path) or "/"
    out = []
    s = html.decode("utf-8", "replace")
    for m in _HREF_RE.finditer(s):
        href = next(g for g in m.groups() if g is not None)
        am = _ANCHOR_RE.match(s[m.end():])  # after the href token
        anchor = am.group(1) if am else ""
        anchor = anchor.strip()
        for e, c in _ENT:
            anchor = anchor.replace(e, c)
        href = re.sub(r"(?s)#.*$", "", href).strip()
        if not href or any(href.lower().startswith(p) for p in
                           ("javascript:", "mailto:", "data:", "tel:")):
            continue
        if re.match(r"[A-Za-z][A-Za-z0-9+.-]*://", href):
            dst = href
        elif href.startswith("//"):
            dst = f"{scheme}:{href}"
        elif href.startswith("/"):
            dst = f"{scheme}://{host}{href}"
        else:
            dst = f"{scheme}://{host}{base_dir}{href}"
        out.append((dst, anchor))
    return out


def _arrays(html_rows, urls):
    h = pa.array(html_rows, pa.binary())
    u = pa.array(urls, pa.string())
    cols, parent = outlink_arrays(h, u)
    return pd.DataFrame(
        {k: v.to_pandas() for k, v in cols.items()}).assign(parent=parent)


def test_quote_styles_and_drops():
    html = (b'<a href="/a">A</a><a href=\'/b\'>B</a><a href=/c>C</a>'
            b'<a href="#">frag</a><a href="/d#sec">D</a>'
            b'<a href="javascript:void(0)">js</a>'
            b'<a href="MAILTO:x@y.z">m</a><a href="tel:+1">t</a>'
            b'<a href="">empty</a>')
    df = _arrays([html], ["https://h.example.com/p/1"])
    assert list(df["href"]) == ["/a", "/b", "/c", "/d"]
    assert list(df["anchor"]) == ["A", "B", "C", "D"]
    assert list(df["link_pos"]) == [0, 1, 2, 3]
    assert all(df["dst_url"].str.startswith("https://h.example.com/"))


def test_resolution_cases():
    html = (b'<a href="http://abs.example.com/x">abs</a>'
            b'<a href="//proto.example.com/y">pr</a>'
            b'<a href="/root">r</a>'
            b'<a href="rel.html">rel</a>')
    df = _arrays([html], ["https://h.example.com/dir/page.html?q=1"])
    assert list(df["dst_url"]) == [
        "http://abs.example.com/x",
        "https://proto.example.com/y",
        "https://h.example.com/root",
        "https://h.example.com/dir/rel.html",
    ]
    assert list(df["dst_host"]) == [
        "abs.example.com", "proto.example.com",
        "h.example.com", "h.example.com"]
    assert list(df["is_internal"]) == [False, False, True, True]
    # pathless base: relative resolves against "/"
    df2 = _arrays([b'<a href="z">z</a>'], ["https://h.example.com"])
    assert list(df2["dst_url"]) == ["https://h.example.com/z"]


def test_anchor_edge_cases():
    html = (b'<a href="/x" class="big" id=z>Spaced  text </a>'
            b'<a href="/y"><b>nested</b></a>'
            b'<a href="/e">News &amp; Events &amp;lt;</a>')
    df = _arrays([html], ["https://h.example.com/"])
    # attributes between href and > are skipped; nested tag gives an
    # empty first text node; &amp; unescapes last
    assert list(df["anchor"]) == ["Spaced  text", "", "News & Events &lt;"]


def test_null_and_linkless_rows():
    df = _arrays([None, b"<p>no links here</p>", b'<a href="/a">A</a>'],
                 ["https://a.example.com/", "https://b.example.com/",
                  "https://c.example.com/"])
    assert list(df["parent"]) == [2]
    assert list(df["src_host"]) == ["c.example.com"]


def test_invalid_utf8_href_fallback():
    html = b'<a href="/ok">A</a><a href="/bad\xff\xfe">B</a>'
    df = _arrays([html], ["https://h.example.com/"])
    assert list(df["href"])[0] == "/ok"
    assert df["href"][1].startswith("/bad")  # lossy-decoded, kept


def test_python_reference_parity_on_messy_fixture():
    docs = pa.table({
        "doc_id": pa.array(np.arange(17), pa.int64()),
        "text": [f"body text for document {i} " * 12 for i in range(17)],
        "lang": ["en"] * 17, "source": ["t"] * 17,
        "n_chars": pa.array([10] * 17, pa.int64())})
    messy = messy_html_batch(synthesize_pages_batch(docs, reps=2))
    cols, parent = outlink_arrays(messy["html"], messy["url"])
    got = list(zip(cols["dst_url"].to_pylist(), cols["anchor"].to_pylist()))
    exp, exp_parent = [], []
    for i in range(messy.num_rows):
        links = _py_links(bytes(messy["html"][i].as_py()),
                          messy["url"][i].as_py())
        exp.extend(links)
        exp_parent.extend([i] * len(links))
    assert got == exp
    assert list(parent) == exp_parent
    # analytic expectation from the template: 10 links/page, exactly
    # one external (the partner link at (pid*13+3) % 1000)
    pid = messy["page_id"].to_numpy(zero_copy_only=False)
    assert len(parent) == 10 * messy.num_rows
    ext = pd.DataFrame({
        "p": parent,
        "e": ~np.asarray(cols["is_internal"].to_pylist())}
    ).groupby("p")["e"].sum()
    assert (ext == 1).all()
    partner = np.asarray(cols["dst_host"].to_pylist()).reshape(-1, 10)[:, 9]
    exp_partner = [f"site-{(int(p) * 13 + 3) % 1000}.example.com"
                   for p in pid]
    assert list(partner) == exp_partner


@pytest.fixture(scope="module")
def messy_ds():
    docs = pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "text": [f"document body {i} words " * 10 for i in range(40)],
        "lang": ["en"] * 40, "source": ["t"] * 40,
        "n_chars": pa.array([10] * 40, pa.int64())})
    pages = messy_html_batch(synthesize_pages_batch(docs, reps=2))
    return rd.from_arrow(pages)


def test_extract_outlinks_dataset(messy_ds):
    pdf = extract_outlinks(messy_ds, carry=("page_id", "url")).to_pandas()
    assert set(LINK_COLUMNS) <= set(pdf.columns)
    assert len(pdf) == 10 * 80
    assert pdf["page_id"].notna().all()


def test_outlink_stats(messy_ds):
    stats = add_outlink_stats(messy_ds).select_columns(
        ["page_id", "n_outlinks", "n_internal", "n_external"]).to_pandas()
    assert (stats["n_outlinks"] == 10).all()
    assert (stats["n_internal"] == 9).all()
    assert (stats["n_external"] == 1).all()


def test_host_edges_feed_pagerank(messy_ds):
    from ocgis_ray.stages.graph import pagerank, pagerank_local

    links = extract_outlinks(messy_ds, carry=("page_id",))
    edges = host_edges(links).filter(expr="src != dst")
    pdf = edges.to_pandas()
    # analytic graph: site-(p%1000) -> site-((p*13+3)%1000) per page
    # id (one partner link per page), distinct edges
    pid = messy_ds.select_columns(["page_id"]).to_pandas()["page_id"]
    exp = pd.DataFrame({
        "src": [f"site-{p % 1000}.example.com" for p in pid],
        "dst": [f"site-{(p * 13 + 3) % 1000}.example.com" for p in pid],
    })
    exp = exp[exp["src"] != exp["dst"]].drop_duplicates()
    got = pdf[["src", "dst"]].sort_values(["src", "dst"]).reset_index(drop=True)
    exps = exp.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exps)
    ranks = pagerank(edges, iters=3, mode="broadcast").to_pandas()
    local = pagerank_local(exp, damping=0.85, iters=3)
    merged = ranks.set_index("node")["rank"]
    assert np.allclose(merged.reindex(local.index), local.to_numpy())


def test_add_inlink_counts():
    # hand-built corpus where link targets ARE page urls: a -> b,
    # b -> a and c, c -> a (two distinct hosts referencing a)
    urls = ["https://a.example.com/", "https://b.example.com/",
            "https://c.example.com/"]
    html = [b'<a href="https://b.example.com/">to b</a>',
            b'<a href="https://a.example.com/">to a</a>'
            b'<a href="https://c.example.com/">to c</a>',
            b'<a href="https://a.example.com/">to a again</a>']
    pages = rd.from_arrow(pa.table({
        "page_id": pa.array([0, 1, 2], pa.int64()),
        "url": pa.array(urls, pa.string()),
        "html": pa.array(html, pa.binary())}))
    links = extract_outlinks(pages, carry=("page_id",))
    got = (add_inlink_counts(pages.drop_columns(["html"]), links)
           .to_pandas().set_index("url").sort_index())
    assert got.loc[urls[0], "n_refs"] == 2
    assert got.loc[urls[0], "n_src_hosts"] == 2
    assert got.loc[urls[1], "n_refs"] == 1
    assert got.loc[urls[2], "n_refs"] == 1
    assert set(got.columns) >= {"page_id", "n_refs", "n_src_hosts"}


def test_anchor_rollup(messy_ds):
    links = extract_outlinks(messy_ds, carry=("page_id",))
    roll = anchor_rollup(links).to_pandas()
    pdf = extract_outlinks(messy_ds, carry=("page_id",)).to_pandas()
    exp = (pdf.groupby("dst_url")
           .agg(n_refs=("src_host", "size"),
                n_src_hosts=("src_host", "nunique")))
    got = roll.set_index("dst_url").sort_index()
    exp = exp.sort_index()
    assert (got["n_refs"] == exp["n_refs"]).all()
    assert (got["n_src_hosts"] == exp["n_src_hosts"]).all()
