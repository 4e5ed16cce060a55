"""Messy-HTML page synthesis — the realistic-crawl fixture source.

``sources.pages`` emits clean ``<article>`` wrappers matched to the
RE2 extractor; REAL crawl HTML is tag soup: headers, nav bars, cookie
banners, sidebars, share widgets, footers, scripts and entities around
the content.  This module synthesizes that shape deterministically so
``stages.dom.DomExtractor`` (the trafilatura-class extractor) can be
validated and benchmarked end to end without external data (the north
rule forbids it).

Ground truth follows the WET convention: the stored ``text`` column IS
the DOM extractor's output over the messy ``html`` (computed once at
materialization, exactly like a WET file is derived from its WARC), so
the fused flagship's per-row byte-identity invariant holds over the
messy corpus by construction — re-extraction must reproduce the stored
bytes.

``body_reps`` scales the body: each rep is its own ``<p>`` paragraph,
so ``body_reps=16`` yields ~10 KB text rows — the fat-row corpus for
the cleaning-cascade A/B (real Common-Crawl rows are ~10-100 KB, where
shuffle-byte trades flip; BASELINE.md round-3 negative result).

Chrome varies deterministically by page_id (nav targets, sidebar
stories, template flavor) so the extractor can't pattern-match a fixed
byte prefix.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ocgis_ray.sources.pages import (REPS, PagesSynthesizer,
                                     synthesize_pages_batch)

_HEAD = ("<!DOCTYPE html><html><head><title>", "</title>"
         "<script>window.dataLayer=window.dataLayer||[];"
         "dataLayer.push({'event':'pageview'});</script>"
         "<style>.nav li{display:inline}.sidebar{float:right}</style>"
         "</head><body>")


def messy_html_batch(t: pa.Table, body_reps: int = 1) -> pa.Table:
    """Replace ``html`` with chrome-wrapped tag soup (vectorized Arrow
    string concat — no Python rows).  Requires page_id/url/text
    columns; ``text`` becomes ``body_reps`` ``<p>`` paragraphs."""
    pid = t["page_id"].to_numpy(zero_copy_only=False)
    pid_s = pc.cast(t["page_id"], pa.string())
    site = pc.binary_join_element_wise(
        "site-", pc.cast(pa.array(pid % 1000), pa.string()),
        ".example.com", "")
    prev_s = pc.cast(pa.array(pid - 1), pa.string())
    next_s = pc.cast(pa.array(pid + 1), pa.string())
    trend_a = pc.cast(pa.array((pid * 7 + 13) % 100000), pa.string())
    trend_b = pc.cast(pa.array((pid * 31 + 5) % 100000), pa.string())

    header = pc.binary_join_element_wise(
        "<header><div class=\"logo\">", site, "</div>"
        "<nav><ul><li><a href=\"/\">Home</a></li>"
        "<li><a href=\"/news\">News &amp; Events</a></li>"
        "<li><a href=\"/p/", prev_s, "\">Prev</a></li>"
        "<li><a href=\"/p/", next_s, "\">Next</a></li></ul></nav>"
        "</header>"
        "<div class=\"cookie\">We use cookies to improve your "
        "experience. <a href=\"/privacy\">Learn more</a></div>", "")
    sidebar = pc.binary_join_element_wise(
        "<aside class=\"sidebar\"><h3>Trending</h3><ul>"
        "<li><a href=\"/p/", trend_a, "\">story ", trend_a, "</a></li>"
        "<li><a href=\"/p/", trend_b, "\">story ", trend_b, "</a></li>"
        "</ul></aside>", "")
    # body: body_reps paragraphs, each "<p>{text}</p>"
    para = pc.binary_join_element_wise("<p>", t["text"], "</p>", "")
    body = para
    for _ in range(body_reps - 1):
        body = pc.binary_join_element_wise(body, para, "")
    # template flavor varies by page: half the pages nest the article
    # in a main/section wrapper, half in plain div soup
    flavor = pa.array(pid % 2 == 0)
    open_tag = pc.if_else(
        flavor,
        pa.scalar("<main><article class=\"post\">"),
        pa.scalar("<div id=\"content\"><div class=\"post-inner\">"))
    close_tag = pc.if_else(
        flavor, pa.scalar("</article></main>"), pa.scalar("</div></div>"))
    article = pc.binary_join_element_wise(
        open_tag, "<h2>Report ", pid_s, "</h2>", body,
        "<div class=\"share\"><a href=\"#\">Share</a> "
        "<a href=\"#\">Tweet</a></div>", close_tag, "")
    partner = pc.binary_join_element_wise(
        "https://site-", pc.cast(pa.array((pid * 13 + 3) % 1000), pa.string()),
        ".example.com/", "")
    footer = pc.binary_join_element_wise(
        "<footer><p>&copy; 2026 ", site, ". All rights reserved.</p>"
        "<ul><li><a href=\"/terms\">Terms</a></li>"
        "<li><a href=\"/privacy\">Privacy</a></li>"
        "<li><a href=\"", partner, "\">Partner site</a></li></ul></footer>"
        "</body></html>", "")
    title = pc.binary_join_element_wise(site, " &mdash; page-", pid_s, "")
    html = pc.binary_join_element_wise(
        _HEAD[0], title, _HEAD[1], header, sidebar, article, footer, "")
    return t.set_column(t.schema.get_field_index("html"), "html",
                        pc.cast(html, pa.binary()))


class MessyPagesSynthesizer(PagesSynthesizer):
    """Actor stage: range batch -> messy pages batch with WET ground
    truth (``text`` := DOM extraction of the messy ``html``,
    ``n_chars`` := its codepoint length).  The per-row DOM parse is
    the honest cost of ground-truth derivation — exactly what a WET
    generation job pays."""

    def __init__(self, docs_ref, reps: int, body_reps: int = 1):
        super().__init__(docs_ref, reps)
        from ocgis_ray.stages.dom import DomExtractor

        self.body_reps = body_reps
        self.extractor = DomExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = super().__call__(batch)
        pages = messy_html_batch(pages, body_reps=self.body_reps)
        pages = self.extractor(pages)
        text = pages["text_extracted"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        pages = pages.drop_columns(["text_extracted"])
        pages = pages.set_column(
            pages.schema.get_field_index("text"), "text", text)
        return pages.set_column(
            pages.schema.get_field_index("n_chars"), "n_chars", n_chars)


def messy_pages_dataset(sf_dir: str, reps: int = REPS, body_reps: int = 1):
    """Lazy messy-pages Dataset (test-scale; bench uses the
    materialized variant)."""
    from ocgis_ray.sources.io import read_parquet_sized
    from ocgis_ray.stages.dom import DomExtractor
    from ocgis_ray.tuning import task_stage

    extract = task_stage(DomExtractor)

    def f(b: pa.Table) -> pa.Table:
        pages = synthesize_pages_batch(b, reps=reps)
        pages = messy_html_batch(pages, body_reps=body_reps)
        pages = extract(pages)
        text = pages["text_extracted"]
        pages = pages.drop_columns(["text_extracted"])
        pages = pages.set_column(
            pages.schema.get_field_index("text"), "text", text)
        return pages.set_column(
            pages.schema.get_field_index("n_chars"), "n_chars",
            pc.cast(pc.utf8_length(text), pa.int64()))

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"])
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def materialize_messy_pages_parquet(
    sf_dir: str, reps: int, out_dir: str, num_blocks: int = 64,
    concurrency: int = 8, body_reps: int = 1,
) -> str:
    """Messy twin of ``pages.materialize_pages_parquet`` (same
    write-tmp-then-rename idempotency, same range-driven parallel
    synthesis); suffix encodes body_reps when fat rows are requested."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ocgis_ray.stages.dom import DOM_VERSION

    # the tag carries the extractor version: cached ground truth from
    # an older extractor would trip the byte-identity gate
    tag = f"messy_reps{reps}_v{DOM_VERSION}" \
        + (f"_body{body_reps}" if body_reps > 1 else "")
    final = os.path.join(out_dir, tag)
    if os.path.exists(os.path.join(final, "_SUCCESS")):
        return final
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).sort_by("doc_id")
    ref = ray.put(docs)
    ds = rd.range(docs.num_rows * reps, override_num_blocks=num_blocks)
    ds = ds.map_batches(
        MessyPagesSynthesizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"docs_ref": ref, "reps": reps,
                               "body_reps": body_reps},
    )
    tmp = final + "_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    with open(os.path.join(final, "_SUCCESS"), "w") as f:
        f.write("")
    return final
