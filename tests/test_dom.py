"""DOM-aware boilerplate removal (stages/dom.py) + the messy-HTML
fixture source (sources/messy.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocgis_ray.stages.dom import DomExtractor, extract_text, make_extractor

MESSY_EN = """<!DOCTYPE html><html><head><title>My Site</title>
<script>var x = 1; function f(){return "nav junk";}</script>
<style>.a{color:red}</style></head>
<body>
<header><h1>SiteName</h1><nav><a href="/">Home</a> <a href="/about">About</a></nav></header>
<div class="sidebar"><ul><li><a href="/t1">Trending one</a></li><li><a href="/t2">Trending two</a></li></ul></div>
<div id="main">
  <h2>The Discovery of the Ancient Harbor</h2>
  <p>Archaeologists announced on Tuesday that they have uncovered the remains of an ancient harbor
  near the coastal town, a find that they said could reshape the understanding of trade routes in
  the region during the early classical period.</p>
  <p>Short linking para.</p>
  <p>The excavation, which began three years ago as a modest survey, expanded rapidly after workers
  found a series of stone quays and the hull of a merchant vessel preserved in the mud. Experts from
  three universities have been involved in the effort since then.</p>
  <div class="share"><a href="#">Share on X</a> <a href="#">Share on FB</a></div>
</div>
<footer>&copy; 2026 My Site. All rights reserved. <a href="/privacy">Privacy</a></footer>
</body></html>"""


def test_justext_path_keeps_content_drops_chrome():
    out = extract_text(MESSY_EN)
    # content paragraphs survive (jusText good blocks)
    assert "Archaeologists announced" in out
    assert "The excavation" in out
    # short paragraph between two good blocks survives (context pass)
    assert "Short linking para." in out
    # heading preceding good content is promoted
    assert out.startswith("The Discovery of the Ancient Harbor")
    # chrome dies: nav/sidebar/share/footer/script/style
    for junk in ("Trending", "Home", "About", "Share on", "rights reserved",
                 "var x", "color:red", "SiteName"):
        assert junk not in out


def test_deterministic_and_bytes_str_equivalent():
    a = extract_text(MESSY_EN)
    assert extract_text(MESSY_EN) == a
    assert extract_text(MESSY_EN.encode()) == a
    assert extract_text(memoryview(MESSY_EN.encode())) == a


def test_non_english_fallback():
    de = ("<html><body><nav><a href='/'>Start</a></nav>"
          "<p>Die Forscher gaben am Dienstag bekannt, dass sie die "
          "Überreste eines antiken Hafens in der Nähe der "
          "Küstenstadt entdeckt haben, ein Fund der das "
          "Verständnis der Handelswege neu gestalten könnte.</p>"
          "<footer><a href='/i'>Impressum</a></footer></body></html>")
    out = extract_text(de)
    assert "Forscher" in out
    assert "Impressum" not in out and "Start" not in out


def test_entities_decoded_and_copyright_killed():
    h = ("<html><body><p>Tom &amp; Jerry went to the harbor and they "
         "watched the boats come in for an hour before they walked home "
         "along the shore road together in the evening light of autumn.</p>"
         "<p>&copy; 2026 Somebody. All of the rights that there are "
         "would appear to be reserved here by the owner of this site "
         "for all time and in every place they could possibly be.</p>"
         "</body></html>")
    out = extract_text(h)
    assert "Tom & Jerry" in out
    assert "©" not in out and "reserved" not in out


def test_pathological_inputs_no_raise():
    for bad in (b"", b"<<<>>>", b"\xff\xfe\x00garbage", b"<p>" * 5000,
                b"<a href='x'>" * 1000, b"plain text only here",
                b"<table><tr><td>x</td></tr>"):
        assert isinstance(extract_text(bad), str)


def test_single_near_good_block_rescued():
    # one sub-200-char English paragraph: context pass would default
    # page edges to bad; the rescue keeps it
    h = ("<html><body><p>This is a small page with only the one "
         "paragraph of text on it for you.</p></body></html>")
    assert "small page" in extract_text(h)


def test_make_extractor_registry():
    from ocgis_ray.stages.extract import HtmlExtractor

    assert isinstance(make_extractor("regex"), HtmlExtractor)
    assert isinstance(make_extractor("dom"), DomExtractor)
    with pytest.raises(ValueError, match="unknown extractor"):
        make_extractor("nope")


def test_dom_extractor_batch_api():
    t = pa.table({
        "html": pa.array([MESSY_EN.encode(), b"", None], pa.binary()),
        "k": pa.array([1, 2, 3]),
    })
    out = DomExtractor()(t)
    assert out.column_names == ["html", "k", "text_extracted"]
    assert "Archaeologists" in out["text_extracted"][0].as_py()
    assert out["text_extracted"][1].as_py() == ""
    # null html -> deterministic empty (None decodes via bytes(None)?
    # no — to_pylist yields None; extract_text(None) must not crash)
    assert out["text_extracted"][2].as_py() == ""


def test_messy_pages_ground_truth_roundtrip(ray_session):
    """The messy corpus satisfies the WET contract: stored text ==
    DOM re-extraction, chrome never leaks into ground truth."""
    import pyarrow.parquet as pq

    from ocgis_ray.sources.messy import messy_html_batch
    from ocgis_ray.sources.pages import synthesize_pages_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"]).slice(0, 60)
    pages = synthesize_pages_batch(docs, reps=2)
    messy = messy_html_batch(pages)
    ext = DomExtractor()(messy)
    for i in range(0, messy.num_rows, 7):
        t = ext["text_extracted"][i].as_py()
        assert extract_text(bytes(messy["html"][i].as_py())) == t
        assert "Trending" not in t and "cookies" not in t \
            and "rights reserved" not in t
        orig = pages["text"][i].as_py()
        if len(orig.split()) >= 15:
            assert orig in t


def test_messy_fat_rows(ray_session):
    """body_reps scales text size for the fat-row A/B corpus."""
    import pyarrow.parquet as pq

    from ocgis_ray.sources.messy import messy_html_batch
    from ocgis_ray.sources.pages import synthesize_pages_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"]).slice(0, 4)
    pages = synthesize_pages_batch(docs, reps=1)
    fat = messy_html_batch(pages, body_reps=16)
    ext = DomExtractor()(fat)
    for i in range(fat.num_rows):
        t = ext["text_extracted"][i].as_py()
        orig = pages["text"][i].as_py()
        if len(orig.split()) >= 15:
            assert t.count(orig) == 16
            assert len(t) > 16 * len(orig)


def test_double_br_paragraph_split():
    """<br><br> (the tag-soup paragraph separator) splits blocks;
    a single <br> stays inline (jusText semantics)."""
    h = ("<html><body>"
         "The first paragraph has plenty of words in it and they are "
         "the kind of words that a person would write in an article "
         "about anything at all."
         "<br><br>"
         "The second paragraph also has plenty of words and it should "
         "be its own block after the double break so that both of "
         "them classify on their own."
         "<br>single break stays inline with more of the same words "
         "that we have been writing here for this test of the single "
         "line break case today.</body></html>")
    out = extract_text(h)
    assert out.count("\n\n") == 1
    assert "single break stays inline" in out
    # whitespace between the two br tags still splits
    assert extract_text(h.replace("<br><br>", "<br>\n <br/>")) \
        .count("\n\n") == 1
