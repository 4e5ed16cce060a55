"""HTML extraction: byte identity, actor smoke, edge cases."""

import pyarrow as pa

from ocgis_ray.stages.extract import HtmlExtractor, extract, verify_extraction_batch


def test_extractor_class_direct():
    ex = HtmlExtractor()
    t = pa.table({
        "html": pa.array(
            [b"<html><head><title>page-1</title></head><body><article>hello world</article></body></html>"],
            type=pa.binary(),
        )
    })
    out = ex(t)
    assert out["text_extracted"][0].as_py() == "hello world"


def test_extractor_multiline_and_unicode():
    ex = HtmlExtractor()
    body = "line1\nline2 é中文"
    raw = f"<article>{body}</article>".encode()
    t = pa.table({"html": pa.array([raw], type=pa.binary())})
    assert ex(t)["text_extracted"][0].as_py() == body


def test_extractor_no_match_yields_null():
    ex = HtmlExtractor()
    t = pa.table({"html": pa.array([b"<html>no article</html>"], type=pa.binary())})
    assert ex(t)["text_extracted"][0].as_py() is None


def test_byte_identity_pipeline(ray_session, sf_dir):
    from ocgis_ray.sources.pages import pages_dataset

    ds = extract(pages_dataset(sf_dir), concurrency=2)
    violations = ds.map_batches(
        verify_extraction_batch, batch_format="pyarrow"
    ).count()
    assert violations == 0


def test_byte_identity_across_reruns(ray_session, sf_dir):
    from ocgis_ray.sources.pages import pages_dataset

    def run():
        ds = extract(pages_dataset(sf_dir), concurrency=2)
        pdf = ds.select_columns(["url", "text_extracted"]).to_pandas()
        return pdf.sort_values("url").reset_index(drop=True)

    a, b = run(), run()
    assert (a["text_extracted"] == b["text_extracted"]).all()
