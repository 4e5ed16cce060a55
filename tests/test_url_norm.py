"""URL normalization + blocklist filtering (stages/url.py round-4
additions).  Normalization is gated by hash-exact DuckDB parity on
adversarial URLs (hypothesis) plus hand-picked semantics cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd
from ocgis_ray.stages.url import (normalize_url, normalize_url_arrays,
                                  normalize_url_sql, url_filter)


def _norm(urls):
    return normalize_url_arrays(pa.array(urls, pa.string())).to_pylist()


def test_normalize_semantics():
    assert _norm([
        "HTTP://WWW.Example.COM:80/Path/X?a=1&utm_source=x&b=2#frag",
        "https://h.example.com:443/p",
        "https://h.example.com:8443/p",
        "https://h.example.com/p?utm_a=1&UTM_b=2&fbclid=z",
        "https://h.example.com/p?a=1&&b=2",
        "https://h.example.com/p?",
        "relative/no/scheme",
        "https://h.example.com/CaseKeptPath?Q=CaseKeptValue",
    ]) == [
        "http://www.example.com/Path/X?a=1&b=2",
        "https://h.example.com/p",
        "https://h.example.com:8443/p",
        "https://h.example.com/p",
        "https://h.example.com/p?a=1&b=2",
        "https://h.example.com/p",
        "relative/no/scheme",
        "https://h.example.com/CaseKeptPath?Q=CaseKeptValue",
    ]


def test_normalize_null_passthrough():
    assert _norm([None, "https://a.example.com/"]) == \
        [None, "https://a.example.com/"]


_url_chars = st.lists(
    st.sampled_from(
        list("abcXYZ019-._~/?#&=:%@!$'()*+,;") + ["utm_", "://", "&utm_x=1",
                                                  "#f", ":80", ":443"]),
    min_size=0, max_size=25).map("".join)
_schemes = st.sampled_from(["http://", "https://", "HTTP://", "ftp://", ""])
_hosts = st.sampled_from(["Example.COM", "a.b.example.com:80",
                          "h.example.com:443", "h.example.com", "h:80"])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_schemes, _hosts, _url_chars), min_size=1,
                max_size=8))
def test_normalize_duckdb_parity_property(parts):
    urls = [s + h + t for s, h, t in parts]
    tbl = pa.table({"i": list(range(len(urls))),
                    "url": pa.array(urls, pa.string())})
    eng = normalize_url_arrays(tbl["url"]).to_pylist()
    con = duckdb.connect()
    con.register("t", tbl)
    ora = [r[0] for r in con.execute(
        f"SELECT {normalize_url_sql('url')} FROM t ORDER BY i").fetchall()]
    con.close()
    assert eng == ora


def _pages(urls):
    return rd.from_arrow(pa.table({
        "page_id": pa.array(np.arange(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string())}))


def test_url_filter_domains_and_hosts():
    urls = ["https://spam.example.com/x",        # domain-blocked
            "https://sub.spam.example.com/x",    # domain-blocked (suffix)
            "https://ads.good.com/x",            # host-blocked exactly
            "https://other.good.com/x",          # kept (only host blocked)
            "https://fine.org/x",                # kept
            None]                                # kept (no URL evidence)
    kept = url_filter(_pages(urls),
                      blocked_domains=["example.com", "ads.good.com"]) \
        .to_pandas()["url"].tolist()
    assert kept == ["https://other.good.com/x", "https://fine.org/x", None]


def test_url_filter_patterns():
    urls = ["https://a.com/wp-login.php", "https://a.com/article",
            "https://b.com/casino/slots", "https://b.com/news"]
    kept = url_filter(_pages(urls),
                      blocked_patterns=[r"/wp-login\.php", r"/casino/"]) \
        .to_pandas()["url"].tolist()
    assert kept == ["https://a.com/article", "https://b.com/news"]


def test_url_filter_empty_spec_keeps_all():
    urls = ["https://a.com/x", None]
    assert url_filter(_pages(urls)).count() == 2


def test_normalize_url_dataset_column():
    ds = normalize_url(_pages(["HTTPS://A.example.com:443/p?utm_x=1&k=2"]))
    assert ds.to_pandas()["url_norm"].tolist() == \
        ["https://a.example.com/p?k=2"]


def test_clean_corpus_url_filter_step():
    import pandas as pd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "url": ["https://spam.example.com/a", "https://ok.org/b",
                "https://ok.org/casino/c", "https://ok.org/d",
                "https://ok.org/e", "https://sub.spam.example.com/f"],
        "text": [f"clean document body number {i} with several words"
                 for i in range(6)]})
    out = clean_corpus(
        rd.from_pandas(df), url_col="url",
        steps=("url_dedup", "url_filter", "exact_dedup"),
        blocked_domains=("example.com",),
        blocked_patterns=(r"/casino/",)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3, 4]

    with pytest.raises(ValueError, match="blocklist"):
        clean_corpus(rd.from_pandas(df), url_col="url",
                     steps=("url_filter",))
    with pytest.raises(ValueError, match="url_col"):
        clean_corpus(rd.from_pandas(df), steps=("url_filter",),
                     blocked_domains=("example.com",))
