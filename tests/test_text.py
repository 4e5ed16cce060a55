"""Text analysis kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocgis_ray.stages.text import LangIdStage, add_fingerprint, add_lang_pred, add_text_stats


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "the cat and the dog sat on a mat",
            "el gato y el perro en la casa de la abuela",
            "a b",
            "Hello, world! How are you?",
        ],
    })
    return rd.from_pandas(df)


def test_text_stats(docs):
    out = add_text_stats(docs).to_pandas().set_index("doc_id")
    assert out.loc[0, "token_count"] == 9  # split(' ') fields
    assert out.loc[2, "token_count"] == 2
    # "Hello, world! How are you?" -> punct . , ! ? count = 3 of 26 chars
    assert out.loc[3, "punct_ratio"] == pytest.approx(3 / 26, abs=1e-6)
    assert 0 < out.loc[0, "alpha_ratio"] < 1
    assert (out["quality_score"] > 0).all()


def test_langid(docs):
    out = add_lang_pred(docs, concurrency=2).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[1, "lang_pred"] == "es"
    assert out.loc[2, "lang_pred"] in ("en", "und")  # 'a' is an en stopword


def test_langid_deterministic():
    st = LangIdStage()
    t = pa.table({"doc_id": [0], "text": ["die katze und der hund in dem haus"]})
    assert st(t)["lang_pred"].to_pylist() == ["de"]
    assert st(t)["lang_pred"].to_pylist() == st(t)["lang_pred"].to_pylist()


def test_fingerprint(docs, ray_session):
    import ray.data as rd

    out = add_fingerprint(docs).to_pandas()
    df2 = pd.DataFrame({"doc_id": [9], "text": ["the cat and the dog sat on a mat"]})
    out2 = add_fingerprint(rd.from_pandas(df2)).to_pandas()
    # same text -> same fingerprint, regardless of doc_id
    assert out.set_index("doc_id").loc[0, "fingerprint"] == out2["fingerprint"][0]
    # distinct texts -> (almost surely) distinct fingerprints
    assert out["fingerprint"].nunique() == 4


def test_byte_class_counts_unicode():
    import pyarrow as pa

    from ocgis_ray.stages.text import ALPHA_BYTES, PUNCT_BYTES, byte_class_counts

    arr = pa.array(["abc def!", "é中文a.", "", "...", "no punct here"])
    alpha = byte_class_counts(arr, ALPHA_BYTES)
    punct = byte_class_counts(arr, PUNCT_BYTES)
    import re

    for i, s in enumerate(arr.to_pylist()):
        assert alpha[i] == len(re.findall(r"[A-Za-z]", s)), s
        assert punct[i] == len(re.findall(r"[.,!?;:]", s)), s


def test_byte_class_counts_sliced_array():
    import pyarrow as pa

    from ocgis_ray.stages.text import byte_class_counts

    arr = pa.array(["xxxx", "ab", "ba", "yyy"]).slice(1, 2)
    counts = byte_class_counts(arr, b"a")
    assert counts.tolist() == [1, 1]


def test_text_stats_arrays_matches_python():
    import pyarrow as pa

    from ocgis_ray.stages.text import text_stats_arrays

    texts = ["the cat", "a  b", "Hello, world!"]
    stats = text_stats_arrays(pa.array(texts))
    for i, s in enumerate(texts):
        assert stats["token_count"][i] == s.count(" ") + 1
