"""Unicode normalization stage: Arrow-kernel semantics, the SQL twin's
exactness, and the cleaning-cascade wiring."""

import pyarrow as pa
import pytest


MESSY = [
    "Café  du   Monde",          # decomposed é + runs of spaces
    "ﬁne\ttext\x07here",          # fi ligature, tab, BEL control
    "UPPER Éé",              # composed É é
    "full　23",  # ideographic space
    "",                                  # empty survives every step
    "abc ",           # line separator at the edge (not RE2 \s)
    " x ",       # NBSP edges — DuckDB trim() keeps these
    " padded  out ",       # plain ASCII edge/interior runs
]


def test_nfc_and_control_and_ws():
    from ocgis_ray.stages.normalize import normalize_text_array

    out = normalize_text_array(pa.array(MESSY), form="NFC").to_pylist()
    assert out[0] == "Café du Monde"          # composed + collapsed
    assert out[1] == "ﬁne texthere"      # BEL dropped, NFC keeps ﬁ
    assert out[4] == ""


def test_nfkc_folds_compatibility_forms():
    from ocgis_ray.stages.normalize import normalize_text_array

    out = normalize_text_array(pa.array(MESSY), form="NFKC").to_pylist()
    assert out[1].startswith("fine")           # ﬁ -> fi under NFKC


def test_accent_strip_and_lower():
    from ocgis_ray.stages.normalize import normalize_text_array

    out = normalize_text_array(pa.array(MESSY), form="NFC", lower=True,
                               strip_accents=True).to_pylist()
    assert out[0] == "cafe du monde"
    assert out[2] == "upper ee"


def test_sql_twin_exact():
    """Engine values == DuckDB values EXACTLY over messy inputs (both
    sides run RE2 + ICU NFC, so the full strings match, not just
    lengths)."""
    import duckdb

    from ocgis_ray.stages.normalize import (normalize_text_array,
                                            normalize_text_sql)

    eng = normalize_text_array(pa.array(MESSY), form="NFC",
                               lower=True).to_pylist()
    con = duckdb.connect()
    con.register("t", pa.table({"s": pa.array(MESSY)}))
    frag = normalize_text_sql("s", lower=True)
    got = [r[0] for r in con.execute(f"SELECT {frag} FROM t").fetchall()]
    assert eng == got


def test_sql_twin_rejects_nfkc():
    from ocgis_ray.stages.normalize import normalize_text_sql

    with pytest.raises(ValueError, match="NFC"):
        normalize_text_sql("s", form="NFKC")


def test_dataset_stage_and_cascade(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus
    from ocgis_ray.stages.normalize import normalize_text

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["Café   x", "Café x",
                                    "plain"])})
    ds = normalize_text(rd.from_arrow(t), col="text")
    got = dict(zip(*[ds.to_pandas()[c] for c in ("doc_id", "text")]))
    # NFC + collapse makes the two spellings byte-identical...
    assert got[1] == got[2] == "Café x"
    # ...so normalize + exact_dedup collapses them in the cascade
    out = clean_corpus(rd.from_arrow(t), steps=("normalize", "exact_dedup"))
    assert sorted(out.to_pandas()["doc_id"]) == [1, 3]


def test_out_column_keeps_raw(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.normalize import normalize_text

    t = pa.table({"text": pa.array(["Á  b"])})
    df = normalize_text(rd.from_arrow(t), col="text",
                        out="text_norm").to_pandas()
    assert df["text"][0] == "Á  b" and df["text_norm"][0] == "Á b"
