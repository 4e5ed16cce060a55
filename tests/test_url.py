"""URL parsing / domain rollup / URL dedup (stages/url.py) and the
BPE-ish token counter (text.add_bpe_token_count) — DuckDB parity."""

import duckdb
import numpy as np
import pytest
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.text import (
    bpe_token_count_arrays,
    bpe_token_count_sql,
)
from ocgis_ray.stages.url import (
    dedup_by_url,
    domain_rollup,
    parse_url,
    parse_url_arrays,
    parse_url_sql,
)

ADVERSARIAL_URLS = [
    "https://site-3.example.com/p/42", "http://a.b/c/d?x=1#f", "ftp://host",
    "nohost", "", None, "https://no.path.example.org/", "a://b://c/d",
    "://x/y", "http://xn--bcher-kva.de/ü/path", "https://one/", "https://x",
    "http://a.b.c.d.e/zz", "//proto-relative/x", "http:///emptyhost/p",
    "https://trailing.dot./p", "s://h?q=1", "日本://ホスト/パス",
]


def _fuzz_urls(n=500, seed=9):
    rng = np.random.default_rng(seed)
    alphabet = list("ab:/. 9-é")
    return ["".join(rng.choice(alphabet, size=rng.integers(0, 30)))
            for _ in range(n)]


def test_parse_url_matches_duckdb():
    urls = ADVERSARIAL_URLS + _fuzz_urls()
    arr = pa.array(urls, type=pa.string())
    got = {k: v.to_pylist() for k, v in parse_url_arrays(arr).items()}
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(urls))), "url": arr}))
    frags = parse_url_sql("url")
    exp = con.execute(
        "SELECT " + ", ".join(f"{v} AS {k}" for k, v in frags.items())
        + " FROM t ORDER BY i").fetchdf()
    con.close()
    for k in frags:
        e = [None if x is None or x != x else x for x in exp[k]]
        assert got[k] == e, k


def test_parse_url_known_values():
    arr = pa.array(["https://site-7.example.com/p/99"])
    got = {k: v.to_pylist()[0] for k, v in parse_url_arrays(arr).items()}
    assert got == {"url_scheme": "https", "url_host": "site-7.example.com",
                   "url_path": "/p/99", "url_domain": "example.com"}


def test_domain_rollup_and_dedup(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "page_id": [3, 1, 2, 4, 5],
        "url": ["https://a.com/x", "https://a.com/x", "https://b.org/y",
                "https://sub.a.com/z", "https://b.org/y2"],
    })
    ds = rd.from_pandas(df)
    roll = domain_rollup(ds).to_pandas().sort_values("url_domain")
    assert dict(zip(roll["url_domain"], roll["n_pages"])) == {
        "a.com": 3, "b.org": 2}
    kept = dedup_by_url(ds).to_pandas()
    # exact-URL dedup keeps min page_id per URL
    assert sorted(kept["page_id"]) == [1, 2, 4, 5]


def test_parse_url_dataset_stage(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({
        "url": ["https://h.example.net/p", None]}))
    out = parse_url(ds).to_pandas()
    assert out["url_host"].tolist()[0] == "h.example.net"
    assert out["url_domain"].isna().tolist() == [False, True]


# ------------------------------------------------------ BPE token count

def test_bpe_token_count_matches_duckdb():
    rng = np.random.default_rng(5)
    alphabet = list("ab Z9 .,!?  0  {}\t\né日")
    texts = ["".join(rng.choice(alphabet, size=rng.integers(0, 60)))
             for _ in range(800)]
    texts += ["", " ", "  ", "a", " a", "a ", None, "abc123", "...", "é",
              "日本 語", "hello world", "  double  spaced  "]
    arr = pa.array(texts, type=pa.string())
    counts, mask = bpe_token_count_arrays(arr)
    con = duckdb.connect()
    con.register("t", pa.table({"i": list(range(len(texts))), "text": arr}))
    sql = con.execute(
        f"SELECT {bpe_token_count_sql()} AS n FROM t ORDER BY i"
    ).fetchdf()["n"].to_numpy(np.float64)
    con.close()
    eng = counts.astype(np.float64)
    if mask is not None:
        eng[mask] = np.nan
    assert ((np.isnan(eng) & np.isnan(sql)) | (eng == sql)).all()


def test_bpe_token_count_known():
    counts, _ = bpe_token_count_arrays(pa.array(["hello world, it's 42"]))
    # tokens: "hello", " world", ",", " it", "'", "s", " 42"
    assert counts[0] == 7


# --------------------------------- data mixing / sequence packing

def test_stratified_sample_matches_duckdb(ray_session):
    import duckdb as ddb
    import ray.data as rd

    from ocgis_ray.stages.reshape import (
        stratified_sample,
        stratified_sample_sql_pred,
    )

    rates = {"src0": 1.0, "src1": 0.3, "src2": 0.0}
    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source"])
    ds = rd.from_pandas(df)
    got = stratified_sample(ds, "doc_id", "source", rates,
                            default_rate=0.05).to_pandas()
    con = ddb.connect()
    con.register("t", df)
    pred = stratified_sample_sql_pred("doc_id", "source", rates,
                                      default_rate=0.05)
    exp = con.execute(f"SELECT doc_id FROM t WHERE {pred}").fetchdf()
    con.close()
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    # src0 kept fully, src2 dropped fully
    assert (got[got["source"] == "src0"].shape[0]
            == (df["source"] == "src0").sum())
    assert (got["source"] == "src2").sum() == 0


def test_pack_sequences_invariants(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import pack_sequences

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(500),
        "n_tokens": rng.integers(1, 900, 500),
    })
    df.loc[7, "n_tokens"] = 5000  # oversized doc
    out = pack_sequences(rd.from_pandas(df), "doc_id", "n_tokens",
                         budget=2048, num_buckets=8).to_pandas()
    # every doc assigned exactly once
    assert sorted(out["doc_id"]) == list(range(500))
    totals = out.groupby(["pack_bucket", "pack_seq"])["n_tokens"].agg(
        ["sum", "count"])
    # packs respect the budget unless they hold a single oversized doc
    over = totals[totals["sum"] > 2048]
    assert (over["count"] == 1).all()
    # oversized doc is alone in its pack
    row = out[out["doc_id"] == 7].iloc[0]
    mates = out[(out["pack_bucket"] == row["pack_bucket"])
                & (out["pack_seq"] == row["pack_seq"])]
    assert len(mates) == 1
    # deterministic: second run bit-identical
    out2 = pack_sequences(rd.from_pandas(df), "doc_id", "n_tokens",
                          budget=2048, num_buckets=8).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pack_sequences_tight_packing(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import pack_sequences

    # all-equal sizes pack exactly budget//size per pack (greedy)
    df = pd.DataFrame({"doc_id": np.arange(64), "n_tokens": [256] * 64})
    out = pack_sequences(rd.from_pandas(df), "doc_id", "n_tokens",
                         budget=1024, num_buckets=1).to_pandas()
    counts = out.groupby(["pack_bucket", "pack_seq"]).size()
    assert set(counts) == {4}


# ------------------------------------------------- review regressions

def test_dedup_by_url_null_urls_pass_through(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "page_id": [1, 2, 3, 4, 5],
        "url": ["https://a.com/x", None, None, "https://a.com/x", None],
    })
    out = dedup_by_url(rd.from_pandas(df)).to_pandas()
    # NULL urls are NOT treated as duplicates of each other
    assert sorted(out["page_id"]) == [1, 2, 3, 5]


def test_key_hash_guards():
    import ray.data as rd

    from ocgis_ray.stages.reshape import (
        sample_by_key,
        stratified_sample_flag,
    )

    def run(ds_df, fn):
        import ray.data as rdd

        return fn(rdd.from_pandas(ds_df)).to_pandas()

    with pytest.raises(Exception, match="integer key"):
        run(pd.DataFrame({"k": [2.7, 1.0]}),
            lambda d: sample_by_key(d, "k", 0.5))
    with pytest.raises(Exception, match="non-negative"):
        run(pd.DataFrame({"k": [-5, 1]}),
            lambda d: stratified_sample_flag(
                d, "k", "g", {}, default_rate=0.5).select_columns(["mix_keep"]))


def test_stratified_sql_pred_escaping_and_empty():
    import duckdb as ddb

    from ocgis_ray.stages.reshape import stratified_sample_sql_pred

    con = ddb.connect()
    # quote in a group name must not break the SQL
    pred = stratified_sample_sql_pred("k", "g", {"don't": 0.5})
    n = con.execute(
        f"SELECT count(*) FROM (VALUES (1, 'don''t'), (2, 'x')) t(k, g) "
        f"WHERE {pred}").fetchone()[0]
    assert n in (0, 1, 2)
    # empty rates -> plain default threshold, still valid SQL
    pred2 = stratified_sample_sql_pred("k", "g", {}, default_rate=1.0)
    n2 = con.execute(
        f"SELECT count(*) FROM (VALUES (1, 'a'), (2, 'b')) t(k, g) "
        f"WHERE {pred2}").fetchone()[0]
    con.close()
    assert n2 == 2


def test_clean_corpus_custom_columns_near_dup(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    base = "the quick brown fox jumps over the lazy dog again and again "
    df = pd.DataFrame({
        "page_id": [1, 2, 3],
        "content": [base + "one", base + "one!", "completely different words"],
    })
    out = clean_corpus(rd.from_pandas(df), id_col="page_id",
                       text_col="content", steps=("near_dup",),
                       minhash_threshold=0.6, num_buckets=2).to_pandas()
    # near-dup pair (1,2) -> 2 dropped; custom column names work
    assert sorted(out["page_id"]) == [1, 3]


def test_request_size_on_pandas_blocks(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.reshape import pack_sequences, request_size

    df = pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [10, 20, 30]})
    packed = pack_sequences(rd.from_pandas(df), "doc_id", "n_tokens",
                            budget=25, num_buckets=2)
    info = request_size(packed)
    assert info["rows"] == 3 and "pack_seq" in info["columns"]
