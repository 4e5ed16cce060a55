"""BM25 lexical retrieval: distributed stats vs local recompute,
scoring parity with the DuckDB SQL twin and a brute-force local BM25,
top-k determinism, degenerate inputs."""

import numpy as np
import pandas as pd
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa"]


def _corpus(n: int = 80, seed: int = 11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(3, 30))
        rows.append((i, " ".join(rng.choice(WORDS, ln))))
    rows.append((n, ""))          # empty doc
    rows.append((n + 1, "qqq"))   # no query term
    return pd.DataFrame(rows, columns=["doc_id", "text"])


QUERY = "alpha beta nosuchword"


def _local_bm25(df: pd.DataFrame, query: str, k1=1.2, b=0.75) -> np.ndarray:
    """Reference implementation: python dict counts, classic formula."""
    qterms = sorted(set(query.lower().split()))
    toks = [d.lower().split() for d in df["text"]]
    n = len(df)
    dl = np.array([len(t) for t in toks], dtype=float)
    avgdl = dl.sum() / n
    scores = np.zeros(n)
    for term in qterms:
        dfc = sum(1 for t in toks if term in t)
        idf = np.log(1.0 + (n - dfc + 0.5) / (dfc + 0.5))
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                scores[i] += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl[i] / avgdl))
    return scores


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray.data as rd

    df = _corpus()
    return df, rd.from_pandas(df).repartition(4)


def test_stats_match_local(corpus_ds):
    from ocgis_ray.stages.bm25 import bm25_stats, query_term_hashes

    df, ds = corpus_ds
    stats = bm25_stats(ds, QUERY)
    assert stats["n"] == len(df)
    toks = [d.lower().split() for d in df["text"]]
    assert stats["avgdl"] == pytest.approx(
        sum(len(t) for t in toks) / len(df))
    qh = query_term_hashes(QUERY)
    assert len(qh) == 3 and (np.sort(qh) == qh).all()
    # df counts: match per-term local counts as a multiset (hash order
    # vs word order differs)
    local_dfs = sorted(
        sum(1 for t in toks if w in t) for w in ("alpha", "beta", "nosuchword"))
    assert sorted(stats["df"].astype(int).tolist()) == local_dfs
    assert 0 in local_dfs  # the absent term really exercises df=0


def test_scores_match_local_reference(corpus_ds):
    from ocgis_ray.stages.bm25 import add_bm25

    df, ds = corpus_ds
    out = add_bm25(ds, QUERY).to_pandas().set_index("doc_id")["bm25"]
    ref = _local_bm25(df, QUERY)
    np.testing.assert_allclose(
        out.reindex(df["doc_id"]).to_numpy(), ref, rtol=0, atol=1e-12)
    assert out.loc[len(df) - 2] == 0.0  # empty doc
    assert out.loc[len(df) - 1] == 0.0  # no query term


def test_sql_twin_bit_exact(corpus_ds):
    import duckdb

    from ocgis_ray.stages.bm25 import add_bm25, bm25_sql

    df, ds = corpus_ds
    out = (add_bm25(ds, QUERY, round_digits=6)
           .select_columns(["doc_id", "bm25"]).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", df)
    oracle = (con.execute(bm25_sql(QUERY)).fetchdf()
              .sort_values("doc_id").reset_index(drop=True))
    assert (out["bm25"].to_numpy() == oracle["bm25"].to_numpy()).all()


def test_topk_deterministic_and_ranked(corpus_ds):
    from ocgis_ray.stages.bm25 import bm25_topk

    df, ds = corpus_ds
    a = bm25_topk(ds, QUERY, k=7)
    b = bm25_topk(ds.repartition(2), QUERY, k=7)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["rank"]) == list(range(1, 8))
    assert (np.diff(a["bm25"].to_numpy()) <= 0).all()
    ref = _local_bm25(df, QUERY)
    order = np.lexsort((df["doc_id"].to_numpy(), -np.round(ref, 6)))
    assert list(a["doc_id"]) == list(df["doc_id"].to_numpy()[order][:7])


def test_degenerate_inputs(corpus_ds, ray_session):
    import ray.data as rd

    from ocgis_ray.stages.bm25 import bm25_sql, bm25_stats

    _, ds = corpus_ds
    with pytest.raises(ValueError, match="no tokens"):
        bm25_sql("   ")
    empty = rd.from_pandas(pd.DataFrame({"doc_id": [], "text": []}))
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_stats(empty, QUERY)


def test_stats_query_mismatch_raises(corpus_ds):
    from ocgis_ray.stages.bm25 import add_bm25, bm25_stats

    _, ds = corpus_ds
    stats = bm25_stats(ds, QUERY)
    with pytest.raises(ValueError, match="different query"):
        add_bm25(ds, "totally different terms", stats)


def test_multi_query_matches_single(corpus_ds):
    from ocgis_ray.stages.bm25 import bm25_topk, bm25_topk_multi

    _, ds = corpus_ds
    queries = {"q1": "alpha beta nosuchword", "q2": "gamma delta",
               "q3": "kappa"}
    multi = bm25_topk_multi(ds, queries, k=5)
    for qid, q in queries.items():
        single = bm25_topk(ds, q, k=5, round_digits=None)
        got = multi[multi["query_id"] == qid].reset_index(drop=True)
        assert list(got["doc_id"]) == list(single["doc_id"])
        np.testing.assert_allclose(got["bm25"].to_numpy(),
                                   single["bm25"].to_numpy(),
                                   rtol=0, atol=1e-12)
        assert list(got["rank"]) == [1, 2, 3, 4, 5]


def test_multi_query_validation(corpus_ds):
    from ocgis_ray.stages.bm25 import bm25_topk_multi

    _, ds = corpus_ds
    with pytest.raises(ValueError, match="no queries"):
        bm25_topk_multi(ds, {}, k=3)
    with pytest.raises(ValueError, match="no tokens"):
        bm25_topk_multi(ds, {"q": "   "}, k=3)


def test_multi_query_tie_break_on_id(ray_session):
    """Many identical docs tie at the top-k boundary: the kept set
    must be the lowest doc_ids, equal to the single-query path and
    stable across batch boundaries."""
    import ray.data as rd

    from ocgis_ray.stages.bm25 import bm25_topk, bm25_topk_multi

    df = pd.DataFrame({"doc_id": np.arange(60),
                       "text": ["alpha beta"] * 60})
    ds = rd.from_pandas(df).repartition(4)
    multi = bm25_topk_multi(ds, {"q": "alpha"}, k=5)
    assert list(multi["doc_id"]) == [0, 1, 2, 3, 4]
    single = bm25_topk(ds, "alpha", k=5, round_digits=None)
    assert list(single["doc_id"]) == [0, 1, 2, 3, 4]
    # empty blocks keep a typed schema (filter empties partitions)
    filt = ds.filter(lambda r: r["doc_id"] < 8)
    m2 = bm25_topk_multi(filt, {"q": "alpha"}, k=3)
    assert list(m2["doc_id"]) == [0, 1, 2]
