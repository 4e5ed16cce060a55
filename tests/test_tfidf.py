"""Corpus-df tf-idf keyword extraction (stages/tfidf.py): DuckDB twin
parity, partitioning invariance, local brute-force recompute, min_df
pruning / foreign-corpus models, degenerate inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "iota", "kappa", "lambda", "mu"]


def _corpus(n: int = 60, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    texts = []
    for _ in range(n):
        ln = int(rng.integers(2, 40))
        texts.append(" ".join(rng.choice(WORDS, ln)))
    texts += ["", None, "Mixed CASE Alpha ALPHA alpha",
              "tab\tand\nnewline separated", "solo-hyphen-token"]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def _local_topk(t: pa.Table, k: int) -> pd.DataFrame:
    """Reference implementation: python dicts, sklearn smooth idf,
    DuckDB-round, ties by the engine token hash ascending."""
    from ocgis_ray.parity import sql_round
    from ocgis_ray.stages.text import _tokenize_hash

    df = t.to_pandas()
    toks = [(d or "").lower().split() for d in df["text"]]
    n = float(len(df))
    dfreq: dict = {}
    for tl in toks:
        for w in set(tl):
            dfreq[w] = dfreq.get(w, 0) + 1
    rows = []
    for i, tl in enumerate(toks):
        tf: dict = {}
        for w in tl:
            tf[w] = tf.get(w, 0) + 1
        scored = []
        for w, c in tf.items():
            idf = np.log((1.0 + n) / (1.0 + dfreq[w])) + 1.0
            s = float(sql_round(c * idf, 4))
            h = _tokenize_hash(pa.array([w], pa.string()))[0][0]
            scored.append((-s, int(h), w, s))
        scored.sort()
        for r, (_negs, _h, w, s) in enumerate(scored[:k], start=1):
            rows.append((int(df["doc_id"][i]), w, s, r))
    return pd.DataFrame(rows, columns=["doc_id", "term", "tfidf", "rank"])


def test_topk_matches_duckdb_twin(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import tfidf_topk, tfidf_topk_sql

    t = _corpus()
    out = tfidf_topk(rd.from_arrow(t).repartition(4), k=3).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(tfidf_topk_sql("documents", k=3)).df() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)


def test_topk_matches_local_recompute(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import tfidf_topk

    t = _corpus(n=40, seed=3)
    out = tfidf_topk(rd.from_arrow(t).repartition(3), k=4).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    ref = _local_topk(t, 4).sort_values(["doc_id", "rank"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import tfidf_topk

    t = _corpus(n=30, seed=5)
    a = tfidf_topk(rd.from_arrow(t).repartition(1), k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    b = tfidf_topk(rd.from_arrow(t).repartition(7), k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_doc_frequency_sentinel_and_counts(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import collect_df_model, doc_frequency

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["a b a", "b c", None]})
    dfd = doc_frequency(rd.from_arrow(t).repartition(2)).to_pandas()
    got = dict(zip(dfd["term"], dfd["df"]))
    # N sentinel counts ALL rows (null text included); df counts
    # DOCS, not occurrences ("a" twice in doc 0 -> df 1)
    assert got == {"": 3, "a": 1, "b": 2, "c": 1}
    m = collect_df_model(doc_frequency(rd.from_arrow(t)))
    assert m["n"] == 3.0 and set(m["terms"]) == {"a", "b", "c"}
    assert (np.sort(m["h"]) == m["h"]).all()


def test_min_df_pruning_falls_back_to_unseen_idf(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import (collect_df_model, doc_frequency,
                                        tfidf_topk)

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["common rare", "common other"]})
    ds = rd.from_arrow(t)
    m = collect_df_model(doc_frequency(ds, min_df=2))
    assert set(m["terms"]) == {"common"} and m["n"] == 2.0
    out = tfidf_topk(ds, k=10, model=m).to_pandas()
    # pruned terms score with df=0 idf = ln(1+N)+1, which exceeds the
    # df=2 idf of "common" -> rare terms rank first
    from ocgis_ray.parity import sql_round

    unseen = float(sql_round(np.log(1.0 + 2.0) + 1.0, 4))
    common = float(sql_round(np.log(3.0 / 3.0) + 1.0, 4))
    top0 = out[(out.doc_id == 0) & (out["rank"] == 1)].iloc[0]
    assert top0["term"] == "rare" and top0["tfidf"] == unseen
    assert float(out[(out.doc_id == 0) & (out.term == "common")]
                 ["tfidf"].iloc[0]) == common


def test_foreign_background_model(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import (collect_df_model, doc_frequency,
                                        tfidf_topk)

    bg = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                   "text": ["x x y", "x z", "x", "y z"]})
    fg = pa.table({"doc_id": pa.array([10], pa.int64()),
                   "text": ["x novel novel"]})
    m = collect_df_model(doc_frequency(rd.from_arrow(bg)))
    out = tfidf_topk(rd.from_arrow(fg), k=3, model=m).to_pandas()
    # "novel" is absent from the background corpus -> df=0 idf
    from ocgis_ray.parity import sql_round

    assert float(out[out.term == "novel"]["tfidf"].iloc[0]) == \
        float(sql_round(2.0 * (np.log(5.0) + 1.0), 4))
    assert float(out[out.term == "x"]["tfidf"].iloc[0]) == \
        float(sql_round(1.0 * (np.log(5.0 / 4.0) + 1.0), 4))


def test_top_keyword_row_preserving(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import (add_top_keyword, collect_df_model,
                                        doc_frequency, top_keyword_sql)

    t = _corpus(n=20, seed=9)
    ds = rd.from_arrow(t)
    m = collect_df_model(doc_frequency(ds))
    out = add_top_keyword(rd.from_arrow(t).repartition(3), m).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == t.num_rows  # every row kept, incl. null/empty
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(top_keyword_sql("documents")).df() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["doc_id", "kw_top", "kw_score"]], oracle, check_dtype=False)
    # token-less rows carry the documented sentinel values
    empties = out[out["kw_top"] == ""]
    assert (empties["kw_score"] == 0.0).all() and len(empties) >= 2


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tfidf import collect_df_model, doc_frequency

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    with pytest.raises(ValueError, match="empty corpus"):
        collect_df_model(doc_frequency(rd.from_arrow(t)))
