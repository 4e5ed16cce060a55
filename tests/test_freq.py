"""Exact heavy hitters (stages/freq.py): DuckDB twin parity, local
brute-force recompute, the Misra-Gries exactness guarantee under tiny
capacities, grouped/ungrouped modes, bigrams, degenerate inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

WORDS = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
         "dog", "and", "cat", "runs", "far"]


def _corpus(n_docs: int = 80, seed: int = 11, zipf: float = 1.6,
            langs=("en", "fr")) -> pa.Table:
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, len(WORDS) + 1) ** zipf
    p /= p.sum()
    texts, lang = [], []
    for i in range(n_docs):
        ln = int(rng.integers(3, 60))
        texts.append(" ".join(rng.choice(WORDS, ln, p=p)))
        lang.append(langs[i % len(langs)])
    texts += ["", None, "Solo"]
    lang += ["en", "fr", "en"]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(lang, pa.string()),
        "text": pa.array(texts, pa.string())})


def _local_topk(t: pa.Table, n: int, k: int,
                group_col: str | None) -> pd.DataFrame:
    df = t.to_pandas()
    rows = []
    groups = df.groupby(group_col) if group_col else [(None, df)]
    for gval, g in groups:
        cnt: dict = {}
        for txt in g["text"]:
            toks = (txt or "").lower().split()
            for i in range(len(toks) - n + 1):
                w = " ".join(toks[i:i + n])
                cnt[w] = cnt.get(w, 0) + 1
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for r, (term, c) in enumerate(top, start=1):
            rows.append(((gval,) if group_col else ()) + (term, c, r))
    cols = ([group_col] if group_col else []) + ["term", "cnt", "rank"]
    return pd.DataFrame(rows, columns=cols) \
        .sort_values(cols[:1] + ["rank"] if group_col else ["rank"]) \
        .reset_index(drop=True)


def _run(t, ray_session, **kw):
    import ray.data as rd

    from ocgis_ray.stages.freq import frequent_ngrams

    out = frequent_ngrams(rd.from_arrow(t).repartition(5), **kw)
    assert out["exact_guaranteed"].all()
    sort_cols = ([kw["group_col"]] if kw.get("group_col") else []) + ["rank"]
    return out.drop(columns=["exact_guaranteed"]) \
        .sort_values(sort_cols).reset_index(drop=True)


def test_grouped_unigrams_vs_duckdb(ray_session):
    from ocgis_ray.stages.freq import frequent_ngrams_sql

    t = _corpus()
    out = _run(t, ray_session, n=1, k=4, group_col="lang")
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(
        frequent_ngrams_sql("documents", n=1, k=4, group_col="lang")
    ).df().sort_values(["lang", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)


def test_ungrouped_bigrams_vs_duckdb_and_local(ray_session):
    from ocgis_ray.stages.freq import frequent_ngrams_sql

    t = _corpus(n_docs=50, seed=3)
    out = _run(t, ray_session, n=2, k=5)
    con = duckdb.connect()
    con.register("documents", t)
    oracle = con.execute(frequent_ngrams_sql("documents", n=2, k=5)) \
        .df().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, oracle, check_dtype=False)
    ref = _local_topk(t, 2, 5, None)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_tiny_capacity_still_exact_when_guaranteed(ray_session):
    """capacity far below vocab: MG prunes hard every batch, yet a
    Zipf head stays provably exact (flag asserted inside _run)."""
    t = _corpus(n_docs=300, seed=5, zipf=2.2, langs=("en",))
    out = _run(t, ray_session, n=1, k=2, group_col="lang",
               capacity=3, batch_size=32)
    ref = _local_topk(t, 1, 2, "lang")
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_trigrams_local_recompute(ray_session):
    t = _corpus(n_docs=40, seed=9, langs=("en",))
    out = _run(t, ray_session, n=3, k=3)
    ref = _local_topk(t, 3, 3, None)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_partitioning_invariance(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.freq import frequent_ngrams

    t = _corpus(n_docs=60, seed=2)
    a = frequent_ngrams(rd.from_arrow(t).repartition(1), n=1, k=3,
                        group_col="lang")
    b = frequent_ngrams(rd.from_arrow(t).repartition(9), n=1, k=3,
                        group_col="lang", batch_size=16)
    pd.testing.assert_frame_equal(
        a.sort_values(["lang", "rank"]).reset_index(drop=True),
        b.sort_values(["lang", "rank"]).reset_index(drop=True))


def test_short_rows_and_empty(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.freq import frequent_ngrams

    # all rows shorter than the window -> no n-grams at all
    t = pa.table({"lang": ["en", "en"], "text": ["one two", None]})
    out = frequent_ngrams(rd.from_arrow(t), n=3, k=2, group_col="lang")
    assert out.empty and list(out.columns) == \
        ["lang", "term", "cnt", "rank", "exact_guaranteed"]
    # null group rows are dropped (twin mirrors with WHERE IS NOT NULL)
    t2 = pa.table({"lang": ["en", None], "text": ["a a b", "zz zz zz"]})
    out2 = frequent_ngrams(rd.from_arrow(t2), n=1, k=1, group_col="lang")
    assert list(out2["term"]) == ["a"] and list(out2["cnt"]) == [2]


def test_guarantee_flag_false_on_flat_distribution(ray_session):
    """A flat distribution with capacity 1 can't certify top-k: the
    flag must read False rather than silently returning a guess."""
    import ray.data as rd

    from ocgis_ray.stages.freq import frequent_ngrams

    rng = np.random.default_rng(0)
    texts = [" ".join(rng.permutation([f"w{i:02d}" for i in range(40)]))
             for _ in range(50)]
    t = pa.table({"text": pa.array(texts, pa.string())})
    out = frequent_ngrams(rd.from_arrow(t).repartition(8), n=1, k=1,
                          capacity=1, batch_size=4)
    # every term has count 50; any one may win, but never with proof
    assert not out["exact_guaranteed"].any()
    assert (out["cnt"] <= 50).all()
