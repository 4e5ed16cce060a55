"""Benchmark decontamination (n-token-gram overlap)."""

import numpy as np
import pandas as pd
import pytest


def _local_windows(text: str, n: int) -> list[tuple[str, ...]]:
    toks = text.lower().split()
    return [tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)]


@pytest.fixture(scope="module")
def docs(ray_session):
    import ray.data as rd

    rows = [
        "the quick brown fox jumps over the lazy dog today",   # bench
        "pack my box with five dozen liquor jugs now ok",      # bench
        "a b c the quick brown fox jumps over the lazy dog x",  # contains bench 10-gram
        "totally unrelated text with no overlap at all here",
        "the quick brown fox jumps over the lazy dog today "
        "the quick brown fox jumps over the lazy dog today",   # dup windows
        "short doc",                                           # < n tokens
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(rows), dtype=np.int64),
                       "text": rows})
    return rd.from_pandas(df), df


def test_counts_match_local_reference(docs):
    from ocgis_ray.stages.decontam import add_contamination, build_bench_ngrams

    ds, df = docs
    n = 5
    bench_texts = list(df["text"][:2])
    bench = build_bench_ngrams(bench_texts, n=n)
    out = (add_contamination(ds, bench, n=n).to_pandas()
           .set_index("doc_id")["contam_ngrams"])
    bench_set = {w for t in bench_texts for w in _local_windows(t, n)}
    for _, row in df.iterrows():
        expect = sum(w in bench_set for w in _local_windows(row["text"], n))
        assert out[row["doc_id"]] == expect, row["text"]
    # structure checks the reference math can't miss
    assert out[3] == 0          # unrelated
    assert out[5] == 0          # shorter than n tokens
    # doubled text: every bench window counts twice (the 4 windows
    # bridging the two copies are not bench members — doc 0's window
    # set does not wrap around)
    assert out[4] == 2 * out[0]
    assert out[2] > 0           # substring containment detected


def test_decontaminate_filters_and_preserves_schema(docs):
    from ocgis_ray.stages.decontam import build_bench_ngrams, decontaminate

    ds, df = docs
    bench = build_bench_ngrams(list(df["text"][:2]), n=5)
    kept = decontaminate(ds, bench, n=5).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}
    assert set(kept["doc_id"]) == {3, 5}
    # max_hits loosens the gate
    from ocgis_ray.stages.decontam import add_contamination

    counts = (add_contamination(ds, bench, n=5).to_pandas()
              .set_index("doc_id")["contam_ngrams"])
    loose = decontaminate(ds, bench, n=5, max_hits=int(counts[2])).to_pandas()
    assert set(loose["doc_id"]) == set(counts.index[counts <= counts[2]])


def test_build_bench_dataset_equals_list(docs):
    from ocgis_ray.stages.decontam import build_bench_ngrams

    ds, df = docs
    a = build_bench_ngrams(list(df["text"]), n=5)
    b = build_bench_ngrams(ds, n=5)
    assert np.array_equal(a, b)
    assert (np.diff(a.view(np.uint64)) > 0).all()


def test_max_ngrams_raises_not_truncates(docs):
    from ocgis_ray.stages.decontam import build_bench_ngrams

    _, df = docs
    with pytest.raises(ValueError, match="build_bench_bloom"):
        build_bench_ngrams(list(df["text"]), n=3, max_ngrams=2)


def test_windows_never_cross_rows(ray_session):
    """Two rows whose concatenation contains a bench n-gram, split at
    the row boundary, must NOT count."""
    import ray.data as rd

    from ocgis_ray.stages.decontam import add_contamination, build_bench_ngrams

    bench = build_bench_ngrams(["alpha beta gamma delta epsilon"], n=5)
    df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                       "text": ["alpha beta gamma", "delta epsilon"]})
    out = add_contamination(rd.from_pandas(df), bench, n=5).to_pandas()
    assert (out["contam_ngrams"] == 0).all()


def test_sql_twin_parity(ray_session, tmp_path):
    """Engine counts == the HUGEINT SQL replay (bench = a doc_id
    predicate over the same table), bit-exact including utf-8 and
    duplicate-window occurrences."""
    import duckdb
    import ray.data as rd

    from ocgis_ray.stages.decontam import (add_contamination,
                                           build_bench_ngrams, contam_sql)

    rng = np.random.default_rng(7)
    vocab = ["the", "données", "fox", "汉字", "jumps", "x1", "—", "a"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(2, 40))))
             for _ in range(60)]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                       "text": texts})
    pq = tmp_path / "documents.parquet"
    df.to_parquet(pq)
    ds = rd.from_pandas(df)
    n = 4
    bench = build_bench_ngrams(ds.filter(lambda r: r["doc_id"] < 6), n=n)
    eng = (add_contamination(ds, bench, n=n).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    ora = con.execute(
        f"SELECT * FROM ({contam_sql('doc_id < 6', n=n)}) ORDER BY doc_id"
    ).df()
    assert (eng["contam_ngrams"].to_numpy()
            == ora["contam_ngrams"].to_numpy()).all()
    assert (eng.loc[eng["doc_id"] < 6, "contam_ngrams"] > 0).any()


def test_bloom_counts_upper_bound_exact(docs):
    """Bloom counts >= exact counts row-wise (no false negatives);
    with a generously sized filter they are equal on this corpus."""
    from ocgis_ray.stages.decontam import (add_contamination,
                                           add_contamination_bloom,
                                           build_bench_bloom,
                                           build_bench_ngrams)

    ds, df = docs
    n = 5
    bench_texts = list(df["text"][:2])
    exact = (add_contamination(ds, build_bench_ngrams(bench_texts, n=n), n=n)
             .to_pandas().set_index("doc_id")["contam_ngrams"])
    bloom = build_bench_bloom(bench_texts, n=n, nbits=1 << 20)
    approx = (add_contamination_bloom(ds, bloom, n=n)
              .to_pandas().set_index("doc_id")["contam_ngrams"])
    assert (approx.loc[exact.index] >= exact).all()
    assert (approx.loc[exact.index] == exact).all()  # ~0 FPR at this size
    # a deliberately tiny filter still never undercounts
    tiny = build_bench_bloom(bench_texts, n=n, nbits=64)
    under = (add_contamination_bloom(ds, tiny, n=n)
             .to_pandas().set_index("doc_id")["contam_ngrams"])
    assert (under.loc[exact.index] >= exact).all()


def test_bloom_build_dataset_equals_list(docs):
    """Distributed sparse-bit build == local list build, bit for bit,
    and the default sizing counting pass runs without a hint."""
    from ocgis_ray.stages.decontam import build_bench_bloom

    ds, df = docs
    a = build_bench_bloom(list(df["text"]), n=5, nbits=1 << 14)
    b = build_bench_bloom(ds, n=5, nbits=1 << 14)
    assert a.nbits == b.nbits and a.k == b.k
    assert np.array_equal(a.bits, b.bits)
    sized = build_bench_bloom(ds, n=5)  # counting-pass sizing
    nwin = sum(max(len(t.split()) - 4, 0) for t in df["text"])
    assert sized.nbits == max(1024, 32 * nwin)


def test_decontaminate_bloom_safe_direction(docs):
    """Bloom gate never keeps a doc the exact gate drops."""
    from ocgis_ray.stages.decontam import (build_bench_bloom,
                                           build_bench_ngrams,
                                           decontaminate,
                                           decontaminate_bloom)

    ds, df = docs
    bench_texts = list(df["text"][:2])
    exact_kept = set(decontaminate(
        ds, build_bench_ngrams(bench_texts, n=5), n=5)
        .to_pandas()["doc_id"])
    bloom = build_bench_bloom(bench_texts, n=5, nbits=1 << 20)
    kept = decontaminate_bloom(ds, bloom, n=5).to_pandas()
    assert set(kept.columns) == {"doc_id", "text"}
    assert set(kept["doc_id"]) <= exact_kept
    assert set(kept["doc_id"]) == exact_kept  # ~0 FPR at this size
