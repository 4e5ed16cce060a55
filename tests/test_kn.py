"""Kneser-Ney bigram LM: distributed training vs a plain-python
reference, SQL-twin bit-exactness, partitioning determinism, and the
degenerate-doc conventions."""

import numpy as np
import pandas as pd
import pytest

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "far"]


def _corpus(n: int = 60, seed: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        ln = int(rng.integers(2, 25))
        rows.append((i, " ".join(rng.choice(WORDS, ln))))
    rows.append((n, ""))            # no tokens
    rows.append((n + 1, "single"))  # one token (also OOV)
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _ref_kn(df: pd.DataFrame, vocab_size: int, d: float = 0.75):
    """Plain-python interpolated-KN reference (dict counts)."""
    from collections import Counter

    toks = [t.lower().split() for t in df["text"]]
    uni = Counter(w for t in toks for w in t)
    # engine vocab tiebreak is (count desc, HASH asc); for the
    # reference we only need the same SET, so pick counts with a
    # strict count cut to dodge tie-order divergence in tests
    vocab = {w for w, _ in uni.most_common(vocab_size)}
    assert len(vocab) <= vocab_size

    def sym(w):
        return w if w in vocab else None  # None = <unk>

    big = Counter()
    for t in toks:
        for a, b in zip(t, t[1:]):
            big[(sym(a), sym(b))] += 1
    c1 = Counter()
    n1r = Counter()
    n1l = Counter()
    for (a, b), c in big.items():
        c1[a] += c
        n1r[a] += 1
        n1l[b] += 1
    tt = len(big)
    w = len(vocab) + 1

    def pcont(b):
        return (n1l[b] + 0.5) / (tt + 0.5 * w)

    def p(a, b):
        if c1[a] == 0:
            return pcont(b)
        return (max(big[(a, b)] - d, 0.0) / c1[a]
                + (d * n1r[a] / c1[a]) * pcont(b))

    out = []
    for t in toks:
        if len(t) < 2:
            out.append(np.inf)
            continue
        lps = [np.log(p(sym(a), sym(b))) for a, b in zip(t, t[1:])]
        out.append(np.exp(-(np.sum(lps) / len(lps))))
    return np.array(out)


@pytest.fixture(scope="module")
def kn_setup(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.kn import train_kn_bigram

    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    model = train_kn_bigram(ds, vocab_size=6)
    return df, ds, model


def test_matches_python_reference(kn_setup):
    from ocgis_ray.stages.kn import score_kn_perplexity

    df, ds, model = kn_setup
    out = (score_kn_perplexity(ds, model).to_pandas()
           .set_index("doc_id")["kn_ppl"].reindex(df["doc_id"]).to_numpy())
    ref = _ref_kn(df, vocab_size=6)
    np.testing.assert_allclose(out, ref, rtol=1e-12)
    assert np.isinf(out[-2]) and np.isinf(out[-1])


def test_partitioning_invariance(kn_setup):
    import ray.data as rd

    from ocgis_ray.stages.kn import train_kn_bigram

    df, _, model = kn_setup
    m2 = train_kn_bigram(rd.from_pandas(df).repartition(1), vocab_size=6)
    np.testing.assert_array_equal(model["hashes"], m2["hashes"])
    np.testing.assert_array_equal(model["logp"], m2["logp"])


def test_probabilities_normalize(kn_setup):
    """Interpolated KN over observed contexts is a (sub-)distribution:
    rows with c1>0 sum to <= 1 and are close to 1 up to the add-half
    continuation smoothing slack; every cell is a finite log-prob."""
    _, _, model = kn_setup
    p = np.exp(model["logp"])
    sums = p.sum(axis=1)
    assert np.isfinite(model["logp"]).all()
    assert (sums <= 1.0 + 1e-9).all()
    assert (sums >= 0.5).all()


def test_sql_twin_bit_exact(kn_setup):
    import duckdb

    from ocgis_ray.parity import sql_round
    from ocgis_ray.stages.kn import kn_ppl_sql, score_kn_perplexity

    df, ds, model = kn_setup
    out = (score_kn_perplexity(ds, model).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    vals = sql_round(out["kn_ppl"].to_numpy(), 6)
    con = duckdb.connect()
    con.register("documents", df)
    oracle = (con.execute(kn_ppl_sql(6)).fetchdf()
              .sort_values("doc_id").reset_index(drop=True))
    assert (vals == oracle["kn_ppl"].to_numpy()).all()


def test_oov_scored_via_unk(kn_setup):
    """A doc of entirely unseen words still gets a finite perplexity
    (every transition flows through <unk>)."""
    import ray.data as rd

    from ocgis_ray.stages.kn import score_kn_perplexity

    _, _, model = kn_setup
    novel = rd.from_pandas(pd.DataFrame(
        {"doc_id": [0], "text": ["zzz yyy xxx www"]}))
    out = score_kn_perplexity(novel, model).to_pandas()
    assert np.isfinite(out.loc[0, "kn_ppl"])
    assert out.loc[0, "kn_ppl"] > 0
