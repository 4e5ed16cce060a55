"""Unigram-LM perplexity scoring (the CCNet/KenLM gate shape)."""

import numpy as np
import pandas as pd
import pytest

COMMON = "the cat sat on the mat and the dog sat on the rug "
RARE = "zyzzyva qwertic plonk vexil grommet usuance "


@pytest.fixture(scope="module")
def corpus(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [COMMON * 4] * 6 + [COMMON * 3 + RARE, RARE * 4],
    })
    return rd.from_pandas(df), df


def test_train_counts_match_pandas(corpus):
    """Distributed counts == a local pandas count; vocab is the
    count-desc top-k with deterministic tiebreak."""
    from ocgis_ray.stages.lm import train_unigram_lm
    from ocgis_ray.stages.text import _horner_hash_bytes

    ds, df = corpus
    model = train_unigram_lm(ds, vocab_size=5)
    toks = " ".join(df["text"]).lower().split()
    counts = pd.Series(toks).value_counts()
    assert model["total"] == len(toks)
    # the five most common words are the vocab, under the model's own
    # deterministic tiebreak (count desc, hash asc — six words tie at
    # the third count level here)
    ranked = sorted(
        ((int(c), int(_horner_hash_bytes(w.encode())))
         for w, c in counts.items()),
        key=lambda t: (-t[0], t[1]))
    top5 = {h for _, h in ranked[:5]}
    assert set(model["hashes"].tolist()) == top5
    # sorted-hash invariant for the searchsorted scorer
    assert (np.diff(model["hashes"]) > 0).all()


def test_score_orders_common_before_rare(corpus):
    """In-distribution docs score lower perplexity than OOV-heavy
    docs; the filter keeps exactly the low-ppl population."""
    from ocgis_ray.stages.lm import (perplexity_filter, score_perplexity,
                                     train_unigram_lm)

    ds, df = corpus
    model = train_unigram_lm(ds, vocab_size=16)
    out = score_perplexity(ds, model).to_pandas().set_index("doc_id")
    common_ppl = out.loc[0, "ppl"]
    mixed_ppl = out.loc[6, "ppl"]
    rare_ppl = out.loc[7, "ppl"]
    assert common_ppl < mixed_ppl < rare_ppl
    cut = (common_ppl + rare_ppl) / 2.0
    kept = perplexity_filter(ds, model, max_ppl=cut).to_pandas()
    assert set(kept["doc_id"]) == set(out.index[out["ppl"] <= cut])
    assert 7 not in set(kept["doc_id"])


def test_score_matches_local_model(corpus):
    """The distributed score equals a local numpy recomputation from
    the model's own (hash, logp) table — exact float equality."""
    from ocgis_ray.stages.lm import score_perplexity, train_unigram_lm
    from ocgis_ray.stages.text import _horner_hash_bytes

    ds, df = corpus
    model = train_unigram_lm(ds, vocab_size=16)
    out = score_perplexity(ds, model).to_pandas().set_index("doc_id")
    lut = dict(zip(model["hashes"].tolist(), model["logp"].tolist()))
    for _, row in df.iterrows():
        toks = row["text"].lower().split()
        lps = np.array([lut.get(int(_horner_hash_bytes(w.encode())),
                                model["logp_oov"]) for w in toks])
        # same summation order: np.add.reduceat == one left-to-right
        # pairwise sum over the row's contiguous segment
        expect = float(np.exp(-(np.add.reduceat(lps, [0])[0] / len(lps))))
        assert out.loc[row["doc_id"], "ppl"] == pytest.approx(expect, rel=1e-12)


def test_log_ratio_matches_local(corpus):
    """score_log_ratio == a local numpy recomputation under both
    models' (hash, logp) tables."""
    from ocgis_ray.stages.lm import score_log_ratio, train_unigram_lm
    from ocgis_ray.stages.text import _horner_hash_bytes

    ds, df = corpus
    # target = the common-only docs; raw = the whole corpus
    target = train_unigram_lm(ds.filter(lambda r: r["doc_id"] < 6),
                              vocab_size=16)
    raw = train_unigram_lm(ds, vocab_size=16)
    out = score_log_ratio(ds, target, raw).to_pandas().set_index("doc_id")

    def logp(model, h):
        lut = dict(zip(model["hashes"].tolist(), model["logp"].tolist()))
        return lut.get(h, model["logp_oov"])

    for _, row in df.iterrows():
        toks = row["text"].lower().split()
        diffs = np.array([logp(target, int(_horner_hash_bytes(w.encode())))
                          - logp(raw, int(_horner_hash_bytes(w.encode())))
                          for w in toks])
        expect = float(np.add.reduceat(diffs, [0])[0]) if len(diffs) else 0.0
        assert out.loc[row["doc_id"], "dsir_logw"] == pytest.approx(
            expect, rel=1e-12, abs=1e-12)
    # in-target docs carry a higher importance ratio than the OOV doc
    assert out.loc[0, "dsir_logw"] > out.loc[7, "dsir_logw"]


def test_dsir_resample_biases_and_is_deterministic(ray_session):
    """dsir_resample keeps ~keep_frac, prefers target-like docs, and
    is a pure function of (ids, models, salt)."""
    import ray.data as rd

    from ocgis_ray.stages.lm import dsir_resample, train_unigram_lm

    n = 400
    rng_texts = [(COMMON if i % 2 == 0 else RARE) * 3 for i in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": rng_texts})
    ds = rd.from_pandas(df)
    target = train_unigram_lm(
        ds.filter(lambda r: r["doc_id"] % 2 == 0), vocab_size=32)
    raw = train_unigram_lm(ds, vocab_size=32)
    kept = dsir_resample(ds, target, raw, keep_frac=0.5).to_pandas()
    # score columns dropped, schema preserved
    assert set(kept.columns) == {"doc_id", "text"}
    # ~keep_frac kept (reservoir-sketch threshold: allow slack)
    assert 0.35 * n <= len(kept) <= 0.65 * n
    # the kept set is overwhelmingly the target-like (even-id) docs:
    # the log-ratio gap between populations dwarfs the Gumbel noise
    even_frac = (kept["doc_id"] % 2 == 0).mean()
    assert even_frac > 0.9
    kept2 = dsir_resample(ds, target, raw, keep_frac=0.5).to_pandas()
    assert sorted(kept2["doc_id"]) == sorted(kept["doc_id"])
    # a different salt re-draws the Gumbel noise -> same size band
    kept3 = dsir_resample(ds, target, raw, keep_frac=0.5, salt=7).to_pandas()
    assert 0.35 * n <= len(kept3) <= 0.65 * n


def test_empty_and_oov_edge(ray_session):
    """Empty docs score +inf (filtered by any gate); a fully-OOV doc
    scores exp(-logp_oov)."""
    import ray.data as rd

    from ocgis_ray.stages.lm import score_perplexity, train_unigram_lm

    df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                       "text": [COMMON * 3, ""]})
    ds = rd.from_pandas(df)
    model = train_unigram_lm(ds, vocab_size=8)
    out = score_perplexity(ds, model).to_pandas().set_index("doc_id")
    assert np.isinf(out.loc[1, "ppl"])
    assert np.isfinite(out.loc[0, "ppl"])


def test_perplexity_buckets_thirds(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.lm import perplexity_buckets

    rng = np.random.RandomState(0)
    df = pd.DataFrame({"doc_id": np.arange(900, dtype=np.int64),
                       "ppl": rng.uniform(1, 100, 900)})
    out = perplexity_buckets(rd.from_pandas(df)).to_pandas()
    counts = out["ppl_bucket"].value_counts()
    assert abs(counts["head"] - 300) <= 1
    assert abs(counts["middle"] - 300) <= 1
    # order respected: every head ppl <= every tail ppl
    assert out[out.ppl_bucket == "head"]["ppl"].max() <= \
        out[out.ppl_bucket == "tail"]["ppl"].min()
    # infinities (empty docs) land in tail once thresholds are finite
    df2 = pd.DataFrame({"doc_id": np.arange(9, dtype=np.int64),
                        "ppl": [1, 2, 3, 4, 5, 6, 7, 8, np.inf]})
    out2 = perplexity_buckets(rd.from_pandas(df2)).to_pandas()
    assert out2.sort_values("doc_id")["ppl_bucket"].iloc[8] == "tail"


def test_quantile_rollup_multi_single_pass(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.calc import quantile_rollup

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"g": np.repeat([0, 1], 500),
                       "v": rng.uniform(0, 10, 1000)})
    ds = rd.from_pandas(df).repartition(4)
    multi = quantile_rollup(ds, "g", "v", (0.25, 0.75),
                            out_col=("q25", "q75")).to_pandas()
    lo = quantile_rollup(ds, "g", "v", 0.25,
                         out_col="q25").to_pandas()
    hi = quantile_rollup(ds, "g", "v", 0.75,
                         out_col="q75").to_pandas()
    m = multi.sort_values("g").reset_index(drop=True)
    assert np.allclose(m["q25"], lo.sort_values("g")["q25"].to_numpy())
    assert np.allclose(m["q75"], hi.sort_values("g")["q75"].to_numpy())
