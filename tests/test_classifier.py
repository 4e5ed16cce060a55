"""Hashed-feature NB classifier: distributed training parity, scoring
parity with a local recompute, gate semantics."""

import numpy as np
import pandas as pd
import pytest

GOOD_WORDS = ["theorem", "proof", "lemma", "integral", "matrix",
              "vector", "derivative", "axiom", "topology", "algebra"]
SPAM_WORDS = ["click", "free", "winner", "casino", "pills", "offer",
              "deal", "buy", "now", "cheap"]


def _corpus(n_per: int = 60, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_per):
        rows.append((2 * i, " ".join(rng.choice(GOOD_WORDS, 12)), "good"))
        rows.append((2 * i + 1, " ".join(rng.choice(SPAM_WORDS, 12)), "spam"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def _local_train(df, n_buckets, bigrams=False, alpha=0.5):
    import pyarrow as pa

    from ocgis_ray.stages.classifier import _feature_buckets

    labels = sorted(df["label"].unique())
    L = len(labels)
    mat = np.zeros((L, n_buckets))
    docs = np.zeros(L)
    for li, lab in enumerate(labels):
        sub = df[df["label"] == lab]
        docs[li] = len(sub)
        b, _, _ = _feature_buckets(pa.array(sub["text"], pa.string()),
                                   n_buckets, bigrams)
        np.add.at(mat[li], b, 1.0)
    logp = np.log(mat + alpha) - np.log(mat.sum(1, keepdims=True)
                                        + alpha * n_buckets)
    prior = np.log(docs) - np.log(docs.sum())
    return labels, logp, prior


@pytest.fixture(scope="module")
def trained(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.classifier import train_nb_classifier

    df = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    model = train_nb_classifier(ds, "label", n_buckets=1 << 12)
    return df, ds, model


def test_distributed_training_matches_local(trained):
    df, _, model = trained
    labels, logp, prior = _local_train(df, 1 << 12)
    assert model["labels"] == labels
    np.testing.assert_array_equal(model["logp"], logp)
    np.testing.assert_allclose(model["prior"], prior, rtol=0, atol=1e-15)


def test_separable_corpus_classifies_perfectly(trained):
    from ocgis_ray.stages.classifier import score_classifier

    df, ds, model = trained
    out = score_classifier(ds, model).to_pandas()
    merged = out.set_index("doc_id")["nb_label"]
    truth = df.set_index("doc_id")["label"]
    assert (merged.reindex(truth.index) == truth).all()
    assert (out["nb_margin"] > 0).all()


def test_score_parity_with_local_recompute(trained):
    import pyarrow as pa

    from ocgis_ray.stages.classifier import _feature_buckets, score_classifier

    df, ds, model = trained
    out = score_classifier(ds, model).to_pandas().set_index("doc_id")
    b, frow, n = _feature_buckets(pa.array(df["text"], pa.string()),
                                  model["n_buckets"], False)
    scores = np.tile(model["prior"], (n, 1))
    np.add.at(scores, frow, model["logp"][:, b].T)
    pred = np.argmax(scores, axis=1)
    for i, did in enumerate(df["doc_id"]):
        assert out.loc[did, "nb_label"] == model["labels"][pred[i]]
        top = scores[i, pred[i]]
        rest = np.delete(scores[i], pred[i]).max()
        assert out.loc[did, "nb_margin"] == pytest.approx(top - rest,
                                                          abs=1e-12)


def test_filter_keeps_only_label(trained):
    from ocgis_ray.stages.classifier import classifier_filter

    df, ds, model = trained
    kept = classifier_filter(ds, model, "good").to_pandas()
    truth = df.set_index("doc_id")["label"]
    assert (truth.loc[kept["doc_id"]] == "good").all()
    assert len(kept) == (truth == "good").sum()
    # a high margin bar keeps a subset
    strict = classifier_filter(ds, model, "good", min_margin=1e9).to_pandas()
    assert len(strict) == 0


def test_bigram_features(ray_session):
    """Unigram-identical classes that differ only in WORD ORDER are
    separable only with bigram features."""
    import ray.data as rd

    from ocgis_ray.stages.classifier import (score_classifier,
                                             train_nb_classifier)

    rows = []
    for i in range(40):
        rows.append((2 * i, "alpha beta " * 6, "ab"))
        rows.append((2 * i + 1, "beta alpha " * 6, "ba"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    ds = rd.from_pandas(df).repartition(3)
    uni = train_nb_classifier(ds, "label", n_buckets=1 << 10)
    bi = train_nb_classifier(ds, "label", n_buckets=1 << 10, bigrams=True)
    out_bi = score_classifier(ds, bi).to_pandas().set_index("doc_id")
    truth = df.set_index("doc_id")["label"]
    assert (out_bi["nb_label"].reindex(truth.index) == truth).all()
    # unigram counts are tied up to the boundary token; margins ~0
    out_uni = score_classifier(ds, uni).to_pandas()
    assert out_uni["nb_margin"].abs().max() < out_bi["nb_margin"].abs().min()


def test_empty_text_scores_prior(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.classifier import score_classifier, train_nb_classifier

    df = _corpus(10)
    ds = rd.from_pandas(df)
    model = train_nb_classifier(ds, "label", n_buckets=1 << 10)
    empty = rd.from_pandas(pd.DataFrame({"doc_id": [0], "text": [""]}))
    out = score_classifier(empty, model).to_pandas()
    # equal priors (balanced corpus): first label wins the tie
    assert out.loc[0, "nb_label"] == model["labels"][0]
    assert out.loc[0, "nb_margin"] == pytest.approx(0.0)


def test_single_label_margin_zero_and_sql_twin(ray_session):
    import duckdb
    import ray.data as rd

    from ocgis_ray.stages.classifier import (nb_score_sql, score_classifier,
                                             train_nb_classifier)

    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["a b", "c d", "e f"],
                       "lang": ["en", "en", "en"]})
    ds = rd.from_pandas(df)
    model = train_nb_classifier(ds, "lang", n_buckets=64)
    out = (score_classifier(ds, model, round_digits=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert (out["nb_label"] == "en").all()
    assert (out["nb_margin"] == 0.0).all()
    con = duckdb.connect()
    con.register("documents", df)
    oracle = (con.execute(
        f"SELECT * FROM ({nb_score_sql('lang', 64)}) ORDER BY doc_id")
        .fetchdf())
    assert len(oracle) == 3
    assert (oracle["nb_label"] == "en").all()
    assert (oracle["nb_margin"] == 0.0).all()


def test_empty_corpus_raises(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.classifier import train_nb_classifier

    empty = rd.from_pandas(pd.DataFrame({"doc_id": [], "text": [],
                                         "lang": []}))
    with pytest.raises(ValueError, match="empty corpus"):
        train_nb_classifier(empty, "lang", n_buckets=64)
