"""Compression-ratio signal + the opt-in model gates (kn_ppl,
classifier, compression) in the cleaning cascade."""

import numpy as np
import pandas as pd
import pytest


def _docs():
    rng = np.random.default_rng(13)
    words = ["news", "report", "market", "value", "index", "growth"]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(words, 25)), "good"))
    rows.append((100, "spam " * 400, "spam"))          # hyper-repetitive
    rows.append((101, "buy buy buy " * 100, "spam"))   # hyper-repetitive
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_compression_ratio_values(ray_session):
    import ray.data as rd
    import zlib

    from ocgis_ray.stages.quality import add_compression_ratio

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["abc " * 500, "x", "", None],
    })
    out = (add_compression_ratio(rd.from_pandas(df)).to_pandas()
           .set_index("doc_id")["compression_ratio"])
    # exact parity with direct zlib
    for i, t in enumerate(df["text"]):
        if t is None:
            assert pd.isna(out.loc[i])
        else:
            b = t.encode()
            assert out.loc[i] == len(zlib.compress(b, 6)) / max(len(b), 1)
    assert out.loc[0] < 0.05      # repetitive text compresses hard
    assert out.loc[1] > 1.0       # single char: header overhead
    assert out.loc[2] > 1.0       # empty: ratio = len(header)/1


def test_compression_filter_drops_repetitive(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.quality import compression_filter

    df = _docs()
    kept = compression_filter(rd.from_pandas(df)).to_pandas()
    assert set(kept["doc_id"]) == set(range(30))  # spam rows dropped


def test_cascade_model_gates(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus
    from ocgis_ray.stages.classifier import train_nb_classifier
    from ocgis_ray.stages.kn import score_kn_perplexity, train_kn_bigram

    df = _docs()
    ds = rd.from_pandas(df[["doc_id", "text", "label"]]).repartition(3)
    nb = train_nb_classifier(ds, "label", n_buckets=512)
    kn = train_kn_bigram(ds, vocab_size=8)
    # pick a threshold that splits the corpus: good docs sit below the
    # 75th percentile of their own ppl, spam (unseen-ish transitions
    # dominated by one bigram) scores very low ppl -> kn gate alone
    # keeps it; the classifier gate is what removes it
    ppl = score_kn_perplexity(ds, kn).to_pandas()
    thresh = float(np.quantile(ppl["kn_ppl"], 0.9))
    out = clean_corpus(
        ds, steps=("compression", "kn_ppl", "classifier"),
        kn_model=kn, kn_max_ppl=thresh,
        nb_model=nb, nb_keep_label="good").to_pandas()
    assert len(out) > 0
    assert set(out["doc_id"]) <= set(range(30))
    # a caller-supplied steps tuple naming a model gate WITHOUT its
    # model raises — a silent no-op filter was the round-3 advice bug
    with pytest.raises(ValueError, match="kn_ppl.*kn_model is None"):
        clean_corpus(ds, steps=("compression", "kn_ppl", "classifier"))
    # ...but the DEFAULT step list keeps decontam's auto-skip
    out2 = clean_corpus(ds, steps=("compression",))
    assert out2.count() == 30


def test_unknown_step_still_rejected(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus

    ds = rd.from_pandas(_docs())
    with pytest.raises(ValueError, match="unknown cleaning steps"):
        clean_corpus(ds, steps=("gopher", "nonsense"))
