"""task_stage: stateless scorer stages must stack without pool-
capacity deadlock, and the per-process instance cache must key on the
broadcast ref (two models never share an instance)."""

import signal

import numpy as np
import pandas as pd
import pytest


def test_four_stacked_scorers_complete_on_small_session(ray_session):
    """Regression: four chained FIXED actor pools (langid + ppl + dsir
    + nb) reserved every CPU of an 8-cpu session and deadlocked the
    read.  The task-stage defaults must finish; alarm = hard fail
    instead of a hung suite."""
    import ray.data as rd

    from ocgis_ray.stages.classifier import (score_classifier,
                                             train_nb_classifier)
    from ocgis_ray.stages.lm import (score_log_ratio, score_perplexity,
                                     train_unigram_lm)
    from ocgis_ray.stages.text import add_lang_pred

    rng = np.random.default_rng(7)
    words = ["the", "of", "value", "data", "le", "la", "der", "und"]
    df = pd.DataFrame({
        "doc_id": np.arange(120),
        "text": [" ".join(rng.choice(words, 20)) for _ in range(120)],
        "lang": ["en", "fr", "de"] * 40,
    })
    ds = rd.from_pandas(df).repartition(4)
    raw = train_unigram_lm(ds, vocab_size=8)
    target = train_unigram_lm(
        ds.filter(lambda r: r["doc_id"] % 2 == 0), vocab_size=8)
    nb = train_nb_classifier(ds, "lang", n_buckets=256)

    def on_alarm(signum, frame):  # pragma: no cover - only on regression
        raise TimeoutError("stacked scorer stages deadlocked")

    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(300)
    try:
        out = score_classifier(
            score_log_ratio(
                score_perplexity(add_lang_pred(ds), raw),
                target, raw),
            nb).to_pandas()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
    assert len(out) == 120
    for c in ("lang_pred", "ppl", "dsir_logw", "nb_label", "nb_margin"):
        assert c in out.columns


def test_task_stage_cache_keys_on_ref(ray_session):
    import ray

    from ocgis_ray import tuning
    from ocgis_ray.tuning import task_stage

    built = []

    class Stage:
        def __init__(self, model_ref):
            built.append(model_ref)
            self.v = ray.get(model_ref)

        def __call__(self, batch):
            return {"x": [self.v]}

    r1, r2 = ray.put(10), ray.put(20)
    f1, f1b, f2 = (task_stage(Stage, model_ref=r1),
                   task_stage(Stage, model_ref=r1),
                   task_stage(Stage, model_ref=r2))
    assert f1({})["x"] == [10]
    assert f1b({})["x"] == [10]   # cache hit: same class+ref
    assert f2({})["x"] == [20]    # distinct ref -> distinct instance
    assert len(built) == 2
    # eviction keeps the cache bounded
    for i in range(tuning._TASK_STAGE_CACHE_MAX + 4):
        task_stage(Stage, model_ref=ray.put(i))({})
    assert len(tuning._TASK_STAGE_CACHE) <= tuning._TASK_STAGE_CACHE_MAX


def test_explicit_concurrency_still_uses_actor_pool(ray_session):
    """The opt-in pool path must still work (heavy-state callers)."""
    import ray.data as rd

    from ocgis_ray.stages.classifier import (score_classifier,
                                             train_nb_classifier)

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c d"],
                       "lang": ["x", "y"]})
    ds = rd.from_pandas(df)
    model = train_nb_classifier(ds, "lang", n_buckets=64)
    out = score_classifier(ds, model, concurrency=1).to_pandas()
    assert set(out["nb_label"]) <= {"x", "y"}
