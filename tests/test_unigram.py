"""Unigram-LM tokenizer: EM training, Viterbi optimality, lossless
round-trip, distributed encode."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ocgis_ray.stages.unigram import (UnigramModel, _em_iter, _matches,
                                      _word_table, learn_unigram, seed_vocab,
                                      train_unigram, unigram_encode,
                                      viterbi_encode)

CORPUS = ("the cat sat on the mat " * 20 +
          "internationalization localization normalization " * 8 +
          "the quick brown fox jumps over the lazy dog " * 5)


def word_table(texts):
    words = pd.Series(" ".join(texts).split())
    vc = words.value_counts()
    return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy()})


def brute_best_segmentation(s, ids, logp):
    """Enumerate every segmentation; return the max total logp."""
    n = len(s)
    best = -np.inf
    for cuts in itertools.product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        tot = 0.0
        ok = True
        for a, b in zip(bounds, bounds[1:]):
            k = ids.get(s[a:b])
            if k is None:
                ok = False
                break
            tot += logp[k]
        if ok and tot > best:
            best = tot
    return best


def test_seed_vocab_contains_bytes_and_frequent_substrings():
    wt = word_table([CORPUS])
    vocab = seed_vocab(wt, seed_size=400)
    assert vocab[:256] == [bytes([i]) for i in range(256)]
    assert b"ization" in vocab or b"izatio" in vocab
    assert b"the" in vocab


def test_em_nll_monotone_at_fixed_vocab():
    wt = word_table([CORPUS])
    pieces = seed_vocab(wt, seed_size=500)
    seqs, cnts = _word_table(wt)
    ids = {p: i for i, p in enumerate(pieces)}
    ml = max(len(p) for p in pieces)
    matches = _matches(seqs, ids, ml)
    logp = np.full(len(pieces), -np.log(float(len(pieces))))
    nlls = []
    for _ in range(5):
        logp, nll, _ = _em_iter(seqs, cnts, matches, logp, len(pieces))
        nlls.append(nll)
    assert all(b <= a + 1e-9 for a, b in zip(nlls, nlls[1:])), nlls


def test_learn_reaches_target_size_and_keeps_bytes():
    wt = word_table([CORPUS])
    model = learn_unigram(wt, vocab_size=300, seed_size=700)
    assert len(model.pieces) <= 300
    assert model.pieces[:256] == [bytes([i]) for i in range(256)]
    assert np.isfinite(model.logp[np.array(
        [len(p) == 1 for p in model.pieces])]).all()


def test_viterbi_matches_brute_force():
    wt = word_table([CORPUS])
    model = learn_unigram(wt, vocab_size=320, seed_size=600)
    ids = model.piece_ids()
    for w in ["the", "cat", "ization", "thecat", "dogma"]:
        s = w.encode()
        got = viterbi_encode(s, ids, model.logp, model.max_len)
        score = float(sum(model.logp[k] for k in got))
        want = brute_best_segmentation(s, ids, model.logp)
        assert abs(score - want) < 1e-9, (w, score, want)
        assert model.decode(got) == s  # lossless


def test_round_trip_lossless_on_arbitrary_unicode():
    wt = word_table([CORPUS])
    model = learn_unigram(wt, vocab_size=280, seed_size=400)
    ids = model.piece_ids()
    rng = np.random.RandomState(5)
    for _ in range(50):
        w = "".join(chr(c) for c in rng.randint(0x20, 0x2FFF, 8))
        s = w.encode("utf-8")
        got = viterbi_encode(s, ids, model.logp, model.max_len)
        assert model.decode(got) == s


def test_frequent_word_becomes_few_pieces():
    wt = word_table([CORPUS])
    model = learn_unigram(wt, vocab_size=400, seed_size=800)
    ids = model.piece_ids()
    n_the = len(viterbi_encode(b"the", ids, model.logp, model.max_len))
    assert n_the == 1  # 'the' dominates the corpus -> one piece
    # rare unseen word falls back to more pieces than 'the'
    n_rare = len(viterbi_encode(b"zqxj", ids, model.logp, model.max_len))
    assert n_rare >= 2


def test_train_and_encode_on_dataset(ray_session):
    docs = pd.DataFrame({
        "doc_id": np.arange(4),
        "text": [CORPUS[:200], "the cat", "", "internationalization"],
    })
    ds = rd.from_pandas(docs)
    model = train_unigram(ds, vocab_size=300, seed_size=500, max_words=1000)
    assert isinstance(model, UnigramModel)
    out = unigram_encode(ds, model, concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["n_tokens"].iloc[2] == 0 and len(out["token_ids"].iloc[2]) == 0
    # document token ids decode back to the lowercased words joined
    ids3 = out["token_ids"].iloc[3]
    assert model.decode(ids3) == b"internationalization"
    assert (out["n_tokens"] == out["token_ids"].map(len)).all()
    # encoding beats the byte count on trained text (compression)
    assert out["n_tokens"].iloc[0] < len(docs["text"].iloc[0])


def test_empty_corpus():
    model = learn_unigram(pd.DataFrame({"word": [], "cnt": []}),
                          vocab_size=256)
    assert len(model.pieces) == 256
    got = viterbi_encode(b"ab", model.piece_ids(), model.logp, model.max_len)
    assert model.decode(got) == b"ab"


def test_vocab_size_guard():
    with pytest.raises(ValueError, match=">= 256"):
        learn_unigram(word_table(["a b"]), vocab_size=100)
