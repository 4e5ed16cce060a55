"""Byte-level BPE tokenizer: train (distributed counts + driver merges)
and encode (broadcast, memoized)."""

import numpy as np
import pandas as pd
import pytest


def _naive_bpe(words: pd.DataFrame, num_merges: int):
    """Reference: recount every pair each step, same tiebreak."""
    seqs, cnts = [], []
    for w, c in zip(words["word"], words["cnt"]):
        b = str(w).encode("utf-8")
        if b:
            seqs.append([b[i: i + 1] for i in range(len(b))])
            cnts.append(int(c))
    merges = []
    for _ in range(num_merges):
        pc: dict = {}
        for seq, c in zip(seqs, cnts):
            for p in zip(seq, seq[1:]):
                pc[p] = pc.get(p, 0) + c
        live = {p: c for p, c in pc.items() if c > 0}
        if not live:
            break
        best = min(live, key=lambda p: (-live[p], p))
        merges.append(best)
        for wi, seq in enumerate(seqs):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[wi] = out
    return merges


def test_learn_bpe_matches_naive_reference():
    from ocgis_ray.stages.tokenizer import learn_bpe

    rng = np.random.default_rng(5)
    for trial in range(4):
        vocab = ["low", "lower", "lowest", "newer", "wider", "new",
                 "aaaa", "aaab", "données", "汉字abc"]
        n = int(rng.integers(4, len(vocab) + 1))
        pick = rng.choice(vocab, size=n, replace=False)
        df = pd.DataFrame({"word": pick,
                           "cnt": rng.integers(1, 50, size=n)})
        got = learn_bpe(df, num_merges=12)
        want = _naive_bpe(df, num_merges=12)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_learn_bpe_classic_example():
    """Sennrich's toy corpus: first merges build the frequent suffix."""
    from ocgis_ray.stages.tokenizer import learn_bpe

    df = pd.DataFrame({"word": ["low", "lower", "newest", "widest"],
                       "cnt": [5, 2, 6, 3]})
    merges = learn_bpe(df, num_merges=4)
    assert merges == _naive_bpe(df, 4)
    # 'es' (9) then 'est' (9) dominate, then 'lo' (7)
    assert merges[0] == (b"e", b"s")
    assert merges[1] == (b"es", b"t")
    assert merges[2] == (b"l", b"o")


def test_word_counts_distributed_matches_pandas(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tokenizer import word_counts

    rng = np.random.default_rng(9)
    vocab = ["alpha", "beta", "Gamma", "delta", "x"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))
             for _ in range(50)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    wc = word_counts(ds, max_words=100)
    toks = pd.Series(" ".join(texts).lower().split()).value_counts()
    got = wc.set_index("word")["cnt"]
    assert wc.attrs["total_tokens"] == int(toks.sum())
    assert sorted(got.index) == sorted(toks.index)
    for w in toks.index:
        assert got[w] == toks[w]
    # ordered by (cnt desc, word asc)
    key = list(zip(-wc["cnt"], wc["word"]))
    assert key == sorted(key)


def test_encode_roundtrip_and_compression(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.tokenizer import (bpe_encode, bpe_vocab,
                                            train_bpe)

    texts = ["the quick brown fox the quick the the",
             "the quick décor 汉字 jumps", None, ""]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts}))
    merges = train_bpe(ds, num_merges=20, max_words=100)
    vocab = bpe_vocab(merges)
    out = bpe_encode(ds, merges).to_pandas().set_index("doc_id").sort_index()
    for d, txt in enumerate(texts):
        ids = out.loc[d, "token_ids"]
        if txt is None or txt == "":
            assert len(ids) == 0 and out.loc[d, "n_tokens"] == 0
            continue
        # lossless: decoded bytes == the whitespace-joined lower words
        dec = b"".join(vocab[i] for i in ids)
        assert dec == "".join(txt.lower().split()).encode("utf-8")
        assert out.loc[d, "n_tokens"] == len(ids)
    # 'the' is frequent enough to become a single token
    the_id = vocab.index(b"the") if b"the" in vocab else None
    assert the_id is not None
    assert ids is not None
    # compression: frequent text encodes to far fewer tokens than bytes
    t0 = out.loc[0]
    raw_bytes = len("".join(texts[0].split()).encode())
    assert t0["n_tokens"] < raw_bytes


def test_tokenize_and_pack_end_to_end(ray_session):
    """Cleaned docs -> token ids -> budget-bounded packs, losslessly."""
    import ray.data as rd

    from ocgis_ray.pipelines.tokenize import tokenize_and_pack
    from ocgis_ray.stages.tokenizer import bpe_vocab

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    src = docs.to_pandas().set_index("doc_id")
    packed, merges = tokenize_and_pack(docs, num_merges=64, budget=128,
                                       max_words=10_000, num_buckets=4)
    out = packed.to_pandas()
    # every doc exactly once, text dropped, ids+counts consistent
    assert sorted(out["doc_id"]) == sorted(src.index)
    assert "text" not in out.columns
    assert (out["token_ids"].str.len() == out["n_tokens"]).all()
    # packs respect the budget except single oversized docs
    tot = out.groupby(["pack_bucket", "pack_seq"])["n_tokens"].agg(
        ["sum", "count"])
    over = tot["sum"] > 128
    assert (tot.loc[over, "count"] == 1).all()
    # decode one doc back to its squeezed lower text
    vocab = bpe_vocab(merges)
    row = out.iloc[0]
    dec = b"".join(vocab[i] for i in row["token_ids"]).decode()
    assert dec == "".join(src.loc[row["doc_id"], "text"].lower().split())
    # reusing the trained merges reproduces identical packs (resume)
    packed2, _ = tokenize_and_pack(docs, merges=merges, budget=128,
                                   num_buckets=4)
    out2 = packed2.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out1 = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)


def test_train_and_encode_agree_on_segmentation(ray_session):
    """NBSP is NOT a word boundary on either side (Arrow RE2 \\s+ is
    ASCII-only): train-time word counts and encode-time words see the
    same token — Python str.split() would disagree."""
    import ray.data as rd

    from ocgis_ray.stages.tokenizer import (bpe_encode, bpe_vocab,
                                            train_bpe, word_counts)

    txt = "foo bar foo bar plain"
    ds = rd.from_pandas(pd.DataFrame({"text": [txt]}))
    wc = word_counts(ds, max_words=10)
    assert wc.set_index("word")["cnt"]["foo bar"] == 2
    merges = train_bpe(ds, num_merges=10, max_words=10)
    out = bpe_encode(ds, merges).to_pandas()
    vocab = bpe_vocab(merges)
    dec = b"".join(vocab[i] for i in out.loc[0, "token_ids"]).decode()
    # squeeze only the ASCII space: the NBSP survives inside the word
    assert dec == "foo barfoo barplain"


def test_empty_merge_budget_stops():
    from ocgis_ray.stages.tokenizer import learn_bpe

    df = pd.DataFrame({"word": ["ab"], "cnt": [1]})
    merges = learn_bpe(df, num_merges=50)
    assert merges == [(b"a", b"b")]  # nothing left after one merge
