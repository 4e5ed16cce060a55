"""clean_corpus_twopass: the decide-on-slim fat-row cascade must
reproduce clean_corpus's survivor set and output text exactly."""

import numpy as np
import pandas as pd
import pytest


def _corpus(n=120):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(n):
        base = i % 40  # text dup groups of 3
        words = [f"w{(base * 13 + j) % 50}" for j in range(30)]
        text = "the quick brown fox " + " ".join(words)
        if i % 10 == 0:
            # gopher-killable: one word repeated (dup-word fraction)
            text = "spam " * 60
        rows.append({
            "doc_id": i,
            "url": f"https://h{i % 50}.example.com/a",  # url dup groups
            "text": text,
        })
    # null-url rows must never collapse into one survivor
    for k in range(2):
        words = " ".join(f"q{k}x{j}" for j in range(28))
        rows.append({"doc_id": n + k, "url": None,
                     "text": "the quick brown fox " + words})
    return pd.DataFrame(rows)


def test_twopass_matches_shuffle_cascade(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus, clean_corpus_twopass

    df = _corpus()
    steps = ("url_dedup", "gopher", "exact_dedup", "pii")
    a = clean_corpus(rd.from_pandas(df).repartition(4), url_col="url",
                     steps=steps, num_buckets=4).to_pandas()
    b = clean_corpus_twopass(rd.from_pandas(df).repartition(4),
                             url_col="url", steps=steps,
                             num_buckets=4).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["doc_id", "url", "text"]],
                                  b[["doc_id", "url", "text"]])
    assert len(a) > 0
    # both null-url rows survive (never collapsed)
    assert {120, 121} <= set(b["doc_id"])


def test_twopass_bucketed_join_path(ray_session):
    """broadcast_max=0 forces the bucketed semi-join re-attach; the
    survivor set must not change."""
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus_twopass

    df = _corpus()
    steps = ("url_dedup", "exact_dedup")
    a = clean_corpus_twopass(rd.from_pandas(df), url_col="url",
                             steps=steps, num_buckets=4).to_pandas()
    b = clean_corpus_twopass(rd.from_pandas(df), url_col="url",
                             steps=steps, num_buckets=4,
                             broadcast_max=0).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_twopass_rejects_global_steps(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus_twopass

    ds = rd.from_pandas(_corpus())
    with pytest.raises(ValueError, match="does not support"):
        clean_corpus_twopass(ds, steps=("exact_dedup", "near_dup"))
    with pytest.raises(ValueError, match="nothing to decide"):
        clean_corpus_twopass(ds, steps=("gopher",))


def test_semi_join_ids_broadcast_and_join(ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import semi_join_ids

    df = pd.DataFrame({"doc_id": np.arange(100), "v": np.arange(100) * 2})
    ids = pd.DataFrame({"doc_id": np.array([3, 17, 99, 42])})
    for bmax in (1 << 20, 0):
        out = semi_join_ids(rd.from_pandas(df), rd.from_pandas(ids),
                            "doc_id", broadcast_max=bmax,
                            num_buckets=4).to_pandas()
        assert sorted(out["doc_id"]) == [3, 17, 42, 99]
        assert sorted(out["v"]) == [6, 34, 84, 198]


def test_twopass_c4_rewrite_parity(ray_session):
    """The c4 REWRITE feeds the content hash in the decision pass and
    re-applies in the re-attach pass: docs that become identical only
    AFTER line cleaning must dedup, and output text must equal the
    shuffle cascade's rewritten text."""
    import ray.data as rd

    from ocgis_ray.pipelines.cleaning import clean_corpus, clean_corpus_twopass

    base = ("This is a clean sentence with enough words to survive the "
            "line filter easily today.")
    rows = []
    for i in range(30):
        junk = f"cookie banner {i}"  # short line, dropped by c4
        # docs 0-9 differ ONLY in the junk line -> identical post-c4
        text = f"{base}\n{junk}" if i < 10 else f"{base} variant {i}.\n{junk}"
        rows.append({"doc_id": i, "text": text})
    df = pd.DataFrame(rows)

    steps = ("c4", "exact_dedup")
    a = clean_corpus(rd.from_pandas(df).repartition(3), steps=steps,
                     num_buckets=4).to_pandas()
    b = clean_corpus_twopass(rd.from_pandas(df).repartition(3), steps=steps,
                             num_buckets=4).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["doc_id", "text"]], b[["doc_id", "text"]])
    # docs 0-9 collapsed to one survivor; junk lines gone from output
    assert (b["doc_id"] < 10).sum() == 1
    assert not b["text"].str.contains("cookie banner").any()
