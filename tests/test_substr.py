"""Exact substring dedup (winnowing-fingerprint distributed shape)."""

import numpy as np
import pandas as pd
import pytest

MIN_LEN = 40


def _rand_text(rng, n: int) -> str:
    return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), size=n))


@pytest.fixture(scope="module")
def planted(ray_session):
    """Corpus with one span shared doc1->doc3, one within-doc repeat in
    doc4, and unique filler everywhere else."""
    import ray.data as rd

    rng = np.random.default_rng(42)
    span = _rand_text(rng, 3 * MIN_LEN)
    texts = {
        0: _rand_text(rng, 300),
        1: _rand_text(rng, 120) + span + _rand_text(rng, 80),   # survivor
        2: _rand_text(rng, 250),
        3: _rand_text(rng, 37) + span + _rand_text(rng, 200),   # loser
        4: (lambda a, b: a + b + a)(_rand_text(rng, 2 * MIN_LEN),
                                    _rand_text(rng, 90)),       # self-repeat
        5: "tiny",
    }
    df = pd.DataFrame({
        "doc_id": np.array(sorted(texts), np.int64),
        "text": [texts[k] for k in sorted(texts)],
        "extra": np.arange(len(texts), dtype=np.int64) * 10,
    })
    return rd.from_pandas(df), df, span


def test_winnowing_guarantee(planted):
    """Both occurrences of the planted span share >= 1 selected
    fingerprint VALUE (the w+s-1 winnowing bound)."""
    from ocgis_ray.stages.substr import selected_fingerprints

    ds, df, span = planted
    sel = selected_fingerprints(ds, min_len=MIN_LEN).to_pandas()
    f1 = set(sel.loc[sel["doc_id"] == 1, "fp"])
    f3 = set(sel.loc[sel["doc_id"] == 3, "fp"])
    assert f1 & f3
    # short rows yield nothing
    assert (sel["doc_id"] != 5).all()
    # selections are within their row
    lens = df.set_index("doc_id")["text"].str.len()
    assert (sel["pos"] < sel["doc_id"].map(lens)).all()


def test_intervals_only_in_losers(planted):
    from ocgis_ray.stages.substr import duplicate_span_intervals

    ds, df, span = planted
    iv = duplicate_span_intervals(ds, min_len=MIN_LEN,
                                  num_buckets=4).to_pandas()
    assert set(iv["doc_id"]) == {3, 4}
    # loser intervals sit inside the planted span's location (plus the
    # w-byte window tail), never in doc 1
    start3 = 37
    end3 = start3 + len(span)
    w = MIN_LEN - MIN_LEN // 2 + 1
    sub = iv[iv["doc_id"] == 3]
    assert (sub["start"] >= start3).all()
    assert (sub["end"] <= end3 + w).all()


def test_substring_dedup_cuts_and_preserves(planted):
    from ocgis_ray.stages.substr import substring_dedup

    ds, df, span = planted
    out = (substring_dedup(ds, min_len=MIN_LEN, num_buckets=4)
           .to_pandas().set_index("doc_id").sort_index())
    src = df.set_index("doc_id").sort_index()
    # non-duplicated docs byte-identical; extra column intact
    for d in (0, 2, 5):
        assert out.loc[d, "text"] == src.loc[d, "text"]
    assert (out["extra"] == src["extra"]).all()
    # the first occurrence survives untouched
    assert out.loc[1, "text"] == src.loc[1, "text"]
    assert span in out.loc[1, "text"]
    # the loser retains NO min_len-length window of the span (interior
    # masks are contiguous, edge residue < s <= min_len)
    t3 = out.loc[3, "text"]
    assert all(span[i: i + MIN_LEN] not in t3
               for i in range(len(span) - MIN_LEN + 1))
    assert len(t3) < len(src.loc[3, "text"])
    # prefix before the span start is untouched
    assert t3.startswith(src.loc[3, "text"][:37])
    # within-doc repeat: second copy cut, doc shrank by ~the repeat
    t4 = out.loc[4, "text"]
    assert len(t4) < len(src.loc[4, "text"])
    a = src.loc[4, "text"][: 2 * MIN_LEN]
    assert t4.count(a[: MIN_LEN]) == 1


def test_no_dup_corpus_unchanged(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.substr import substring_dedup

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [_rand_text(rng, int(rng.integers(5, 400)))
                 for _ in range(20)],
    })
    out = (substring_dedup(rd.from_pandas(df), min_len=MIN_LEN,
                           num_buckets=4)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["text"].tolist() == df.set_index("doc_id")["text"].tolist()


def test_determinism(planted):
    from ocgis_ray.stages.substr import substring_dedup

    ds, df, _ = planted
    a = (substring_dedup(ds, min_len=MIN_LEN, num_buckets=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (substring_dedup(ds, min_len=MIN_LEN, num_buckets=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_random_planting_property(ray_session):
    """Randomized: shared spans of exactly min_len at arbitrary
    alignments are always detected (guarantee, not luck)."""
    import ray.data as rd

    from ocgis_ray.stages.substr import duplicate_span_intervals

    rng = np.random.default_rng(11)
    for trial in range(5):
        span = _rand_text(rng, MIN_LEN)
        off_a = int(rng.integers(0, 120))
        off_b = int(rng.integers(0, 120))
        df = pd.DataFrame({
            "doc_id": np.array([0, 1], np.int64),
            "text": [_rand_text(rng, off_a) + span + _rand_text(rng, 60),
                     _rand_text(rng, off_b) + span + _rand_text(rng, 60)],
        })
        iv = duplicate_span_intervals(rd.from_pandas(df), min_len=MIN_LEN,
                                      num_buckets=2).to_pandas()
        assert (iv["doc_id"] == 1).all() and len(iv) >= 1, f"trial {trial}"


def test_null_text_passthrough(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.substr import substring_dedup

    df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                       "text": pd.array(["hello world ok", None],
                                        dtype="string")})
    out = (substring_dedup(rd.from_pandas(df), min_len=8, num_buckets=2)
           .to_pandas().set_index("doc_id").sort_index())
    assert out.loc[0, "text"] == "hello world ok"
    assert out.loc[1, "text"] is None or pd.isna(out.loc[1, "text"])
