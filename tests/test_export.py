"""prepare_training_data: the one-call corpus->trainer export —
split integrity, tokenizer round-trip, epoch-0 layout, resume."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def _docs(n: int = 150, seed: int = 4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = ["the", "value", "report", "data", "market", "index",
             "growth", "rate", "annual", "review"]
    rows = []
    for i in range(n):
        ln = int(rng.integers(8, 40))
        rows.append((i, " ".join(rng.choice(words, ln)),
                     f"src{i % 7}"))
    # exact duplicate + junk the gopher gate drops
    rows.append((n, rows[0][1], "src0"))
    rows.append((n + 1, "x", "src1"))
    return pd.DataFrame(rows, columns=["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def exported(ray_session, tmp_path_factory):
    import ray.data as rd

    from ocgis_ray.pipelines.export import prepare_training_data

    out = str(tmp_path_factory.mktemp("export"))
    df = _docs()
    ds = rd.from_pandas(df).repartition(3)
    res = prepare_training_data(ds, out, num_merges=64, budget=256,
                                max_words=50_000,
                                clean_steps=("exact_dedup", "pii"))
    return df, out, res


def test_splits_written_with_lineage(exported):
    import duckdb

    df, out, res = exported
    assert set(res["splits"]) == {"train", "val", "test"}
    total = sum(res["splits"].values())
    # cleaning dropped the exact duplicate, nothing else
    assert total == len(df) - 1
    con = duckdb.connect()
    for split, n in res["splits"].items():
        part = os.path.join(out, f"part={split}")
        assert os.path.isdir(part)
        if n:
            got = con.execute(
                f"SELECT count(*) FROM '{part}/*.parquet'").fetchone()[0]
            assert got == n
    manifest = [json.loads(l) for l in
                open(os.path.join(out, "manifest.jsonl"))]
    assert {m["partition"] for m in manifest} >= set(res["splits"])


def test_group_leakage_guard(exported):
    import duckdb

    df, out, res = exported
    con = duckdb.connect()
    seen = {}
    for split, n in res["splits"].items():
        if not n:
            continue
        ids = [r[0] for r in con.execute(
            f"SELECT doc_id FROM '{out}/part={split}/*.parquet'").fetchall()]
        for d in ids:
            src = df.loc[df["doc_id"] == d, "source"].iloc[0]
            assert seen.setdefault(src, split) == split, \
                f"group {src} leaked across splits"


def test_tokens_roundtrip_and_epoch_layout(exported):
    import duckdb

    from ocgis_ray.stages.tokenizer import bpe_vocab

    df, out, res = exported
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, token_ids, pack_bucket, pack_seq "
        f"FROM '{out}/part=train/*.parquet'").fetchall()
    texts = df.set_index("doc_id")["text"]
    vocab = bpe_vocab(res["merges"])
    for doc_id, ids, _, _ in rows[:20]:
        dec = b"".join(vocab[i] for i in ids).decode()
        assert dec == "".join(texts.loc[doc_id].lower().split())
    # epoch-0 layout: pack keys are NOT in sorted order (shuffled)
    keys = [(b << 32) + s for _, _, b, s in rows]
    assert keys != sorted(keys)


def test_resume_skips_completed(exported, ray_session):
    import ray.data as rd

    from ocgis_ray.pipelines.export import prepare_training_data

    df, out, res = exported
    again = prepare_training_data(
        rd.from_pandas(df).repartition(3), out, num_merges=64,
        budget=256, max_words=50_000, merges=res["merges"],
        clean_steps=("exact_dedup", "pii"))
    assert again["records"] == []  # every split already complete


def test_custom_split_names_need_train_or_merges(ray_session, tmp_path):
    import ray.data as rd

    from ocgis_ray.pipelines.export import prepare_training_data

    ds = rd.from_pandas(_docs(20))
    with pytest.raises(ValueError, match="no 'train' split"):
        prepare_training_data(ds, str(tmp_path / "o"),
                              splits={"fit": 0.9, "holdout": 0.1})
    # train_split= names the training partition explicitly
    res = prepare_training_data(
        ds, str(tmp_path / "o2"), splits={"fit": 0.9, "holdout": 0.1},
        train_split="fit", num_merges=32, budget=128,
        clean_steps=("exact_dedup",))
    assert set(res["splits"]) == {"fit", "holdout"}
