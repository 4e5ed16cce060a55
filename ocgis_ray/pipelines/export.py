"""prepare_training_data — the one-call corpus-to-trainer export.

Composes the engine's LLM-data operators into the full last mile:

    raw documents
      -> clean_corpus            (filters -> dedups -> PII; pluggable)
      -> assign_split            (leakage-safe group-keyed train/val/test)
      -> [checkpoint]            (cleaned+labeled corpus, object store)
      -> per split:
           tokenize_and_pack     (BPE trained ONCE on the train split,
                                  reused for val/test — no tokenizer
                                  leakage, cross-split consistency)
           -> epoch-0 layout     (deterministic_shuffle over the pack
                                  key: the written file order IS a
                                  seed-stable shuffle; later epochs
                                  re-shuffle at read time with a new
                                  salt)
           -> lineage write      (atomic part=<split> + manifest --
                                  a re-run skips completed splits)

Everything streams except the two deliberate checkpoints every
production pipeline keeps anyway: the cleaned corpus (consumed once
per split) and the packed output itself.

Ordering note: packing assigns ``(pack_bucket, pack_seq)`` by id hash,
so shuffling BEFORE packing would be erased — the epoch-0 order is
applied to the packed rows, which is what a trainer reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def prepare_training_data(
    docs,
    out_dir: str,
    splits: dict[str, float] | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    clean_steps: tuple = ("gopher", "exact_dedup", "pii"),
    num_merges: int = 2048,
    budget: int = 2048,
    merges: list | None = None,
    train_split: str = "train",
    shuffle_salt: int = 0,
    resume: bool = True,
    max_words: int = 1_000_000,
    num_buckets: int | None = None,
    clean_kwargs: dict | None = None,
) -> dict:
    """Run the export; returns ``{"records": [lineage records written
    this run], "merges": the tokenizer, "splits": {name: rows}}``.

    ``merges`` reuses an existing tokenizer (cross-crawl consistency);
    otherwise one trains on THIS corpus's train split.  With
    ``resume`` a completed split (per the manifest) is skipped — the
    deterministic tokenizer/packer reproduce identical bytes for the
    rest."""
    from ocgis_ray.pipelines.cleaning import clean_corpus
    from ocgis_ray.pipelines.tokenize import tokenize_and_pack
    from ocgis_ray.stages.reshape import assign_split, deterministic_shuffle
    from ocgis_ray.stages.tokenizer import train_bpe
    from ocgis_ray.state import lineage

    splits = dict(DEFAULT_SPLITS if splits is None else splits)
    if merges is None and train_split not in splits:
        raise ValueError(
            f"prepare_training_data: no {train_split!r} split to train "
            f"the tokenizer on (splits={list(splits)}); pass merges= "
            f"or train_split=")
    cleaned = clean_corpus(docs, id_col=id_col, text_col=text_col,
                           url_col=url_col, steps=clean_steps,
                           num_buckets=num_buckets,
                           **(clean_kwargs or {}))
    labeled = assign_split(cleaned, group_col, splits)
    # checkpoint: each split (and tokenizer training) consumes this —
    # without it the whole cleaning cascade re-executes per consumer
    labeled = labeled.materialize()
    if merges is None:
        merges = train_bpe(
            labeled.filter(lambda r, s=train_split: r["split"] == s),
            num_merges=num_merges, col=text_col, max_words=max_words,
            num_buckets=num_buckets)

    def make_ds(split: str):
        part = labeled.filter(lambda r, s=split: r["split"] == s)
        packed, _ = tokenize_and_pack(part, merges=merges, budget=budget,
                                      col=text_col, id_col=id_col,
                                      num_buckets=num_buckets)
        packed = packed.drop_columns(["split"])

        def pack_key(t: pa.Table) -> pa.Table:
            from ocgis_ray.sources.io import ensure_list_column

            # stabilize the on-disk schema: uniform-length blocks
            # otherwise write token_ids as Ray's tensor-extension
            # STRUCT(data, shape) instead of list<int32>
            t = ensure_list_column(t, "token_ids", pa.int32())
            key = (t["pack_bucket"].to_numpy(zero_copy_only=False)
                   .astype(np.int64) * (1 << 32)
                   + t["pack_seq"].to_numpy(zero_copy_only=False)
                   .astype(np.int64))
            return t.append_column("_pack_key", pa.array(key))

        keyed = packed.map_batches(pack_key, batch_format="pyarrow",
                                   zero_copy_batch=True)
        # epoch-0 layout: written row order is the seed-stable shuffle;
        # docs in one pack share _pack_key, so the id tiebreak keeps
        # within-pack order reproducible across parallelism levels
        out = deterministic_shuffle(keyed, "_pack_key", salt=shuffle_salt,
                                    tiebreak_cols=[id_col])
        return out.drop_columns(["_pack_key"])

    records = lineage.run_partitioned(make_ds, out_dir,
                                      list(splits), resume=resume)
    # honor the {name: rows} contract on resume runs too: splits
    # skipped as already-complete report their manifest row counts
    rows = {}
    for rec in lineage.read_manifest(out_dir):
        if rec.get("partition") in splits:
            rows[rec["partition"]] = rec.get("rows")
    rows.update({r["partition"]: r["rows"] for r in records})
    return {"records": records, "merges": merges, "splits": rows}
