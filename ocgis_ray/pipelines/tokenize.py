"""Tokenize-and-pack: the last mile of a training-data pipeline.

Composes the engine's pieces into the step that turns a CLEANED corpus
into model-ready input: train (or accept) a byte-level BPE tokenizer,
encode every document to token ids, and greedily pack documents into
fixed-token-budget sequences (the batching layout LLM trainers
consume).  Everything streams: training's corpus pass is the word-count
shuffle, encoding is a broadcast actor stage, packing is the
hash-bucketed deterministic packer — no driver materialization.

Typical use::

    clean = clean_corpus(docs, ...)
    packed, merges = tokenize_and_pack(clean, num_merges=4096,
                                       budget=2048)
    packed.write_parquet(out)          # (doc_id, token_ids, n_tokens,
                                       #  pack_bucket, pack_seq)

Resume note: both the encoder (pure function of the broadcast merges)
and the packer (hash-bucketed, id-sorted) are deterministic, so a
re-run after failure reproduces identical packs — the same property
the reference's GridChunker resume relies on (SURVEY §2.9).
"""

from __future__ import annotations


def tokenize_and_pack(ds, num_merges: int = 4096, budget: int = 2048,
                      col: str = "text", id_col: str = "doc_id",
                      merges: list | None = None,
                      max_words: int = 1_000_000, lower: bool = True,
                      concurrency=None, num_buckets: int | None = None):
    """Returns ``(packed_dataset, merges)``.

    ``packed_dataset`` carries the input columns minus ``col`` (fat
    text is dropped once ids exist) plus ``token_ids`` (list<int32>),
    ``n_tokens``, and the ``(pack_bucket, pack_seq)`` composite pack
    key.  Pass ``merges`` to reuse a trained tokenizer (cross-crawl
    consistency); otherwise one is trained on ``ds`` itself."""
    from ocgis_ray.stages.reshape import pack_sequences
    from ocgis_ray.stages.tokenizer import bpe_encode, train_bpe

    if merges is None:
        merges = train_bpe(ds, num_merges=num_merges, col=col,
                           max_words=max_words, lower=lower,
                           num_buckets=num_buckets)
    enc = bpe_encode(ds, merges, col=col, lower=lower,
                     concurrency=concurrency)
    enc = enc.drop_columns([col])
    packed = pack_sequences(enc, id_col=id_col, size_col="n_tokens",
                            budget=budget, num_buckets=num_buckets)
    return packed, merges
