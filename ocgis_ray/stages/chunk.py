"""Token-window document chunking: split long documents into
fixed-token windows with overlap — the embedding-/context-window prep
step every RAG or long-context training pipeline runs before encoding.

One vectorized pass per batch: whitespace-token spans come from the
shared byte-view tokenizer (:func:`ocgis_ray.stages.text._tokenize_hash`
``with_spans``), window boundaries are pure index arithmetic, and the
chunk text is SLICED FROM THE ORIGINAL BYTES (first window token's
start to last's end), so inter-token whitespace inside a chunk is
byte-exact and ``" ".join``-free.  Embarrassingly parallel — no
shuffle; the output is a flat (doc, chunk_seq) table ready for
``unigram_encode``/``bpe_encode`` or an embedding actor pool.

Window math (the SQL-twinnable part): ``stride = max_tokens -
overlap``; a doc with ``n`` tokens emits ``1 + ceil(max(n -
max_tokens, 0) / stride)`` chunks (zero-token docs emit ONE empty
chunk so every document stays represented).  The final window is the
natural remainder — never re-padded backward — so every token belongs
to at least one and at most ``ceil(max_tokens / stride)`` windows.

No reference analog (no text surface, SURVEY §2.7); first-class
LLM-pipeline component per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocgis_ray.stages.text import KERNEL_BATCH_SIZE, _tokenize_hash


def chunk_counts(n_tokens: np.ndarray, max_tokens: int,
                 overlap: int) -> np.ndarray:
    """Chunks per document — shared by the stage and its SQL twin."""
    stride = max_tokens - overlap
    extra = np.maximum(n_tokens - max_tokens, 0)
    return 1 + (extra + stride - 1) // stride


def chunk_counts_sql(n_tokens_expr: str, max_tokens: int,
                     overlap: int) -> str:
    stride = max_tokens - overlap
    return (f"1 + CAST(ceil(greatest({n_tokens_expr} - {max_tokens}, 0) "
            f"/ {stride}.0) AS BIGINT)")


def add_chunk_count(ds, col: str = "text", max_tokens: int = 512,
                    overlap: int = 64, out: str = "n_chunks"):
    """Append the chunk count WITHOUT emitting the chunks — planning /
    cost estimation, and the SQL-twinnable face of the chunker: the
    whitespace-token segmentation is the SAME kernel
    :func:`chunk_by_tokens` windows over (``_tokenize_hash``), so a
    green twin pins the tokenizer; twin = :func:`chunk_counts_sql`
    over ``len(regexp_extract_all(col, '[^ \\t\\n\\r\\v\\f]+'))``."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        _, _, per_row = _tokenize_hash(arr, lower=False)
        return t.append_column(
            out, pa.array(chunk_counts(per_row, max_tokens, overlap)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def chunk_by_tokens(ds, col: str = "text", id_col: str = "doc_id",
                    max_tokens: int = 512, overlap: int = 64,
                    keep_cols: list[str] | None = None,
                    batch_size: int = KERNEL_BATCH_SIZE):
    """One row per (document, window): ``id_col``, ``chunk_seq``,
    ``chunk_text``, ``chunk_tokens`` (+ ``keep_cols`` carried over)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def f(t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.quality import _gather_strings

        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        _, _, per_row, data, tok_starts, tok_lens = _tokenize_hash(
            arr, lower=False, with_spans=True)
        n = t.num_rows
        n_chunks = chunk_counts(per_row, max_tokens, overlap)
        row_tok_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(per_row, out=row_tok_off[1:])
        total = int(n_chunks.sum())
        rows = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        # chunk_seq = position within its own document's windows
        seq = (np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        first = seq * stride                    # doc-relative token index
        last = np.minimum(first + max_tokens, per_row[rows])  # exclusive
        n_tok = np.maximum(last - first, 0)
        g_first = row_tok_off[rows] + first
        g_last = row_tok_off[rows] + last - 1
        starts = np.zeros(total, dtype=np.int64)
        lens = np.zeros(total, dtype=np.int64)
        has = n_tok > 0
        starts[has] = tok_starts[g_first[has]]
        lens[has] = (tok_starts[g_last[has]] + tok_lens[g_last[has]]
                     - starts[has])
        text_arr = _gather_strings(np.asarray(data), starts, lens)
        cols = {id_col: t[id_col].take(pa.array(rows, pa.int64()))}
        for c in keep_cols or []:
            cols[c] = t[c].take(pa.array(rows, pa.int64()))
        cols["chunk_seq"] = pa.array(seq)
        cols["chunk_text"] = text_arr
        cols["chunk_tokens"] = pa.array(n_tok)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)
