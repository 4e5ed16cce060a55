"""Byte-level BPE tokenizer: distributed training, broadcast encoding.

The canonical training-data tokenization step (Sennrich et al. 2016;
the GPT-2/HuggingFace byte-level variant), split the way real trainers
split it:

- **count** (:func:`word_counts`): the corpus-sized work — one
  distributed pass counts whitespace-words (the shared tokenize
  kernel's segmentation), a bucketed shuffle sums per word, and the
  top-``max_words`` distinct words return to the driver.  The merge
  loop's input is the COMPACT word-frequency table (Zipf: ~10^6-10^7
  distinct words for web corpora), not the corpus — this is exactly
  how HuggingFace/SentencePiece train.  Truncation to ``max_words`` is
  LOGGED with the dropped count mass (no silent caps).
- **learn** (:func:`learn_bpe`): classic greedy BPE on the driver over
  the word table — repeatedly merge the most frequent adjacent token
  pair (deterministic tiebreak: count desc, pair bytes asc),
  incremental pair-count maintenance so each merge costs only the
  words containing the pair.
- **encode** (:func:`bpe_encode`): merges broadcast once (``ray.put``);
  each actor encodes every DISTINCT word in the batch once (per-actor
  memo — Zipf makes the hit rate ~99% on natural text) and emits token
  ids per document as a ``list<int32>`` column plus the token count.
  Byte-level base alphabet: any UTF-8 input round-trips losslessly
  (``decode(encode(w)) == w`` by construction — tested).

No reference analog (the reference has no text surface, SURVEY §2.7);
this is a first-class LLM-pipeline component per the build brief.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

logger = logging.getLogger(__name__)


def word_counts(ds, col: str = "text", max_words: int = 1_000_000,
                lower: bool = True, num_buckets: int | None = None) -> pd.DataFrame:
    """(word, cnt) DataFrame of the corpus's ``max_words`` most frequent
    whitespace-words (count desc, word asc tiebreak), plus the total
    token count — the compact training input for :func:`learn_bpe`."""
    from ocgis_ray.sources.io import bucketed_group_apply

    def partial(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if lower:
            arr = pc.utf8_lower(arr)
        toks = pc.list_flatten(pc.split_pattern_regex(arr, r"\s+"))
        toks = toks.filter(pc.greater(pc.utf8_length(toks), 0))
        vc = toks.value_counts()
        return pd.DataFrame({"word": vc.field("values").to_pandas(),
                             "cnt": vc.field("counts").to_pandas()
                             .astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=KERNEL_BATCH_SIZE)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", sort=False, as_index=False)["cnt"].sum()

    combined = bucketed_group_apply(partials, "word", combine,
                                    num_buckets=num_buckets).materialize()
    import ray.data.aggregate as agg

    total = combined.aggregate(agg.Sum("cnt"))["sum(cnt)"]
    total = int(total) if total is not None else 0
    top = (combined.sort(["cnt", "word"], descending=[True, False])
           .limit(max_words).to_pandas())
    kept = int(top["cnt"].sum())
    if kept < total:
        logger.warning(
            "word_counts: truncated to top %d words; dropped %d of %d "
            "token occurrences (%.2f%%)", max_words, total - kept, total,
            100.0 * (total - kept) / max(total, 1))
    top.attrs["total_tokens"] = total
    return top


def learn_bpe(words: pd.DataFrame, num_merges: int) -> list[tuple[bytes, bytes]]:
    """Greedy BPE merges over a (word, cnt) table.  Tokens are BYTES
    sequences seeded from the words' UTF-8 bytes; returns the ordered
    merge list.  Deterministic: ties break on the smaller (left,
    right) byte pair."""
    from collections import defaultdict

    seqs: list[list[bytes]] = []
    cnts: list[int] = []
    for w, c in zip(words["word"], words["cnt"]):
        b = str(w).encode("utf-8")
        if b:
            seqs.append([b[i: i + 1] for i in range(len(b))])
            cnts.append(int(c))

    import heapq

    pair_cnt: dict[tuple[bytes, bytes], int] = defaultdict(int)
    pair_words: dict[tuple[bytes, bytes], set[int]] = defaultdict(set)
    for wi, seq in enumerate(seqs):
        c = cnts[wi]
        for a, b in zip(seq, seq[1:]):
            pair_cnt[(a, b)] += c
            pair_words[(a, b)].add(wi)

    # lazy max-heap: stale entries are skipped on pop (re-pushed on
    # every count increase), so each merge is O(words-containing-pair
    # + log #pairs) instead of a full pair-table scan
    heap = [(-c, p) for p, c in pair_cnt.items()]
    heapq.heapify(heap)

    def push(p):
        heapq.heappush(heap, (-pair_cnt[p], p))

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_cnt.get(p, 0) == -negc and negc < 0:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        new_tok = best[0] + best[1]
        # rewrite only the words containing the pair, updating pair
        # counts incrementally
        for wi in list(pair_words[best]):
            seq = seqs[wi]
            c = cnts[wi]
            i = 0
            out: list[bytes] = []
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == best:
                    if out:
                        old = (out[-1], seq[i])
                        pair_cnt[old] -= c
                        push(old)      # decreases need a fresh entry too
                        new = (out[-1], new_tok)
                        pair_cnt[new] += c
                        pair_words[new].add(wi)
                        push(new)
                    if i + 2 < len(seq):
                        old = (seq[i + 1], seq[i + 2])
                        pair_cnt[old] -= c
                        push(old)
                        new = (new_tok, seq[i + 2])
                        pair_cnt[new] += c
                        pair_words[new].add(wi)
                        push(new)
                    out.append(new_tok)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[wi] = out
        pair_cnt[best] = 0
        del pair_words[best]
    return merges


def bpe_vocab(merges: list[tuple[bytes, bytes]]) -> list[bytes]:
    """Token id -> bytes table: 256 byte tokens then one per merge."""
    return [bytes([i]) for i in range(256)] + [a + b for a, b in merges]


def _encode_word(b: bytes, ranks: dict[tuple[bytes, bytes], int],
                 ids: dict[bytes, int]) -> list[int]:
    seq = [b[i: i + 1] for i in range(len(b))]
    while len(seq) > 1:
        best_rank = None
        best_i = -1
        for i, p in enumerate(zip(seq, seq[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        seq[best_i: best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return [ids[t] for t in seq]


class BpeEncodeStage:
    """Actor: encode each batch's documents to token-id lists.

    Merge ranks decode once per actor; distinct words memoize across
    the actor's lifetime (Zipf hit rates make re-encoding rare), with
    an epoch-clear at ``memo_cap`` entries so a long-lived actor
    streaming unbounded distinct words (URLs, ids) cannot grow the
    cache past a bounded footprint — frequent words repopulate
    immediately after a clear.

    Segmentation and case mapping are the SAME Arrow kernels
    :func:`word_counts` trains on (``utf8_lower`` + RE2 ``\\s+``
    split), so encode-time words are exactly the trained
    distribution — Python ``str.split()``/``str.lower()`` differ on
    Unicode whitespace (NBSP) and locale-ish case points."""

    def __init__(self, merges_ref, col: str, lower: bool,
                 memo_cap: int = 1_000_000):
        import ray

        merges = (ray.get(merges_ref) if not isinstance(merges_ref, list)
                  else merges_ref)
        self.ranks = {p: i for i, p in enumerate(merges)}
        self.ids = {t: i for i, t in enumerate(bpe_vocab(merges))}
        self.col = col
        self.lower = lower
        self.memo: dict[str, list[int]] = {}
        self.memo_cap = memo_cap

    def _word_ids(self, w: str) -> list[int]:
        got = self.memo.get(w)
        if got is None:
            if len(self.memo) >= self.memo_cap:
                self.memo.clear()
            got = _encode_word(w.encode("utf-8"), self.ranks, self.ids)
            self.memo[w] = got
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t[self.col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.lower:
            col = pc.utf8_lower(col)
        words = pc.split_pattern_regex(col, r"\s+")
        out_ids: list[list[int]] = []
        counts = np.zeros(t.num_rows, dtype=np.int64)
        for i, row_words in enumerate(words):
            if not row_words.is_valid:
                out_ids.append([])
                continue
            doc: list[int] = []
            for w in row_words.values:
                s = w.as_py()
                if s:
                    doc.extend(self._word_ids(s))
            out_ids.append(doc)
            counts[i] = len(doc)
        t = t.append_column("token_ids",
                            pa.array(out_ids, type=pa.list_(pa.int32())))
        return t.append_column("n_tokens", pa.array(counts))


def bpe_encode(ds, merges: list[tuple[bytes, bytes]], col: str = "text",
               lower: bool = True, concurrency=None,
               batch_size: int = KERNEL_BATCH_SIZE):
    """Append ``token_ids`` (list<int32>) and ``n_tokens`` columns."""
    import ray

    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    merges_ref = ray.put(merges)
    return ds.map_batches(
        BpeEncodeStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"merges_ref": merges_ref, "col": col,
                               "lower": lower})


def train_bpe(ds, num_merges: int, col: str = "text",
              max_words: int = 1_000_000, lower: bool = True,
              num_buckets: int | None = None) -> list[tuple[bytes, bytes]]:
    """One-call train: distributed word counts -> driver merge loop."""
    wc = word_counts(ds, col=col, max_words=max_words, lower=lower,
                     num_buckets=num_buckets)
    return learn_bpe(wc, num_merges)
