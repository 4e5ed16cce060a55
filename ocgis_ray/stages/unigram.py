"""Unigram-LM tokenizer (SentencePiece-style): distributed counting,
driver EM training, broadcast Viterbi encoding.

The OTHER major subword family next to byte-level BPE (Kudo 2018,
"Subword Regularization"; the SentencePiece ``--model_type=unigram``
default), split the same way :mod:`ocgis_ray.stages.tokenizer` splits
BPE:

- **count**: reuses :func:`tokenizer.word_counts` — one distributed
  pass + bucketed shuffle yields the COMPACT (word, cnt) table
  (Zipf-bounded, model-sized), never the corpus.
- **train** (:func:`learn_unigram`): driver loop over the word table.
  Seed vocab = all 256 single bytes (lossless coverage of any UTF-8
  input, as in byte-level BPE) + the most frequent substrings scored
  ``count * len`` (SentencePiece's seed heuristic).  EM then
  alternates forward-backward expected piece counts (the full
  segmentation lattice, log-space) with ML re-estimation, and prunes
  the lowest-expected-count multi-byte pieces between rounds until
  the target vocab size — the expected-count criterion is the
  standard simplification of SentencePiece's per-piece likelihood
  loss (single bytes are never pruned, so coverage is preserved).
  Per-word lattice matches are precomputed once per vocab and reused
  across the round's EM iterations.
- **encode** (:func:`unigram_encode`): model broadcast once
  (``ray.put``); actors Viterbi-decode each DISTINCT word once
  (per-actor memo) and emit ``list<int32>`` token ids + ``n_tokens``,
  with the SAME Arrow segmentation kernels the counter trained on.

No reference analog (the reference has no text surface, SURVEY §2.7);
first-class LLM-pipeline component per the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

NEG_INF = -np.inf


@dataclass
class UnigramModel:
    """pieces[i] is the byte string for token id i; logp aligned.
    The first 256 ids are always the single bytes (coverage)."""

    pieces: list[bytes]
    logp: np.ndarray
    max_len: int

    def piece_ids(self) -> dict[bytes, int]:
        return {p: i for i, p in enumerate(self.pieces)}

    def decode(self, ids) -> bytes:
        return b"".join(self.pieces[int(i)] for i in ids)


def _word_table(words: pd.DataFrame) -> tuple[list[bytes], np.ndarray]:
    seqs, cnts = [], []
    for w, c in zip(words["word"], words["cnt"]):
        b = str(w).encode("utf-8")
        if b:
            seqs.append(b)
            cnts.append(int(c))
    return seqs, np.asarray(cnts, dtype=np.float64)


def seed_vocab(words: pd.DataFrame, seed_size: int = 8192,
               max_piece_len: int = 10) -> list[bytes]:
    """All 256 single bytes + the top multi-byte substrings by
    ``occurrences * len`` (deterministic tiebreak: score desc, piece
    bytes asc)."""
    from collections import defaultdict

    seqs, cnts = _word_table(words)
    sub: dict[bytes, float] = defaultdict(float)
    for s, c in zip(seqs, cnts):
        n = len(s)
        for i in range(n):
            for j in range(i + 2, min(i + max_piece_len, n) + 1):
                sub[s[i:j]] += c
    scored = sorted(((cnt * len(p), p) for p, cnt in sub.items()),
                    key=lambda t: (-t[0], t[1]))
    base = [bytes([i]) for i in range(256)]
    return base + [p for _, p in scored[: max(0, seed_size - 256)]]


def _matches(seqs: list[bytes], ids: dict[bytes, int],
             max_len: int) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Per word: (start, end, piece_id) arrays of every lattice edge.
    Computed once per vocab; EM iterations only re-weight the edges."""
    out = []
    for s in seqs:
        n = len(s)
        st, en, pid = [], [], []
        for i in range(n):
            for j in range(i + 1, min(i + max_len, n) + 1):
                k = ids.get(s[i:j])
                if k is not None:
                    st.append(i)
                    en.append(j)
                    pid.append(k)
        out.append((np.asarray(st, dtype=np.int64),
                    np.asarray(en, dtype=np.int64),
                    np.asarray(pid, dtype=np.int64)))
    return out


def _em_iter(seqs, cnts, matches, logp, n_pieces):
    """One forward-backward E-step + ML M-step.  Returns (new_logp,
    corpus negative log likelihood under the INPUT logp)."""
    ecnt = np.zeros(n_pieces, dtype=np.float64)
    nll = 0.0
    for s, c, (st, en, pid) in zip(seqs, cnts, matches):
        n = len(s)
        w = logp[pid]
        alpha = np.full(n + 1, NEG_INF)
        alpha[0] = 0.0
        # edges are generated start-ascending; alpha needs end order
        order = np.argsort(en, kind="stable")
        for e in order:
            a = alpha[st[e]] + w[e]
            if a > NEG_INF:
                cur = alpha[en[e]]
                alpha[en[e]] = (a if cur == NEG_INF
                                else np.logaddexp(cur, a))
        beta = np.full(n + 1, NEG_INF)
        beta[n] = 0.0
        for e in order[::-1]:
            b = beta[en[e]] + w[e]
            if b > NEG_INF:
                cur = beta[st[e]]
                beta[st[e]] = (b if cur == NEG_INF
                               else np.logaddexp(cur, b))
        z = alpha[n]
        nll -= c * z
        post = np.exp(alpha[st] + w + beta[en] - z)
        np.add.at(ecnt, pid, c * post)
    tot = ecnt.sum()
    with np.errstate(divide="ignore"):
        new_logp = np.where(ecnt > 0, np.log(ecnt) - np.log(tot), NEG_INF)
    return new_logp, nll, ecnt


def learn_unigram(words: pd.DataFrame, vocab_size: int,
                  seed_size: int = 8192, max_piece_len: int = 10,
                  em_iters: int = 2, prune_frac: float = 0.25,
                  ) -> UnigramModel:
    """EM + prune loop over the compact (word, cnt) table."""
    if vocab_size < 256:
        raise ValueError("vocab_size must be >= 256 (single-byte coverage)")
    seqs, cnts = _word_table(words)
    if not seqs:
        base = [bytes([i]) for i in range(256)]
        return UnigramModel(base, np.full(256, -np.log(256.0)), 1)
    pieces = seed_vocab(words, seed_size=seed_size,
                        max_piece_len=max_piece_len)
    # init from raw occurrence counts (EM re-estimates immediately)
    occ = np.ones(len(pieces), dtype=np.float64)
    sub_occ = {}
    for s, c in zip(seqs, cnts):
        for i in range(len(s)):
            for j in range(i + 1, min(i + max_piece_len, len(s)) + 1):
                sub_occ[s[i:j]] = sub_occ.get(s[i:j], 0.0) + c
    for k, p in enumerate(pieces):
        occ[k] += sub_occ.get(p, 0.0)
    logp = np.log(occ) - np.log(occ.sum())

    while True:
        ids = {p: i for i, p in enumerate(pieces)}
        ml = max(len(p) for p in pieces)
        matches = _matches(seqs, ids, ml)
        ecnt = None
        for _ in range(em_iters):
            logp, _, ecnt = _em_iter(seqs, cnts, matches, logp, len(pieces))
        if len(pieces) <= vocab_size:
            break
        # prune lowest-expected-count multi-byte pieces (never bytes);
        # deterministic tiebreak on the piece bytes
        multi = [(ecnt[k], pieces[k], k) for k in range(len(pieces))
                 if len(pieces[k]) > 1]
        n_drop = min(len(multi),
                     max(int(len(pieces) * prune_frac),
                         len(pieces) - vocab_size))
        n_drop = min(n_drop, len(pieces) - vocab_size)
        multi.sort(key=lambda t: (t[0], t[1]))
        drop = {k for _, _, k in multi[:n_drop]}
        keep = [k for k in range(len(pieces)) if k not in drop]
        pieces = [pieces[k] for k in keep]
        logp = logp[keep]
        # renormalize the survivors (numpy log-sum-exp)
        fin = logp[np.isfinite(logp)]
        if fin.size:
            mx = fin.max()
            logp = logp - (mx + np.log(np.exp(fin - mx).sum()))
    # single bytes unseen in training end at -inf; floor them so OOV
    # input at encode time stays reachable (lossless coverage)
    floor = (logp[np.isfinite(logp)].min() if np.isfinite(logp).any()
             else -np.log(256.0)) - 10.0
    for k, p in enumerate(pieces):
        if len(p) == 1 and not np.isfinite(logp[k]):
            logp[k] = floor
    return UnigramModel(pieces, logp, max(len(p) for p in pieces))


def viterbi_encode(s: bytes, ids: dict[bytes, int], logp: np.ndarray,
                   max_len: int) -> list[int]:
    """Best segmentation under the unigram LM (ties break toward the
    LONGEST last piece, deterministically)."""
    n = len(s)
    best = np.full(n + 1, NEG_INF)
    back: list[tuple[int, int] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        bi = best[i]
        if bi == NEG_INF:
            continue
        for j in range(i + 1, min(i + max_len, n) + 1):
            k = ids.get(s[i:j])
            if k is None:
                continue
            sc = bi + logp[k]
            if sc > best[j]:
                best[j] = sc
                back[j] = (i, k)
    out: list[int] = []
    j = n
    while j > 0:
        i, k = back[j]  # single bytes guarantee reachability
        out.append(k)
        j = i
    out.reverse()
    return out


class UnigramEncodeStage:
    """Actor: Viterbi-encode each batch's documents to token-id lists
    (same memo/segmentation contract as ``BpeEncodeStage``)."""

    def __init__(self, model_ref, col: str, lower: bool,
                 memo_cap: int = 1_000_000):
        import ray

        model: UnigramModel = (ray.get(model_ref)
                               if not isinstance(model_ref, UnigramModel)
                               else model_ref)
        self.ids = model.piece_ids()
        self.logp = model.logp
        self.max_len = model.max_len
        self.col = col
        self.lower = lower
        self.memo: dict[str, list[int]] = {}
        self.memo_cap = memo_cap

    def _word_ids(self, w: str) -> list[int]:
        got = self.memo.get(w)
        if got is None:
            if len(self.memo) >= self.memo_cap:
                self.memo.clear()
            got = viterbi_encode(w.encode("utf-8"), self.ids, self.logp,
                                 self.max_len)
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


def unigram_encode(ds, model: UnigramModel, col: str = "text",
                   lower: bool = True, concurrency=None,
                   batch_size: int = KERNEL_BATCH_SIZE):
    """Append ``token_ids`` (list<int32>) and ``n_tokens`` columns."""
    import ray

    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    model_ref = ray.put(model)
    return ds.map_batches(
        UnigramEncodeStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"model_ref": model_ref, "col": col,
                               "lower": lower})


def train_unigram(ds, vocab_size: int, col: str = "text",
                  max_words: int = 1_000_000, lower: bool = True,
                  seed_size: int = 8192, max_piece_len: int = 10,
                  num_buckets: int | None = None) -> UnigramModel:
    """One-call train: distributed word counts -> driver EM loop."""
    from ocgis_ray.stages.tokenizer import word_counts

    wc = word_counts(ds, col=col, max_words=max_words, lower=lower,
                     num_buckets=num_buckets)
    return learn_unigram(wc, vocab_size, seed_size=seed_size,
                         max_piece_len=max_piece_len)
