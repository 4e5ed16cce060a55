"""BM25 lexical retrieval over the documents table — the sparse
counterpart to :mod:`ocgis_ray.stages.ann`'s dense similarity search.

Production LLM-data pipelines pair embedding ANN with lexical BM25
(retrieval-based decontamination, hard-negative mining, corpus search)
— Robertson & Zaragoza 2009, the Lucene/ATIRE ``ln(1 + (N - df + .5)
/ (df + .5))`` idf variant.

Shape (two streaming passes, NO full-vocab shuffle):

1. **stats** (:func:`bm25_stats`): the query's terms are hashed with
   the shared ``_tokenize_hash`` kernel and broadcast; one
   ``map_batches`` pass emits per-batch partials (doc count, token
   count, per-term document frequency) that ``Dataset.sum`` folds into
   a query-terms-sized dict.  df is counted ONLY for the query's
   terms, so corpus vocabulary size never matters.
2. **score** (:func:`add_bm25`): a stateless task stage
   (``tuning.task_stage``) re-tokenizes each batch once, gathers
   per-doc term frequencies via ``searchsorted`` against the sorted
   query hashes, and computes the BM25 sum vectorized.  Two tokenize
   passes beat materializing per-doc tf columns at corpus scale (the
   stats pass reads only the text column and its output is
   query-sized).

:func:`bm25_topk` adds the retrieval tail: per-block partial top-k,
then a driver-side final merge over the (k x blocks)-bounded partials
— the same combine shape as ``stages/ann.py``.

``bm25_sql`` is the DuckDB twin: identical token hashes (parity
HUGEINT fragments), exact integer df/dl counts, the same operation
order for idf/avgdl/score, both sides rounded before comparison.

Reference seam: the reference has no text retrieval; the analog
surface is its calculation registry (``calc/engine.py``) — a
corpus-level statistic applied per element.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def query_term_hashes(query: str) -> np.ndarray:
    """Sorted unique uint64 hashes of the query's tokens (the engine
    tokenizer: ASCII-lowercase, ASCII-whitespace split, Horner +
    splitmix64).  Duplicate query terms carry weight 1 (the classic
    unique-terms BM25; qtf weighting is a deliberate non-goal)."""
    from ocgis_ray.stages.text import _tokenize_hash

    h, _, _ = _tokenize_hash(pa.array([query], pa.string()), lower=True)
    return np.unique(h)  # sorted unique


def _per_doc_tf(arr, qh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (tf (n, Q) int64, dl (n,) int64) against
    the sorted query hashes ``qh`` — one tokenize pass, one
    searchsorted gather, one ``np.add.at`` scatter."""
    from ocgis_ray.stages.text import _tokenize_hash

    h, tok_row, per_row = _tokenize_hash(arr, lower=True)
    n = len(per_row)
    tf = np.zeros((n, len(qh)), dtype=np.int64)
    if h.size and qh.size:
        pos = np.searchsorted(qh, h)
        pos_c = np.minimum(pos, len(qh) - 1)
        hit = qh[pos_c] == h
        if hit.any():
            np.add.at(tf, (tok_row[hit], pos_c[hit]), 1)
    return tf, per_row.astype(np.int64)


def bm25_stats(ds, query: str, col: str = "text") -> dict:
    """One streaming pass -> ``{"qh": sorted uint64 (Q,), "df":
    float64 (Q,), "n": float, "avgdl": float}``.

    Exact integer partials (docs, token total, per-term df) summed by
    ``Dataset.sum`` — the result is query-sized, never corpus-sized."""
    qh = query_term_hashes(query)
    q = len(qh)

    def partial(t: pa.Table) -> pa.Table:
        tf, dl = _per_doc_tf(t[col], qh)
        cols = {"_n": pa.array([t.num_rows], pa.int64()),
                "_dl": pa.array([int(dl.sum())], pa.int64())}
        present = (tf > 0).sum(axis=0)
        for i in range(q):
            cols[f"_df{i}"] = pa.array([int(present[i])], pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    sums = partials.sum(["_n", "_dl"] + [f"_df{i}" for i in range(q)])
    # an empty dataset yields None sums (no partial rows at all)
    n = float(sums["sum(_n)"] or 0) if sums else 0.0
    if n == 0:
        raise ValueError("bm25_stats: empty corpus")
    # avgdl = exact int token total / exact int doc count (the SQL
    # twin divides the same two integers — bit-identical)
    avgdl = float(sums["sum(_dl)"]) / n
    df = np.array([float(sums[f"sum(_df{i})"]) for i in range(q)])
    return {"qh": qh, "df": df, "n": n, "avgdl": avgdl}


def _idf(stats: dict) -> np.ndarray:
    n, df = stats["n"], stats["df"]
    return np.log(1.0 + (n - df + 0.5) / (df + 0.5))


class _Bm25Stage:
    def __init__(self, qh_tuple, df_tuple, n, avgdl, col, out,
                 k1, b, round_digits):
        self.qh = np.asarray(qh_tuple, dtype=np.uint64)
        stats = {"n": n, "df": np.asarray(df_tuple, dtype=np.float64)}
        self.idf = _idf(stats)
        self.avgdl = avgdl
        self.col = col
        self.out = out
        self.k1 = k1
        self.b = b
        self.round_digits = round_digits

    def __call__(self, t: pa.Table) -> pa.Table:
        tf, dl = _per_doc_tf(t[self.col], self.qh)
        tff = tf.astype(np.float64)
        norm = self.k1 * (1.0 - self.b
                          + self.b * (dl.astype(np.float64) / self.avgdl))
        with np.errstate(invalid="ignore"):
            terms = tff * (self.k1 + 1.0) / (tff + norm[:, None])
        terms[tf == 0] = 0.0  # covers dl=0 rows (0/0 -> NaN)
        score = terms @ self.idf
        if self.round_digits is not None:
            from ocgis_ray.parity import sql_round

            score = sql_round(score, self.round_digits)
        return t.append_column(self.out, pa.array(score))


def add_bm25(ds, query: str, stats: dict | None = None,
             col: str = "text", out: str = "bm25",
             k1: float = DEFAULT_K1, b: float = DEFAULT_B,
             batch_size: int = 4096, round_digits: int | None = None):
    """Append the per-document BM25 score for ``query``.  ``stats``
    (from :func:`bm25_stats` over the scoring corpus, or a LARGER
    background corpus — both are legitimate) is computed here when
    omitted; note that consumes ``ds``'s lineage once."""
    from ocgis_ray.tuning import task_stage

    if stats is None:
        stats = bm25_stats(ds, query, col=col)
    elif not np.array_equal(stats["qh"], query_term_hashes(query)):
        # stats may come from a LARGER corpus, but never from a
        # DIFFERENT query — silently scoring the old query's terms
        # under the new query's name is the misuse this catches
        raise ValueError("add_bm25: stats were computed for a "
                         "different query's terms")
    fn = task_stage(_Bm25Stage,
                    qh_tuple=tuple(int(h) for h in stats["qh"]),
                    df_tuple=tuple(float(d) for d in stats["df"]),
                    n=stats["n"], avgdl=stats["avgdl"], col=col, out=out,
                    k1=k1, b=b, round_digits=round_digits)
    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def bm25_topk(ds, query: str, k: int, col: str = "text",
              id_col: str = "doc_id", k1: float = DEFAULT_K1,
              b: float = DEFAULT_B, round_digits: int | None = 6):
    """Top-``k`` documents for ``query`` -> small pandas frame
    ``(id_col, bm25, rank)``, score desc / id asc (deterministic).

    Per-block partial top-k bounds the driver-side merge at
    ``k x n_blocks`` rows — the ann.py combine shape."""
    import pandas as pd

    stats = bm25_stats(ds, query, col=col)
    scored = add_bm25(ds, query, stats, col=col, k1=k1, b=b,
                      round_digits=round_digits)

    def partial_topk(t: pa.Table) -> pa.Table:
        df = t.select([id_col, "bm25"]).to_pandas()
        df = df.sort_values(["bm25", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = scored.map_batches(partial_topk, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["bm25", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def bm25_topk_multi(ds, queries: dict, k: int, col: str = "text",
                    id_col: str = "doc_id", k1: float = DEFAULT_K1,
                    b: float = DEFAULT_B):
    """Batched retrieval: top-``k`` docs for EVERY query in ONE corpus
    pass (plus one shared stats pass) — the ``ann_bruteforce`` shape
    for lexical search.  ``queries`` maps query_id -> query text.

    All queries' terms merge into one sorted hash vocabulary; stats
    are computed for the union in a single pass; scoring gathers one
    per-batch tf matrix and multiplies by the (Q x T) per-query idf
    matrix — one matmul per batch, not one pass per query.  Returns a
    pandas frame ``(query_id, id_col, bm25, rank)``; ties break on
    ``id_col`` ascending."""
    import pandas as pd

    if not queries:
        raise ValueError("bm25_topk_multi: no queries")
    qids = list(queries)
    per_q = {qid: query_term_hashes(str(q)) for qid, q in queries.items()}
    union = np.unique(np.concatenate([h for h in per_q.values()
                                      if h.size]
                                     or [np.empty(0, np.uint64)]))
    if not union.size:
        raise ValueError("bm25_topk_multi: queries have no tokens")
    stats = bm25_stats(ds, " ".join(str(q) for q in queries.values()),
                       col=col)
    # stats["qh"] is the union's sorted hashes by construction (same
    # tokenizer over the concatenated query text)
    assert np.array_equal(stats["qh"], union), "union/stats drift"
    idf_union = _idf(stats)
    # (Q, T) weight matrix: idf where the query contains the term
    w = np.zeros((len(qids), union.size))
    for r, qid in enumerate(qids):
        pos = np.searchsorted(union, per_q[qid])
        w[r, pos] = idf_union[pos]
    k1f, bf, avgdl = float(k1), float(b), stats["avgdl"]

    qid_type = pa.array(qids).type

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if t.num_rows == 0:
            # typed empty table — pa.array([]) infers null and breaks
            # schema unification against non-empty blocks
            return pa.table({"query_id": pa.array([], qid_type),
                             id_col: t[id_col],
                             "bm25": pa.array([], pa.float64())})
        tf, dl = _per_doc_tf(t[col], union)
        tff = tf.astype(np.float64)
        norm = k1f * (1.0 - bf + bf * (dl.astype(np.float64) / avgdl))
        with np.errstate(invalid="ignore"):
            terms = tff * (k1f + 1.0) / (tff + norm[:, None])
        terms[tf == 0] = 0.0
        scores = terms @ w.T  # (batch, Q)
        kk = min(k, scores.shape[0])
        out_q, out_id, out_s = [], [], []
        for c, qid in enumerate(qids):
            # full (score desc, id asc) order per query: argpartition
            # keeps an ARBITRARY subset at tied boundaries, which
            # breaks the documented id tiebreak and varies with batch
            # boundaries
            order = np.lexsort((ids, -scores[:, c]))[:kk]
            out_q.extend([qid] * kk)
            out_id.extend(ids[order])
            out_s.extend(scores[order, c])
        return pa.table({"query_id": pa.array(out_q, qid_type),
                         id_col: pa.array(out_id),
                         "bm25": pa.array(np.asarray(out_s, np.float64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    parts = parts.sort_values(["query_id", "bm25", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
    parts = parts.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    parts["rank"] = parts.groupby("query_id", sort=False).cumcount() + 1
    return parts


def bm25_sql(query: str, col: str = "text", table: str = "documents",
             id_col: str = "doc_id", out: str = "bm25",
             k1: float = DEFAULT_K1, b: float = DEFAULT_B,
             round_digits: int = 6) -> str:
    """DuckDB twin of ``bm25_stats`` + ``add_bm25`` over the SAME
    table.  The query's term hashes are embedded as HUGEINT literals
    computed by the engine's own tokenizer (the minhash-oracle
    precedent); df/dl are exact integer counts; avgdl divides the same
    two integers; idf/score reproduce the numpy operation order; both
    sides round to ``round_digits`` (summation order drifts ~1e-13).

    Docs matching no query term (incl. empty docs) score exactly 0.0
    on both sides."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    qh = query_term_hashes(query)
    if not qh.size:
        raise ValueError("bm25_sql: query has no tokens")
    vals = ", ".join(f"({int(h)}::HUGEINT)" for h in qh)
    hashes = sql_token_hash_list(sql_tokens(col), lower=True)
    k1r, br = repr(float(k1)), repr(float(b))
    return f"""
WITH bmq AS (
  SELECT * FROM (VALUES {vals}) AS q(qh)
), bmtok AS (
  SELECT {id_col}, {hashes} AS hs FROM {table}
), bmdl AS (
  SELECT {id_col}, len(hs) AS dl FROM bmtok
), bmn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM bmdl
), bmtf AS (
  SELECT e.{id_col}, e.h AS qh, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT t.{id_col}, unnest(t.hs) AS h FROM bmtok t) e
  JOIN bmq q ON e.h = q.qh
  GROUP BY e.{id_col}, e.h
), bmdf AS (
  SELECT q.qh,
         ln(1.0 + (n.n - coalesce(d.df, 0.0) + 0.5)
                  / (coalesce(d.df, 0.0) + 0.5)) AS idf
  FROM bmq q
  LEFT JOIN (SELECT qh, CAST(count(*) AS DOUBLE) AS df
             FROM bmtf GROUP BY qh) d ON q.qh = d.qh
  CROSS JOIN bmn n
), bmsc AS (
  SELECT f.{id_col},
         sum(i.idf * (f.tf * ({k1r} + 1.0))
             / (f.tf + {k1r} * (1.0 - {br}
                                + {br} * (CAST(l.dl AS DOUBLE) / n.avgdl))))
           AS s
  FROM bmtf f
  JOIN bmdf i ON f.qh = i.qh
  JOIN bmdl l ON f.{id_col} = l.{id_col}
  CROSS JOIN bmn n
  GROUP BY f.{id_col}
)
SELECT t.{id_col}, round(coalesce(sc.s, 0.0), {round_digits}) AS {out}
FROM {table} t LEFT JOIN bmsc sc ON t.{id_col} = sc.{id_col}
"""
