"""Corpus-level tf-idf keyword extraction over the documents table.

The per-document companion to :mod:`ocgis_ray.stages.bm25`: BM25 scores
documents against a QUERY (query-sized df, never corpus-sized); here the
document-frequency table spans the WHOLE corpus vocabulary and the
output is each document's top-k characteristic terms — topic tagging,
cluster labeling, dedup-survivor description, search-index enrichment.

Scale shape (two streaming passes, one bucketed shuffle):

1. **df pass** (:func:`doc_frequency`): one ``map_batches`` pass emits
   per-batch partial document frequencies — tokens dedup to (row, term)
   pairs batch-locally first, so a term appearing 100x in one doc
   contributes ONE partial count — then the shared partial+final
   ``grouped_aggregate`` folds them by term.  The result is
   vocabulary-sized (the BPE-vocab / unigram-LM precedent: model-sized
   next to the corpus, ~1e6-1e8 rows at web scale, never row-scale).
2. **score pass** (:func:`tfidf_topk` / :func:`add_top_keyword`): the
   collected (hash-sorted) df model broadcasts once via ``ray.put`` and
   a stateless task stage (``tuning.task_stage`` — built once per
   worker) re-tokenizes each batch, folds tokens to (row, term, tf) via
   one lexsort, gathers idf by ``searchsorted`` against the broadcast
   hashes, and ranks per row fully vectorized.  No shuffle: per-doc
   top-k is row-local once the model is broadcast.

Identity convention: terms are keyed by the shared 64-bit token hash
(``text._tokenize_hash``), identical modulo hash collisions to the SQL
twin's group-by-string — the repo-wide content-hash assumption.  Ties
in the per-doc ranking break on that hash ascending, which the twin
replays exactly (HUGEINT order == uint64 order).

idf uses the smooth sklearn form ``ln((1 + N) / (1 + df)) + 1`` (never
zero or negative, defined for df == N); N counts ALL corpus rows
(token-less docs included), mirroring ``count(*)``.  One row == one
document (df counts rows; the twin's ``count(DISTINCT id)`` agrees
because ids are unique per row — documented requirement).

Reference seam: the reference's corpus-level statistic surface is its
calculation registry (``calc/engine.py:28-90``, a global reduction
parameterizing a per-element map) — same two-phase shape, re-expressed
as aggregate-then-broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_ROUND = 4


def _batch_term_pairs(arr):
    """Arrow string column -> one (row, term) pair per distinct term
    per row: ``(pair_row, pair_hash, rep_tok, tf, low, ts, tl)`` where
    ``rep_tok`` indexes the pair's first token occurrence into the
    span arrays (its string is the term, lowercased).  One lexsort."""
    from ocgis_ray.stages.text import _tokenize_hash

    h, tok_row, _per_row, low, ts, tl = _tokenize_hash(
        arr, lower=True, with_spans=True)
    if not h.size:
        z = np.empty(0, np.int64)
        return z, np.empty(0, np.uint64), z, z, low, ts, tl
    order = np.lexsort((h, tok_row))
    hs, rs = h[order], tok_row[order]
    first = np.empty(len(hs), dtype=bool)
    first[0] = True
    first[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    starts = np.nonzero(first)[0]
    tf = np.diff(np.append(starts, len(hs)))
    return (rs[starts], hs[starts], order[starts], tf.astype(np.int64),
            low, ts, tl)


def doc_frequency(ds, col: str = "text", min_df: int = 1,
                  num_buckets: int | None = None):
    """Streaming document-frequency table: Dataset of ``(term, df)``
    with one sentinel row ``term == ''`` carrying the corpus row count
    N (the empty string can never be a token, so the slot is free and
    N folds through the same aggregate instead of a second pass).

    ``min_df`` prunes the tail AFTER the aggregate (rare-term rows
    dominate vocabulary size; pruning changes downstream idf only for
    the pruned terms, which scoring then treats as unseen df=0 — leave
    at 1 for exact-parity uses)."""
    from ocgis_ray.stages.quality import _gather_strings
    from ocgis_ray.stages.tiles import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        sent = pa.table({"term": pa.array([""], pa.string()),
                         "_df": pa.array([t.num_rows], pa.int64())})
        pr, ph, rep, _tf, low, ts, tl = _batch_term_pairs(t[col])
        if not ph.size:
            return sent
        o2 = np.argsort(ph, kind="stable")
        phs = ph[o2]
        b2 = np.empty(len(phs), dtype=bool)
        b2[0] = True
        b2[1:] = phs[1:] != phs[:-1]
        starts = np.nonzero(b2)[0]
        counts = np.diff(np.append(starts, len(phs)))
        rep_first = rep[o2][starts]
        terms = _gather_strings(low, ts[rep_first], tl[rep_first])
        return pa.concat_tables([sent, pa.table(
            {"term": terms, "_df": pa.array(counts.astype(np.int64))})])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = grouped_aggregate(partials, ["term"], {"df": ("_df", "sum")},
                            num_buckets=num_buckets)
    if min_df > 1:
        agg = agg.filter(expr=f"df >= {int(min_df)} or term == ''")
    return agg


def collect_df_model(df_ds) -> dict:
    """Collect a :func:`doc_frequency` Dataset into the broadcastable
    scoring model: ``{"h": sorted uint64 hashes, "df": aligned float64,
    "terms": aligned object array, "n": float}``.  Vocabulary-sized —
    the documented broadcast assumption (prune with ``min_df`` first
    when the tail is too fat to ship)."""
    from ocgis_ray.stages.text import _tokenize_hash

    pdf = df_ds.to_pandas()
    if pdf.empty:
        # a 0-row input never runs the partial, so even the N sentinel
        # is absent (the frame may not even carry the columns)
        raise ValueError("collect_df_model: empty corpus")
    is_n = pdf["term"].to_numpy(object) == ""
    n = float(pdf.loc[is_n, "df"].sum())
    if n == 0:
        raise ValueError("collect_df_model: empty corpus")
    pdf = pdf[~is_n]
    terms = pdf["term"].to_numpy(object)
    h, _r, per = _tokenize_hash(pa.array(terms, pa.string()), lower=True)
    if per.size and not (per == 1).all():
        raise AssertionError("df table contains non-single-token terms")
    o = np.argsort(h)
    return {"h": h[o], "df": pdf["df"].to_numpy(np.float64)[o],
            "terms": terms[o], "n": n}


class TfidfTopkStage:
    """Broadcast-model scorer: per batch, fold tokens to (row, term,
    tf), look idf up against the sorted model hashes, rank per row.
    ``k is None`` -> ALL (row, term) scores (no per-row cut)."""

    def __init__(self, model_ref, col: str, id_col: str, k: int | None,
                 round_digits: int | None):
        import ray

        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) \
            else model_ref
        self.h = m["h"]
        nn = m["n"]
        self.idf = np.log((1.0 + nn) / (1.0 + m["df"])) + 1.0
        # unseen term (foreign corpus / min_df-pruned tail): df = 0
        self.default_idf = np.log(1.0 + nn) + 1.0
        self.col, self.id_col, self.k = col, id_col, k
        self.round_digits = round_digits

    def _score_pairs(self, t: pa.Table):
        from ocgis_ray.parity import sql_round

        pr, ph, rep, tf, low, ts, tl = _batch_term_pairs(t[self.col])
        if not ph.size:
            return None
        pos = np.searchsorted(self.h, ph)
        pos_c = np.minimum(pos, max(len(self.h) - 1, 0))
        hit = (self.h[pos_c] == ph) if len(self.h) else \
            np.zeros(len(ph), dtype=bool)
        idf = np.where(hit, self.idf[pos_c], self.default_idf)
        score = tf.astype(np.float64) * idf
        if self.round_digits is not None:
            score = sql_round(score, self.round_digits)
        # rank within row: score desc, term hash asc (total order —
        # (row, hash) pairs are unique)
        o = np.lexsort((ph, -score, pr))
        r = pr[o]
        bstart = np.concatenate(
            [[0], np.nonzero(r[1:] != r[:-1])[0] + 1])
        counts = np.diff(np.append(bstart, len(r)))
        rank = (np.arange(len(r), dtype=np.int64)
                - np.repeat(bstart, counts) + 1)
        return r, ph[o], rep[o], score[o], rank, low, ts, tl

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.quality import _gather_strings

        id_arr = t[self.id_col].combine_chunks()
        scored = self._score_pairs(t)
        if scored is None:
            return pa.table({
                self.id_col: pa.array([], id_arr.type),
                "term": pa.array([], pa.string()),
                "tfidf": pa.array([], pa.float64()),
                "rank": pa.array([], pa.int64())})
        r, ph, rep, score, rank, low, ts, tl = scored
        if self.k is not None:
            keep = rank <= self.k
            r, rep, score, rank = r[keep], rep[keep], score[keep], rank[keep]
        terms = _gather_strings(low, ts[rep], tl[rep])
        return pa.table({
            self.id_col: id_arr.take(pa.array(r)),
            "term": terms,
            "tfidf": pa.array(score),
            "rank": pa.array(rank)})


class TopKeywordStage(TfidfTopkStage):
    """Row-preserving variant: appends ``kw_top`` (the rank-1 term,
    ``''`` for token-less docs) and ``kw_score`` columns to the input
    batch — the fused-scan shape the catalog gate rides."""

    def __init__(self, model_ref, col: str, round_digits: int | None):
        super().__init__(model_ref, col, id_col="", k=1,
                         round_digits=round_digits)

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.quality import _gather_strings

        n = t.num_rows
        kw = np.full(n, "", dtype=object)
        sc = np.zeros(n, dtype=np.float64)
        scored = self._score_pairs(t)
        if scored is not None:
            r, ph, rep, score, rank, low, ts, tl = scored
            top = rank == 1
            rows = r[top]
            terms = _gather_strings(low, ts[rep[top]], tl[rep[top]])
            kw[rows] = terms.to_numpy(zero_copy_only=False)
            sc[rows] = score[top]
        return t.append_column("kw_top", pa.array(kw, pa.string())) \
                .append_column("kw_score", pa.array(sc))


def _broadcast_model(model: dict):
    import ray

    return ray.put(model)


def tfidf_topk(ds, k: int | None = 10, col: str = "text",
               id_col: str = "doc_id", model: dict | None = None,
               round_digits: int | None = DEFAULT_ROUND,
               batch_size: int = 4096):
    """Each document's top-``k`` tf-idf terms -> Dataset ``(id_col,
    term, tfidf, rank)``; rank is 1-based per document, score desc /
    term-hash asc.  ``model`` (a :func:`collect_df_model` result —
    from THIS corpus or a larger background corpus) is computed here
    when omitted, consuming ``ds``'s lineage once more."""
    from ocgis_ray.tuning import task_stage

    if model is None:
        model = collect_df_model(doc_frequency(ds, col=col))
    ref = _broadcast_model(model)
    fn = task_stage(TfidfTopkStage, model_ref=ref, col=col,
                    id_col=id_col, k=k, round_digits=round_digits)
    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def add_top_keyword(ds, model: dict, col: str = "text",
                    round_digits: int | None = DEFAULT_ROUND,
                    batch_size: int = 4096):
    """Append ``kw_top`` / ``kw_score`` (the document's single highest
    tf-idf term and its score) to every row — schema-preserving, so it
    drops into a fused per-document scan."""
    from ocgis_ray.tuning import task_stage

    ref = _broadcast_model(model)
    fn = task_stage(TopKeywordStage, model_ref=ref, col=col,
                    round_digits=round_digits)
    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


# ------------------------------------------------------------ SQL twin

_LOWER_TR = ("translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
             "'abcdefghijklmnopqrstuvwxyz')")


def _term_hash_scalar(expr: str) -> str:
    from ocgis_ray.parity import sql_token_hash_list

    return f"list_extract({sql_token_hash_list(f'[{expr}]')}, 1)"


def tfidf_sql_ctes(table: str, col: str = "text",
                   id_col: str = "doc_id",
                   round_digits: int = DEFAULT_ROUND) -> str:
    """The shared CTE chain (tftok/tfp/tdf/tn/tsc/trk) ending in the
    ranked per-(doc, term) scores — compose with a ``WITH`` prefix and
    a final SELECT.  Groups by the term STRING (engine: its hash) and
    orders ties by the engine's token hash, replayed in HUGEINT."""
    from ocgis_ray.parity import sql_tokens

    toks = f"list_transform({sql_tokens(col)}, t -> {_LOWER_TR})"
    th = _term_hash_scalar("term")
    return (
        f"tftok AS (SELECT {id_col}, unnest({toks}) AS term "
        f"FROM {table}),\n"
        f"tfp AS (SELECT {id_col}, term, CAST(count(*) AS DOUBLE) AS tf "
        f"FROM tftok GROUP BY {id_col}, term),\n"
        f"tdf AS (SELECT term, CAST(count(DISTINCT {id_col}) AS DOUBLE) "
        f"AS df FROM tftok GROUP BY term),\n"
        f"tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),\n"
        f"tsc AS (SELECT p.{id_col}, p.term,\n"
        f"  round(p.tf * (ln((1.0 + n.n) / (1.0 + d.df)) + 1.0), "
        f"{int(round_digits)}) AS tfidf\n"
        f"  FROM tfp p JOIN tdf d USING (term) CROSS JOIN tn n),\n"
        f"trk AS (SELECT *, row_number() OVER (PARTITION BY {id_col} "
        f"ORDER BY tfidf DESC, {th} ASC) AS rank FROM tsc)"
    )


def tfidf_topk_sql(table: str = "documents", k: int = 10,
                   col: str = "text", id_col: str = "doc_id",
                   round_digits: int = DEFAULT_ROUND) -> str:
    """DuckDB twin of :func:`tfidf_topk` over the SAME table (model
    from the scored corpus, ``min_df=1``)."""
    ctes = tfidf_sql_ctes(table, col=col, id_col=id_col,
                          round_digits=round_digits)
    return (f"WITH {ctes}\n"
            f"SELECT {id_col}, term, tfidf, CAST(rank AS BIGINT) AS rank "
            f"FROM trk WHERE rank <= {int(k)}")


def top_keyword_sql(table: str = "documents", col: str = "text",
                    id_col: str = "doc_id",
                    round_digits: int = DEFAULT_ROUND) -> str:
    """DuckDB twin of :func:`add_top_keyword`: one row per input row,
    ``kw_top``/``kw_score`` (coalesced to ``''``/0.0 for token-less
    docs)."""
    ctes = tfidf_sql_ctes(table, col=col, id_col=id_col,
                          round_digits=round_digits)
    return (f"WITH {ctes}\n"
            f"SELECT t.{id_col}, coalesce(k.term, '') AS kw_top,\n"
            f"  coalesce(k.tfidf, 0.0) AS kw_score\n"
            f"FROM {table} t LEFT JOIN "
            f"(SELECT * FROM trk WHERE rank = 1) k USING ({id_col})")
