"""Frequent terms / n-grams: exact distributed top-k heavy hitters.

The corpus-analysis primitive behind stopword discovery, boilerplate
token detection and n-gram LM vocabulary selection.  The obvious
implementation — count every n-gram, shuffle the full vocabulary,
rank — is what :func:`ocgis_ray.stages.tfidf.doc_frequency` already
does, and its shuffle is vocabulary-sized (fine for unigrams, hopeless
for web-scale 5-grams).  This module gets an EXACT top-k out of a
shuffle bounded by ``capacity x batches`` rows instead, via the
classic two-pass sketch-then-verify shape:

1. **Candidate pass** — each batch builds exact local n-gram counts
   (one lexsort) and reduces them to a Misra-Gries summary of size
   ``capacity`` per group: subtract the (capacity+1)-th largest count
   from every counter, drop the non-positive ones (the Agarwal et al.
   "Mergeable Summaries" construction — at most ``capacity`` survivors,
   per-item undercount <= that threshold).  Summaries merge by plain
   per-term SUMMATION through the shared bucketed
   :func:`~ocgis_ray.stages.tiles.grouped_aggregate`; per-batch
   thresholds ride a sentinel row (``term == ''`` — never a token) so
   the same aggregate also yields each group's total error bound
   ``E = sum_b threshold_b``.  Every merged weight then satisfies
   ``w(t) <= true(t) <= w(t) + E``, and a term ABSENT from the merge
   has ``true(t) <= E``.
2. **Verify pass** — candidates are the merged terms with
   ``w + E >= W_k`` (``W_k`` = k-th largest weight).  Any true-top-k
   term present in the merge is provably a candidate, so one broadcast
   of the candidate hash set + a second streaming count restricted to
   it (tiny shuffle: candidates only) yields exact counts.  The final
   per-group ``exact_guaranteed`` flag is ``kth_exact > E``: when it
   holds, no absent term (``true <= E``) can displace the reported
   top-k, making the result provably the true top-k; raise
   ``capacity`` if it ever reads false.  Pruned-but-merged terms can
   never displace it unconditionally (``true <= w + E < W_k <=
   kth_exact``).

Identity convention: n-grams are keyed by a Horner fold of the shared
64-bit token hashes (``text._tokenize_hash``); output term STRINGS are
the lowercased tokens joined with single spaces, which is what the
DuckDB twin groups by.  Final ranking happens driver-side on the
candidate table (k x groups rows) and breaks ties by term string
ascending — replayed verbatim in SQL (``ORDER BY cnt DESC, term``).

Reference seam: the reference's corpus-frequency surface is the same
calculation-registry reduction as tf-idf (``calc/engine.py:28-90``);
the sketch-then-verify split is the scale path it never needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_FNV = np.uint64(1099511628211)


def _ngram_hashes(arr, n: int):
    """Arrow string column -> per-position n-gram data: ``(ng_hash,
    ng_row, first_tok, low, ts, tl)`` where ``first_tok`` indexes the
    n-gram's first token into the span arrays (token ``first_tok + j``
    is the j-th word).  Positions whose window crosses a row boundary
    are dropped."""
    from ocgis_ray.stages.text import _mix64, _tokenize_hash

    h, tok_row, _per_row, low, ts, tl = _tokenize_hash(
        arr, lower=True, with_spans=True)
    if h.size < n:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64), low, ts, tl)
    if n == 1:
        return h, tok_row, np.arange(len(h), dtype=np.int64), low, ts, tl
    m = len(h) - n + 1
    valid = tok_row[:m] == tok_row[n - 1:]
    with np.errstate(over="ignore"):
        g = h[:m].copy()
        for j in range(1, n):
            g = g * _FNV + h[j: m + j]
    g = _mix64(g)
    idx = np.nonzero(valid)[0]
    return (g[idx], tok_row[idx], idx.astype(np.int64), low, ts, tl)


def _gram_strings(first_tok: np.ndarray, n: int, low: np.ndarray,
                  ts: np.ndarray, tl: np.ndarray) -> pa.Array:
    """Materialize n-gram strings (lowercased tokens joined by ' ')
    for a SMALL set of representative positions."""
    import pyarrow.compute as pc

    from ocgis_ray.stages.quality import _gather_strings

    parts = [_gather_strings(low, ts[first_tok + j], tl[first_tok + j])
             for j in range(n)]
    if n == 1:
        return parts[0]
    args = []
    for i, p in enumerate(parts):
        if i:
            args.append(pa.array([" "] * len(p), pa.string()))
        args.append(p)
    return pc.binary_join_element_wise(*args, "")


def _group_keys(arr) -> np.ndarray:
    """uint64 key per row of a group column (string: content hash;
    integer: value bits mixed) — engine-internal only, never replayed
    in SQL (the twin groups by the group VALUE)."""
    from ocgis_ray.stages.text import _mix64, string_value_hash

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return string_value_hash(arr)
    vals = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return _mix64(vals.astype(np.int64).view(np.uint64))


def _pair_counts(gkeys: np.ndarray | None, ng: np.ndarray):
    """Exact local counts per (group, ngram-hash) pair: returns
    ``(pair_first_pos, counts, pair_g)`` where ``pair_first_pos``
    indexes each pair's first occurrence into the position arrays."""
    if gkeys is None:
        order = np.argsort(ng, kind="stable")
        ks = ng[order]
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = ks[1:] != ks[:-1]
    else:
        order = np.lexsort((ng, gkeys))
        ks, gs = ng[order], gkeys[order]
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = (ks[1:] != ks[:-1]) | (gs[1:] != gs[:-1])
    starts = np.nonzero(new)[0]
    counts = np.diff(np.append(starts, len(ng))).astype(np.int64)
    return order[starts], counts, (None if gkeys is None
                                   else gkeys[order[starts]])


def _mg_reduce(pair_g: np.ndarray | None, counts: np.ndarray,
               capacity: int):
    """Misra-Gries reduction of exact per-group counts: per group,
    subtract the (capacity+1)-th largest count and drop non-positive.
    Returns ``(keep_mask, weights, group_reps, thresholds)`` where the
    last two align per distinct group (threshold 0 == lossless)."""
    m = len(counts)
    if pair_g is None:
        seg_ids = np.zeros(m, dtype=np.int64)
        n_seg = 1
        seg_rep = np.zeros(1, dtype=np.int64)
    else:
        o = np.argsort(pair_g, kind="stable")
        gsorted = pair_g[o]
        new = np.empty(m, dtype=bool)
        new[0] = True
        new[1:] = gsorted[1:] != gsorted[:-1]
        seg_of_sorted = np.cumsum(new) - 1
        seg_ids = np.empty(m, dtype=np.int64)
        seg_ids[o] = seg_of_sorted
        n_seg = int(seg_of_sorted[-1]) + 1
        seg_rep = o[np.nonzero(new)[0]]
    # rank within group by count desc (stable): lexsort on (−count)
    o2 = np.lexsort((-counts, seg_ids))
    seg_sorted = seg_ids[o2]
    bnew = np.empty(m, dtype=bool)
    bnew[0] = True
    bnew[1:] = seg_sorted[1:] != seg_sorted[:-1]
    bstart = np.nonzero(bnew)[0]
    blen = np.diff(np.append(bstart, m))
    rank = np.arange(m, dtype=np.int64) - np.repeat(bstart, blen)
    thresholds = np.zeros(n_seg, dtype=np.int64)
    over = blen > capacity
    if over.any():
        # position of the (capacity+1)-th largest count per oversize group
        pos = bstart[over] + capacity
        thresholds[seg_sorted[bstart[over]]] = counts[o2[pos]]
    w = counts - thresholds[seg_ids]
    keep = w > 0
    return keep, w, seg_rep, thresholds


class _CandidatePartial:
    """Pass-1 map: batch -> MG summary table (group?, term, _w) with a
    per-(batch, group) ``term == ''`` sentinel carrying the threshold
    (the group's error-bound contribution)."""

    def __init__(self, col: str, group_col: str | None, n: int,
                 capacity: int):
        self.col, self.group_col = col, group_col
        self.n, self.capacity = n, capacity

    def __call__(self, t: pa.Table) -> pa.Table:
        gcol = None
        if self.group_col is not None:
            gcol = t[self.group_col].combine_chunks()
            mask = gcol.is_valid()
            if not mask.true_count == len(mask):
                t = t.filter(mask)
                gcol = t[self.group_col].combine_chunks()
        ng, ng_row, first_tok, low, ts, tl = _ngram_hashes(
            t[self.col], self.n)
        gschema = ([] if self.group_col is None else
                   [(self.group_col, t.schema.field(self.group_col).type)])
        empty = pa.table(
            {**{name: pa.array([], typ) for name, typ in gschema},
             "term": pa.array([], pa.string()),
             "_w": pa.array([], pa.int64())})
        if not ng.size:
            return empty
        gkeys = None if gcol is None else _group_keys(gcol)[ng_row]
        pair_pos, counts, pair_g = _pair_counts(gkeys, ng)
        keep, w, seg_rep, thresholds = _mg_reduce(
            pair_g, counts, self.capacity)
        kept_pos = pair_pos[keep]
        terms = _gram_strings(first_tok[kept_pos], self.n, low, ts, tl)
        cols: dict = {}
        sent = thresholds > 0
        n_sent = int(sent.sum())
        if gcol is not None:
            rows = ng_row[kept_pos]
            sent_rows = ng_row[pair_pos[seg_rep[sent]]]
            gv = gcol.take(pa.array(np.concatenate([rows, sent_rows])))
            cols[self.group_col] = gv
        cols["term"] = pa.concat_arrays(
            [terms, pa.array([""] * n_sent, pa.string())])
        cols["_w"] = pa.array(np.concatenate([w[keep], thresholds[sent]]))
        return pa.table(cols)


class _RecountStage:
    """Pass-2 map: exact batch-local counts restricted to the
    broadcast candidate set, keyed by combined (group, ngram) hash."""

    def __init__(self, cand_ref, col: str, group_col: str | None,
                 n: int):
        import ray

        self.ckeys = (ray.get(cand_ref)
                      if isinstance(cand_ref, ray.ObjectRef) else cand_ref)
        self.col, self.group_col, self.n = col, group_col, n

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.text import _mix64

        ng, ng_row, _ft, _low, _ts, _tl = _ngram_hashes(t[self.col], self.n)
        if ng.size and self.group_col is not None:
            gcol = t[self.group_col].combine_chunks()
            gk = _group_keys(gcol)[ng_row]
            with np.errstate(over="ignore"):
                ng = _mix64(gk * _FNV + ng)
        if ng.size:
            pos = np.searchsorted(self.ckeys, ng)
            posc = np.minimum(pos, max(len(self.ckeys) - 1, 0))
            hit = self.ckeys[posc] == ng if len(self.ckeys) else \
                np.zeros(len(ng), dtype=bool)
            ng = ng[hit]
        if not ng.size:
            return pa.table({"_ck": pa.array([], pa.int64()),
                             "_cnt": pa.array([], pa.int64())})
        u, c = np.unique(ng, return_counts=True)
        return pa.table({"_ck": pa.array(u.view(np.int64)),
                         "_cnt": pa.array(c.astype(np.int64))})


def _candidate_keys(terms: np.ndarray, gvals, group_col, n: int):
    """Recompute each candidate's combined (group, ngram) hash from
    its term STRING — the same fold the recount pass applies."""
    from ocgis_ray.stages.text import _mix64, _tokenize_hash

    h, tok_row, per_row = _tokenize_hash(
        pa.array(terms, pa.string()), lower=True)
    if per_row.size and not (per_row == n).all():
        raise AssertionError("candidate term is not an n-gram")
    m = len(terms)
    if n == 1:
        ng = h
    else:
        with np.errstate(over="ignore"):
            ng = h[0::n].copy()
            for j in range(1, n):
                ng = ng * _FNV + h[j::n]
        ng = _mix64(ng)
    if group_col is not None:
        gk = _group_keys(gvals)
        with np.errstate(over="ignore"):
            ng = _mix64(gk * _FNV + ng)
    assert len(ng) == m
    return ng


def frequent_ngrams(ds, col: str = "text", n: int = 1, k: int = 10,
                    group_col: str | None = None,
                    capacity: int | None = None,
                    num_buckets: int | None = None,
                    max_candidates: int = 1 << 20,
                    batch_size: int = 4096) -> pd.DataFrame:
    """EXACT top-``k`` most frequent word n-grams (optionally per
    ``group_col``) via Misra-Gries candidates + broadcast recount.

    Returns a driver-sized DataFrame ``(group?, term, cnt, rank,
    exact_guaranteed)`` — at most ``k`` rows per group, rank 1-based,
    ties broken by term ascending.  ``exact_guaranteed`` is the
    per-group proof flag (see module docstring); it is always True
    when no batch overflowed ``capacity``.  Consumes ``ds``'s lineage
    twice (candidates, recount).

    ``capacity`` defaults to ``max(64, 16 * k)``; raise it when the
    guarantee flag reads False (heavier tails need more counters).
    Counting is by 64-bit hash (the repo-wide convention): tokens
    longer than 64 bytes count by their prefix hash."""
    from ocgis_ray.stages.tiles import grouped_aggregate
    from ocgis_ray.tuning import task_stage

    if n < 1:
        raise ValueError("n must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    capacity = max(64, 16 * k) if capacity is None else int(capacity)
    gkeys = [] if group_col is None else [group_col]

    partial = _CandidatePartial(col, group_col, n, capacity)
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    merged = grouped_aggregate(partials, gkeys + ["term"],
                               {"w": ("_w", "sum")},
                               num_buckets=num_buckets).to_pandas()
    if len(merged) > max_candidates:
        raise ValueError(
            f"frequent_ngrams: merged summary has {len(merged)} rows "
            f"(> max_candidates={max_candidates}) — lower capacity or "
            f"raise max_candidates")
    out_cols = gkeys + ["term", "cnt", "rank", "exact_guaranteed"]
    if merged.empty:
        return pd.DataFrame(columns=out_cols)
    is_sent = merged["term"].to_numpy(object) == ""
    sent = merged[is_sent]
    cand = merged[~is_sent].reset_index(drop=True)
    if cand.empty:
        return pd.DataFrame(columns=out_cols)
    if group_col is not None:
        err = sent.set_index(group_col)["w"]
        e_of = cand[group_col].map(err).fillna(0).to_numpy(np.int64)
        grp_ids = cand[group_col]
    else:
        e_total = int(sent["w"].sum())
        e_of = np.full(len(cand), e_total, dtype=np.int64)
        grp_ids = pd.Series(np.zeros(len(cand), dtype=np.int64))
    w = cand["w"].to_numpy(np.int64)
    # W_k per group = k-th largest merged weight (0 if fewer than k)
    wk = pd.Series(w).groupby(grp_ids.to_numpy(object)).transform(
        lambda s: (np.sort(s.to_numpy())[-k] if len(s) >= k else 0)
    ).to_numpy(np.int64)
    keep = (w + e_of) >= wk
    cand = cand[keep].reset_index(drop=True)
    e_of = e_of[keep]

    terms = cand["term"].to_numpy(object)
    gvals = (pa.array(cand[group_col]) if group_col is not None else None)
    ck = _candidate_keys(terms, gvals, group_col, n)
    order = np.argsort(ck)
    if len(ck) > 1 and (ck[order][1:] == ck[order][:-1]).any():
        raise AssertionError("candidate hash collision — widen the key")
    ref = _bcast(ck[order])
    fn = task_stage(_RecountStage, cand_ref=ref, col=col,
                    group_col=group_col, n=n)
    counted = ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size)
    exact = grouped_aggregate(counted, ["_ck"],
                              {"cnt": ("_cnt", "sum")},
                              num_buckets=num_buckets).to_pandas()
    cnt_of = dict(zip(exact["_ck"].to_numpy(np.int64),
                      exact["cnt"].to_numpy(np.int64)))
    cand = cand.assign(
        cnt=np.array([cnt_of.get(int(c), 0) for c in ck.view(np.int64)],
                     dtype=np.int64),
        _e=e_of)

    # rank vectorized: sort (group asc, cnt desc, term asc), cumcount
    gdummy = cand[group_col] if group_col is not None else \
        pd.Series(np.zeros(len(cand), dtype=np.int64))
    cand = cand.assign(_g=gdummy.to_numpy()) \
        .sort_values(["_g", "term"], kind="mergesort") \
        .sort_values(["_g", "cnt"], ascending=[True, False],
                     kind="mergesort").reset_index(drop=True)
    cand["rank"] = cand.groupby("_g", sort=False).cumcount() + 1
    top = cand[cand["rank"] <= k].copy()
    # k-th (lowest-ranked) exact count per group certifies the proof
    kth = top.groupby("_g", sort=False)["cnt"].transform("min") \
        .to_numpy(np.int64)
    e_top = top["_e"].to_numpy(np.int64)
    top["exact_guaranteed"] = (kth > e_top) | (e_top == 0)
    if group_col is not None:
        top = top.sort_values([group_col, "rank"], kind="mergesort")
    return top[out_cols].reset_index(drop=True)


def _bcast(v):
    import ray

    return ray.put(v)


# ------------------------------------------------------------ SQL twin


def _ngram_terms_sql(col: str, n: int) -> str:
    from ocgis_ray.parity import sql_tokens

    toks = (f"list_transform({sql_tokens(col)}, t -> "
            f"translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
            f"'abcdefghijklmnopqrstuvwxyz'))")
    if n == 1:
        return toks
    return (f"list_transform(generate_series(1, "
            f"greatest(len({toks}) - {n - 1}, 0)), "
            f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))")


def frequent_ngrams_sql(table: str, col: str = "text", n: int = 1,
                        k: int = 10, group_col: str | None = None) -> str:
    """DuckDB twin of :func:`frequent_ngrams` (exact counts, same
    ordering: cnt desc, term asc; null groups dropped like the
    engine's candidate pass)."""
    grams = _ngram_terms_sql(col, n)
    gsel = f"{group_col}, " if group_col else ""
    part = f"PARTITION BY {group_col} " if group_col else ""
    where = f"WHERE {group_col} IS NOT NULL " if group_col else ""
    return (
        f"SELECT {gsel}term, cnt, rank FROM (\n"
        f"  SELECT {gsel}term, cnt, CAST(row_number() OVER ({part}"
        f"ORDER BY cnt DESC, term ASC) AS BIGINT) AS rank FROM (\n"
        f"    SELECT {gsel}term, CAST(count(*) AS BIGINT) AS cnt\n"
        f"    FROM (SELECT {gsel}unnest({grams}) AS term FROM {table} "
        f"{where})\n"
        f"    GROUP BY {gsel}term)\n"
        f") WHERE rank <= {int(k)} ORDER BY {gsel}rank"
    )
