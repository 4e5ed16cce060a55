"""Model-based quality scoring: corpus-trained unigram LM perplexity.

The CCNet/RefinedWeb pipelines gate documents on the perplexity of a
language model trained on a reference corpus (KenLM over Wikipedia).
No model libraries exist in this container, so the same shape runs
with an in-repo deterministic unigram model:

- **train** (:func:`train_unigram_lm`): one distributed pass counts
  token hashes per batch (the shared ``_tokenize_hash`` kernel), a
  bucketed shuffle sums them per token, and the global top-``vocab``
  rows come back to the driver as the MODEL — a small (hash, logp)
  table, add-half smoothed, with every out-of-vocab token sharing one
  OOV log-probability.  Only the model (vocab_size rows) ever reaches
  the driver.
- **score** (:func:`score_perplexity`): the model is broadcast once
  (``ray.put``) and each batch scores vectorized — token hashes,
  ``searchsorted`` membership against the sorted vocab, mean log prob
  per doc, ``ppl = exp(-mean)``.
- **gate** (:func:`perplexity_filter`): keep docs with ``ppl <=
  max_ppl`` (low perplexity = close to the training distribution).

Reference seam: the ocgis calculation-plugin registry
(``/root/reference/src/ocgis/calc/engine.py``) is the analog surface —
a trained artifact applied per element; here the artifact is built by
the engine itself.  At warehouse scale swap the exact count aggregate
for ``sketch.heavy_hitters`` (bounded memory, approximate counts) —
the scoring side is unchanged.

Determinism: token hashing, count summation (int), and the top-k
tiebreak (count desc, hash asc) are all order-independent, so the
same corpus always yields the same model and scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _token_counts_partial(arr: pa.Array) -> pd.DataFrame:
    from ocgis_ray.stages.text import _tokenize_hash

    h, _, _ = _tokenize_hash(arr, lower=True)
    if h.size == 0:
        return pd.DataFrame({"tok": pd.Series(dtype=np.int64),
                             "cnt": pd.Series(dtype=np.int64)})
    tok, cnt = np.unique(h, return_counts=True)
    return pd.DataFrame({"tok": tok.view(np.int64),
                         "cnt": cnt.astype(np.int64)})


def train_unigram_lm(ds, col: str = "text", vocab_size: int = 65536,
                     min_count: int = 1) -> dict:
    """Train the unigram model: distributed count -> bucketed combine
    -> global top-``vocab_size`` (count desc, hash asc tiebreak).

    Returns ``{"hashes": sorted uint64, "logp": float64, "logp_oov":
    float, "total": int}`` — driver-side small by construction."""
    from ocgis_ray.sources.io import bucketed_group_apply

    def partial(t: pa.Table) -> pd.DataFrame:
        return _token_counts_partial(t[col].combine_chunks()
                                     if isinstance(t[col], pa.ChunkedArray)
                                     else t[col])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("tok", sort=False, as_index=False)["cnt"].sum()
        out = out[out["cnt"] >= min_count].copy()
        # order-preserving uint64 -> int64 map (tok is an int64 VIEW;
        # sorting it signed would rank hashes >= 2^63 first), so the
        # tiebreak is true unsigned-hash ascending
        out["tok_sort"] = (out["tok"].to_numpy(np.int64).view(np.uint64)
                           ^ np.uint64(1 << 63)).view(np.int64)
        return out

    combined = bucketed_group_apply(partials, "tok", combine)
    # global top-k: sort the (distinct-token) table, take vocab_size.
    # The sorted side is #distinct-tokens rows of 16 bytes — tiny next
    # to the corpus; at true warehouse scale use sketch.heavy_hitters.
    combined = combined.materialize()  # two consumers: top-k + total
    top = (combined.sort(["cnt", "tok_sort"], descending=[True, False])
           .limit(vocab_size).to_pandas())
    # total tokens INCLUDING the tail that fell outside the vocab —
    # one tiny aggregate pass over the distinct-token table
    import ray.data.aggregate as agg

    total = int(combined.aggregate(agg.Sum("cnt"))["sum(cnt)"])
    hashes = top["tok"].to_numpy(np.int64).view(np.uint64)
    counts = top["cnt"].to_numpy(np.float64)
    order = np.argsort(hashes)
    hashes, counts = hashes[order], counts[order]
    v = counts.size
    denom = total + 0.5 * (v + 1)
    logp = np.log((counts + 0.5) / denom)
    logp_oov = float(np.log(0.5 / denom))
    return {"hashes": hashes, "logp": logp, "logp_oov": logp_oov,
            "total": total}


class PerplexityStage:
    """Actor: per-doc unigram perplexity from the broadcast model.

    Model decode once per actor in ``__init__``; per batch one
    tokenize pass + one ``searchsorted`` gather."""

    def __init__(self, model_ref, col: str, out: str):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.hashes = m["hashes"]
        self.logp = m["logp"]
        self.logp_oov = m["logp_oov"]
        self.col = col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.text import _tokenize_hash

        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h, _, per_row = _tokenize_hash(arr, lower=True)
        if h.size == 0:
            ppl = np.full(t.num_rows, np.inf)
            return t.append_column(self.out, pa.array(ppl))
        if self.hashes.size:
            pos = np.searchsorted(self.hashes, h)
            pos_c = np.minimum(pos, self.hashes.size - 1)
            lp = np.where(self.hashes[pos_c] == h, self.logp[pos_c],
                          self.logp_oov)
        else:  # empty-vocab model: every token is OOV
            lp = np.full(h.size, self.logp_oov)
        sums = np.zeros(t.num_rows)
        row_ends = np.cumsum(per_row)
        starts = np.concatenate([[0], row_ends[:-1]])
        # reduceat over only the non-empty rows' starts (an empty row's
        # start would alias the next row's segment)
        nz = per_row > 0
        if nz.any():
            sums[nz] = np.add.reduceat(lp, starts[nz])
        mean = np.where(nz, sums / np.maximum(per_row, 1), -np.inf)
        ppl = np.exp(-mean)  # empty doc -> exp(inf) = inf (worst score)
        return t.append_column(self.out, pa.array(ppl))


def score_perplexity(ds, model: dict, col: str = "text",
                     out: str = "ppl", concurrency=None,
                     batch_size: int = 4096):
    """Default is a stateless task stage (``tuning.task_stage``) —
    the model is small and stacked fixed pools deadlock small
    sessions; pass ``concurrency`` for a dedicated actor pool."""
    import ray

    from ocgis_ray.tuning import task_stage

    model_ref = ray.put(model)
    if concurrency is None:
        return ds.map_batches(
            task_stage(PerplexityStage, model_ref=model_ref, col=col,
                       out=out),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
    return ds.map_batches(
        PerplexityStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"model_ref": model_ref, "col": col,
                               "out": out})


def perplexity_filter(ds, model: dict, max_ppl: float,
                      col: str = "text", concurrency=None):
    """Keep docs whose unigram perplexity is at most ``max_ppl`` (the
    CCNet 'head/middle' gate shape).  The score column is dropped."""
    import pyarrow.compute as pc

    scored = score_perplexity(ds, model, col=col, out="_ppl",
                              concurrency=concurrency)

    def keep(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less_equal(t["_ppl"], pa.scalar(max_ppl)))
        return out.drop_columns(["_ppl"])

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def _vocab_ctes(prefix: str, pred: str, vocab_size: int, col: str,
                table: str, id_col: str) -> str:
    """Shared CTE block replaying :func:`train_unigram_lm` in SQL:
    token-hash explode -> exact counts -> top-``vocab_size`` with the
    engine's (count desc, unsigned-hash asc) tiebreak -> add-half
    denominator.  ``pred`` restricts the training corpus (TRUE = all
    rows)."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    return f"""{prefix}toks AS (
  SELECT {id_col}, {sql_token_hash_list(sql_tokens(col), lower=True)} AS hs
  FROM {table} WHERE {pred}
), {prefix}exp AS (
  SELECT {id_col}, unnest(hs) AS h FROM {prefix}toks
), {prefix}cnt AS (
  SELECT h, count(*) AS cnt FROM {prefix}exp GROUP BY h
), {prefix}voc AS (
  SELECT h, cnt FROM {prefix}cnt ORDER BY cnt DESC, h ASC LIMIT {vocab_size}
), {prefix}den AS (
  SELECT (SELECT CAST(coalesce(sum(cnt), 0) AS DOUBLE) FROM {prefix}cnt)
         + 0.5 * ((SELECT count(*) FROM {prefix}voc) + 1) AS denom
)"""


def _logp_expr(prefix: str) -> str:
    """Per-token log-prob under the ``prefix`` model (NULL vocab join
    = OOV), same operation order as the numpy kernel."""
    return (f"CASE WHEN {prefix}voc.h IS NULL THEN ln(0.5 / {prefix}den.denom) "
            f"ELSE ln((CAST({prefix}voc.cnt AS DOUBLE) + 0.5) / {prefix}den.denom) END")


def unigram_ppl_sql(vocab_size: int, col: str = "text",
                    table: str = "documents", id_col: str = "doc_id",
                    out: str = "ppl", round_digits: int = 6) -> str:
    """DuckDB twin of ``train_unigram_lm`` + ``score_perplexity`` over
    the SAME table: exact integer counts and the engine's tiebreak
    make the vocab identical; log/exp and the per-doc sum agree within
    ``round_digits`` (both sides round — summation-order float drift
    is ~1e-13, far inside round-6).  Empty docs score +infinity on
    both sides."""
    return f"""
WITH {_vocab_ctes("lp", "TRUE", vocab_size, col, table, id_col)},
lpsc AS (
  SELECT e.{id_col}, {_logp_expr("lp")} AS lp
  FROM lpexp e
  LEFT JOIN lpvoc ON e.h = lpvoc.h
  CROSS JOIN lpden
), lpagg AS (
  SELECT {id_col}, sum(lp) AS s, count(*) AS ntok
  FROM lpsc GROUP BY {id_col}
)
SELECT t.{id_col},
       round(CASE WHEN a.{id_col} IS NULL THEN 'infinity'::DOUBLE
                  ELSE exp(-(a.s / a.ntok)) END, {round_digits}) AS {out}
FROM {table} t LEFT JOIN lpagg a ON t.{id_col} = a.{id_col}
"""


def dsir_logw_sql(target_pred: str, vocab_size: int, col: str = "text",
                  table: str = "documents", id_col: str = "doc_id",
                  out: str = "dsir_logw", round_digits: int = 6) -> str:
    """DuckDB twin of ``score_log_ratio`` with target model trained on
    ``WHERE target_pred`` and raw model on the whole table.  Docs with
    no tokens sum to 0.0 (the kernel's zero-initialized row sums)."""
    return f"""
WITH {_vocab_ctes("lt", target_pred, vocab_size, col, table, id_col)},
{_vocab_ctes("lr", "TRUE", vocab_size, col, table, id_col)},
ldsc AS (
  SELECT e.{id_col}, ({_logp_expr("lt")}) - ({_logp_expr("lr")}) AS d
  FROM lrexp e
  LEFT JOIN ltvoc ON e.h = ltvoc.h
  LEFT JOIN lrvoc ON e.h = lrvoc.h
  CROSS JOIN ltden CROSS JOIN lrden
), ldagg AS (
  SELECT {id_col}, sum(d) AS s FROM ldsc GROUP BY {id_col}
)
SELECT t.{id_col},
       round(coalesce(a.s, 0.0), {round_digits}) AS {out}
FROM {table} t LEFT JOIN ldagg a ON t.{id_col} = a.{id_col}
"""


# -------------------------------------------- DSIR importance resampling

class LogRatioStage:
    """Actor: per-doc log importance ratio ``sum_t (log p_target(t) -
    log p_raw(t))`` under two broadcast unigram models — ONE tokenize
    pass, two searchsorted gathers (the DSIR hashed-feature likelihood
    ratio, Xie et al. 2023, with unigram features)."""

    def __init__(self, models_ref, col: str, out: str):
        import ray

        m = ray.get(models_ref) if not isinstance(models_ref, tuple) else models_ref
        self.target, self.raw = m
        self.col = col
        self.out = out

    @staticmethod
    def _logp(model, h):
        hs, lp = model["hashes"], model["logp"]
        if not hs.size:
            return np.full(h.size, model["logp_oov"])
        pos = np.minimum(np.searchsorted(hs, h), hs.size - 1)
        return np.where(hs[pos] == h, lp[pos], model["logp_oov"])

    def __call__(self, t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.text import _tokenize_hash

        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        h, _, per_row = _tokenize_hash(arr, lower=True)
        sums = np.zeros(t.num_rows)
        if h.size:
            diff = self._logp(self.target, h) - self._logp(self.raw, h)
            starts = np.concatenate([[0], np.cumsum(per_row)[:-1]])
            nz = per_row > 0
            if nz.any():
                sums[nz] = np.add.reduceat(diff, starts[nz])
        return t.append_column(self.out, pa.array(sums))


def score_log_ratio(ds, target_model: dict, raw_model: dict,
                    col: str = "text", out: str = "dsir_logw",
                    concurrency=None, batch_size: int = 4096):
    """Default is a stateless task stage (``tuning.task_stage``) —
    see :func:`score_perplexity`; pass ``concurrency`` for a pool."""
    import ray

    from ocgis_ray.tuning import task_stage

    models_ref = ray.put((target_model, raw_model))
    if concurrency is None:
        return ds.map_batches(
            task_stage(LogRatioStage, models_ref=models_ref, col=col,
                       out=out),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
    return ds.map_batches(
        LogRatioStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"models_ref": models_ref, "col": col,
                               "out": out})


def dsir_resample(ds, target_model: dict, raw_model: dict,
                  keep_frac: float, col: str = "text",
                  id_col: str = "doc_id", salt: int = 0,
                  concurrency=None):
    """DSIR resampling: keep ~``keep_frac`` of the corpus, biased
    toward the target distribution — Gumbel-top-k over the importance
    ratio, made DETERMINISTIC and resume-stable by deriving each doc's
    Gumbel noise from its id hash (``g = -log(-log(u))``, ``u`` from
    the shared multiplicative key hash) instead of an RNG.

    The global top-k threshold comes from the bounded-memory reservoir
    quantile sketch (one pass over the materialized scored table), so
    the kept fraction is approximate to the sketch's rank error; the
    selection itself is exact given the threshold.  Returns the
    filtered Dataset with the score columns dropped."""
    import pyarrow.compute as pc

    from ocgis_ray.stages.reshape import _key_hash
    from ocgis_ray.stages.sketch import quantile_reservoir

    scored = score_log_ratio(ds, target_model, raw_model, col=col,
                             out="_logw", concurrency=concurrency)

    def add_gumbel(t: pa.Table) -> pa.Table:
        h = _key_hash(t[id_col].to_numpy(zero_copy_only=False), salt,
                      "dsir_resample")
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        g = -np.log(-np.log(u))
        z = t["_logw"].to_numpy(zero_copy_only=False) + g
        return t.append_column("_z", pa.array(z))

    with_z = scored.map_batches(add_gumbel, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
    tau = quantile_reservoir(with_z, "_z", [1.0 - keep_frac])[1.0 - keep_frac]

    def keep(t: pa.Table) -> pa.Table:
        out = t.filter(pc.greater_equal(t["_z"], pa.scalar(float(tau))))
        return out.drop_columns(["_logw", "_z"])

    return with_z.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def perplexity_buckets(ds, col: str = "ppl", out: str = "ppl_bucket",
                       labels: tuple = ("head", "middle", "tail"),
                       round_digits: int = 6):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): split
    the corpus into head/middle/tail thirds by LM perplexity.

    Thresholds = ``round(quantile_cont(col, 1/3 | 2/3), round_digits)``
    computed by the exact distributed quantile kernel
    (:func:`ocgis_ray.stages.calc.quantile_rollup` — already proven
    bit-compatible with DuckDB ``quantile_cont`` by the daily_perc
    oracle), then a broadcast compare: ``<= t1`` -> head, ``<= t2`` ->
    middle, else tail (empty docs score +inf and land in tail).  Pass
    the ROUNDED perplexity column so engine and SQL twin bucket the
    same doubles.

    Cost: the upstream executes TWICE (one slim single-column pass for
    both tertile thresholds — a single multi-quantile rollup, not one
    pass per threshold — plus the labeling pass).  When the upstream
    is expensive and small enough to cache, materialize it before
    calling (the catalog's langid query does)."""
    import pyarrow as pa

    from ocgis_ray.stages.calc import quantile_rollup

    slim = ds.select_columns([col]).map_batches(
        lambda t: t.append_column("_g", pa.array(
            np.zeros(t.num_rows, dtype=np.int64))),
        batch_format="pyarrow", zero_copy_batch=True)
    df = quantile_rollup(slim, "_g", col, (1.0 / 3.0, 2.0 / 3.0),
                         out_col=("t1", "t2"),
                         round_digits=round_digits).to_pandas()
    t1, t2 = float(df["t1"].iloc[0]), float(df["t2"].iloc[0])
    lab = np.asarray(labels, dtype=object)

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = np.where(v <= t1, 0, np.where(v <= t2, 1, 2))
        return t.append_column(out, pa.array(lab[b], pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def ppl_bucket_sql(base_select: str, col: str = "ppl",
                   out: str = "ppl_bucket",
                   labels: tuple = ("head", "middle", "tail"),
                   round_digits: int = 6) -> str:
    """Wrap a SELECT producing ``col`` with the tertile bucket column
    (the :func:`perplexity_buckets` twin)."""
    return f"""WITH pbase AS ({base_select}),
pth AS (
  SELECT round(quantile_cont({col}, 1.0/3), {round_digits}) AS t1,
         round(quantile_cont({col}, 2.0/3), {round_digits}) AS t2
  FROM pbase
)
SELECT pbase.*,
       CASE WHEN {col} <= t1 THEN '{labels[0]}'
            WHEN {col} <= t2 THEN '{labels[1]}'
            ELSE '{labels[2]}' END AS {out}
FROM pbase, pth"""
