"""Model-based quality classification: a fastText-shaped linear text
classifier with hashed bag-of-words(+bigram) features and closed-form
multinomial Naive Bayes training.

The published LLM-data pipelines (CCNet, the GPT-3/PaLM quality
filters, phi-1's classifier stage) gate documents with a cheap linear
classifier trained on a labeled reference set — fastText supervised
mode in practice.  No model libraries exist in this container, so the
same shape runs with deterministic closed-form training:

- **features**: token Horner hashes (the shared ``_tokenize_hash``
  kernel, lowercased) folded into ``n_buckets`` hash buckets; with
  ``bigrams=True`` adjacent-token pair hashes are added (fastText
  ``wordNgrams=2``).  Hashing trick = bounded model size at any vocab.
- **train** (:func:`train_nb_classifier`): one distributed pass emits
  per-batch ``(label, bucket, cnt)`` partials plus per-label doc
  counts; a bucketed shuffle sums them; the driver assembles the dense
  ``(labels x n_buckets)`` log-likelihood matrix (add-``alpha``
  smoothed multinomial NB) and the label log-priors — the MODEL is
  ``labels x n_buckets`` doubles, small by construction and broadcast
  once via ``ray.put``.
- **score** (:func:`score_classifier`): vectorized per batch — one
  tokenize pass, bucket gather, per-(doc, label) ``np.add.at``
  accumulation, argmax with deterministic tiebreak (lowest label
  index).  Emits the predicted label and the top-2 logit margin.
- **gate** (:func:`classifier_filter`): keep docs predicted
  ``keep_label`` with margin >= ``min_margin``.

Reference seam: like :mod:`ocgis_ray.stages.lm`, the analog surface is
the reference's calculation-plugin registry
(``/root/reference/src/ocgis/calc/engine.py``) — a trained artifact
applied per element, here trained by the engine itself.

Determinism: token hashing, integer count summation, and every
tiebreak (label name ascending for the class order, lowest index at
equal logits) are order-independent — the same corpus always yields
the same model and predictions under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _feature_buckets(arr, n_buckets: int, bigrams: bool
                     ) -> tuple[np.ndarray, np.ndarray, int]:
    """Arrow string column -> (bucket_ids, feat_row, n_rows).

    Unigram buckets are ``token_hash % n_buckets``; bigram features
    hash adjacent same-row token hashes with a golden-ratio mix before
    folding (fastText's wordNgrams=2 shape)."""
    from ocgis_ray.stages.text import _mix64, _tokenize_hash

    h, tok_row, per_row = _tokenize_hash(arr, lower=True)
    n = len(per_row)
    nb = np.uint64(n_buckets)
    feats = [h % nb]
    rows = [tok_row]
    if bigrams and h.size > 1:
        same = tok_row[1:] == tok_row[:-1]
        with np.errstate(over="ignore"):
            bg = _mix64(h[:-1] * _BIGRAM_MIX + h[1:])[same]
        feats.append(bg % nb)
        rows.append(tok_row[:-1][same])
    return (np.concatenate(feats).astype(np.int64),
            np.concatenate(rows), n)


def train_nb_classifier(ds, label_col: str, col: str = "text",
                        n_buckets: int = 1 << 18, bigrams: bool = False,
                        alpha: float = 0.5,
                        num_buckets: int | None = None) -> dict:
    """Closed-form multinomial NB over hashed features — distributed
    count, bucketed combine, small driver-side model assembly.

    Returns ``{"labels": [str...], "logp": (L, n_buckets) float64,
    "prior": (L,) float64, "n_buckets": int, "bigrams": bool}``."""
    from ocgis_ray.sources.io import bucketed_group_apply

    def partial(t: pa.Table) -> pd.DataFrame:
        labels = t[label_col].to_pandas().astype(str).to_numpy()
        buckets, feat_row, n = _feature_buckets(t[col], n_buckets, bigrams)
        frames = []
        if buckets.size:
            df = pd.DataFrame({"label": labels[feat_row], "bucket": buckets})
            g = df.groupby(["label", "bucket"], sort=False).size()
            g = g.reset_index(name="cnt")
            g["docs"] = 0
            frames.append(g)
        ld = pd.Series(labels).value_counts()
        frames.append(pd.DataFrame({"label": ld.index.to_numpy(object),
                                    "bucket": np.full(len(ld), -1, np.int64),
                                    "cnt": np.zeros(len(ld), np.int64),
                                    "docs": ld.to_numpy(np.int64)}))
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["label", "bucket"], sort=False,
                         as_index=False)[["cnt", "docs"]].sum()

    # the combined table is <= L * (n_buckets + 1) rows — the model
    # size itself; collecting it to the driver IS the training output
    counts = bucketed_group_apply(partials, ["label", "bucket"], combine,
                                  num_buckets=num_buckets).to_pandas()
    if counts.empty:
        raise ValueError("train_nb_classifier: empty corpus")
    labels = sorted(counts["label"].unique())
    lidx = {l: i for i, l in enumerate(labels)}
    L = len(labels)
    mat = np.zeros((L, n_buckets), dtype=np.float64)
    tok = counts[counts["bucket"] >= 0]
    mat[tok["label"].map(lidx).to_numpy(np.int64),
        tok["bucket"].to_numpy(np.int64)] = tok["cnt"].to_numpy(np.float64)
    totals = mat.sum(axis=1, keepdims=True)
    logp = np.log(mat + alpha) - np.log(totals + alpha * n_buckets)
    docs = counts[counts["bucket"] < 0].groupby("label")["docs"].sum()
    dvec = np.array([docs.get(l, 0) for l in labels], dtype=np.float64)
    prior = np.log(np.maximum(dvec, 1e-300)) - np.log(max(dvec.sum(), 1.0))
    return {"labels": labels, "logp": logp, "prior": prior,
            "n_buckets": n_buckets, "bigrams": bigrams}


class _NbScoreStage:
    def __init__(self, model_ref, col: str, out_prefix: str,
                 round_digits: int | None = None):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.labels = np.asarray(m["labels"], dtype=object)
        self.logp = m["logp"]
        self.prior = m["prior"]
        self.n_buckets = m["n_buckets"]
        self.bigrams = m["bigrams"]
        self.col = col
        self.pre = out_prefix
        self.round_digits = round_digits

    def __call__(self, batch: pa.Table) -> pa.Table:
        L = len(self.labels)
        buckets, feat_row, n = _feature_buckets(
            batch[self.col], self.n_buckets, self.bigrams)
        scores = np.tile(self.prior, (n, 1))
        if buckets.size:
            np.add.at(scores, feat_row, self.logp[:, buckets].T)
        if self.round_digits is not None:
            # SQL-parity mode: argmax/margin over ROUNDED scores so a
            # summation-order ulp can never flip the predicted label
            # between the engine and the DuckDB twin
            from ocgis_ray.parity import sql_round

            scores = sql_round(scores, self.round_digits)
        pred = np.argmax(scores, axis=1)  # first max = lowest label index
        top = np.take_along_axis(scores, pred[:, None], axis=1)[:, 0]
        if L > 1:
            tmp = scores.copy()
            np.put_along_axis(tmp, pred[:, None], -np.inf, axis=1)
            margin = top - tmp.max(axis=1)
        else:
            margin = np.zeros(n)
        if self.round_digits is not None:
            from ocgis_ray.parity import sql_round

            margin = sql_round(margin, self.round_digits)
        out = batch.append_column(
            f"{self.pre}_label", pa.array(self.labels[pred].tolist(),
                                          pa.string()))
        return out.append_column(f"{self.pre}_margin", pa.array(margin))


def score_classifier(ds, model: dict, col: str = "text",
                     out_prefix: str = "nb", concurrency=None,
                     batch_size: int = 4096,
                     round_digits: int | None = None):
    """Broadcast-model vectorized scoring: appends ``<prefix>_label``
    (predicted class) and ``<prefix>_margin`` (top-2 logit gap).
    ``round_digits`` switches on the SQL-parity mode (scores rounded
    before argmax — see :func:`nb_score_sql`).

    Default is a STATELESS task stage (per-worker-process instance
    cache, ``tuning.task_stage``): the model is small, and stacking
    fixed actor pools deadlocks small sessions.  Pass an explicit
    ``concurrency`` for a dedicated actor pool."""
    import ray

    from ocgis_ray.tuning import task_stage

    ref = ray.put(model)
    kw = {"model_ref": ref, "col": col, "out_prefix": out_prefix,
          "round_digits": round_digits}
    if concurrency is None:
        return ds.map_batches(
            task_stage(_NbScoreStage, **kw), batch_format="pyarrow",
            zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(
        _NbScoreStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs=kw)


def classifier_filter(ds, model: dict, keep_label: str,
                      min_margin: float = 0.0, col: str = "text",
                      concurrency=None, batch_size: int = 4096):
    """Quality gate: keep documents the classifier assigns
    ``keep_label`` with at least ``min_margin`` logit separation —
    the phi-style 'educational value' filter shape."""
    scored = score_classifier(ds, model, col=col, out_prefix="_nbgate",
                              concurrency=concurrency,
                              batch_size=batch_size)

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(
            pc.equal(t["_nbgate_label"], keep_label),
            pc.greater_equal(t["_nbgate_margin"], min_margin))
        return t.filter(keep).drop_columns(["_nbgate_label",
                                            "_nbgate_margin"])

    return scored.map_batches(gate, batch_format="pyarrow",
                              zero_copy_batch=True)


def nb_score_sql(label_col: str, n_buckets: int, alpha: float = 0.5,
                 col: str = "text", table: str = "documents",
                 id_col: str = "doc_id", out_label: str = "nb_label",
                 out_margin: str = "nb_margin",
                 round_digits: int = 6) -> str:
    """DuckDB twin of ``train_nb_classifier`` (unigrams) +
    ``score_classifier(round_digits=...)`` trained ON THE SAME table —
    the model is built IN SQL, so the oracle carries no side-channel
    literals:

    - per-token hash buckets via the shared ``parity`` fragments
      (identical Horner+splitmix64 values, unsigned ``% n_buckets``);
    - per-(label, bucket) exact counts and per-label totals;
    - per-token term ``ln(cnt + alpha) - ln(tot + alpha*n_buckets)``
      (same two-log form as the numpy kernel — NOT ``ln`` of the
      ratio, which rounds differently);
    - per-(doc, label) score = prior + token-term sum, rounded to
      ``round_digits`` on BOTH sides before ranking (summation order
      differs, so raw floats drift ~1e-13); rank by score DESC, label
      ASC — the engine's first-max/lowest-index tiebreak;
    - margin = rank-1 score minus rank-2 score, rounded.

    Documents with no tokens score the bare (rounded) prior."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    hashes = sql_token_hash_list(sql_tokens(col), lower=True)
    a = repr(float(alpha))
    return f"""
WITH nbtoks AS (
  SELECT {id_col}, {hashes} AS hs FROM {table}
), nbexp AS (
  SELECT t.{id_col}, d.{label_col} AS dlabel, unnest(t.hs) % {n_buckets} AS b
  FROM nbtoks t JOIN {table} d ON t.{id_col} = d.{id_col}
), nbcnt AS (
  SELECT dlabel AS label, b, CAST(count(*) AS DOUBLE) AS cnt
  FROM nbexp GROUP BY dlabel, b
), nbtot AS (
  SELECT label, sum(cnt) AS tot FROM nbcnt GROUP BY label
), nblab AS (
  SELECT {label_col} AS label,
         ln(CAST(count(*) AS DOUBLE))
           - ln((SELECT CAST(count(*) AS DOUBLE) FROM {table})) AS prior
  FROM {table} GROUP BY {label_col}
), nbterm AS (
  SELECT e.{id_col}, l.label,
         sum(ln(coalesce(c.cnt, 0.0) + {a})
             - ln(t.tot + {a} * {n_buckets})) AS s
  FROM nbexp e
  CROSS JOIN nblab l
  JOIN nbtot t ON t.label = l.label
  LEFT JOIN nbcnt c ON c.label = l.label AND c.b = e.b
  GROUP BY e.{id_col}, l.label
), nbfull AS (
  SELECT d.{id_col}, l.label,
         round(l.prior + coalesce(sc.s, 0.0), {round_digits}) AS score
  FROM {table} d
  CROSS JOIN nblab l
  LEFT JOIN nbterm sc ON sc.{id_col} = d.{id_col} AND sc.label = l.label
), nbrank AS (
  SELECT {id_col}, label, score,
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY score DESC, label ASC) AS rk
  FROM nbfull
)
SELECT a.{id_col}, a.label AS {out_label},
       round(a.score - coalesce(b.score, a.score), {round_digits})
         AS {out_margin}
FROM nbrank a LEFT JOIN nbrank b
  ON a.{id_col} = b.{id_col} AND b.rk = 2
WHERE a.rk = 1
"""
