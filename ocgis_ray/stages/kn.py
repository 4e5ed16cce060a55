"""Interpolated Kneser-Ney bigram language model — the KenLM/CCNet
quality-gate shape one order up from :mod:`ocgis_ray.stages.lm`'s
unigram model.

CCNet/RefinedWeb gate documents on the perplexity of an n-gram LM with
modified Kneser-Ney smoothing (KenLM over Wikipedia).  No model
libraries exist in this container, so the bigram case runs in-repo
with the classic interpolated-KN estimator (Kneser & Ney 1995; Chen &
Goodman 1999, eq. 15) and a fixed absolute discount ``D``:

    P(w2|w1) = max(c(w1 w2) - D, 0) / c(w1·)
             + [D · N1+(w1 ·) / c(w1·)] · Pcont(w2)
    Pcont(w2) = (N1+(· w2) + 0.5) / (N1+(· ·) + 0.5 · (V+1))

where ``N1+`` are distinct-continuation type counts and ``Pcont`` is
add-half smoothed so every symbol (including ``<unk>``) has positive
continuation mass — a word seen only document-initially would
otherwise zero it.  Contexts never observed on the left (``c(w1·) =
0``, possible only at scoring time) fall back to ``Pcont`` alone.

Shape:

- **train** (:func:`train_kn_bigram`): the unigram top-``vocab_size``
  vocabulary (count desc / hash asc — `lm.train_unigram_lm`) maps
  every token to an id in ``[0, V]`` (``V`` = ``<unk>``); one
  distributed pass counts within-document adjacent id pairs
  (vectorized: searchsorted id map + pair codes + ``np.unique``); a
  bucketed shuffle sums the at-most-(V+1)^2-row pair table — the
  MODEL itself — and the driver assembles the dense log-probability
  matrix.  Keep ``vocab_size`` driver-sized (the matrix is
  ``(V+1)^2`` doubles); a sparse/quantized store is the KenLM-scale
  path and out of scope here.
- **score** (:func:`score_kn_perplexity`): broadcast matrix, stateless
  task stage (`tuning.task_stage`), one tokenize pass per batch, one
  fancy-index gather per transition; ``ppl = exp(-mean log P)`` over a
  doc's transitions; docs with < 2 tokens score ``inf`` (no evidence
  = worst score, matching the unigram empty-doc convention).

``kn_ppl_sql`` replays training AND scoring in DuckDB over the same
table: identical vocab tiebreak, exact integer pair/type counts, the
numpy kernel's operation order, both sides rounded.

Reference seam: the calculation-plugin registry
(``/root/reference/src/ocgis/calc/engine.py``) — a corpus-trained
artifact applied per element, trained by the engine itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_DISCOUNT = 0.75


def _map_ids(h: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Token hashes -> vocab ids in [0, V]; OOV -> V (``<unk>``)."""
    v = hashes.size
    if not h.size:
        return np.empty(0, dtype=np.int64)
    if not v:
        return np.full(h.size, 0, dtype=np.int64)  # all-<unk> vocab
    pos = np.searchsorted(hashes, h)
    pos_c = np.minimum(pos, v - 1)
    return np.where(hashes[pos_c] == h, pos_c, v).astype(np.int64)


def _pair_codes(arr, hashes: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray, int]:
    """Arrow string column -> (pair codes ``id1*(V+1)+id2`` for
    within-row adjacent tokens, transition rows, n_rows) — the ONE
    bigram-pairing kernel shared by training and scoring (two copies
    drifted once; see review history)."""
    from ocgis_ray.stages.text import _tokenize_hash

    h, tok_row, per_row = _tokenize_hash(arr, lower=True)
    n = len(per_row)
    ids = _map_ids(h, hashes)
    if ids.size < 2:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                n)
    same = tok_row[1:] == tok_row[:-1]
    w = hashes.size + 1
    codes = ids[:-1][same] * w + ids[1:][same]
    return codes, tok_row[:-1][same], n


def train_kn_bigram(ds, col: str = "text", vocab_size: int = 256,
                    discount: float = DEFAULT_DISCOUNT,
                    num_buckets: int | None = None) -> dict:
    """Distributed pair count -> bucketed combine -> driver-side dense
    interpolated-KN log-prob matrix.

    Returns ``{"hashes": sorted uint64 (V,), "logp": (V+1, V+1)
    float64, "discount": float}``."""
    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.stages.lm import train_unigram_lm

    uni = train_unigram_lm(ds, col=col, vocab_size=vocab_size)
    hashes = uni["hashes"]
    w = hashes.size + 1

    def partial(t: pa.Table) -> pd.DataFrame:
        codes, _, _ = _pair_codes(
            t[col].combine_chunks()
            if isinstance(t[col], pa.ChunkedArray) else t[col], hashes)
        if not codes.size:
            return pd.DataFrame({"pair": pd.Series(dtype=np.int64),
                                 "cnt": pd.Series(dtype=np.int64)})
        pair, cnt = np.unique(codes, return_counts=True)
        return pd.DataFrame({"pair": pair, "cnt": cnt.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("pair", sort=False, as_index=False)["cnt"].sum()

    # the combined table is <= (V+1)^2 rows — the model itself
    pairs = bucketed_group_apply(partials, "pair", combine,
                                 num_buckets=num_buckets).to_pandas()
    big = np.zeros((w, w), dtype=np.float64)
    if len(pairs):
        p = pairs["pair"].to_numpy(np.int64)
        big[p // w, p % w] = pairs["cnt"].to_numpy(np.float64)
    c1 = big.sum(axis=1)                      # c(w1 ·)
    types = big > 0
    n1_right = types.sum(axis=1).astype(np.float64)   # N1+(w1 ·)
    n1_left = types.sum(axis=0).astype(np.float64)    # N1+(· w2)
    total_types = float(types.sum())                  # N1+(· ·)
    d = float(discount)
    pcont = (n1_left + 0.5) / (total_types + 0.5 * w)
    safe_c1 = np.maximum(c1, 1.0)
    pk = (np.maximum(big - d, 0.0) / safe_c1[:, None]
          + ((d * n1_right / safe_c1)[:, None] * pcont[None, :]))
    pk[c1 == 0, :] = pcont[None, :]           # unseen left context
    return {"hashes": hashes, "logp": np.log(pk), "discount": d}


class KnPerplexityStage:
    """Per-doc bigram KN perplexity from the broadcast matrix: one
    tokenize pass, one (id1, id2) gather, reduceat per doc."""

    def __init__(self, model_ref, col: str, out: str):
        import ray

        m = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref
        self.hashes = m["hashes"]
        self.logp = m["logp"]
        self.col = col
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t[self.col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        codes, trans_row, n = _pair_codes(arr, self.hashes)
        ppl = np.full(n, np.inf)
        if codes.size:
            lp = self.logp.ravel()[codes]  # logp[id1, id2] by pair code
            n_trans = np.bincount(trans_row, minlength=n)
            sums = np.zeros(n)
            ends = np.cumsum(n_trans)
            starts = np.concatenate([[0], ends[:-1]])
            nz = n_trans > 0
            sums[nz] = np.add.reduceat(lp, starts[nz])
            ppl[nz] = np.exp(-(sums[nz] / n_trans[nz]))
        return t.append_column(self.out, pa.array(ppl))


def score_kn_perplexity(ds, model: dict, col: str = "text",
                        out: str = "kn_ppl", concurrency=None,
                        batch_size: int = 4096):
    """Stateless task stage by default (stacks with other scorers);
    pass ``concurrency`` for a dedicated actor pool."""
    import ray

    from ocgis_ray.tuning import task_stage

    model_ref = ray.put(model)
    if concurrency is None:
        return ds.map_batches(
            task_stage(KnPerplexityStage, model_ref=model_ref, col=col,
                       out=out),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
    return ds.map_batches(
        KnPerplexityStage, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"model_ref": model_ref, "col": col,
                               "out": out})


def kn_perplexity_filter(ds, model: dict, max_ppl: float,
                         col: str = "text", concurrency=None):
    """Keep docs whose KN-bigram perplexity is at most ``max_ppl`` —
    the CCNet head/middle gate with a real n-gram model.  Docs with
    < 2 tokens score ``inf`` and are dropped."""
    import pyarrow.compute as pc

    scored = score_kn_perplexity(ds, model, col=col, out="_knppl",
                                 concurrency=concurrency)

    def keep(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less_equal(t["_knppl"], pa.scalar(max_ppl)))
        return out.drop_columns(["_knppl"])

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def kn_ppl_sql(vocab_size: int, discount: float = DEFAULT_DISCOUNT,
               col: str = "text", table: str = "documents",
               id_col: str = "doc_id", out: str = "kn_ppl",
               round_digits: int = 6) -> str:
    """DuckDB twin of ``train_kn_bigram`` + ``score_kn_perplexity``
    over the SAME table.

    Vocab replays ``lm._vocab_ctes`` (identical tiebreak); OOV tokens
    map to the HUGEINT sentinel ``-1`` (= the engine's ``<unk>`` id —
    no real splitmix64 hash is negative); bigram pairs come from a
    position self-join over the zipped unnest; all counts are exact
    integers and the score expression mirrors the numpy operation
    order.  Because the twin scores its own training corpus, every
    scored transition was counted (``c1 >= 1``), so the engine's
    unseen-context fallback never fires here.  Docs with < 2 tokens
    score infinity on both sides; both sides round."""
    from ocgis_ray.stages.lm import _vocab_ctes

    d = repr(float(discount))
    return f"""
WITH {_vocab_ctes("kb", "TRUE", vocab_size, col, table, id_col)},
kbw AS (
  SELECT (SELECT count(*) FROM kbvoc) + 1 AS w
), kbpos AS (
  SELECT {id_col}, unnest(hs) AS h,
         unnest(range(1, len(hs) + 1)) AS pos
  FROM kbtoks
), kbsym AS (
  SELECT p.{id_col}, p.pos, coalesce(v.h, -1::HUGEINT) AS s
  FROM kbpos p LEFT JOIN kbvoc v ON p.h = v.h
), kbbg AS (
  SELECT a.{id_col}, a.s AS s1, b.s AS s2
  FROM kbsym a JOIN kbsym b
    ON a.{id_col} = b.{id_col} AND b.pos = a.pos + 1
), kbbc AS (
  SELECT s1, s2, CAST(count(*) AS DOUBLE) AS c12
  FROM kbbg GROUP BY s1, s2
), kbc1 AS (
  SELECT s1, sum(c12) AS c1, CAST(count(*) AS DOUBLE) AS n1r
  FROM kbbc GROUP BY s1
), kbcl AS (
  SELECT s2, CAST(count(*) AS DOUBLE) AS n1l FROM kbbc GROUP BY s2
), kbtt AS (
  SELECT CAST(count(*) AS DOUBLE) AS tt FROM kbbc
), kbpc AS (
  SELECT l.s2, (l.n1l + 0.5) / (t.tt + 0.5 * w.w) AS pcont
  FROM kbcl l CROSS JOIN kbtt t CROSS JOIN kbw w
), kblp AS (
  SELECT g.{id_col},
         ln(greatest(c.c12 - {d}, 0.0) / u.c1
            + (({d} * u.n1r) / u.c1) * pc.pcont) AS lp
  FROM kbbg g
  JOIN kbbc c ON g.s1 = c.s1 AND g.s2 = c.s2
  JOIN kbc1 u ON g.s1 = u.s1
  JOIN kbpc pc ON g.s2 = pc.s2
), kbagg AS (
  SELECT {id_col}, sum(lp) AS s, count(*) AS ntr
  FROM kblp GROUP BY {id_col}
)
SELECT t.{id_col},
       round(CASE WHEN a.{id_col} IS NULL THEN 'infinity'::DOUBLE
                  ELSE exp(-(a.s / a.ntr)) END, {round_digits}) AS {out}
FROM {table} t LEFT JOIN kbagg a ON t.{id_col} = a.{id_col}
"""
