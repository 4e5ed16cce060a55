"""Web-text quality filtering: repetition stats, Gopher-rule gating,
C4-style line cleaning, PII redaction, paragraph-level dedup.

First-class training-data-pipeline operators (build brief; no reference
analog — the reference's text surface ends at scalar functions).  The
rule set mirrors the published web-corpus pipelines:

- repetition / quality signals per Gopher (Rae et al. 2021 §A1.1):
  duplicate-word fraction, top-bigram character fraction, stop-word
  fraction, mean word length, word-count bounds — combined into a
  single ``gopher_keep`` gate;
- line-level cleaning per C4 (Raffel et al. 2020 §2.2): keep lines
  that end in terminal punctuation, have a minimum word count, and
  contain no blocklisted substring;
- paragraph-level exact dedup per RefinedWeb/CCNet: explode
  paragraphs, global keep-first on content hash, reconstruct.

SQL-parity notes (the driver's gate hash-compares values):

- "word" means a DuckDB ``string_split(col, ' ')`` FIELD — single-space
  separators, empty fields included — matching the existing
  ``token_count`` parity in :mod:`ocgis_ray.stages.text`.
- all ratios are ``sql_round``-ed to 6 digits on both sides; the
  ``gopher_keep`` thresholds compare the ROUNDED values so the
  boolean is reproducible bit-exactly.
- distinct/bigram counting uses 64-bit splitmix-finalized Horner
  hashes of the field bytes (same family as the minhash/fingerprint
  kernels).  Distinct fields collide with probability ~n²/2⁶⁵ per
  document (≈1e-16 at 10³ words) — the same engineering assumption
  the dedup stages document.  Word-bigram keys are injective as
  strings (fields contain no spaces), so hashing is the only
  approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ocgis_ray.parity import sql_round
from ocgis_ray.stages.text import (
    KERNEL_BATCH_SIZE,
    _FNV,
    _horner_hash_bytes,
    _mix64,
    _string_byte_view,
)

ROUND_DIGITS = 6

# Gopher-style gate thresholds, calibrated so the synthetic documents
# table splits into a meaningful keep/drop mix (word counts 10-99,
# dup-word fraction 0-0.72, top-bigram fraction 0.03-0.33 at sf0.01).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MAX_DUP_WORD_FRAC = 0.6
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.12
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 8.0

# the en profile from text.STOPWORDS, frozen in definition order so the
# SQL twin's IN-list is reproducible
GOPHER_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "for", "with", "on")


# ------------------------------------------------------------- segments

def _segments(data: np.ndarray, off: np.ndarray, sep: int):
    """Split every row of a string column's byte view on a single-byte
    separator — DuckDB ``string_split`` semantics (empty segments kept,
    a row with no separator is one segment).

    Returns ``(starts, ends, seg_row, segs_per_row)`` — all int64,
    row-major (segments of row 0, then row 1, ...).  Fully vectorized:
    one pass to locate separators, O(rows + seps) index arithmetic.
    ``sep`` must be an ASCII byte (cannot occur inside multi-byte UTF-8
    sequences, so byte positions are char-boundary-safe)."""
    n = len(off) - 1
    sep_pos = np.nonzero(data == sep)[0]
    # drop separators outside [off[0], off[-1]) (sliced views)
    if len(sep_pos) and (sep_pos[0] < off[0] or sep_pos[-1] >= off[-1]):
        sep_pos = sep_pos[(sep_pos >= off[0]) & (sep_pos < off[-1])]
    sep_row = np.searchsorted(off[1:], sep_pos, side="right").astype(np.int64)
    seps_per_row = np.bincount(sep_row, minlength=n).astype(np.int64)
    segs_per_row = seps_per_row + 1
    total = int(segs_per_row.sum())
    first_idx = np.zeros(n, dtype=np.int64)
    np.cumsum(segs_per_row[:-1], out=first_idx[1:])
    starts = np.empty(total, dtype=np.int64)
    ends = np.empty(total, dtype=np.int64)
    starts[first_idx] = off[:-1]
    ends[first_idx + segs_per_row - 1] = off[1:]
    if len(sep_pos):
        cum_before = np.zeros(n, dtype=np.int64)
        np.cumsum(seps_per_row[:-1], out=cum_before[1:])
        rank = np.arange(len(sep_pos), dtype=np.int64) - cum_before[sep_row]
        idx = first_idx[sep_row] + 1 + rank  # segment AFTER this sep
        starts[idx] = sep_pos + 1
        ends[idx - 1] = sep_pos
    seg_row = np.repeat(np.arange(n, dtype=np.int64), segs_per_row)
    return starts, ends, seg_row, segs_per_row


_HASH_MAX_LEN = 128


def _hash_segments(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Horner polynomial hash (splitmix-finalized) per segment, FULL
    content — gathers segment bytes segment-major and reduces via the
    O(total-bytes) prefix-sum Horner (:func:`_segmented_horner`).

    The former 128-byte prefix cap made distinct long words sharing a
    prefix (URLs, base64 runs on real web text) deterministically
    collide, silently diverging dup_word_frac / top-bigram / gopher
    verdicts from the DuckDB twin; full-content hashing restores the
    repo-wide only-probabilistic-collisions contract.  Short-word
    batches (lmax <= 16, the natural-language case) keep the cheaper
    per-position loop — identical values, no gather temporaries."""
    n_segs = len(starts)
    h = np.zeros(n_segs, dtype=np.uint64)
    if n_segs == 0:
        return h
    lmax = int(lens.max())
    if lmax <= 16:
        with np.errstate(over="ignore"):
            for u in range(lmax):
                act = lens > u
                # gather uint8 then let the add promote — converting the
                # whole byte buffer to uint64 up front is an 8x temporary
                h[act] = h[act] * _FNV + data[starts[act] + u]
        return _mix64(h)
    total = int(lens.sum())
    seg_first = np.zeros(n_segs, dtype=np.int64)
    np.cumsum(lens[:-1], out=seg_first[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(seg_first, lens)
    idx = np.repeat(starts, lens) + within
    return _segmented_horner(data[idx], lens)


def _char_counts(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                 cum: np.ndarray | None = None) -> np.ndarray:
    """UTF-8 char count per segment (non-continuation bytes).  Pass a
    precomputed ``cum`` (cumsum of char-start flags, length
    ``len(data)+1``) when the caller already built one."""
    if cum is None:
        cum = np.zeros(len(data) + 1, dtype=np.int64)
        # cumsum the bool mask directly — widening the whole byte
        # buffer to int64 first costs an 8x-size temporary per batch
        np.cumsum((data & 0xC0) != 0x80, dtype=np.int64, out=cum[1:])
    return cum[ends] - cum[starts]


# ------------------------------------------------- repetition / Gopher

def quality_stats_arrays(text_arr) -> dict[str, np.ndarray]:
    """Gopher-style repetition/quality signals per row, vectorized:

    - ``dup_word_frac``  = 1 - distinct_fields / fields
    - ``mean_word_len``  = (chars - (fields-1)) / fields
    - ``stopword_frac``  = stop-word fields / fields
    - ``top_bigram_frac`` = max over adjacent-field bigrams of
      count·(len(w1)+len(w2)+1) / chars   (0 when < 2 fields)
    - ``gopher_keep``    = int64 0/1 gate over the ROUNDED signals

    Outputs are bit-identical to :func:`quality_stats_sql`'s DuckDB
    twin; NULL text rows surface as a ``_null_mask`` entry."""
    import pyarrow.compute as pc

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    data, off = _string_byte_view(text_arr)
    n = len(off) - 1
    n_chars = pc.utf8_length(text_arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = np.nan_to_num(n_chars)  # null rows -> 0, masked below

    starts, ends, frow, fper = _segments(data, off, ord(" "))
    lens = ends - starts
    h = _hash_segments(data, starts, lens)

    # distinct fields per row: sort (row, hash), count group starts
    order = np.lexsort((h, frow))
    hs, rs = h[order], frow[order]
    grp_start = np.empty(len(hs), dtype=bool)
    if len(hs):
        grp_start[0] = True
        grp_start[1:] = (hs[1:] != hs[:-1]) | (rs[1:] != rs[:-1])
    distinct = np.bincount(rs[grp_start], minlength=n).astype(np.float64)

    fper_f = fper.astype(np.float64)
    dup_word_frac = 1.0 - distinct / fper_f
    mean_word_len = (n_chars - (fper_f - 1.0)) / fper_f

    stop_table = np.sort(np.asarray(
        [_horner_hash_bytes(w.encode(), max_len=_HASH_MAX_LEN) for w in GOPHER_STOPWORDS],
        dtype=np.uint64))
    pos = np.minimum(np.searchsorted(stop_table, h), stop_table.size - 1)
    member = (stop_table[pos] == h).astype(np.float64)
    stopword_frac = np.bincount(frow, weights=member, minlength=n) / fper_f

    # top-bigram character coverage
    clen = _char_counts(data, starts, ends)
    top_cov = np.zeros(n, dtype=np.float64)
    if len(h) > 1:
        adj = frow[:-1] == frow[1:]
        if adj.any():
            with np.errstate(over="ignore"):
                bh = _mix64(h[:-1][adj] * _FNV + h[1:][adj])
            brow = frow[:-1][adj]
            blen = (clen[:-1][adj] + clen[1:][adj] + 1).astype(np.float64)
            border = np.lexsort((bh, brow))
            bh, brow, blen = bh[border], brow[border], blen[border]
            gstart = np.empty(len(bh), dtype=bool)
            gstart[0] = True
            gstart[1:] = (bh[1:] != bh[:-1]) | (brow[1:] != brow[:-1])
            gidx = np.nonzero(gstart)[0]
            counts = np.diff(np.append(gidx, len(bh))).astype(np.float64)
            cov = counts * blen[gidx]
            grow = brow[gidx]
            # per-row max over this row's groups (grow is sorted)
            row_start = np.nonzero(np.r_[True, grow[1:] != grow[:-1]])[0]
            maxes = np.maximum.reduceat(cov, row_start)
            top_cov[grow[row_start]] = maxes
    top_bigram_frac = np.where(n_chars > 0, top_cov / np.maximum(n_chars, 1.0), 0.0)

    dup_word_frac = sql_round(dup_word_frac, ROUND_DIGITS)
    mean_word_len = sql_round(mean_word_len, ROUND_DIGITS)
    stopword_frac = sql_round(stopword_frac, ROUND_DIGITS)
    top_bigram_frac = sql_round(top_bigram_frac, ROUND_DIGITS)

    keep = (
        (fper >= GOPHER_MIN_WORDS) & (fper <= GOPHER_MAX_WORDS)
        & (dup_word_frac <= GOPHER_MAX_DUP_WORD_FRAC)
        & (stopword_frac > 0.0)
        & (top_bigram_frac <= GOPHER_MAX_TOP_BIGRAM_FRAC)
        & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
    ).astype(np.int64)

    out = {
        "dup_word_frac": dup_word_frac,
        "mean_word_len": mean_word_len,
        "stopword_frac": stopword_frac,
        "top_bigram_frac": top_bigram_frac,
        "gopher_keep": keep,
    }
    if text_arr.null_count:
        out["_null_mask"] = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
    return out


def add_quality_stats(ds, col: str = "text"):
    """Append the Gopher repetition/quality columns (see
    :func:`quality_stats_arrays`); NULL text rows yield NULL stats."""

    def f(t: pa.Table) -> pa.Table:
        stats = quality_stats_arrays(t[col])
        isnull = stats.pop("_null_mask", None)
        for name, vals in stats.items():
            t = t.append_column(
                name, pa.array(vals, mask=isnull) if isnull is not None else pa.array(vals))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def add_compression_ratio(ds, col: str = "text",
                          out: str = "compression_ratio",
                          level: int = 6, batch_size: int = 4096):
    """zlib compression ratio per document — the Dolma/RedPajama-V2
    repetitiveness signal: ``len(zlib.compress(utf8)) / max(len(utf8),
    1)``.  Boilerplate/repetitive text compresses far below ~0.4;
    encrypted/binary junk sits near (or above) 1.0.

    Not SQL-expressible (DEFLATE), so this signal is pytest-checked
    only.  The per-row ``zlib.compress`` call is a C kernel — the
    Python loop here is dispatch, not the hot path (DEFLATE dominates
    at ~100 MB/s/core), and null rows pass through as null."""
    import zlib

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = np.empty(len(arr), dtype=np.float64)
        mask = np.zeros(len(arr), dtype=bool)
        for i, v in enumerate(arr):
            if not v.is_valid:
                mask[i] = True
                continue
            raw = v.as_buffer()  # zero-copy utf-8 view
            vals[i] = len(zlib.compress(bytes(raw), level)) / max(len(raw), 1)
        return t.append_column(
            out, pa.array(vals, mask=mask if mask.any() else None))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def compression_filter(ds, col: str = "text", min_ratio: float = 0.30,
                       max_ratio: float = 1.15, level: int = 6):
    """Keep docs with ``min_ratio <= compression_ratio <= max_ratio``
    (drop hyper-repetitive boilerplate below, binary junk above);
    null-text rows are dropped like the other quality gates."""
    import pyarrow.compute as pc

    scored = add_compression_ratio(ds, col=col, out="_zratio", level=level)

    def keep(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.greater_equal(t["_zratio"], pa.scalar(min_ratio)),
                     pc.less_equal(t["_zratio"], pa.scalar(max_ratio)))
        return t.filter(pc.fill_null(ok, False)).drop_columns(["_zratio"])

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def gopher_filter(ds, col: str = "text"):
    """Rows passing the Gopher gate (stats computed, gate applied,
    stat columns dropped — the filter shape a cleaning pipeline uses)."""
    def f(t: pa.Table) -> pa.Table:
        stats = quality_stats_arrays(t[col])
        keep = stats["gopher_keep"].astype(bool)
        if "_null_mask" in stats:
            keep &= ~stats["_null_mask"]
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def quality_stats_sql(col: str = "text", table: str = "documents",
                      id_col: str = "doc_id",
                      extra_select: str = "") -> str:
    """Full DuckDB twin of :func:`quality_stats_arrays` over ``table``
    (CTE-shaped: the top-bigram coverage needs a per-bigram group-by).
    ``extra_select`` appends further select-list fragments computed
    over ``d`` (e.g. the text_stats fragments) to the outer query."""
    sw = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    split = f"string_split(d.{col}, ' ')"
    nf = f"len({split})"
    r = ROUND_DIGITS
    extra = f",\n  {extra_select}" if extra_select else ""
    return f"""
WITH f AS (
  SELECT {id_col}, string_split({col}, ' ') AS l,
         CAST(length({col}) AS DOUBLE) AS n
  FROM {table}
),
w AS (
  SELECT {id_col}, n, unnest(l) AS w, unnest(range(1, len(l) + 1)) AS i FROM f
),
bg AS (
  SELECT a.{id_col} AS {id_col}, a.n AS n, a.w || ' ' || b.w AS bg
  FROM w a JOIN w b ON a.{id_col} = b.{id_col} AND b.i = a.i + 1
),
cov AS (
  SELECT {id_col}, n, bg, CAST(count(*) * length(bg) AS DOUBLE) AS cov
  FROM bg GROUP BY {id_col}, n, bg
),
tb AS (
  SELECT f.{id_col} AS {id_col},
         CASE WHEN f.n IS NULL THEN NULL
              ELSE round(coalesce(max(cov.cov) / f.n, 0.0), {r}) END AS top_bigram_frac
  FROM f LEFT JOIN cov ON f.{id_col} = cov.{id_col}
  GROUP BY f.{id_col}, f.n
),
q AS (
  SELECT d.{id_col} AS {id_col},
    round(1.0 - CAST(len(list_distinct({split})) AS DOUBLE) / {nf}, {r}) AS dup_word_frac,
    round((CAST(length(d.{col}) AS DOUBLE) - ({nf} - 1)) / {nf}, {r}) AS mean_word_len,
    round(CAST(len(list_filter({split}, x -> x IN ({sw}))) AS DOUBLE) / {nf}, {r}) AS stopword_frac,
    {nf} AS _nf,
    tb.top_bigram_frac AS top_bigram_frac{extra}
  FROM {table} d JOIN tb ON d.{id_col} = tb.{id_col}
)
SELECT * EXCLUDE (_nf),
  CAST((_nf >= {GOPHER_MIN_WORDS} AND _nf <= {GOPHER_MAX_WORDS}
        AND dup_word_frac <= {GOPHER_MAX_DUP_WORD_FRAC}
        AND stopword_frac > 0.0
        AND top_bigram_frac <= {GOPHER_MAX_TOP_BIGRAM_FRAC}
        AND mean_word_len >= {GOPHER_MIN_MEAN_WORD_LEN}
        AND mean_word_len <= {GOPHER_MAX_MEAN_WORD_LEN}) AS BIGINT) AS gopher_keep
FROM q
"""


# --------------------------------------------------------- C4 line rules

C4_TERMINAL = b".!?\"'"
C4_MIN_WORDS = 3
C4_BLOCKLIST = ("lorem ipsum", "{", "javascript")


def _find_substring_starts(data: np.ndarray, pattern: bytes) -> np.ndarray:
    """Byte positions where ``pattern`` starts — vectorized sliding
    compare (len(pattern) shifted equality passes over the batch's
    byte view, which ``_string_byte_view`` guarantees is already
    rebased to the array's own window).  Hits spanning a row/segment
    boundary are the caller's job to mask (patterns contain no
    newlines, so a cross-LINE hit is impossible by construction)."""
    m = len(pattern)
    if len(data) < m:
        return np.empty(0, dtype=np.int64)
    hit = data[: len(data) - m + 1] == pattern[0]
    for j in range(1, m):
        hit &= data[j: len(data) - m + 1 + j] == pattern[j]
    return np.nonzero(hit)[0].astype(np.int64)


def c4_line_filter(ds, col: str = "text", min_words: int = C4_MIN_WORDS,
                   terminal: bytes = C4_TERMINAL,
                   blocklist: tuple[str, ...] = C4_BLOCKLIST,
                   drop_empty_docs: bool = True):
    """C4-style line cleaning (Raffel et al. 2020 §2.2), vectorized.

    Splits ``col`` on ``\\n``; keeps lines that (a) end in a terminal-
    punctuation byte, (b) contain >= ``min_words`` space-split fields,
    and (c) contain no blocklisted substring (case-sensitive);
    reconstructs the document from the kept lines.  Whole-batch
    kernels: one segment pass, byte-LUT predicates, a single
    fancy-gather rebuild — no per-row Python.

    SQL twin (pytest parity):
    ``array_to_string(list_filter(string_split(text, chr(10)),
    l -> <same predicates>), chr(10))``."""
    term_set = frozenset(terminal)
    bl = tuple(b.encode() for b in blocklist)

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        data, off = _string_byte_view(arr)
        n = len(off) - 1
        starts, ends, lrow, _ = _segments(data, off, ord("\n"))
        lens = ends - starts

        # (a) terminal punctuation: last byte of a non-empty line
        term_lut = np.zeros(256, dtype=bool)
        term_lut[list(term_set)] = True
        nonempty = lens > 0
        keep = np.zeros(len(starts), dtype=bool)
        keep[nonempty] = term_lut[data[ends[nonempty] - 1]]

        # (b) word count: spaces within the line + 1
        sp = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(data == ord(" "), out=sp[1:])
        keep &= (sp[ends] - sp[starts] + 1) >= min_words

        # (c) blocklist substrings -> owning line
        for pat in bl:
            hits = _find_substring_starts(data, pat)
            if len(hits):
                li = np.searchsorted(starts, hits, side="right") - 1
                inside = (hits + len(pat)) <= ends[li]
                keep[li[inside]] = False

        # rebuild: kept lines joined by \n, per row
        kstart, klen, krow = starts[keep], lens[keep], lrow[keep]
        kper = np.bincount(krow, minlength=n).astype(np.int64)
        out_len = np.bincount(krow, weights=klen, minlength=n).astype(np.int64) \
            + np.maximum(kper - 1, 0)
        new_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(out_len, out=new_off[1:])
        total = int(new_off[-1])
        if total >= 1 << 31:
            raise ValueError(
                f"c4_line_filter batch output is {total} bytes (>= 2 GiB "
                "int32 offset limit) — lower the stage's batch_size")
        out = np.full(total, ord("\n"), dtype=np.uint8)
        if len(kstart):
            # dest start of each kept line: row base + within-row prefix
            # of (len+1) minus the current line's own (len+1)
            g = klen + 1
            cg = np.cumsum(g)
            row_first = np.zeros(n, dtype=np.int64)
            np.cumsum(kper[:-1], out=row_first[1:])  # first kept-line idx per row
            base_cg = np.where(kper > 0, np.r_[0, cg][row_first], 0)
            prefix = cg - g - base_cg[krow]
            dest = new_off[krow] + prefix
            # gather all line bytes with one fancy index
            tot_bytes = int(klen.sum())
            rep_dest = np.repeat(dest, klen)
            rep_src = np.repeat(kstart, klen)
            within = np.arange(tot_bytes, dtype=np.int64) \
                - np.repeat(np.r_[0, np.cumsum(klen)[:-1]], klen)
            out[rep_dest + within] = data[rep_src + within]
        validity = None
        if arr.null_count:
            import pyarrow.compute as pc
            validity = pc.is_valid(arr).combine_chunks() if isinstance(
                arr, pa.ChunkedArray) else pc.is_valid(arr)
        new_arr = pa.Array.from_buffers(
            pa.string(), n,
            [validity.buffers()[1] if validity is not None else None,
             pa.py_buffer(new_off.astype(np.int32).tobytes()),
             pa.py_buffer(out.tobytes())])
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, new_arr)
        if drop_empty_docs:
            import pyarrow.compute as pc
            t = t.filter(pc.greater(pc.utf8_length(pc.fill_null(t[col], "")), 0))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def c4_line_filter_sql(col: str = "text", min_words: int = C4_MIN_WORDS,
                       terminal: bytes = C4_TERMINAL,
                       blocklist: tuple[str, ...] = C4_BLOCKLIST) -> str:
    """DuckDB expression twin of :func:`c4_line_filter` (the kept-and-
    rejoined text), for parity tests.  Takes the SAME parameters so a
    customized filter keeps a matching twin."""
    not_blocked = " AND ".join(
        f"NOT contains(l, '{b.replace(chr(39), chr(39) * 2)}')" for b in blocklist)
    cls = "".join("\\" + chr(c) if chr(c) in "]\\^-" else chr(c)
                  for c in terminal).replace("'", "''")
    pred = (f"len(string_split(l, ' ')) >= {min_words} "
            f"AND regexp_matches(l, '[{cls}]$') "
            f"AND {not_blocked}")
    return (f"array_to_string(list_filter(string_split({col}, chr(10)), "
            f"l -> {pred}), chr(10))")


# ------------------------------------------------------------ PII redact

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # RE2-compatible (no lookaround/backrefs) so the DuckDB twin
    # regexp_replace(..., 'g') matches byte-for-byte
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d{3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
)


def pii_redact(ds, col: str = "text",
               patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
               concurrency: int | None = None):
    """PII scrub via Arrow's RE2 kernel — the SAME engine DuckDB's
    ``regexp_replace`` uses, so parity is by construction (including
    ASCII-only ``\\d``/``\\b`` semantics, which Python's Unicode-aware
    ``re`` would get wrong on e.g. Arabic-Indic digits).  Pattern
    order matters (emails before phones — an email can contain
    digits).  Zero pandas, zero Python: one C++ pass per pattern,
    ~30x the per-row pandas ``str.replace`` path this replaced.

    ``concurrency`` is accepted for API compatibility; a stateless
    task pool needs no sizing."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        for pat, tok in patterns:
            arr = pc.replace_substring_regex(arr, pattern=pat, replacement=tok)
        idx = t.schema.get_field_index(col)
        return t.set_column(idx, col, arr)

    from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def pii_redact_sql(col: str = "text",
                   patterns: tuple[tuple[str, str], ...] = PII_PATTERNS) -> str:
    expr = col
    for pat, tok in patterns:
        # standard-SQL string literals pass backslashes through
        # untouched, so only quotes need escaping
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{tok}', 'g')"
    return expr


# ------------------------------------------------ document wordlist gate

def _wordlist_pattern(words: tuple[str, ...]) -> str:
    import re as _re

    if not words:
        raise ValueError("wordlist_doc_filter needs at least one word")
    return r"\b(?:" + "|".join(_re.escape(w) for w in words) + r")\b"


def wordlist_doc_filter(ds, words: tuple[str, ...], col: str = "text",
                        mode: str = "drop", out: str = "has_blocked"):
    """C4 §2.2 DOCUMENT-level blocklist gate (the 'bad words' rule):
    drop — or with ``mode='flag'`` just mark — any document containing
    a blocklisted WORD (whole-word, case-insensitive).  The line-level
    substring rule is :func:`c4_line_filter`; this is the page killer
    applied before it in the C4 recipe.

    One Arrow RE2 pass over the byte buffer (alternation of escaped
    words inside ``\\b...\\b``) — the same engine DuckDB's
    ``regexp_matches`` uses, so the twin
    (:func:`wordlist_doc_filter_sql`) matches by construction,
    including ASCII-only ``\\b`` semantics.  NULL text never matches
    (kept by ``drop``, flagged False by ``flag``)."""
    if mode not in ("drop", "flag"):
        # validate eagerly — inside the closure this would surface as
        # a mid-pipeline RayTaskError instead of at the call site
        raise ValueError(f"mode must be 'drop' or 'flag', not {mode!r}")
    pat = _wordlist_pattern(tuple(words))

    def f(t: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.match_substring_regex(
            t[col], pat, ignore_case=True), False)
        if mode == "flag":
            return t.append_column(out, m)
        return t.filter(pc.invert(m))

    from ocgis_ray.stages.text import KERNEL_BATCH_SIZE

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def wordlist_doc_filter_sql(words: tuple[str, ...],
                            col: str = "text") -> str:
    """DuckDB predicate twin of :func:`wordlist_doc_filter`'s match
    (true = document contains a blocklisted word)."""
    p = _wordlist_pattern(tuple(words)).replace("'", "''")
    return f"coalesce(regexp_matches({col}, '{p}', 'i'), false)"


# ------------------------------------------------------ paragraph dedup

def paragraph_dedup(ds, id_col: str = "doc_id", col: str = "text",
                    sep: str = "\n\n", drop_empty_docs: bool = True,
                    num_buckets: int | None = None):
    """Cross-document paragraph-level exact dedup (RefinedWeb §G.3 /
    CCNet shape): explode paragraphs with a 64-bit content hash,
    GLOBAL keep-first on the hash (bucketed shuffle — the survivor is
    the minimum ``(id_col, position)``, deterministic under resume),
    then reconstruct each document from its surviving paragraphs.

    Two hash shuffles total (dedup + regroup); nothing materializes on
    the driver.  Hash collisions merge distinct paragraphs with
    probability ~P²/2⁶⁵ — the repo-wide content-hash assumption.

    With ``drop_empty_docs=False`` a document whose every paragraph
    was deduped away (or whose text is NULL) survives as an EMPTY
    string: each doc also emits a per-doc sentinel row whose hash is
    unique, so the doc reaches the rebuild even with zero surviving
    paragraphs."""
    from ocgis_ray.sources.io import bucketed_group_apply, distinct_rows
    from ocgis_ray.stages.text import string_value_hash

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        txt = t[col].combine_chunks()
        # vectorized paragraph split: list<string> -> flat + parent
        # indices (nulls propagate to null lists, which flatten to
        # zero elements — NULL text emits no real paragraphs)
        lists = pc.split_pattern(txt, sep)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cnt = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
        cols = {
            id_col: ids.take(pa.array(parent)),
            "_pos": pa.array(pos),
            "_para": flat,
            "_sent": pa.array(np.zeros(len(flat), dtype=bool)),
            "_ph": pa.array(string_value_hash(flat).view(np.int64)),
        }
        out = pa.table(cols)
        if drop_empty_docs:
            return out
        # one sentinel row per doc: unique hash input (\x00 prefix
        # cannot collide with a real paragraph of this corpus), so a
        # doc with zero surviving paragraphs still reaches the rebuild
        s_para = pc.binary_join_element_wise(
            pa.scalar("\x00sentinel:"), pc.cast(ids, pa.string()),
            pa.scalar(""))
        n = len(t)
        sent_tbl = pa.table({
            id_col: ids,
            "_pos": pa.array(np.full(n, -1, dtype=np.int64)),
            "_para": s_para,
            "_sent": pa.array(np.ones(n, dtype=bool)),
            "_ph": pa.array(string_value_hash(s_para).view(np.int64)),
        })
        return pa.concat_tables([sent_tbl, out])

    paras = ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)
    # survivor = lexicographic-min (id, position) — no bit packing, so
    # any orderable id type and any paragraph count are safe
    kept = distinct_rows(paras, "_ph", order_col=[id_col, "_pos"],
                         num_buckets=num_buckets)

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        real = g[~g["_sent"]].sort_values([id_col, "_pos"], kind="mergesort")
        joined = real.groupby(id_col, sort=True)["_para"].agg(sep.join)
        all_ids = pd.Index(g[id_col].unique()).sort_values()
        joined = joined.reindex(all_ids, fill_value="").reset_index()
        joined.columns = [id_col, col]
        return joined

    out = bucketed_group_apply(kept, [id_col], rebuild, num_buckets=num_buckets)
    if drop_empty_docs:
        out = out.filter(lambda r: len(r[col]) > 0)
    return out


def boilerplate_line_filter(ds, group_col: str, id_col: str = "doc_id",
                            col: str = "text", sep: str = "\n",
                            min_docs: int = 2, max_frac: float = 0.5,
                            drop_empty_docs: bool = True,
                            carry: tuple = (),
                            num_buckets: int | None = None):
    """Host-level boilerplate removal (CCNet/RefinedWeb shape): a line
    is boilerplate WITHIN a group (host / domain / source) when it
    appears in >= ``min_docs`` distinct documents AND in more than
    ``max_frac`` of the group's documents — navigation bars, cookie
    banners, copyright footers.  Every occurrence of a boilerplate
    line is removed from every document of that group; documents are
    rebuilt with surviving lines in original order.

    Distinct from :func:`paragraph_dedup` (global keep-FIRST: one
    survivor keeps the paragraph) — here frequent lines are removed
    EVERYWHERE, and rarity is judged per group, not globally.

    Scale shape: ONE bucketed shuffle — lines bucket by GROUP (a
    document belongs to exactly one group, so frequency decision,
    line filter and per-document rebuild all happen in the same
    vectorized per-bucket pass; nothing driver-sized, no joins).
    Hot-host skew concentrates that host's lines in one bucket — the
    same partitioning any per-host statistic needs.  ``carry``
    columns (per-document constants, e.g. lang) ride along.

    DuckDB twin: unnest(string_split) + count(DISTINCT id) GROUP BY
    (group, line) + anti-join + string_agg(... ORDER BY pos) — see
    ``q_token_rollup_by_lang``'s gate for the worked twin."""
    from ocgis_ray.sources.io import bucketed_group_apply
    from ocgis_ray.stages.text import string_value_hash

    carry = tuple(carry)

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        txt = t[col].combine_chunks()
        lists = pc.split_pattern(txt, sep)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cnt = pc.fill_null(pc.list_value_length(lists), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=starts[1:])
        pos = np.arange(len(flat), dtype=np.int64) - starts[parent]
        take = pa.array(parent)
        cols = {
            group_col: t[group_col].combine_chunks().take(take),
            id_col: ids.take(take),
            "_pos": pa.array(pos),
            "_line": flat,
            "_sent": pa.array(np.zeros(len(flat), dtype=bool)),
            "_lh": pa.array(string_value_hash(flat).view(np.int64)),
        }
        for c in carry:
            cols[c] = t[c].combine_chunks().take(take)
        out = pa.table(cols)
        if drop_empty_docs:
            return out
        s_line = pc.binary_join_element_wise(
            pa.scalar("\x00sentinel:"), pc.cast(ids, pa.string()),
            pa.scalar(""))
        n = len(t)
        sent_cols = {
            group_col: t[group_col].combine_chunks(),
            id_col: ids,
            "_pos": pa.array(np.full(n, -1, dtype=np.int64)),
            "_line": s_line,
            "_sent": pa.array(np.ones(n, dtype=bool)),
            "_lh": pa.array(string_value_hash(s_line).view(np.int64)),
        }
        for c in carry:
            sent_cols[c] = t[c].combine_chunks()
        return pa.concat_tables([pa.table(sent_cols), out])

    lines = ds.map_batches(explode, batch_format="pyarrow",
                           zero_copy_batch=True)

    def process(g: pd.DataFrame) -> pd.DataFrame:
        real = g[~g["_sent"]]
        # frequency decision: distinct docs per (group, line); the
        # group's doc universe = distinct ids among its real lines
        # (every non-null text yields >= 1 line)
        dd = real.drop_duplicates([group_col, "_lh", id_col])
        nd = dd.groupby([group_col, "_lh"], sort=False)[id_col] \
            .transform("size")
        npd = dd[group_col].map(
            dd.drop_duplicates([group_col, id_col])
            .groupby(group_col, sort=False).size())
        bad = dd.loc[(nd >= min_docs) & (nd.to_numpy()
                                         > max_frac * npd.to_numpy()),
                     [group_col, "_lh"]]
        # drop EVERY occurrence of a boilerplate line (vectorized
        # anti-merge), then rebuild each doc in original line order
        keep = real.merge(bad.assign(_bp=np.int8(1)),
                          on=[group_col, "_lh"], how="left")
        keep = keep[keep["_bp"].isna()] \
            .sort_values([id_col, "_pos"], kind="mergesort")
        joined = keep.groupby(id_col, sort=True)["_line"].agg(sep.join)
        firsts = g.drop_duplicates(id_col).set_index(id_col)
        all_ids = pd.Index(g[id_col].unique()).sort_values()
        joined = joined.reindex(all_ids, fill_value="").reset_index()
        joined.columns = [id_col, col]
        for c in (group_col,) + carry:
            joined[c] = firsts.loc[joined[id_col], c].to_numpy()
        return joined

    out = bucketed_group_apply(lines, [group_col], process,
                               num_buckets=num_buckets)
    if drop_empty_docs:
        out = out.filter(expr=f"{col} != ''")
    return out


def boilerplate_line_filter_sql(table: str, group_col: str,
                                id_col: str = "doc_id",
                                col: str = "text", min_docs: int = 2,
                                max_frac: float = 0.5,
                                drop_empty_docs: bool = True,
                                extra_cols: tuple = ()) -> str:
    """DuckDB twin of :func:`boilerplate_line_filter` (sep='\\n'
    only): same distinct-doc frequency rule, same rebuild order —
    the twin groups by the LINE STRING where the engine groups by its
    64-bit content hash, identical modulo hash collisions (the
    repo-wide content-hash assumption).  ``extra_cols`` are carried
    per-document constants.  One documented edge: NULL ``col`` rows
    vanish here even with ``drop_empty_docs=False`` (the engine's
    sentinel keeps them as '')."""
    ec = "".join(f", {c}" for c in extra_cols)
    ecd = "".join(f", d.{c}" for c in extra_cols)
    keep_pred = ("" if not drop_empty_docs
                 else " WHERE k._ctext IS NOT NULL AND k._ctext != ''")
    return (
        f"WITH _sp AS (SELECT {id_col}, {group_col}{ec}, "
        f"string_split({col}, chr(10)) AS _ls FROM {table} "
        f"WHERE {col} IS NOT NULL),\n"
        f"_bl AS (SELECT {id_col}, {group_col}{ec}, "
        f"unnest(_ls) AS _line, "
        f"unnest(range(1, len(_ls) + 1)) AS _pos FROM _sp),\n"
        f"_cnt AS (SELECT {group_col}, _line, "
        f"count(DISTINCT {id_col}) AS _nd FROM _bl "
        f"GROUP BY {group_col}, _line),\n"
        f"_npd AS (SELECT {group_col}, count(DISTINCT {id_col}) AS _np "
        f"FROM _bl GROUP BY {group_col}),\n"
        f"_bp AS (SELECT c.{group_col}, c._line FROM _cnt c "
        f"JOIN _npd n USING ({group_col}) "
        f"WHERE c._nd >= {int(min_docs)} "
        f"AND c._nd > {float(max_frac)!r} * n._np),\n"
        f"_keep AS (SELECT b.* FROM _bl b ANTI JOIN _bp p "
        f"ON b.{group_col} = p.{group_col} AND b._line = p._line)\n"
        f"SELECT d.{id_col}, d.{group_col}{ecd}, "
        f"coalesce(k._ctext, '') AS {col} FROM "
        f"(SELECT DISTINCT {id_col}, {group_col}{ec} FROM _bl) d "
        f"LEFT JOIN (SELECT {id_col}, "
        f"string_agg(_line, chr(10) ORDER BY _pos) AS _ctext "
        f"FROM _keep GROUP BY {id_col}) k USING ({id_col})"
        f"{keep_pred}"
    )


def _gather_strings(data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                    null_mask: np.ndarray | None = None) -> pa.Array:
    """Build a string array from (start, len) slices of a byte view —
    one fancy-gather, no per-row Python.  Shared by the line-filter
    rebuild and the URL parser."""
    n = len(starts)
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    total = int(new_off[-1])
    if total >= 1 << 31:
        raise ValueError(
            f"string batch output is {total} bytes (>= 2 GiB int32 offset "
            "limit) — lower the stage's batch_size")
    out = np.empty(total, dtype=np.uint8)
    if total:
        rep_src = np.repeat(starts, lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(new_off[:-1], lens)
        out[:] = data[rep_src + within]
    validity = None
    if null_mask is not None and null_mask.any():
        validity = pa.array(~null_mask).buffers()[1]
    return pa.Array.from_buffers(
        pa.string(), n,
        [validity, pa.py_buffer(new_off.astype(np.int32).tobytes()),
         pa.py_buffer(out.tobytes())])


# ----------------------------------------- full Gopher n-gram signals

def ngram_repetition_arrays(text_arr, top_ns=(2, 3, 4),
                            dup_ns=(5, 6, 7, 8, 9, 10)) -> dict[str, np.ndarray]:
    """The full Gopher repetition table (Rae et al. 2021, Table A1):

    - ``top_{n}gram_char_frac``: characters covered by the MOST
      FREQUENT word n-gram (count x n-gram char length, inner spaces
      included) / total chars;
    - ``dup_{n}gram_char_frac``: characters covered by ANY word n-gram
      occurring more than once — overlap-aware (each character counted
      once, the DataTrove-style character mask), via interval stabbing
      (+1/-1 deltas, one cumsum) rather than per-occurrence loops.

    Word = DuckDB ``string_split(col, ' ')`` field, matching
    :func:`quality_stats_arrays`.  Rows with fewer than n fields score
    0.  NULL rows surface via ``_null_mask``.  Checked against a
    straightforward Python reference in tests (no SQL twin — the
    overlap union is not reasonably SQL-expressible)."""
    import pyarrow.compute as pc

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    data, off = _string_byte_view(text_arr)
    n_rows = len(off) - 1
    n_chars = pc.utf8_length(text_arr).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = np.nan_to_num(n_chars)
    safe_chars = np.maximum(n_chars, 1.0)

    starts, ends, frow, fper = _segments(data, off, ord(" "))
    h = _hash_segments(data, starts, ends - starts)
    is_char = (data & 0xC0) != 0x80
    char_cum = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(is_char, dtype=np.int64, out=char_cum[1:])
    clen = _char_counts(data, starts, ends, cum=char_cum)

    out: dict[str, np.ndarray] = {}
    all_ns = sorted(set(top_ns) | set(dup_ns))
    nf = len(h)
    for n in all_ns:
        if nf >= n:
            m = nf - n + 1
            # an n-gram is valid iff its first and last field share a row
            valid = frow[:m] == frow[n - 1:]
            key = np.zeros(m, dtype=np.uint64)
            glen = np.zeros(m, dtype=np.int64)
            with np.errstate(over="ignore"):
                for j in range(n):
                    key = key * _FNV + h[j: m + j]
                    glen += clen[j: m + j]
            key = _mix64(key)
            glen += n - 1  # inner separators
            vkey, vrow = key[valid], frow[:m][valid]
            vstart = starts[:m][valid]
            vend = ends[n - 1:][valid]
            vlen = glen[valid]
        else:
            vkey = np.empty(0, np.uint64)
            vrow = vstart = vend = vlen = np.empty(0, np.int64)

        order = np.lexsort((vkey, vrow))
        sk, sr = vkey[order], vrow[order]
        gstart = np.empty(len(sk), dtype=bool)
        if len(sk):
            gstart[0] = True
            gstart[1:] = (sk[1:] != sk[:-1]) | (sr[1:] != sr[:-1])
        gidx = np.nonzero(gstart)[0]
        counts = np.diff(np.append(gidx, len(sk)))

        if n in top_ns:
            top = np.zeros(n_rows, dtype=np.float64)
            if len(gidx):
                cov = counts.astype(np.float64) * vlen[order][gidx]
                grow = sr[gidx]
                row_start = np.nonzero(np.r_[True, grow[1:] != grow[:-1]])[0]
                top[grow[row_start]] = np.maximum.reduceat(cov, row_start)
            out[f"top_{n}gram_char_frac"] = sql_round(
                np.where(n_chars > 0, top / safe_chars, 0.0), ROUND_DIGITS)

        if n in dup_ns:
            dup = np.zeros(n_rows, dtype=np.float64)
            if len(gidx):
                occ_dup = np.repeat(counts >= 2, counts)  # sorted order
                sel = order[occ_dup]
                if len(sel):
                    # mark [vstart, vend) byte spans; union via deltas
                    delta = np.zeros(len(data) + 1, dtype=np.int64)
                    np.add.at(delta, vstart[sel], 1)
                    np.add.at(delta, vend[sel], -1)
                    covered = np.cumsum(delta[:-1]) > 0
                    marked = np.zeros(len(data) + 1, dtype=np.int64)
                    np.cumsum(covered & is_char, dtype=np.int64, out=marked[1:])
                    dup = (marked[off[1:]] - marked[off[:-1]]).astype(np.float64)
            out[f"dup_{n}gram_char_frac"] = sql_round(
                np.where(n_chars > 0, dup / safe_chars, 0.0), ROUND_DIGITS)

    if text_arr.null_count:
        out["_null_mask"] = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
    return out


def add_ngram_repetition(ds, col: str = "text", top_ns=(2, 3, 4),
                         dup_ns=(5, 6, 7, 8, 9, 10)):
    """Append the full Gopher n-gram repetition columns."""

    def f(t: pa.Table) -> pa.Table:
        stats = ngram_repetition_arrays(t[col], top_ns=top_ns, dup_ns=dup_ns)
        isnull = stats.pop("_null_mask", None)
        for name, vals in stats.items():
            t = t.append_column(
                name, pa.array(vals, mask=isnull) if isnull is not None else pa.array(vals))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


# ------------------------------------------ line/paragraph repetition

def _segmented_horner(vals: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Full-content Horner hash per segment in O(total values): the
    prefix-sum form ``h(seg) = Σ v[i]·FNV^(L-1-i)`` (≡ the iterative
    Horner mod 2⁶⁴) — no loop over segment LENGTH, so one huge
    segment cannot stall the batch (unlike :func:`_hash_segments`,
    whose 128-step cap is a words-only approximation).  ``vals`` is
    segment-major (all of segment 0, then 1, ...); empty segments
    hash to ``_mix64(0)``."""
    n_segs = len(seg_lens)
    out = np.zeros(n_segs, dtype=np.uint64)
    total = int(seg_lens.sum())
    if total:
        maxlen = int(seg_lens.max())
        pows = np.full(maxlen, _FNV, dtype=np.uint64)
        pows[0] = np.uint64(1)
        with np.errstate(over="ignore"):
            np.cumprod(pows, out=pows)  # pows[j] = FNV^j (mod 2^64)
            seg_first = np.zeros(n_segs, dtype=np.int64)
            np.cumsum(seg_lens[:-1], out=seg_first[1:])
            within = np.arange(total, dtype=np.int64) \
                - np.repeat(seg_first, seg_lens)
            rev = np.repeat(seg_lens, seg_lens) - 1 - within
            weighted = vals.astype(np.uint64) * pows[rev]
            nz = seg_lens > 0
            bounds = seg_first[nz]
            out[nz] = np.add.reduceat(weighted, bounds)
    return _mix64(out)


def _dup_occurrences(keys: np.ndarray, rows: np.ndarray) -> np.ndarray:
    """Indices of occurrences whose (row, key) group has count >= 2 —
    the shared duplicate-detection idiom (lexsort, group boundaries,
    occurrence-level mask)."""
    order = np.lexsort((keys, rows))
    sk, sr = keys[order], rows[order]
    gstart = np.empty(len(sk), dtype=bool)
    if len(sk):
        gstart[0] = True
        gstart[1:] = (sk[1:] != sk[:-1]) | (sr[1:] != sr[:-1])
    gidx = np.nonzero(gstart)[0]
    counts = np.diff(np.append(gidx, len(sk)))
    return order[np.repeat(counts >= 2, counts)]


def line_repetition_arrays(text_arr) -> dict[str, np.ndarray]:
    """The Gopher line/paragraph repetition signals (Rae et al. 2021
    Table A1 rows 1-4), vectorized:

    - ``dup_line_frac``       duplicate lines / lines
    - ``dup_line_char_frac``  chars in duplicate lines / chars
    - ``dup_para_frac``       duplicate paragraphs / paragraphs
    - ``dup_para_char_frac``  chars in duplicate paragraphs / chars

    A "line" is a ``\\n`` split segment; a "paragraph" is a maximal
    run of non-empty lines (the blank-line-separated block — same
    blocks ``\\n\\n`` splitting yields on normalized text).  A segment
    is *duplicate* when its content occurs 2+ times in the SAME
    document.  Line identity = FULL-content Horner (the prefix-sum
    form, O(bytes) — lines routinely exceed the 128-byte word cap, so
    a prefix hash would falsely merge long same-prefix lines);
    paragraph identity = full Horner over the member line keys.
    Checked against a plain-Python reference in tests, including the
    long-same-prefix regime."""
    import pyarrow.compute as pc

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    data, off = _string_byte_view(text_arr)
    n = len(off) - 1
    n_chars = np.nan_to_num(
        pc.utf8_length(text_arr).to_numpy(zero_copy_only=False).astype(np.float64))
    safe_chars = np.maximum(n_chars, 1.0)

    starts, ends, lrow, lper = _segments(data, off, ord("\n"))
    lens = ends - starts
    line_bytes = data[np.repeat(starts, lens)
                      + (np.arange(int(lens.sum()), dtype=np.int64)
                         - np.repeat(np.r_[np.zeros(1, np.int64),
                                           np.cumsum(lens)[:-1]], lens))] \
        if lens.sum() else np.empty(0, np.uint8)
    lkey = _segmented_horner(line_bytes, lens)
    clen = _char_counts(data, starts, ends)

    def dup_stats(keys, rows, sizes, per_row):
        """(dup_count/total, dup_size/row_size) per row for one
        segment family."""
        sel = _dup_occurrences(keys, rows)
        dup_cnt = np.bincount(rows[sel], minlength=n).astype(np.float64)
        dup_sz = np.bincount(rows[sel], weights=sizes[sel],
                             minlength=n).astype(np.float64)
        frac = dup_cnt / np.maximum(per_row, 1.0)
        return frac, dup_sz

    lper_f = lper.astype(np.float64)
    line_frac, line_sz = dup_stats(lkey, lrow, clen.astype(np.float64), lper_f)

    # paragraphs: runs of non-empty lines within a row
    nonempty = lens > 0
    first_line = np.zeros(len(lens), dtype=bool)
    row_first = np.zeros(n, dtype=np.int64)
    np.cumsum(lper[:-1], out=row_first[1:])
    first_line[row_first[lper > 0]] = True
    prev_empty = np.empty(len(lens), dtype=bool)
    if len(lens):
        prev_empty[0] = True
        prev_empty[1:] = ~nonempty[:-1]
    para_start = nonempty & (first_line | prev_empty)
    para_id = np.cumsum(para_start) - 1  # global id; only valid on nonempty
    if len(lens) and para_start.any():
        pidx = np.nonzero(para_start)[0]
        n_paras = len(pidx)
        prow = lrow[pidx]
        # full Horner over member line keys — member lines are already
        # paragraph-major (paragraphs are contiguous line runs), so
        # the O(total members) segmented form applies directly
        memb = np.nonzero(nonempty)[0]
        mpara = para_id[memb]
        counts_per_para = np.bincount(mpara, minlength=n_paras)
        pchars = np.bincount(mpara, weights=clen[memb],
                             minlength=n_paras)
        ph = _segmented_horner(lkey[memb], counts_per_para)
        paras_per_row = np.bincount(prow, minlength=n).astype(np.float64)
        para_frac, para_sz = dup_stats(ph, prow, pchars, paras_per_row)
    else:
        para_frac = np.zeros(n, dtype=np.float64)
        para_sz = np.zeros(n, dtype=np.float64)

    out = {
        "dup_line_frac": sql_round(line_frac, ROUND_DIGITS),
        "dup_line_char_frac": sql_round(line_sz / safe_chars, ROUND_DIGITS),
        "dup_para_frac": sql_round(para_frac, ROUND_DIGITS),
        "dup_para_char_frac": sql_round(para_sz / safe_chars, ROUND_DIGITS),
    }
    if text_arr.null_count:
        out["_null_mask"] = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
    return out


def add_line_repetition(ds, col: str = "text"):
    """Append the Gopher line/paragraph duplicate-fraction columns."""

    def f(t: pa.Table) -> pa.Table:
        stats = line_repetition_arrays(t[col])
        isnull = stats.pop("_null_mask", None)
        for name, vals in stats.items():
            t = t.append_column(
                name, pa.array(vals, mask=isnull) if isnull is not None else pa.array(vals))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)
