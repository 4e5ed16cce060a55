"""Text analysis: token counts, quality scores, language ID,
document fingerprinting.

First-class training-data-pipeline operators over the ``documents`` /
pages text column (no reference analog — the reference's scalar-
function surface is thin, SURVEY §2.7).  SQL-parity notes per kernel:

- ``token_count`` counts ``split(' ')`` fields == DuckDB
  ``len(string_split(text, ' '))`` (empty fields included — parity is
  with the SQL function, not Python ``str.split()``'s collapsing).
- ``alpha_ratio``/``punct_ratio`` use the same regex class as the
  generated oracle SQL; ratios are rounded on both sides.
- language ID and fingerprints are hash/heuristic kernels with no SQL
  twin — they get rows-only oracle checks plus pytest assertions.
"""

from __future__ import annotations

import numpy as np

from ocgis_ray.parity import sql_round
import pandas as pd
import pyarrow as pa

ROUND_DIGITS = 6

# explicit batch size for the byte-view kernel map stages: Ray's
# pyarrow default hands WHOLE BLOCKS (a 180 MB text block blows the
# cache — measured 4-10x slower than 4k-row batches), and on pandas
# upstream blocks it also bounds the per-batch conversion
KERNEL_BATCH_SIZE = 4096

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "for", "with", "on"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "los", "las"},
    "de": {"der", "die", "das", "und", "in", "von", "mit", "ist", "den", "ein"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
    "zh": {"的", "了", "是", "在", "我", "有", "和", "就", "不", "人"},
}


ALPHA_BYTES = bytes(range(ord("A"), ord("Z") + 1)) + bytes(range(ord("a"), ord("z") + 1))
PUNCT_BYTES = b".,!?;:"
SPACE_BYTE = b" "


def _string_byte_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string array -> (utf8 data bytes, int64 offsets[n+1]).

    Zero-copy views into the Arrow buffers; the basis of the byte-LUT
    counting kernels (sub-us/row — regex engines count the same
    classes 30-40x slower).

    The view is REBASED to the array's window: ``data`` is the slice
    ``[off[0], off[-1])`` of the parent buffer and offsets start at 0.
    Sliced arrays (Ray's zero-copy batches share one block buffer)
    would otherwise make every whole-buffer pass (``data == sep``,
    cumsum LUTs) cost O(block) per batch instead of O(batch) —
    measured 3x on a 62k-row block cut into 8k batches."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    off = off.astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    if lo > 0 or hi < len(data):
        data = data[lo:hi]
        off = off - lo
    return data, off


def byte_class_counts(arr, class_bytes: bytes, view=None) -> np.ndarray:
    """Per-row count of bytes in ``class_bytes`` (ASCII classes only —
    multi-byte utf8 sequences can't collide with ASCII ranges, so byte
    counts equal char counts for these classes).  Pass a precomputed
    ``view = _string_byte_view(arr)`` when counting several classes
    over the same column (avoids re-materializing the buffers)."""
    data, off = _string_byte_view(arr) if view is None else view
    lut = np.zeros(256, dtype=np.uint8)
    lut[list(class_bytes)] = 1
    cum = np.empty(len(data) + 1, dtype=np.int64)
    cum[0] = 0
    np.cumsum(lut[data], out=cum[1:])
    return cum[off[1:]] - cum[off[:-1]]


def text_stats_arrays(text_arr) -> dict[str, np.ndarray]:
    """Vectorized stats over an Arrow string column (shared by
    ``add_text_stats`` and the fused flagship worker); outputs match
    the DuckDB oracle SQL exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    data, off = _string_byte_view(text_arr)
    n_chars = pc.utf8_length(text_arr).to_numpy(zero_copy_only=False).astype(np.float64)
    # one pass for all three classes: bit-packed per-byte LUT
    # (space -> 1, alpha -> 2^21, punct -> 2^42; per-row counts stay
    # far below 2^21 for any sane block's row, so fields don't carry)
    lut = np.zeros(256, dtype=np.int64)
    lut[list(SPACE_BYTE)] += 1
    lut[list(ALPHA_BYTES)] += 1 << 21
    lut[list(PUNCT_BYTES)] += 1 << 42
    cum = np.empty(len(data) + 1, dtype=np.int64)
    cum[0] = 0
    np.cumsum(lut[data], out=cum[1:])
    packed = cum[off[1:]] - cum[off[:-1]]
    mask = (1 << 21) - 1
    tokens = (packed & mask) + 1  # == len(string_split(s,' '))
    alpha = ((packed >> 21) & mask).astype(np.float64)
    punct = ((packed >> 42) & mask).astype(np.float64)
    safe_n = np.maximum(n_chars, 1.0)
    alpha_ratio = alpha / safe_n
    punct_ratio = punct / safe_n
    quality = (
        0.5 * alpha_ratio
        + 0.3 * np.minimum(1.0, tokens.astype(np.float64) / 100.0)
        + 0.2 * (1.0 - punct_ratio)
    )
    out = {
        "token_count": tokens,
        "alpha_ratio": sql_round(alpha_ratio, ROUND_DIGITS),
        "punct_ratio": sql_round(punct_ratio, ROUND_DIGITS),
        "quality_score": sql_round(quality, ROUND_DIGITS),
    }
    # NULL text rows must come out NULL (the SQL twin's semantics),
    # not token_count=1 / NaN ratios from the zeroed byte view
    if text_arr.null_count:
        isnull = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
        out["_null_mask"] = isnull
    return out


def add_text_stats(ds, col: str = "text"):
    """token_count, alpha_ratio, punct_ratio, quality_score columns —
    byte-LUT vectorized, oracle-checkable; NULL text rows yield NULL
    stats (matching the SQL twin)."""
    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        stats = text_stats_arrays(t[col])
        isnull = stats.pop("_null_mask", None)
        for name, vals in stats.items():
            t = t.append_column(name, pa.array(vals, mask=isnull)
                                if isnull is not None else pa.array(vals))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def text_stats_sql(col: str = "text") -> dict[str, str]:
    """Select-list fragments matching :func:`add_text_stats` exactly."""
    n = f"greatest(CAST(length({col}) AS DOUBLE), 1.0)"
    alpha = f"CAST(length(regexp_replace({col}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    punct = f"CAST(length(regexp_replace({col}, '[^.,!?;:]', '', 'g')) AS DOUBLE)"
    tokens = f"CAST(len(string_split({col}, ' ')) AS BIGINT)"
    return {
        "token_count": tokens,
        "alpha_ratio": f"round({alpha} / {n}, {ROUND_DIGITS})",
        "punct_ratio": f"round({punct} / {n}, {ROUND_DIGITS})",
        "quality_score": (
            f"round(0.5 * ({alpha} / {n}) + 0.3 * least(1.0, CAST({tokens} AS DOUBLE) / 100.0)"
            f" + 0.2 * (1.0 - ({punct} / {n})), {ROUND_DIGITS})"
        ),
    }


# ---------------------------------------------------------------- hashing

_FNV = np.uint64(1099511628211)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized) — decorrelates the polynomial
    hash so min-selection isn't biased toward low-byte windows."""
    h = np.asarray(h, dtype=np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def _horner_hash_bytes(b: bytes, max_len: int = 64) -> np.uint64:
    """Scalar twin of the vectorized Horner token hash (build side)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        h = np.uint64(0)
        for c in b[:max_len]:
            h = h * _FNV + np.uint64(c)
        return np.uint64(_mix64(np.asarray([h]))[0])


def token_entropy_values(arr) -> np.ndarray:
    """Shannon entropy (nats) of each document's own unigram token
    distribution: ``H = ln(n) - (Σ c·ln c)/n`` over per-(doc, token)
    counts ``c`` — the vocabulary-diversity quality signal (low H =
    repetitive/templated text).  Vectorized: one tokenize pass, one
    lexsort for (row, hash) run-lengths.  Empty docs score 0.0."""
    h, tok_row, per_row = _tokenize_hash(arr, lower=True)
    n_rows = len(per_row)
    out = np.zeros(n_rows, dtype=np.float64)
    if not h.size:
        return out
    order = np.lexsort((h, tok_row))
    sh, sr = h[order], tok_row[order]
    gstart = np.empty(len(sh), dtype=bool)
    gstart[0] = True
    gstart[1:] = (sh[1:] != sh[:-1]) | (sr[1:] != sr[:-1])
    gidx = np.nonzero(gstart)[0]
    c = np.diff(np.append(gidx, len(sh))).astype(np.float64)
    clogc = c * np.log(c)
    rows = sr[gidx]
    sums = np.bincount(rows, weights=clogc, minlength=n_rows)
    nz = per_row > 0
    nf = per_row.astype(np.float64)
    out[nz] = np.log(nf[nz]) - sums[nz] / nf[nz]
    return out


def add_token_entropy(ds, col: str = "text", out: str = "token_entropy",
                      round_digits: int | None = None):
    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        vals = token_entropy_values(arr)
        if round_digits is not None:
            from ocgis_ray.parity import sql_round

            vals = sql_round(vals, round_digits)
        return t.append_column(out, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def token_entropy_sql(col: str = "text", round_digits: int = 6) -> str:
    """Per-row SELECT fragment twin of :func:`add_token_entropy`: the
    same token hashes (``parity`` fragments), per-distinct counts via
    list ops, the same two-term entropy form, both sides rounded
    (list_sum order vs reduceat order drifts ~1e-15)."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    hs = sql_token_hash_list(sql_tokens(col), lower=True)
    n = "CAST(len(hs) AS DOUBLE)"
    # per-distinct count c appears twice (c and ln(c)) — DuckDB list
    # lambdas have no let-binding, so the filter runs twice per
    # distinct token; fine at per-row list sizes
    clogc = ("list_sum(list_transform(list_distinct(hs), x -> "
             "CAST(len(list_filter(hs, y -> y = x)) AS DOUBLE) "
             "* ln(CAST(len(list_filter(hs, y -> y = x)) AS DOUBLE))))")
    return (f"(SELECT round(CASE WHEN len(hs) = 0 THEN 0.0 "
            f"ELSE ln({n}) - ({clogc}) / {n} END, {round_digits}) "
            f"FROM (SELECT {hs} AS hs) __te)")


def string_value_hash(arr) -> np.ndarray:
    """Full-content Horner+splitmix hash per string VALUE
    (case-preserving, no length cap, whitespace included) — the
    SQL-twinnable whole-string hash (``parity.sql_string_hash``).
    Null and empty values both hash ``mix64(0)`` (the SQL twin
    coalesces NULL to '')."""
    from ocgis_ray.stages.quality import _segmented_horner

    data, off = _string_byte_view(arr)
    return _segmented_horner(data, np.diff(off).astype(np.int64))


_WS_BYTES = b" \t\n\r\x0b\x0c"
_LOWER_LUT = np.arange(256, dtype=np.uint8)
_LOWER_LUT[ord("A"): ord("Z") + 1] += 32
_WS_LUT = np.zeros(256, dtype=bool)
_WS_LUT[list(_WS_BYTES)] = True

_TOKEN_HASH_MAX_LEN = 64


def _tokenize_hash(arr, lower: bool = True, with_spans: bool = False):
    """Arrow string column -> (token_hashes, token_row, tokens_per_row).

    Fully vectorized over the zero-copy byte view: ASCII-lowercase via
    LUT (``lower=True``), ASCII-whitespace token boundaries (rows
    always break tokens), Horner polynomial hash per token (loop over
    CHAR POSITION, not tokens — ~12 vector ops for typical text).
    Tokens longer than 64 bytes hash their prefix (no stopword is near
    that long).

    ``with_spans=True`` appends ``(byte_buffer, tok_starts, tok_lens)``
    to the tuple so callers can materialize the (lowercased) token
    STRINGS from the same pass (``quality._gather_strings``) — the
    buffer is the lowered copy when ``lower=True``, else the raw
    view; spans cover FULL token length (only the hash is capped)."""
    data, off = _string_byte_view(arr)
    n = len(off) - 1
    if len(data) == 0:
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
                 np.zeros(n, np.int64))
        if with_spans:
            return empty + (np.empty(0, np.uint8),
                            np.empty(0, np.int64), np.empty(0, np.int64))
        return empty
    low = _LOWER_LUT[data] if lower else data
    ws = _WS_LUT[low]
    nonws = ~ws
    prev = np.empty(len(data), dtype=bool)
    prev[0] = False
    prev[1:] = nonws[:-1]
    row_starts = off[:-1][off[:-1] < len(data)]
    prev[row_starts] = False  # a row boundary always breaks a token
    tok_starts = np.nonzero(nonws & ~prev)[0]
    # token end = first whitespace or row end after the start
    breaks = np.union1d(np.nonzero(ws)[0], off[1:])
    tok_ends = breaks[np.searchsorted(breaks, tok_starts, side="right")]
    tok_lens = tok_ends - tok_starts
    # Horner over byte position (vectorized across tokens)
    h = np.zeros(tok_starts.shape, dtype=np.uint64)
    lmax = int(min(tok_lens.max(), _TOKEN_HASH_MAX_LEN)) if tok_lens.size else 0
    for u in range(lmax):
        act = tok_lens > u
        # gather uint8, let the add promote (no full-buffer widening)
        h[act] = h[act] * _FNV + low[tok_starts[act] + u]
    h = _mix64(h)
    tok_row = np.searchsorted(off[1:], tok_starts, side="right").astype(np.int64)
    tokens_per_row = np.bincount(tok_row, minlength=n).astype(np.int64)
    if with_spans:
        return (h, tok_row, tokens_per_row, low,
                tok_starts.astype(np.int64), tok_lens.astype(np.int64))
    return h, tok_row, tokens_per_row


class LangIdStage:
    """Actor-pool language ID: stopword-profile scoring.

    Stopword hash tables are built once per actor (``__init__``);
    scoring is fully vectorized — one tokenize+hash pass over the
    batch's zero-copy byte view, sorted-array membership per language,
    per-row hit fractions via ``bincount``, argmax with deterministic
    lexicographic tiebreak.  A heuristic stopword identifier per the
    build brief — NOT a model; the plumbing (actor pool, batch
    scoring) is what a fasttext-style model would use.

    Tokenization is ASCII-lowercase + ASCII-whitespace split (the
    vectorizable subset of ``str.lower().split()``; stopword profiles
    are ASCII or multi-byte CJK, both unaffected)."""

    def __init__(self):
        self.langs = sorted(STOPWORDS)
        self.tables = [
            np.sort(np.asarray(
                [_horner_hash_bytes(w.encode("utf-8")) for w in STOPWORDS[lang]],
                dtype=np.uint64,
            ))
            for lang in self.langs
        ]

    def __call__(self, t: pa.Table) -> pa.Table:
        arr = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) \
            else t["text"]
        h, tok_row, per_row = _tokenize_hash(arr)
        n = len(t)
        scores = np.zeros((len(self.langs), n), dtype=np.float64)
        safe = np.maximum(per_row, 1).astype(np.float64)
        for i, table in enumerate(self.tables):
            pos = np.searchsorted(table, h)
            pos_c = np.minimum(pos, table.size - 1)
            member = (table[pos_c] == h).astype(np.float64)
            scores[i] = np.bincount(tok_row, weights=member, minlength=n) / safe
        best = scores.argmax(axis=0)  # ties -> first = lexicographic min
        best_score = scores.max(axis=0)
        langs = np.asarray(self.langs, dtype=object)
        pred = np.where(best_score > 0.0, langs[best], "und")
        return t.append_column("lang_pred", pa.array(pred, type=pa.string()))


def add_lang_pred(ds, concurrency=None):
    """Default is a stateless task stage (``tuning.task_stage``; the
    stopword tables build in ~ms, cached per worker process) so langid
    stacks with other scorers without pool-capacity deadlock; pass
    ``concurrency`` for a dedicated actor pool."""
    from ocgis_ray.tuning import task_stage

    if concurrency is None:
        return ds.map_batches(task_stage(LangIdStage),
                              batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=KERNEL_BATCH_SIZE)
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=concurrency,
                          batch_size=KERNEL_BATCH_SIZE)


def add_fingerprint(ds, col: str = "text", k: int = 8, out: str = "fingerprint"):
    """Winnowing-style document fingerprint: min rolling byte-k-gram
    hash (deterministic int64).  Near-identical texts share it; used
    as a cheap pre-cluster key.

    Vectorized: ONE Horner pass builds every window hash over the
    batch's zero-copy byte view (k vector ops total), row-boundary-
    crossing windows are excluded with a segment gather, and per-row
    minima come from ``np.minimum.reduceat`` — no per-doc Python, no
    k-gram string materialization."""

    def f(t: pa.Table) -> pa.Table:
        text_arr = t[col]
        if isinstance(text_arr, pa.ChunkedArray):
            text_arr = text_arr.combine_chunks()
        data, off = _string_byte_view(text_arr)
        n = len(off) - 1
        fps = np.zeros(n, dtype=np.uint64)
        lens = off[1:] - off[:-1]
        valid_counts = np.maximum(lens - k + 1, 0)
        nz = valid_counts > 0
        if len(data) >= k and nz.any():
            nwin = len(data) - k + 1
            h = np.zeros(nwin, dtype=np.uint64)
            for u in range(k):
                h = h * _FNV + data[u: nwin + u]
            h = _mix64(h)
            cnts = valid_counts[nz]
            seg_starts = np.concatenate([[0], np.cumsum(cnts)[:-1]])
            within = np.arange(int(cnts.sum())) - np.repeat(seg_starts, cnts)
            vals = h[np.repeat(off[:-1][nz], cnts) + within]
            fps[nz] = np.minimum.reduceat(vals, seg_starts)
        short = ~nz
        if short.any():
            # rows shorter than k: Horner over the whole row
            s_off = off[:-1][short]
            s_len = lens[short]
            hs = np.zeros(int(short.sum()), dtype=np.uint64)
            for u in range(int(s_len.max()) if s_len.size else 0):
                act = s_len > u
                hs[act] = hs[act] * _FNV + data[s_off[act] + u]
            fps[short] = _mix64(hs)
        return t.append_column(out, pa.array(fps.view(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def fingerprint_sql(col: str = "text", k: int = 8,
                    table: str = "documents",
                    id_col: str = "doc_id",
                    out: str = "fingerprint") -> str:
    """DuckDB twin of :func:`add_fingerprint`, BIT-EXACT.

    Reproduces the uint64 FNV-Horner window hash + splitmix64 + min
    in SQL via the HUGEINT fragments in :mod:`ocgis_ray.parity`
    (``% 2**64`` after every step; split multiplies for the 64x64-bit
    products).  The guarded Horner covers the short-row tail exactly
    like the kernel: rows with fewer than ``k`` bytes hash their full
    byte sequence, empty rows hash to ``mix(0) == 0``."""
    from ocgis_ray.parity import (
        SQL_FNV,
        SQL_P64,
        sql_hexpair_byte,
        sql_mix64_list,
    )

    byte_p = sql_hexpair_byte("hx", "p")
    # guarded Horner over bytes i..i+k-1 (guards only bind on the
    # single short-row window i=1, where i+u <= L trims the tail)
    horner = "0::HUGEINT"
    for u in range(k):
        horner = (f"(CASE WHEN i + {u} <= L THEN "
                  f"(({horner}) * {SQL_FNV} + bs[i + {u}]) % {SQL_P64} "
                  f"ELSE ({horner}) END)")
    windows = f"list_transform(range(1, greatest(L - {k - 2}, 2)), i -> {horner})"
    return f"""
WITH fph AS (
  SELECT {id_col},
         octet_length(encode(coalesce({col}, ''))) AS L,
         hex(encode(coalesce({col}, ''))) AS hx
  FROM {table}
), fpb AS (
  SELECT {id_col}, L,
         list_transform(range(1, L + 1), p -> ({byte_p})::HUGEINT) AS bs
  FROM fph
), fpm AS (
  SELECT {id_col}, list_min({sql_mix64_list(windows)}) AS fp
  FROM fpb
)
SELECT {id_col},
       CAST(CASE WHEN fp >= {1 << 63} THEN fp - {SQL_P64} ELSE fp END
            AS BIGINT) AS {out}
FROM fpm
"""


def langid_sql(col: str = "text", table: str = "documents",
               id_col: str = "doc_id") -> str:
    """DuckDB twin of :class:`LangIdStage`, BIT-EXACT.

    Token hashes are recomputed in SQL (``parity.sql_token_hash_list``,
    the proven ``_tokenize_hash`` twin) and membership is tested
    against the per-language stopword HASH literals generated here
    with the same ``_horner_hash_bytes`` the stage uses — so even a
    hash collision (non-stopword token colliding into a profile)
    scores identically on both sides.  Scores are
    ``hits / max(ntok, 1)`` in DOUBLE (same IEEE division), argmax
    with the stage's lexicographic-first tiebreak, ``'und'`` on zero."""
    from ocgis_ray.parity import sql_token_hash_list, sql_tokens

    langs = sorted(STOPWORDS)
    hash_lits = {
        lang: sorted(int(_horner_hash_bytes(w.encode("utf-8")))
                     for w in STOPWORDS[lang])
        for lang in langs
    }
    score_cols = ",\n         ".join(
        f"CAST(len(list_filter(hs, h -> h IN "
        f"({', '.join(f'{v}::HUGEINT' for v in hash_lits[lang])}))) AS DOUBLE)"
        f" / greatest(len(hs), 1) AS s_{lang}"
        for lang in langs
    )
    # first lang (sorted order) attaining the max == argmax tiebreak
    pred = "CASE "
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} >= s_{other}" for other in langs[i + 1:]]
        cond = " AND ".join(conds) if conds else "TRUE"
        pred += f"WHEN {cond} THEN '{lang}' "
    pred += "END"
    best = f"greatest({', '.join(f's_{lang}' for lang in langs)})"
    return f"""
WITH toks AS (
  SELECT {id_col},
         {sql_token_hash_list(sql_tokens(col), lower=True)} AS hs
  FROM {table}
), scored AS (
  SELECT {id_col},
         {score_cols}
  FROM toks
)
SELECT {id_col},
       CASE WHEN {best} > 0.0 THEN {pred} ELSE 'und' END AS lang_pred
FROM scored
"""


# ------------------------------------------------- BPE-ish token count

# GPT-2-family pre-tokenizer, RE2-compatible (no lookahead): an
# optional leading space glued to a letter/digit/symbol run, or a
# space run.  DuckDB's regexp_extract_all over this pattern counts the
# same tokens byte-for-byte.
BPE_SPLIT_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

_BPE_CLS = np.full(256, 3, dtype=np.uint8)  # other
_BPE_CLS[ord(" ")] = 0
_BPE_CLS[ord("A"): ord("Z") + 1] = 1
_BPE_CLS[ord("a"): ord("z") + 1] = 1
_BPE_CLS[ord("0"): ord("9") + 1] = 2


def bpe_token_count_arrays(text_arr) -> tuple[np.ndarray, np.ndarray | None]:
    """Tokens per row under :data:`BPE_SPLIT_PATTERN` — vectorized run
    counting instead of a regex engine.

    The pattern's tokenization is equivalent to counting maximal
    same-class byte runs (space / letter / digit / other; UTF-8
    continuation bytes share the lead byte's "other" class so a
    multi-byte char never splits a run), where a LENGTH-1 space run
    followed by a non-space run in the same row glues onto that run
    (" ?X+") and contributes no token of its own.  Verified
    exhaustively against DuckDB ``len(regexp_extract_all(...))`` in
    tests.  Returns (counts, null_mask_or_None)."""
    import pyarrow.compute as pc

    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    data, off = _string_byte_view(text_arr)
    n = len(off) - 1
    counts = np.zeros(n, dtype=np.int64)
    if len(data):
        cls = _BPE_CLS[data]
        rs = np.empty(len(data), dtype=bool)
        rs[0] = True
        rs[1:] = cls[1:] != cls[:-1]
        row_starts = off[:-1][off[:-1] < len(data)]
        rs[row_starts] = True  # runs never cross row boundaries
        p = np.nonzero(rs)[0]
        run_end = np.append(p[1:], len(data))
        run_cls = cls[p]
        run_row = np.searchsorted(off[1:], p, side="right").astype(np.int64)
        run_len = run_end - p
        last_in_row = run_end == off[run_row + 1]
        glued_space = (run_cls == 0) & (run_len == 1) & ~last_in_row
        counts = np.bincount(run_row[~glued_space], minlength=n).astype(np.int64)
    null_mask = None
    if text_arr.null_count:
        null_mask = pc.is_null(text_arr).to_numpy(zero_copy_only=False)
    return counts, null_mask


def add_bpe_token_count(ds, col: str = "text", out: str = "bpe_token_count"):
    """Append the BPE-ish pre-tokenizer token count (see
    :data:`BPE_SPLIT_PATTERN`); NULL text rows yield NULL."""

    def f(t: pa.Table) -> pa.Table:
        counts, mask = bpe_token_count_arrays(t[col])
        return t.append_column(
            out, pa.array(counts, mask=mask) if mask is not None else pa.array(counts))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                        batch_size=KERNEL_BATCH_SIZE)


def bpe_token_count_sql(col: str = "text") -> str:
    return (f"CAST(len(regexp_extract_all({col}, "
            f"'{BPE_SPLIT_PATTERN}')) AS BIGINT)")
