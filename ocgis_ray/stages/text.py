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
    classes 30-40x slower)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data, off.astype(np.int64)


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
    return {
        "token_count": tokens,
        "alpha_ratio": sql_round(alpha_ratio, ROUND_DIGITS),
        "punct_ratio": sql_round(punct_ratio, ROUND_DIGITS),
        "quality_score": sql_round(quality, ROUND_DIGITS),
    }


def add_text_stats(ds, col: str = "text"):
    """token_count, alpha_ratio, punct_ratio, quality_score columns —
    byte-LUT vectorized, oracle-checkable."""
    import pyarrow as pa

    def f(t: pa.Table) -> pa.Table:
        stats = text_stats_arrays(t[col])
        for name, vals in stats.items():
            t = t.append_column(name, pa.array(vals))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


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


class LangIdStage:
    """Actor-pool language ID: stopword-profile scoring.

    Sets are built once per actor (``__init__``); scoring is a token
    membership fraction per language, argmax with deterministic 'en'
    tiebreak.  A heuristic n-gram/stopword identifier per the build
    brief — NOT a model; the plumbing (actor pool, batch scoring) is
    what a fasttext-style model would use."""

    def __init__(self):
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}
        self.langs = sorted(self.profiles)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in df["text"]:
            toks = t.lower().split()
            if not toks:
                preds.append("und")
                continue
            scores = {
                lang: sum(tok in ws for tok in toks) / len(toks)
                for lang, ws in self.profiles.items()
            }
            best = max(scores.values())
            if best == 0.0:
                preds.append("und")
            else:
                preds.append(min(l for l, s in scores.items() if s == best))
        df = df.copy()
        df["lang_pred"] = preds
        return df


def add_lang_pred(ds, concurrency: int | None = 4):
    return ds.map_batches(LangIdStage, batch_format="pandas", concurrency=concurrency)


def add_fingerprint(ds, col: str = "text", k: int = 8, out: str = "fingerprint"):
    """Winnowing-style document fingerprint: min rolling char-k-gram
    hash (deterministic int64).  Near-identical texts share it; used
    as a cheap pre-cluster key."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(df[col]):
            if len(t) < k:
                grams = np.asarray([t], dtype=object)
            else:
                grams = np.asarray([t[j : j + k] for j in range(len(t) - k + 1)],
                                   dtype=object)
            fps[i] = int(pd.util.hash_array(grams).min())
        df = df.copy()
        df[out] = fps
        return df

    return ds.map_batches(f, batch_format="pandas")
