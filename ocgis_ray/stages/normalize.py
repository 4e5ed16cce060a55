"""Unicode text normalization — the cleaning cascade's first mile.

No reference analog (the reference normalizes array units, not text;
``/root/reference/src/ocgis/util/units.py``); this is the standard
CCNet/fastText-style preprocessing every web-text pipeline applies
before hashing, LM scoring or tokenization: canonical Unicode form
(NFC/NFKC), control-character strip, accent folding, case folding and
whitespace collapse.

Control strip, case fold and whitespace collapse are Arrow-vectorized
(RE2 ``replace_substring_regex``, ``utf8_lower/trim``).  The canonical
FORM step can NOT use ``pc.utf8_normalize``: this pyarrow build's
kernel decomposes + reorders but never RE-composes (verified:
NFC("e"+U+0301) stays decomposed), silently diverging from every
other NFC implementation.  Forms therefore go through stdlib
``unicodedata.normalize`` (a C function) guarded by a vectorized
pure-ASCII fast path (``pc.string_is_ascii``) — web corpora are
ASCII-dominated, so most batches never enter the Python loop at all.
The DuckDB twin (``normalize_text_sql``) replays the SQL-expressible
subset exactly (NFC + lower + control strip + whitespace collapse;
DuckDB's regexp_* is RE2 too); NFKC and accent-strip have no DuckDB
equivalent (``strip_accents`` folds ligatures differently from
Mn-removal) and are pytest-covered instead.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# C0 controls minus \t\n\r, plus DEL — the characters C4/CCNet drop
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_WS_RE = r"\s+"
_EDGE_WS_RE = r"^\s+|\s+$"


def _form_normalize(arr, form: str):
    """``unicodedata.normalize(form, ...)`` with the ASCII fast path.

    All-ASCII batches (the common case) return the input array
    untouched — one vectorized ``string_is_ascii`` + ``all``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    ascii_mask = pc.string_is_ascii(arr)
    if pc.all(ascii_mask).as_py() is not False:   # True or empty/all-null
        return arr
    # mixed batch: materialize once, normalize ONLY the non-ASCII rows
    # (the rebuild is unavoidable; the C-speed loop is not)
    import numpy as np

    obj = arr.to_numpy(zero_copy_only=False)
    am = ascii_mask.to_numpy(zero_copy_only=False)
    for i in np.nonzero(~(am.astype(bool)))[0]:
        v = obj[i]
        if v is not None:
            obj[i] = unicodedata.normalize(form, v)
    return pa.array(obj, type=arr.type)


def normalize_text_array(arr, form: str = "NFC", lower: bool = False,
                         strip_accents: bool = False,
                         strip_control: bool = True,
                         collapse_whitespace: bool = True):
    """Normalize one Arrow string array; returns a new array.

    Order (fixed, mirrored by the SQL twin): canonical form ->
    control strip -> accent fold (NFD, drop Mn, re-form) -> lower ->
    whitespace collapse + trim."""
    if form:
        arr = _form_normalize(arr, form)
    if strip_control:
        arr = pc.replace_substring_regex(arr, pattern=_CONTROL_RE,
                                         replacement="")
    if strip_accents:
        arr = _form_normalize(arr, "NFD")
        arr = pc.replace_substring_regex(arr, pattern=r"\p{Mn}",
                                         replacement="")
        arr = _form_normalize(arr, form or "NFC")
    if lower:
        arr = pc.utf8_lower(arr)
    if collapse_whitespace:
        arr = pc.replace_substring_regex(arr, pattern=_WS_RE,
                                         replacement=" ")
        # edge-trim with the SAME RE2 class the collapse used —
        # utf8_trim_whitespace trims the Unicode WS set (U+2028, NBSP,
        # U+3000...) that DuckDB's trim() and RE2's \s do NOT, which
        # would silently diverge from the SQL twin on non-ASCII edges
        arr = pc.replace_substring_regex(arr, pattern=_EDGE_WS_RE,
                                         replacement="")
    return arr


def normalize_text(ds, col: str = "text", out: str | None = None,
                   form: str = "NFC", lower: bool = False,
                   strip_accents: bool = False, strip_control: bool = True,
                   collapse_whitespace: bool = True,
                   batch_size: int = 8192):
    """Dataset version: one zero-copy Arrow pass, no Python rows.

    ``out=None`` rewrites ``col`` in place (the cascade default);
    name ``out`` to keep the raw text alongside."""
    dst = out or col

    def f(t: pa.Table) -> pa.Table:
        norm = normalize_text_array(
            t[col], form=form, lower=lower, strip_accents=strip_accents,
            strip_control=strip_control,
            collapse_whitespace=collapse_whitespace)
        if dst in t.column_names:
            return t.set_column(t.schema.get_field_index(dst), dst, norm)
        return t.append_column(dst, norm)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def normalize_text_sql(expr: str, form: str = "NFC", lower: bool = False,
                       strip_control: bool = True,
                       collapse_whitespace: bool = True) -> str:
    """DuckDB fragment replaying :func:`normalize_text_array` exactly
    for the SQL-expressible subset (NFC / lower / control strip /
    whitespace collapse — both sides run RE2, so the regex semantics
    match byte for byte).  ``form`` must be "NFC" or "" and
    ``strip_accents`` is unsupported (DuckDB's ``strip_accents`` folds
    ligatures differently from Mn-removal)."""
    if form not in ("", "NFC"):
        raise ValueError("SQL twin supports form='NFC' or '' only")
    s = expr
    if form:
        s = f"nfc_normalize({s})"
    if strip_control:
        s = (f"regexp_replace({s}, "
             f"'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')")
    if lower:
        s = f"lower({s})"
    if collapse_whitespace:
        s = f"regexp_replace({s}, '\\s+', ' ', 'g')"
        s = f"regexp_replace({s}, '^\\s+|\\s+$', '', 'g')"
    return s
