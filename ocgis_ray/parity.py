"""Float-parity helpers shared by engine kernels and oracle SQL.

The driver's correctness gate hash-compares values, so float outputs
must be BIT-identical to what DuckDB computes.  DuckDB's ``round(x, d)``
on DOUBLE is round-half-away-from-zero implemented as
``trunc(x * 10^d + copysign(0.5, x)) / 10^d`` (verified empirically,
exact on 20k random + exact-binary-half samples); numpy's ``np.round``
is banker's (half-to-even) and DIFFERS on exact halves — which clip
areas and char ratios hit routinely (binary-fraction cell sizes).

Every oracle-facing rounding in the engine goes through
:func:`sql_round`.
"""

from __future__ import annotations

import numpy as np


def sql_round(x: np.ndarray | float, digits: int) -> np.ndarray:
    """Bit-exact mirror of DuckDB ``round(x_double, digits)``."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** digits
    scaled = x * p
    return np.trunc(scaled + np.copysign(0.5, scaled)) / p


# ------------------------------------------------------------------
# uint64 hash parity: SQL fragments that reproduce the engine's
# FNV-Horner + splitmix64 hashing (stages/text.py `_tokenize_hash` /
# `_mix64`, stages/dedup.py shingles) BIT-EXACTLY in DuckDB.
#
# DuckDB integers raise on overflow instead of wrapping, so all
# arithmetic runs in HUGEINT (int128) with explicit `% 2^64`.  A
# uint64 x uint64 product can overflow int128; `sql_umul64` splits the
# left operand into 32-bit halves so every partial product stays under
# 2^96.  `xor` and `>>` work on HUGEINT natively (verified on DuckDB
# 1.0).  These fragments turn "content-hash operators are not
# SQL-expressible" into ordinary oracle rows.

SQL_P64 = 1 << 64
SQL_P32 = 1 << 32
SQL_FNV = 1099511628211            # matches stages/text.py _FNV
_MIX_M1 = 0xBF58476D1CE4E5B9       # splitmix64 multipliers
_MIX_M2 = 0x94D049BB133111EB

# ASCII-whitespace token split, identical to stages/text.py _WS_BYTES
SQL_WS_CLASS = r"[ \t\n\r\x0b\x0c]+"


def sql_umul64(h: str, c: str | int) -> str:
    """SQL for ``(h * c) % 2**64`` with both operands < 2**64.

    ``h`` is referenced twice — pass a VARIABLE (lambda arg / column),
    not a large expression."""
    return (f"((({h}) % {SQL_P32}) * ({c}) "
            f"+ (((({h}) // {SQL_P32}) * ({c})) % {SQL_P32}) * {SQL_P32}) "
            f"% {SQL_P64}")


def sql_mix64_list(list_expr: str) -> str:
    """splitmix64 finalizer applied to every element of a HUGEINT list
    (staged ``list_transform`` chain so the input expression is never
    duplicated — each stage's lambda only repeats its variable)."""
    s1 = sql_umul64("xor(h, h >> 30)", _MIX_M1)
    s2 = sql_umul64("xor(h, h >> 27)", _MIX_M2)
    return ("list_transform(list_transform(list_transform("
            f"{list_expr}, h -> {s1}), h -> {s2}), h -> xor(h, h >> 31))")


def sql_hexpair_byte(hx: str, p: str) -> str:
    """SQL for byte ``p`` (1-based) of the hex string ``hx`` (DuckDB
    ``hex(encode(..))`` output, uppercase)."""
    d = "'0123456789ABCDEF'"
    return (f"(strpos({d}, substr({hx}, 2*({p})-1, 1)) - 1) * 16 "
            f"+ strpos({d}, substr({hx}, 2*({p}), 1)) - 1")


def sql_signed64(h: str) -> str:
    """Fold a uint64-valued HUGEINT expression into BIGINT two's
    complement — the view the engine takes when it stores a uint64
    hash in an int64 Arrow column (``.view(np.int64)``)."""
    return (f"CAST({h} - (CASE WHEN {h} >= 9223372036854775808 "
            f"THEN 18446744073709551616::HUGEINT ELSE 0 END) AS BIGINT)")


def sql_string_hash(expr: str) -> str:
    """HUGEINT twin of ``text.string_value_hash``: full-content Horner
    over ALL utf-8 bytes of the value (case-preserving, whitespace
    included), splitmix64-finalized.  NULL/empty hash ``mix64(0)`` —
    the reduce seeds with a prepended 0, which is a Horner no-op for
    non-empty values and makes the empty list reducible.  O(bytes)
    per value: use on SHORT key columns (domains, sources), not
    document bodies."""
    enc = f"encode(coalesce({expr}, ''))"
    byte_p = sql_hexpair_byte(f"hex({enc})", "p")
    horner = (f"list_reduce(list_prepend(0::HUGEINT, list_transform("
              f"range(1, octet_length({enc}) + 1), "
              f"p -> ({byte_p})::HUGEINT)), "
              f"(a, b) -> (a * {SQL_FNV} + b) % {SQL_P64})")
    return f"list_extract({sql_mix64_list(f'[{horner}]')}, 1)"


def sql_tokens(col: str) -> str:
    """SQL for the engine's ASCII-whitespace tokenizer (byte-level and
    char-level splits agree: UTF-8 continuation bytes are never ASCII
    whitespace)."""
    return (f"list_filter(string_split_regex(coalesce({col}, ''), "
            f"'{SQL_WS_CLASS}'), t -> t <> '')")


def sql_token_hash_list(tokens_expr: str, lower: bool = True,
                        max_len: int = 64) -> str:
    """SQL list of the engine's per-token hashes: optional ASCII-only
    lowercase, Horner over the first ``max_len`` UTF-8 bytes, then
    splitmix64 (``_tokenize_hash`` twin).  ``list_reduce`` seeds with
    the first element, which equals Horner's ``0*FNV + b0`` first
    step; tokens are non-empty by construction."""
    t = ("translate(t, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
         "'abcdefghijklmnopqrstuvwxyz')" if lower else "t")
    byte_p = sql_hexpair_byte(f"hex(encode({t}))", "p")
    horner = (f"list_reduce(list_transform("
              f"range(1, least(octet_length(encode({t})), {max_len}) + 1), "
              f"p -> ({byte_p})::HUGEINT), "
              f"(a, b) -> (a * {SQL_FNV} + b) % {SQL_P64})")
    return sql_mix64_list(
        f"list_transform({tokens_expr}, t -> {horner})")
