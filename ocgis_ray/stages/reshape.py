"""Row-shape transforms: melt (wide->long), union-all, size estimates.

- ``melt``: the reference's melted record iteration
  (``/root/reference/src/ocgis/collection/field.py:636-750``,
  ``variable/iterator.py``) flattens a field to header-standardized
  rows; columnar analog is an unpivot over value columns.  DuckDB twin:
  ``UNPIVOT``/stacked ``UNION ALL`` selects.
- ``union_all``: ``MultiRequestDataset`` concatenation
  (``driver/request/multi_request.py``) == ``Dataset.union``.
- ``request_size``: the dry-run size estimate (``ops/core.py:218-289``)
  == schema + pruned byte/row counts off the lazy plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """Wide -> long: one output row per (row, value column)."""

    if not value_cols:
        raise ValueError("melt needs at least one value column")

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        out: dict[str, pa.Array] = {}
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), len(value_cols)))
        for c in id_cols:
            out[c] = t[c].take(idx)
        # dictionary-encoded variable column: len(value_cols) strings +
        # an int8/int index instead of n*len(value_cols) Python strings
        codes = np.repeat(np.arange(len(value_cols), dtype=np.int32), n)
        out[var_name] = pa.DictionaryArray.from_arrays(
            pa.array(codes), pa.array(value_cols, pa.string())
        ).cast(pa.string())
        vals = [pa.chunked_array([t[c]]).cast(pa.float64()) for c in value_cols]
        out[value_name] = pa.concat_arrays(
            [v.combine_chunks() for v in vals]
        )
        return pa.table(out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def union_all(*datasets):
    """Concatenate Datasets (schema-aligned union-all)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def request_size(ds) -> dict:
    """Dry-run size accounting over the (lazy) plan — executes only
    counting, not the user pipeline's consumption."""
    return {
        "rows": ds.count(),
        "bytes": ds.size_bytes(),
        "columns": [f.name for f in ds.schema().base_schema],
    }


def sample_by_key(ds, key_col: str, rate: float, salt: int = 0):
    """Deterministic hash sampling: keep a row iff
    ``(key * 2654435761 + salt) % 2^32 < rate * 2^32`` — stable under
    resume/retry (pure function of the key), cheap (no shuffle), and
    SQL-mirrorable (the multiplicative hash is exact integer math).
    The training-data-pipeline sampling operator (the reference has
    none — its data is grid-complete by construction, SURVEY §2.6)."""
    import numpy as np
    import pyarrow as pa

    threshold = np.uint64(int(rate * (1 << 32)))
    mult = np.uint64(2654435761)
    mod = np.uint64(1 << 32)
    salt_u = np.uint64(salt)

    def f(t: pa.Table) -> pa.Table:
        raw = t[key_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(raw.dtype, np.signedinteger) and raw.size \
                and raw.min() < 0:
            # the SQL twin's CAST(key AS UBIGINT) raises on negatives
            # while numpy would silently wrap — fail identically
            raise ValueError("sample_by_key requires non-negative keys "
                             "(the SQL twin cannot wrap)")
        k = raw.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (k * mult + salt_u) % mod
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sample_by_key_sql_pred(key_expr: str, rate: float, salt: int = 0) -> str:
    """DuckDB predicate twin of :func:`sample_by_key` (exact integer
    math, bit-identical decisions).  The key reduces mod 2^32 BEFORE
    the multiply — (k*M) mod 2^32 depends only on k mod 2^32, and
    DuckDB (unlike numpy) raises on uint64 overflow."""
    threshold = int(rate * (1 << 32))
    return (f"(((CAST({key_expr} AS UBIGINT) % 4294967296) * 2654435761"
            f" + {salt}) % 4294967296) < {threshold}")
