"""Exact substring dedup: remove byte spans duplicated across the corpus.

The ExactSubstr operator of Lee et al. 2022 ("Deduplicating Training
Data Makes Language Models Better"): any byte span of length >=
``min_len`` that occurs more than once in the corpus is removed from
every occurrence but the first.  The paper builds one global suffix
array — inherently single-machine.  This implementation is the
DISTRIBUTED shape, built on winnowing fingerprints (Schleimer et al.
2003, the MOSS algorithm):

1. **Select** (:func:`selected_fingerprints`): hash every ``w``-byte
   window (one Horner pass over the batch's zero-copy byte view, the
   ``add_fingerprint`` kernel generalized), then keep the windows that
   are minimal in any run of ``s`` consecutive windows (two O(n)
   block-decomposition sliding-min passes — no per-row Python).  The
   winnowing guarantee: two occurrences of any span of length >=
   ``w + s - 1 == min_len`` share at least one selected fingerprint
   VALUE, regardless of byte alignment.
2. **Match** (:func:`duplicate_span_intervals`): one bucketed shuffle
   groups selections by fingerprint; every occurrence except the
   global ``(id, pos)``-minimum emits a removal interval ``[pos,
   pos + w)``.
3. **Cut** (:func:`substring_dedup`): intervals merge per document
   (second bucketed shuffle, packed to one row per doc), hash-join
   back onto the corpus, and each text is rebuilt with the spans cut
   out in ONE segment gather.

Semantics vs the suffix-array original, stated honestly:

- Detection is GUARANTEED for spans >= ``min_len`` (the winnowing
  bound), like the paper.
- Removal masks the matched ``w``-byte windows, merged.  Inside a long
  duplicated span selections recur at least every ``s`` positions and
  ``w >= s``, so the interior mask is contiguous; up to ``~s`` bytes
  at each EDGE of the span can survive (the paper's suffix array
  removes the maximal extension).  For training-dedup purposes the
  residue is below ``min_len`` by construction.
- OVER-removal below the contract: a shared ``w``-byte window
  (``w ~= min_len/2``) that winnowing selects in BOTH occurrences is
  cut even when the surrounding duplicated span is shorter than
  ``min_len`` — each shared w-gram is selected with probability
  ~``2/s`` per occurrence, so frequent short boilerplate loses
  w-byte windows at corpus scale.  This errs toward MORE dedup (the
  usual training-data preference); callers needing a stricter
  contract raise ``min_len`` (which raises ``w``), since the paper's
  byte-verified maximal extension would require shipping candidate
  windows twice.
- 64-bit fingerprint collisions can cut a non-duplicated window with
  probability ~``n_selected^2 / 2^65`` — the repo-wide content-hash
  assumption (an exact byte-verification join would close it at the
  cost of shipping candidate windows twice).

Scale: selection is embarrassingly parallel; the fingerprint table
carries ~``2/s`` rows per corpus byte through ONE hash shuffle; the
interval merge shuffles only duplicated docs' intervals; the rebuild
is one corpus-wide hash join (the intervals side is tiny) — the same
exchange budget as ``quality.paragraph_dedup``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ocgis_ray.stages.text import (
    KERNEL_BATCH_SIZE,
    _FNV,
    _mix64,
    _string_byte_view,
)

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _params(min_len: int) -> tuple[int, int]:
    """(w, s) with w + s - 1 == min_len and w >= s (contiguous
    interior masks)."""
    if min_len < 8:
        raise ValueError(f"min_len={min_len} too small (>= 8)")
    s = min_len // 2
    w = min_len - s + 1
    return w, s


def _block_min_with_arg(h: np.ndarray, s: int):
    """Block-decomposition sliding-min support arrays.

    Returns (pre_min, pre_arg, suf_min, suf_arg), each length
    ``len(h)``: prefix/suffix min and LEFTMOST argmin within blocks of
    size ``s``.  Window ``[i, i+s-1]`` (spanning at most two blocks)
    then resolves as ``min(suf[i], pre[i+s-1])``."""
    n = h.size
    nb = (n + s - 1) // s
    pad = nb * s - n
    hp = np.concatenate([h, np.full(pad, _U64_MAX, np.uint64)]).reshape(nb, s)
    base = (np.arange(nb, dtype=np.int64) * s)[:, None]
    idx = np.arange(s, dtype=np.int64)

    pre = np.minimum.accumulate(hp, axis=1)
    upd = np.empty((nb, s), dtype=bool)
    upd[:, 0] = True
    upd[:, 1:] = hp[:, 1:] < pre[:, :-1]          # strict: leftmost ties
    pre_arg = np.maximum.accumulate(np.where(upd, idx, 0), axis=1) + base

    hr = hp[:, ::-1]
    sacc = np.minimum.accumulate(hr, axis=1)
    supd = np.empty((nb, s), dtype=bool)
    supd[:, 0] = True
    supd[:, 1:] = hr[:, 1:] <= sacc[:, :-1]       # <=: earliest ORIGINAL pos
    sarg_rev = np.maximum.accumulate(np.where(supd, idx, 0), axis=1)
    suf = sacc[:, ::-1]
    suf_arg = (np.int64(s - 1) - sarg_rev)[:, ::-1] + base

    flat = slice(0, n)
    return (pre.reshape(-1)[flat], pre_arg.reshape(-1)[flat],
            suf.reshape(-1)[flat], suf_arg.reshape(-1)[flat])


def _winnow_batch(text_arr, w: int, s: int):
    """(fp uint64, row int64, pos int64) of the winnowed selections of
    one batch — pos is the byte offset of the ``w``-gram in its row."""
    data, off = _string_byte_view(text_arr)
    nrows = len(off) - 1
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if len(data) < w:
        return empty
    nwin = len(data) - w + 1
    h = np.zeros(nwin, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for u in range(w):
            h = h * _FNV + data[u: nwin + u]
    h = _mix64(h)

    pre, pre_arg, suf, suf_arg = _block_min_with_arg(h, s)

    # resolve EVERY window position with contiguous slice ops (fancy
    # gathers over per-row index lists measured 4x slower), then mask
    # to the valid in-row windows via interval deltas
    m = nwin - s + 1
    if m <= 0:
        return empty
    take_suf = suf[:m] <= pre[s - 1:]
    arg_all = np.where(take_suf, suf_arg[:m], pre_arg[s - 1:])
    # valid winnow-window starts: runs of s consecutive w-grams fully
    # inside one row — row r contributes [off[r], off[r]+cnt_r)
    lens = off[1:] - off[:-1]
    n_sel_win = np.maximum(lens - w - s + 2, 0)     # per-row window count
    nz = n_sel_win > 0
    if not nz.any():
        return empty
    cnts = n_sel_win[nz]
    delta = np.zeros(m + 1, dtype=np.int32)
    np.add.at(delta, off[:-1][nz], 1)
    np.add.at(delta, off[:-1][nz] + cnts, -1)
    valid = np.cumsum(delta[:-1]) > 0
    arg = np.unique(arg_all[valid])                 # selected w-gram starts
    row = np.searchsorted(off[1:], arg, side="right").astype(np.int64)
    return h[arg], row, arg - off[:-1][row]


def selected_fingerprints(ds, min_len: int = 64, id_col: str = "doc_id",
                          col: str = "text"):
    """Dataset of winnowed selections: (id_col, ``fp`` int64-viewed
    hash, ``pos`` byte offset)."""
    w, s = _params(min_len)

    def f(t: pa.Table) -> pa.Table:
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        fp, row, pos = _winnow_batch(arr, w, s)
        ids = t[id_col].take(pa.array(row))
        return pa.table({id_col: ids,
                         "fp": pa.array(fp.view(np.int64)),
                         "pos": pa.array(pos)})

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=KERNEL_BATCH_SIZE)


def duplicate_span_intervals(ds, min_len: int = 64, id_col: str = "doc_id",
                             col: str = "text",
                             num_buckets: int | None = None):
    """Removal intervals (id_col, start, end): every occurrence of a
    multiply-selected fingerprint except the global (id, pos)-minimum
    survivor.  One bucketed hash shuffle on the fingerprint."""
    from ocgis_ray.sources.io import bucketed_group_apply

    w, _ = _params(min_len)
    sel = selected_fingerprints(ds, min_len=min_len, id_col=id_col, col=col)

    def losers(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["fp", id_col, "pos"], kind="mergesort")
        dup = g["fp"].duplicated()                 # first occurrence kept
        out = g.loc[dup, [id_col, "pos"]].rename(columns={"pos": "start"})
        out["end"] = out["start"] + w
        return out.reset_index(drop=True)

    return bucketed_group_apply(sel, "fp", losers, num_buckets=num_buckets)


def _merge_pack(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Merge each doc's intervals and pack them to one binary row per
    doc — vectorized ACROSS docs (doc-scaled interval keys; byte
    positions are < 2^32 by the string-offset domain, so a doc bump
    always outranks any end and merge runs never span docs)."""
    if not len(g):
        return pd.DataFrame({id_col: [], "_spans": []})
    g = g.sort_values([id_col, "start"], kind="mergesort")
    st = g["start"].to_numpy(np.int64)
    en = g["end"].to_numpy(np.int64)
    dcode, didx = np.unique(g[id_col].to_numpy(), return_inverse=True)
    key_st = didx.astype(np.int64) * (1 << 32) + st
    key_en = didx.astype(np.int64) * (1 << 32) + en
    cummax = np.maximum.accumulate(key_en)
    keep_new = np.empty(len(st), dtype=bool)
    keep_new[0] = True
    keep_new[1:] = key_st[1:] > cummax[:-1]
    gstarts = np.nonzero(keep_new)[0]
    mst = st[keep_new]
    men = np.maximum.reduceat(en, gstarts)
    mdoc = didx[keep_new]
    interleaved = np.empty(2 * len(mst), dtype="<i8")
    interleaved[0::2] = mst
    interleaved[1::2] = men
    raw = interleaved.tobytes()
    counts = np.bincount(mdoc, minlength=len(dcode))
    boffs = np.zeros(len(dcode) + 1, dtype=np.int64)
    np.cumsum(counts * 16, out=boffs[1:])
    blobs = [raw[boffs[i]: boffs[i + 1]] for i in range(len(dcode))]
    return pd.DataFrame({id_col: dcode, "_spans": blobs})


def substring_dedup(ds, min_len: int = 64, id_col: str = "doc_id",
                    col: str = "text", num_buckets: int | None = None,
                    drop_empty_docs: bool = False):
    """Rewrite ``col`` with all duplicated spans (>= ``min_len`` bytes,
    winnowing-guaranteed) cut from every occurrence but the first.
    All other columns pass through (hash join on ``id_col``)."""
    from ocgis_ray.sources.io import bucketed_group_apply, join_datasets

    iv = duplicate_span_intervals(ds, min_len=min_len, id_col=id_col,
                                  col=col, num_buckets=num_buckets)
    # materialize the (one row per duplicated doc) interval table: it
    # is consumed twice (emptiness check + join) and is tiny next to
    # the corpus — the signatures-checkpoint pattern
    packed = bucketed_group_apply(iv, id_col,
                                  lambda g: _merge_pack(g, id_col),
                                  num_buckets=num_buckets).materialize()
    if packed.count() == 0:
        return ds
    # repartition unifies block schemas: map_groups emits zero-column
    # blocks for empty shuffle partitions, which Arrow's join rejects
    packed = packed.repartition(max(2, num_buckets or 2))
    joined = join_datasets(ds, packed, on=(id_col,),
                           join_type="left_outer",
                           num_partitions=num_buckets)

    def cut(t: pa.Table) -> pa.Table:
        from ocgis_ray.stages.quality import _gather_strings

        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        data, off = _string_byte_view(arr)
        lens = off[1:] - off[:-1]
        n = t.num_rows
        import pyarrow.compute as pc

        spans_col = t["_spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        # buffer-level span parse: counts and flattened (start, end)
        # pairs straight from the binary array's offsets — no per-row
        # Python (null rows have zero-length payloads)
        sbufs = spans_col.buffers()
        off_dt = (np.int64 if pa.types.is_large_binary(spans_col.type)
                  else np.int32)
        soff = np.frombuffer(sbufs[1], dtype=off_dt)[
            spans_col.offset: spans_col.offset + n + 1].astype(np.int64)
        counts = (soff[1:] - soff[:-1]) // 16
        k_tot = int(counts.sum())
        if k_tot:
            sdata = np.frombuffer(sbufs[2], dtype=np.uint8)
            lo, hi = int(soff[0]), int(soff[-1])
            # rows are back-to-back in offset order, so this slice IS
            # the concatenated payloads; tobytes() realigns for int64
            pairs = np.frombuffer(sdata[lo:hi].tobytes(), dtype="<i8")
            ivs = pairs[0::2]
            row_of_iv = np.repeat(np.arange(n, dtype=np.int64), counts)
            ive = np.minimum(pairs[1::2], lens[row_of_iv])
        else:
            ivs = np.empty(0, np.int64)
            ive = np.empty(0, np.int64)
        # segments kept per row: k_i + 1 (between/around the cuts)
        seg_cnt = counts + 1
        seg_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(seg_cnt, out=seg_off[1:])
        nseg = int(seg_off[-1])
        seg_start = np.empty(nseg, dtype=np.int64)
        seg_end = np.empty(nseg, dtype=np.int64)
        head = seg_off[:-1]
        tail = seg_off[1:] - 1
        seg_start[head] = 0
        seg_end[tail] = lens
        if k_tot:
            all_pos = np.arange(nseg, dtype=np.int64)
            not_head = np.ones(nseg, dtype=bool)
            not_head[head] = False
            not_tail = np.ones(nseg, dtype=bool)
            not_tail[tail] = False
            seg_start[all_pos[not_head]] = ive     # segment after each cut
            seg_end[all_pos[not_tail]] = ivs       # segment before each cut
        seg_row = np.repeat(np.arange(n, dtype=np.int64), seg_cnt)
        g_start = off[:-1][seg_row] + seg_start
        g_len = np.maximum(seg_end - seg_start, 0)
        # collapse each row's segments into one string: gather segments
        # then re-offset by per-row totals
        new_lens = np.bincount(seg_row, weights=g_len,
                               minlength=n).astype(np.int64)
        flat = _gather_strings(data, g_start, g_len)
        fdata = np.frombuffer(flat.buffers()[2], dtype=np.uint8) \
            if flat.buffers()[2] is not None else np.empty(0, np.uint8)
        row_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(new_lens, out=row_off[1:])
        validity = None
        if arr.null_count:
            validity = pa.array(
                ~pc.is_null(arr).to_numpy(zero_copy_only=False)).buffers()[1]
        out_arr = pa.Array.from_buffers(
            pa.string(), n,
            [validity, pa.py_buffer(row_off.astype(np.int32).tobytes()),
             pa.py_buffer(fdata.tobytes())])
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, out_arr)
        return t.drop_columns(["_spans"])

    out = joined.map_batches(cut, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=KERNEL_BATCH_SIZE)
    if drop_empty_docs:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda t: t.filter(pc.greater(pc.utf8_length(t[col]), 0)),
            batch_format="pyarrow", zero_copy_batch=True)
    return out
