"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
metadata columns alongside (kind, width/height or duration, codec) —
the Arrow-native answer to the reference's VLEN ``ObjectType`` payloads
(``/root/reference/src/ocgis/variable/base.py:202-219``).

The container has NO image/audio libraries, so the decode kernels are
STUBS behind ``fake=True``: the Ray-side plumbing — schemas, actor-pool
signatures, small-batch sizing for fat rows, flat frame expansion — is
real and tested; the pixel math is a clearly-marked deterministic fake
(or ``NotImplementedError`` when ``fake=False``).

Memory rule for fat binary rows (ray_guide "Memory-aware"): batches of
256-1024 rows, ``batch_format="pyarrow"`` (binary columns do NOT
round-trip pandas cleanly), project the payload away as soon as
features are extracted.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
        ("meta_w", pa.int64()),      # image width / audio sample rate / video fps
        ("meta_h", pa.int64()),      # image height / channels / frame count
    ]
)


def _binary_view(arr) -> tuple[np.ndarray, np.ndarray]:
    """Arrow binary column -> (data bytes, int64 offsets) zero-copy."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    if bufs[2] is None:
        return np.empty(0, np.uint8), np.zeros(len(arr) + 1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset: arr.offset + len(arr) + 1]
    return np.frombuffer(bufs[2], dtype=np.uint8), off.astype(np.int64)


def synth_media_batch(batch: pa.Table, kind: str = "image") -> pa.Table:
    """Deterministic fake media derived from documents (payload bytes =
    text repeated 4x, utf-8) — plumbing fixture, not content.
    Vectorized: Arrow element-wise join builds the payloads, no Python
    per-row string work."""
    import pyarrow.compute as pc

    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    t = batch["text"]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    rep = pc.binary_join_element_wise(t, t, t, t, "")
    payload = rep.cast(pa.binary())
    return pa.table(
        {
            "media_id": pa.array(doc_id),
            "kind": pa.array(np.full(len(doc_id), kind, dtype=object)),
            "payload": payload,
            "n_bytes": pc.binary_length(payload).cast(pa.int64()),
            "meta_w": pa.array(64 + (doc_id % 64)),
            "meta_h": pa.array(48 + (doc_id % 48)),
        }
    )


def synth_media(sf_dir: str, kind: str = "image"):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: synth_media_batch(b, kind), batch_format="pyarrow", zero_copy_batch=True
    )


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``fake=True``: deterministic 16-dim feature from payload byte
    statistics (pure function — resume-safe).  ``fake=False`` raises
    ``NotImplementedError`` — a real deployment plugs PIL/ffmpeg here;
    only ``__init__`` (model/codec load) and ``__call__`` (batch
    decode) change, the pipeline shape does not."""

    FEATURE_DIM = 16

    def __init__(self, fake: bool = True):
        if not fake:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/ffmpeg, absent in this container"
            )
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized fake decode: per-row chunk means over the payload
        # buffer via one byte-cumsum + np.array_split-equivalent edge
        # math (no per-row Python, no payload copies)
        data, off = _binary_view(batch["payload"])
        n = batch.num_rows
        feats = np.zeros((n, self.FEATURE_DIM), dtype=np.float64)
        if len(data) and n:
            cums = np.zeros(len(data) + 1, dtype=np.int64)
            np.cumsum(data, out=cums[1:])
            L = np.minimum(off[1:] - off[:-1], 4096)  # first 4096 bytes
            d = self.FEATURE_DIM
            i = np.arange(d + 1)
            # np.array_split edges: first L%d chunks get ceil(L/d)
            edges = (i[None, :] * (L // d)[:, None]
                     + np.minimum(i[None, :], (L % d)[:, None]))
            abs_edges = off[:-1][:, None] + edges
            sums = cums[abs_edges[:, 1:]] - cums[abs_edges[:, :-1]]
            lens = edges[:, 1:] - edges[:, :-1]
            with np.errstate(invalid="ignore", divide="ignore"):
                feats = np.where(lens > 0, sums / np.maximum(lens, 1), 0.0)
        out = batch.drop_columns(["payload"])  # fat column dies here
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.astype(np.float32).ravel()), self.FEATURE_DIM
            ),
        )


def decode_features(ds, concurrency=None, batch_size: int = 512,
                    fake: bool = True):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        MediaDecoder, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"fake": fake},
    )


class FrameSampler:
    """video -> frame rows (flat expansion): every media row emits
    ``n_frames`` rows with a deterministic byte-slice 'frame'.  Real
    frame decode would replace ``_slice``; the fan-out plumbing and
    small-batch discipline are the tested part."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        if not fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        self.n_frames = n_frames

    def _slice(self, payload: bytes, i: int) -> bytes:
        if not payload:
            return b""
        step = max(1, len(payload) // self.n_frames)
        return payload[i * step : i * step + min(step, 256)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized flat fan-out: frame byte ranges computed as arrays,
        # output binary column assembled with one gather (segment-
        # arange) — no per-row Python, no payload round-trips
        data, off = _binary_view(batch["payload"])
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        n = batch.num_rows
        nf = self.n_frames
        L = (off[1:] - off[:-1]).astype(np.int64)
        step = np.maximum(1, L // nf)
        fi = np.tile(np.arange(nf, dtype=np.int64), n)
        mid = np.repeat(ids, nf)
        starts = np.repeat(off[:-1], nf) + np.repeat(step, nf) * fi
        lens = np.minimum(np.repeat(step, nf), 256)
        # clamp to the row's payload end (empty payloads -> 0 bytes)
        row_end = np.repeat(off[1:], nf)
        lens = np.maximum(np.minimum(row_end - starts, lens), 0)
        total = int(lens.sum())
        within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        gathered = data[np.repeat(starts, lens) + within] if total else \
            np.empty(0, np.uint8)
        out_off = np.zeros(len(lens) + 1, dtype=np.int32)
        np.cumsum(lens, out=out_off[1:])
        frame_arr = pa.BinaryArray.from_buffers(
            pa.binary(), len(lens),
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(gathered.tobytes())],
        )
        return pa.table({
            "media_id": pa.array(mid),
            "frame_idx": pa.array(fi),
            "frame": frame_arr,
        })


def sample_frames(ds, n_frames: int = 4, concurrency=None,
                  batch_size: int = 256):
    from ocgis_ray.tuning import auto_pool

    concurrency = auto_pool() if concurrency is None else concurrency
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
    )
