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


def synth_media_batch(batch: pa.Table, kind: str = "image") -> pa.Table:
    """Deterministic fake media derived from documents (payload bytes =
    repeated utf-8 text) — plumbing fixture, not content."""
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    payloads = [(t * 4).encode("utf-8") for t in texts]
    return pa.table(
        {
            "media_id": pa.array(doc_id),
            "kind": pa.array([kind] * len(doc_id)),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
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
        feats = np.zeros((batch.num_rows, self.FEATURE_DIM), dtype=np.float32)
        payloads = batch["payload"].to_pylist()
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            if arr.size == 0:
                continue
            chunks = np.array_split(arr[: 4096], self.FEATURE_DIM)
            feats[i] = [float(c.mean()) if c.size else 0.0 for c in chunks]
        out = batch.drop_columns(["payload"])  # fat column dies here
        return out.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel()), self.FEATURE_DIM
            ),
        )


def decode_features(ds, concurrency: int | None = 2, batch_size: int = 512,
                    fake: bool = True):
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
        mids, fidx, frames = [], [], []
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        for mid, p in zip(ids, payloads):
            for i in range(self.n_frames):
                mids.append(mid)
                fidx.append(i)
                frames.append(self._slice(p, i))
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_frames(ds, n_frames: int = 4, concurrency: int | None = 2,
                  batch_size: int = 256):
    return ds.map_batches(
        FrameSampler, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"n_frames": n_frames},
    )
