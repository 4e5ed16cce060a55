"""Multimodal plumbing: schemas, actor decode stubs, frame fan-out."""

import numpy as np
import pyarrow as pa
import pytest

from ocgis_ray.stages.multimodal import (
    FrameSampler,
    MediaDecoder,
    decode_features,
    sample_frames,
    synth_media,
    synth_media_batch,
)


def test_synth_media_schema():
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["ab", "cdef"])})
    out = synth_media_batch(batch)
    assert out.column_names == ["media_id", "kind", "payload", "n_bytes", "meta_w", "meta_h"]
    assert out["payload"].type == pa.binary()
    assert out["n_bytes"].to_pylist() == [8, 16]


def test_decoder_fake_deterministic():
    dec = MediaDecoder(fake=True)
    batch = synth_media_batch(pa.table({"doc_id": pa.array([1], pa.int64()),
                                        "text": pa.array(["hello world"])}))
    a = dec(batch)["features"].to_pylist()
    b = dec(batch)["features"].to_pylist()
    assert a == b
    assert len(a[0]) == MediaDecoder.FEATURE_DIM


def test_decoder_real_raises():
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        FrameSampler(fake=False)


def test_decoder_drops_payload():
    dec = MediaDecoder(fake=True)
    batch = synth_media_batch(pa.table({"doc_id": pa.array([1], pa.int64()),
                                        "text": pa.array(["x"])}))
    assert "payload" not in dec(batch).column_names


def test_frame_sampler_fanout():
    fs = FrameSampler(n_frames=4)
    batch = synth_media_batch(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                        "text": pa.array(["abcdefgh", "ij"])}))
    out = fs(batch)
    assert out.num_rows == 8
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 3, 0, 1, 2, 3]


def test_pipeline_end_to_end(ray_session, sf_dir):
    media = synth_media(sf_dir)
    feats = decode_features(media, concurrency=2)
    pdf = feats.to_pandas()
    assert len(pdf) == media.count()
    frames = sample_frames(synth_media(sf_dir), n_frames=2, concurrency=2)
    assert frames.count() == 2 * len(pdf)
