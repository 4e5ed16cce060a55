"""AVI/MJPEG container (stages/avi.py): real compressed video through
the in-repo T.81 codec — container round-trip, Dataset-level frame
sampling, and decode through the existing real image path."""

import numpy as np
import pyarrow as pa
import pytest

from ocgis_ray.stages.avi import (avi_mjpeg_encode, avi_mjpeg_frames,
                                  sample_avi_frames, synth_avi_video)
from ocgis_ray.stages.jpeg import jpeg_decode, jpeg_encode


def test_container_roundtrip_and_validation():
    rng = np.random.RandomState(0)
    px = [rng.randint(0, 256, (12, 16, 3), dtype=np.uint8)
          for _ in range(5)]
    frames = [jpeg_encode(p, quality=90) for p in px]
    avi = avi_mjpeg_encode(frames, 16, 12)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert avi_mjpeg_frames(avi) == frames
    # deterministic bytes
    assert avi_mjpeg_encode(frames, 16, 12) == avi
    # every frame decodes through the real codec
    for f, p in zip(avi_mjpeg_frames(avi), px):
        got = jpeg_decode(f)
        assert got.shape == p.shape
        assert abs(got.astype(float).mean() - p.astype(float).mean()) < 3.0
    with pytest.raises(ValueError, match="RIFF"):
        avi_mjpeg_frames(b"not an avi")
    with pytest.raises(ValueError, match="no frames"):
        avi_mjpeg_encode([], 4, 4)
    with pytest.raises(ValueError, match="JPEG"):
        avi_mjpeg_frames(avi_mjpeg_encode([b"zzzz"], 4, 4))


def test_avi_video_pipeline(ray_session):
    """synth -> sample -> REAL decode: sampled frames carry the
    per-frame gradient (JPEG-lossy but mean within tolerance), flow
    through decode_image_stats' JPEG path, and frame indices are
    evenly spaced."""
    from ocgis_ray.stages.multimodal import (_gradient_pixels,
                                             decode_image_stats)

    vids = synth_avi_video("/root/testdata/sf0.001", w=16, h=12,
                           n_frames=4).limit(6)
    frames = sample_avi_frames(vids, n_sample=2).materialize()
    fdf = frames.to_pandas()
    assert len(fdf) == 12  # 6 videos x 2 sampled frames
    assert sorted(fdf["frame_idx"].unique()) == [0, 2]
    assert (fdf["kind"] == "image").all()

    stats = decode_image_stats(
        frames.take_batch(12, batch_format="pyarrow")).to_pandas()
    stats = stats.sort_values(["media_id", "frame_idx"],
                              ignore_index=True)
    fdf = fdf.sort_values(["media_id", "frame_idx"], ignore_index=True)
    # per-channel means track the source gradient per sampled frame
    # (JPEG-lossy: tolerance a few counts)
    src = _gradient_pixels(
        (fdf["media_id"].to_numpy(np.int64) * 131
         + fdf["frame_idx"].to_numpy(np.int64)), 16, 12) \
        .reshape(len(fdf), -1, 3).astype(np.float64)
    for ci, c in enumerate(("mean_r", "mean_g", "mean_b")):
        want = src[:, :, ci].mean(axis=1)
        got = stats[c].to_numpy(np.float64)
        assert np.abs(got - want).max() < 3.0, c
    # distinct frames of one video differ (real per-frame content)
    one = stats[stats.media_id == stats.media_id.iloc[0]]
    assert one["luma"].nunique() == len(one)
