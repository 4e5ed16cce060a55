"""Video near-dup: sampled-frame pHash consensus over real containers.

A brightness-shifted copy of a video must pair with its original on
EVERY sampled frame; an unrelated video must not reach the
``min_matching_frames`` consensus even if one frame lands close.
"""

import numpy as np
import pyarrow as pa
import pytest


def _gradient(seed: int, w: int = 48, h: int = 36) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / max(w - 1, 1) * rng.uniform(0.5, 1.0)
            + yy * 255 / max(h - 1, 1) * rng.uniform(0.0, 0.5))
    px = np.stack([np.clip(base * f, 0, 255) for f in
                   rng.uniform(0.4, 1.0, 3)], axis=-1)
    px[:, :, 0] += 40 * np.sin(xx / rng.uniform(2, 6))
    px[:, :, 1] += 40 * np.cos(yy / rng.uniform(2, 6))
    return np.clip(px, 0, 255).astype(np.uint8)


_W, _H, _NF = 48, 36, 3


def _frames(vid: int, bright: int = 0) -> list[np.ndarray]:
    out = []
    for f in range(_NF):
        px = _gradient(vid * 131 + f)
        if bright:
            px = np.clip(px.astype(np.int16) + bright, 0, 255).astype(np.uint8)
        out.append(px)
    return out


def _ppm_video(frames: list[np.ndarray]) -> bytes:
    header = f"P6\n{_W} {_H}\n255\n".encode()
    return b"".join(header + f.tobytes() for f in frames)


def _avi_video(frames: list[np.ndarray]) -> bytes:
    from ocgis_ray.stages.avi import avi_mjpeg_encode
    from ocgis_ray.stages.jpeg import jpeg_encode

    return avi_mjpeg_encode([jpeg_encode(f, quality=90) for f in frames],
                            _W, _H)


def _media_table(encode) -> pa.Table:
    # 1: original, 2: brightness-shifted copy (near-dup), 3/4: unrelated
    rows = [(1, encode(_frames(1))), (2, encode(_frames(1, bright=10))),
            (3, encode(_frames(7))), (4, encode(_frames(13)))]
    ids, payloads = zip(*rows)
    return pa.table({
        "media_id": pa.array(list(ids), pa.int64()),
        "kind": pa.array(["video"] * len(ids)),
        "payload": pa.array(list(payloads), pa.binary()),
        "meta_w": pa.array([_W] * len(ids), pa.int64()),
        "meta_h": pa.array([_H] * len(ids), pa.int64()),
    })


# thresholds pinned to the measured pHash geometry of these fixtures:
# PPM copy frame distances are [0, 0, 8] (brightness +10) with the
# nearest unrelated frame at 8, so max_hamming=7 keeps 2 frames and
# excludes strangers; the AVI path re-encodes BOTH sides through JPEG
# q90 (copy framewise [8, 8, 8], nearest stranger 10), so 8 keeps all
# 3 and still excludes strangers.
@pytest.mark.parametrize("container,encode,max_ham,want_frames", [
    ("ppm", _ppm_video, 7, 2), ("avi", _avi_video, 8, _NF)])
def test_video_near_duplicates(ray_session, container, encode,
                               max_ham, want_frames):
    import ray.data as rd

    from ocgis_ray.stages.multimodal import video_near_duplicates

    pairs = video_near_duplicates(
        rd.from_arrow(_media_table(encode)), container=container,
        n_sample=_NF, max_hamming=max_ham,
        min_matching_frames=2).to_pandas()
    got = {(int(a), int(b)) for a, b in
           zip(pairs["media_id_a"], pairs["media_id_b"])}
    assert got == {(1, 2)}
    row = pairs.set_index(["media_id_a", "media_id_b"]).loc[(1, 2)]
    assert int(row["n_frames_matched"]) == want_frames
    assert 0 <= int(row["min_hamming"]) <= max_ham


def test_video_near_duplicates_consensus_gate(ray_session):
    """One coincidentally-shared frame must NOT pair two videos."""
    import ray.data as rd

    from ocgis_ray.stages.multimodal import video_near_duplicates

    shared = _gradient(42)
    va = _ppm_video([shared, _gradient(100), _gradient(101)])
    vb = _ppm_video([shared, _gradient(200), _gradient(201)])
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "kind": pa.array(["video", "video"]),
        "payload": pa.array([va, vb], pa.binary()),
        "meta_w": pa.array([_W, _W], pa.int64()),
        "meta_h": pa.array([_H, _H], pa.int64()),
    })
    ds = rd.from_arrow(t)
    strict = video_near_duplicates(ds, n_sample=3, max_hamming=8,
                                   min_matching_frames=2).to_pandas()
    assert len(strict) == 0
    # with consensus relaxed the shared frame IS found
    loose = video_near_duplicates(ds, n_sample=3, max_hamming=8,
                                  min_matching_frames=1).to_pandas()
    assert {(int(a), int(b)) for a, b in
            zip(loose["media_id_a"], loose["media_id_b"])} == {(1, 2)}
    assert int(loose["min_hamming"].iloc[0]) == 0


def test_video_near_duplicates_rejects_bad_container():
    import ray.data as rd

    from ocgis_ray.stages.multimodal import video_near_duplicates

    with pytest.raises(ValueError, match="container"):
        video_near_duplicates(rd.from_items([]), container="mkv")
