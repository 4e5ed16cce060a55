"""Perceptual hash: DCT pHash properties + cross-codec near-dup pairs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _gradient(seed: int, w: int = 48, h: int = 36) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 / max(w - 1, 1) * rng.uniform(0.5, 1.0)
            + yy * 255 / max(h - 1, 1) * rng.uniform(0.0, 0.5))
    px = np.stack([np.clip(base * f, 0, 255) for f in
                   rng.uniform(0.4, 1.0, 3)], axis=-1)
    # structured texture so hashes differ between seeds
    px[:, :, 0] += 40 * np.sin(xx / rng.uniform(2, 6))
    px[:, :, 1] += 40 * np.cos(yy / rng.uniform(2, 6))
    return np.clip(px, 0, 255).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_identical_and_distinct():
    from ocgis_ray.stages.multimodal import _phash64

    a = _phash64(_gradient(1))
    assert _phash64(_gradient(1)) == a  # deterministic
    dists = [_ham(int(a), int(_phash64(_gradient(s)))) for s in range(2, 8)]
    assert min(dists) >= 10  # distinct images land far apart


def test_brightness_and_noise_robust():
    """Median thresholding makes sensitivity image-dependent (an image
    whose DCT coefficients hug the block median flips more bits — true
    of the reference imagehash too), so this pins a well-separated
    image; the cross-codec JPEG test below covers realistic
    re-encoding noise."""
    from ocgis_ray.stages.multimodal import _phash64

    px = _gradient(5)
    base = int(_phash64(px))
    brighter = np.clip(px.astype(np.int16) + 20, 0, 255).astype(np.uint8)
    assert _ham(base, int(_phash64(brighter))) <= 4
    rng = np.random.default_rng(0)
    noisy = np.clip(px.astype(np.int16)
                    + rng.integers(-5, 6, px.shape), 0, 255).astype(np.uint8)
    assert _ham(base, int(_phash64(noisy))) <= 6


def test_small_image_upsample_path():
    from ocgis_ray.stages.multimodal import _phash64

    px = _gradient(5, w=12, h=9)  # below the 32x32 DCT input
    assert _phash64(px) == _phash64(px)
    big = px.repeat(8, axis=0).repeat(8, axis=1)  # same content upscaled
    assert _ham(int(_phash64(px)), int(_phash64(big))) <= 6


def _media_table(rows):
    ids, payloads, ws, hs = zip(*rows)
    return pa.table({
        "media_id": pa.array(list(ids), pa.int64()),
        "payload": pa.array(list(payloads), pa.binary()),
        "meta_w": pa.array(list(ws), pa.int32()),
        "meta_h": pa.array(list(hs), pa.int32()),
    })


def _encode_rows():
    """Same raster in three codecs (+ one unrelated image): pHash must
    pair the re-encodings, not the stranger."""
    from ocgis_ray.stages.jpeg import jpeg_encode
    from ocgis_ray.stages.multimodal import _png_encode_rgb

    px = _gradient(11)
    h, w = px.shape[:2]
    ppm = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    png = _png_encode_rgb(px)
    jpg = jpeg_encode(px, quality=90)
    other = _gradient(99)
    ppm2 = f"P6\n{w} {h}\n255\n".encode() + other.tobytes()
    return [(1, ppm, w, h), (2, png, w, h), (3, jpg, w, h), (4, ppm2, w, h)]


def test_cross_codec_near_dup_pipeline(ray_session):
    import ray.data as rd

    from ocgis_ray.stages.multimodal import (phash_images,
                                             phash_near_duplicates)

    ds = rd.from_arrow(_media_table(_encode_rows()))
    sigs = phash_images(ds, concurrency=2).to_pandas()
    assert len(sigs) == 4
    by_id = sigs.set_index("media_id")["phash"]
    assert by_id[1] == by_id[2]  # PPM and PNG decode to identical pixels
    assert _ham(int(by_id[1]), int(by_id[3])) <= 8  # JPEG is lossy-close
    assert _ham(int(by_id[1]), int(by_id[4])) > 8   # stranger stays out

    pairs = phash_near_duplicates(
        phash_images(rd.from_arrow(_media_table(_encode_rows())),
                     concurrency=2),
        max_hamming=8).to_pandas()
    got = {tuple(sorted((int(a), int(b))))
           for a, b in zip(pairs["media_id_a"], pairs["media_id_b"])}
    assert got == {(1, 2), (1, 3), (2, 3)}


def test_phash_batch_rejects_unknown_format():
    from ocgis_ray.stages.multimodal import phash_batch

    bad = _media_table([(1, b"GIF89a....", 4, 4)])
    with pytest.raises(ValueError, match="unknown image payload"):
        phash_batch(bad)
