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


def test_ppm_real_decode_roundtrip(ray_session, sf_dir):
    """REAL pixel decode (P6 PPM, pure numpy): channel means from the
    distributed decode equal a direct numpy render of the same
    deterministic gradient."""
    import numpy as np

    from ocgis_ray.stages.multimodal import decode_ppm, synth_ppm_media

    out = decode_ppm(synth_ppm_media(sf_dir, w=32, h=24)).to_pandas()
    assert len(out) > 0 and "payload" not in out.columns
    # re-render one image driver-side and compare exactly
    row = out.sort_values("media_id").iloc[0]
    did = int(row["media_id"])
    yy = np.arange(24)[:, None]
    xx = np.arange(32)[None, :]
    r = (did * 31 + xx * 8) % 256 + np.zeros_like(yy)
    g = (did * 17 + yy * 11) % 256 + np.zeros_like(xx)
    b = (did * 7 + xx * 3 + yy * 5) % 256
    assert row["mean_r"] == pytest.approx(np.broadcast_to(r, (24, 32)).mean())
    assert row["mean_g"] == pytest.approx(np.broadcast_to(g, (24, 32)).mean())
    assert row["mean_b"] == pytest.approx(b.mean())
    assert row["luma"] == pytest.approx(
        0.299 * row["mean_r"] + 0.587 * row["mean_g"] + 0.114 * row["mean_b"])
    assert (out["contrast"] >= 0).all()


def test_ppm_decode_rejects_non_ppm(ray_session, sf_dir):
    """the real decoder validates the magic instead of silently
    producing garbage from non-PPM payloads."""
    import pytest as _pytest

    from ocgis_ray.stages.multimodal import decode_ppm, synth_media

    bad = synth_media(sf_dir)  # text payloads, no P6 magic
    with _pytest.raises(Exception):
        decode_ppm(bad).to_pandas()


def test_wav_real_decode(ray_session, sf_dir):
    """REAL PCM decode: RMS/peak/zcr from the distributed decode equal
    a direct numpy render of the same deterministic waveform."""
    import numpy as np

    from ocgis_ray.stages.multimodal import decode_wav, synth_wav_media

    out = decode_wav(synth_wav_media(sf_dir)).to_pandas()
    assert len(out) > 0 and "payload" not in out.columns
    row = out.sort_values("media_id").iloc[0]
    did = int(row["media_id"])
    t = np.arange(2048, dtype=np.float64)
    f0 = 100.0 + (did % 50) * 7.0
    wave = (0.6 * np.sin(2 * np.pi * f0 * t / 8000)
            + 0.3 * np.sin(2 * np.pi * 2 * f0 * t / 8000))
    pcm = np.round(wave * 32767.0 * 0.5).astype(np.int16).astype(np.float64)
    assert row["rms"] == pytest.approx(np.sqrt((pcm ** 2).mean()))
    assert row["peak"] == pytest.approx(np.abs(pcm).max())
    sgn = pcm >= 0
    assert row["zcr"] == pytest.approx((sgn[1:] != sgn[:-1]).sum() / 2047)
    # a 100-450 Hz tone crosses zero ~2*f0/rate per sample
    assert 0.01 < row["zcr"] < 0.2


def test_empty_inputs_through_new_stages(ray_session, sf_dir):
    """empty datasets flow through every new actor/task stage without
    error (the verify-probe invariant)."""
    import numpy as np
    import ray.data as rd

    from ocgis_ray.stages.ann import ann_ivf, load_query_vectors
    from ocgis_ray.stages.sketch import (approx_distinct, heavy_hitters,
                                         hopping_window_rollup)

    empty_ev = rd.read_parquet(f"{sf_dir}/events.parquet").filter(
        lambda r: False)
    assert hopping_window_rollup(empty_ev, "ts", 7200, 3600).count() == 0
    assert heavy_hitters(empty_ev, "event_type", k=3).count() == 0
    assert approx_distinct(empty_ev, "user_id") == 0
    q = load_query_vectors(sf_dir, [0])
    empty_emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet").filter(
        lambda r: False)
    # k-means needs data; an empty vector table is a clear error, not
    # a silent wrong answer
    try:
        n = ann_ivf(empty_emb, q, k=3).count()
        assert n == 0
    except (ValueError, IndexError):
        pass


def test_png_codec_roundtrip_and_filters():
    """stdlib PNG: encode(filter 0) -> decode recovers the raster
    exactly, and the decoder reconstructs ALL five scanline filter
    types (hand-filtered stream)."""
    import struct
    import zlib

    import numpy as np

    from ocgis_ray.stages.multimodal import (_gradient_pixels,
                                             _png_decode_rgb,
                                             _png_encode_rgb)

    px = _gradient_pixels(np.array([7, 42]), 32, 24)
    for i in range(2):
        assert np.array_equal(_png_decode_rgb(_png_encode_rgb(px[i])), px[i])

    rng = np.random.RandomState(0)
    raster = rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)
    h, w, bpp = 6, 5, 3

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    recon = raster.reshape(h, w * 3).astype(np.int64)
    rows = []
    for r, f in zip(range(h), [0, 1, 2, 3, 4, 1]):
        cur = recon[r]
        prior = recon[r - 1] if r else np.zeros(w * 3, np.int64)
        line = np.zeros(w * 3, np.int64)
        for x in range(w * 3):
            a = cur[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
            line[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(line.astype(np.uint8)))
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"".join(rows)))
           + chunk(b"IEND", b""))
    assert np.array_equal(_png_decode_rgb(png), raster)


def test_mixed_container_decode_matches(ray_session, sf_dir):
    """PPM and PNG rows of the SAME raster produce identical stats
    through the dispatching decode stage, in the original row order."""
    import numpy as np

    from ocgis_ray.stages.multimodal import decode_images, synth_image_media

    out = decode_images(synth_image_media(sf_dir)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(out) == 500
    # recompute expected means straight from the gradient formula
    from ocgis_ray.stages.multimodal import _gradient_pixels

    ids = out["media_id"].to_numpy()
    px = _gradient_pixels(ids, 32, 24).reshape(len(ids), -1, 3) \
        .astype(np.float64)
    np.testing.assert_allclose(out["mean_r"], px[:, :, 0].mean(axis=1),
                               rtol=0, atol=0)
    np.testing.assert_allclose(out["mean_g"], px[:, :, 1].mean(axis=1),
                               rtol=0, atol=0)
    # both containers present
    assert (ids % 2 == 0).any() and (ids % 2 == 1).any()


def test_video_frame_sampling_real(ray_session, sf_dir):
    """Motion-PPM video: REAL frame sampling (header-validated stream
    parse) -> complete standalone PPM rows -> REAL pixel decode; the
    decoded means reproduce the per-frame gradient formula exactly."""
    import numpy as np

    from ocgis_ray.stages.multimodal import (_gradient_pixels, decode_ppm,
                                             sample_ppm_frames,
                                             synth_ppm_video)

    vids = synth_ppm_video(sf_dir, w=16, h=12, n_frames=6)
    frames = sample_ppm_frames(vids, n_sample=3)
    out = decode_ppm(frames).to_pandas()
    assert len(out) == 500 * 3
    # evenly spaced: frames 0, 2, 4 of 6
    assert sorted(out["frame_idx"].unique()) == [0, 2, 4]
    # decoded channel means == the gradient formula for seed d*131+f
    sub = out.sort_values(["media_id", "frame_idx"]).head(50)
    seeds = (sub["media_id"].to_numpy() * 131
             + sub["frame_idx"].to_numpy()).astype(np.int64)
    px = _gradient_pixels(seeds, 16, 12).reshape(len(seeds), -1, 3) \
        .astype(np.float64)
    np.testing.assert_array_equal(sub["mean_r"].to_numpy(),
                                  px[:, :, 0].mean(axis=1))
    np.testing.assert_array_equal(sub["mean_g"].to_numpy(),
                                  px[:, :, 1].mean(axis=1))


def test_video_frame_sampling_validates_stream(ray_session):
    """Corrupt frame boundaries and ragged payloads fail loudly."""
    import numpy as np
    import ray.data as rd

    from ocgis_ray.stages.multimodal import sample_ppm_frames_batch

    header = b"P6\n2 2\n255\n"
    frame = header + bytes(range(12))
    good = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "kind": pa.array(["video"]),
        "payload": pa.array([frame * 3], pa.binary()),
        "n_bytes": pa.array([len(frame) * 3], pa.int64()),
        "meta_w": pa.array([2], pa.int64()),
        "meta_h": pa.array([2], pa.int64()),
    })
    out = sample_ppm_frames_batch(good, n_sample=2)
    assert out.num_rows == 2

    ragged = good.set_column(2, "payload",
                             pa.array([frame * 3 + b"x"], pa.binary()))
    with pytest.raises(ValueError, match="whole number"):
        sample_ppm_frames_batch(ragged, n_sample=2)

    corrupt = good.set_column(2, "payload",
                              pa.array([frame + b"X6" + frame[2:] + frame],
                                       pa.binary()))
    with pytest.raises(ValueError, match="P6 header"):
        sample_ppm_frames_batch(corrupt, n_sample=3)
