"""Haitsma-Kalker audio fingerprints: invariances + near-dup pairing."""

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ocgis_ray.stages.multimodal import (audio_fingerprint_batch,
                                         audio_fingerprints,
                                         audio_near_duplicates,
                                         hk_subfingerprints)

RATE = 8000
NS = 8192


def clip(content_seed, noise_seed=None, noise=0.0):
    """Broadband 'program' audio (HK is built for broadband content —
    a pure tone leaves most log bands empty, so their bits are noise):
    seeded noise through a time-varying comb of moving band
    emphases, i.e. the same content_seed reproduces the same
    spectro-temporal structure; independent noise_seed perturbation
    models coding noise."""
    rng = np.random.RandomState(content_seed)
    base = rng.normal(0, 1.0, NS)
    # time-varying spectral shaping: multiply segments by seeded
    # envelopes and add seeded slow AM so band energies MOVE
    t = np.arange(NS, dtype=np.float64)
    am = 1.0 + 0.8 * np.sin(2 * np.pi * t * rng.uniform(1.5, 4.0) / NS
                            + rng.uniform(0, 6.28))
    seg_env = np.repeat(rng.uniform(0.2, 1.0, NS // 512), 512)
    w = base * am * seg_env
    if noise:
        w = w + np.random.RandomState(noise_seed).normal(
            0, noise * w.std(), NS)
    return w / np.abs(w).max() * 0.8


def tone(freqs, amps, seed=None, noise=0.0):
    # kept for the invariance tests (deterministic narrowband signal)
    t = np.arange(NS, dtype=np.float64)
    w = sum(a * np.sin(2 * np.pi * f * t / RATE)
            for f, a in zip(freqs, amps))
    if noise:
        w = w + np.random.RandomState(seed).normal(0, noise, NS)
    peak = np.abs(w).max() or 1.0
    return w / peak * 0.8


def wav_bytes(w):
    pcm = np.round(w * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm),
                      b"WAVE", b"fmt ", 16, 1, 1, RATE, RATE * 2, 2, 16,
                      b"data", len(pcm))
    return hdr + pcm


def media_table(waves):
    return pa.table({
        "media_id": pa.array(np.arange(len(waves), dtype=np.int64)),
        "kind": pa.array(["audio"] * len(waves)),
        "payload": pa.array([wav_bytes(w) for w in waves], pa.binary()),
        "n_bytes": pa.array(np.full(len(waves), NS * 2 + 44, np.int64)),
        "meta_w": pa.array(np.full(len(waves), RATE, np.int64)),
        "meta_h": pa.array(np.full(len(waves), NS, np.int64)),
    })


def hamming(a, b):
    return bin(np.uint64(a) ^ np.uint64(b)).count("1")


def test_subfingerprint_shape_and_determinism():
    w = tone([440, 880], [0.6, 0.3])
    fp1 = hk_subfingerprints(w * 32767, RATE)
    fp2 = hk_subfingerprints(w * 32767, RATE)
    n_frames = 1 + (NS - 2048) // 1024
    assert len(fp1) == n_frames - 1
    assert np.array_equal(fp1, fp2)
    # too-short input -> empty
    assert len(hk_subfingerprints(np.zeros(100), RATE)) == 0


def test_volume_invariance():
    w = tone([523, 1046], [0.5, 0.25], seed=1, noise=0.02)
    a = hk_subfingerprints(w * 32767, RATE)
    b = hk_subfingerprints(w * 3276.7, RATE)  # 20 dB quieter
    assert np.array_equal(a, b)  # energy-ratio signs are scale-free


def test_batch_signature_separates_content():
    same1 = clip(10, noise_seed=1, noise=0.05)
    same2 = clip(10, noise_seed=2, noise=0.05)
    other = clip(11, noise_seed=3, noise=0.05)
    out = audio_fingerprint_batch(media_table([same1, same2, other]))
    sig = out["af_sig"].to_numpy()
    assert hamming(sig[0], sig[1]) <= 8
    assert hamming(sig[0], sig[2]) > 12
    assert all(len(f) > 0 for f in out["af_frames"].to_pylist())


def test_near_dup_pipeline(ray_session):
    waves = [clip(10, noise_seed=1, noise=0.05),
             clip(10, noise_seed=2, noise=0.05),
             clip(11, noise_seed=3, noise=0.05),
             clip(12, noise_seed=4, noise=0.05)]
    ds = rd.from_arrow(media_table(waves))
    sigs = audio_fingerprints(ds, concurrency=2)
    pairs = audio_near_duplicates(sigs, max_hamming=6).to_pandas()
    got = {tuple(sorted(p)) for p in
           zip(pairs["media_id_a"], pairs["media_id_b"])}
    assert (0, 1) in got
    assert all(p == (0, 1) for p in got)  # no cross-content pairs


def test_degenerate_metadata_yields_empty_fingerprints():
    samples = np.random.RandomState(0).normal(0, 1, NS)
    # rate <= 0: previously ZeroDivisionError in rfftfreq
    assert hk_subfingerprints(samples, 0).size == 0
    assert hk_subfingerprints(samples, -8000).size == 0
    # Nyquist below f_lo: previously decreasing geomspace edges ->
    # non-monotonic reduceat -> garbage bits
    assert hk_subfingerprints(samples, 500).size == 0
    # healthy rate still fingerprints
    assert hk_subfingerprints(samples, RATE).size > 0


def test_rate_exactly_twice_f_lo_is_degenerate():
    samples = np.random.RandomState(1).normal(0, 1, NS)
    # rate == 2*f_lo: Nyquist equals f_lo, band edges collapse —
    # previously produced identical all-zero-difference fingerprints
    assert hk_subfingerprints(samples, 600).size == 0
    assert hk_subfingerprints(samples, 601).size > 0
