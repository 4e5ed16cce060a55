"""Baseline JPEG codec (stages/jpeg.py): spec-parity + round trips.

The decoder is validated two independent ways:

1. Against the SPEC, not our encoder: a hand-assembled T.81-conformant
   payload whose entropy bits are computed by hand from the Annex K
   canonical Huffman codes (so a mirrored encoder/decoder bug — e.g. a
   wrong-but-consistent zigzag — cannot pass).
2. Round trips through every encoder configuration (4:4:4, 4:2:0,
   grayscale, restart markers) with codec-appropriate tolerances.
"""

import struct

import numpy as np
import pytest

from ocgis_ray.stages.jpeg import (
    ZIGZAG,
    _huff_codes,
    _AC_LUM,
    _DC_LUM,
    _dct_matrix,
    jpeg_decode,
    jpeg_encode,
)


def _smooth_raster(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (xx * 3 + 40) % 200 + 20,
        (yy * 4 + 30) % 200 + 20,
        ((xx + yy) * 2 + 50) % 200 + 20,
    ], axis=2).astype(np.uint8)


def test_zigzag_matches_published_order():
    # first 16 entries of the T.81 zigzag, as published
    assert ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10,
                                    17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[-1] == 63


def test_canonical_huffman_codes():
    dc = _huff_codes(*_DC_LUM)
    assert dc[0] == (0b00, 2)          # DC category 0 -> '00'
    assert dc[6] == (0b1110, 4)        # DC category 6 -> '1110'
    ac = _huff_codes(*_AC_LUM)
    assert ac[0x00] == (0b1010, 4)     # EOB -> '1010'
    assert ac[0x01] == (0b00, 2)       # run 0 / size 1 -> '00'
    # canonical property: codes of each length are consecutive
    by_len = {}
    for code, ln in ac.values():
        by_len.setdefault(ln, []).append(code)
    for ln, codes in by_len.items():
        codes.sort()
        assert codes == list(range(codes[0], codes[0] + len(codes)))


def test_dct_matrix_orthonormal():
    A = _dct_matrix()
    assert np.allclose(A @ A.T, np.eye(8), atol=1e-12)


def _hand_jpeg(entropy: bytes, gray_quant: int = 16) -> bytes:
    """Minimal spec-conformant single-component 8x8 JPEG assembled by
    hand (quant table = Annex K luminance at quality 50, whose DC
    entry is 16)."""
    from ocgis_ray.stages.jpeg import QUANT_LUM

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    assert QUANT_LUM[0] == gray_quant
    parts = [b"\xFF\xD8"]
    parts.append(seg(0xFFDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG].tolist())))
    parts.append(seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1)
                     + bytes([1, 0x11, 0])))
    bits, vals = _DC_LUM
    parts.append(seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals)))
    bits, vals = _AC_LUM
    parts.append(seg(0xFFC4, bytes([0x10]) + bytes(bits) + bytes(vals)))
    parts.append(seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])))
    parts.append(entropy)
    parts.append(b"\xFF\xD9")
    return b"".join(parts)


def test_decode_hand_assembled_gray128():
    # solid 128: level shift 0 -> DC diff 0 ('00') + EOB ('1010'),
    # padded with 1s -> 0b00101011 = 0x2B
    px = jpeg_decode(_hand_jpeg(bytes([0x2B])))
    assert px.shape == (8, 8, 3)
    assert np.all(px == 128)


def test_decode_hand_assembled_gray200():
    # solid 200: DC coef = 64*72/8 = 576, quant 16 -> 36 = category 6.
    # DC cat-6 code '1110' + bits '100100' + EOB '1010' + pad '11'
    # -> 11101001 00101011 = 0xE9 0x2B
    px = jpeg_decode(_hand_jpeg(bytes([0xE9, 0x2B])))
    assert np.all(px == 200)


def test_roundtrip_444():
    px = _smooth_raster()
    dec = jpeg_decode(jpeg_encode(px, quality=90))
    err = np.abs(dec.astype(float) - px.astype(float))
    assert dec.shape == px.shape
    assert err.max() <= 6 and err.mean() < 1.5


def test_roundtrip_420_subsampled():
    px = _smooth_raster(h=22, w=30)   # non-multiple of 16: MCU padding
    dec = jpeg_decode(jpeg_encode(px, quality=90, subsample=True))
    err = np.abs(dec.astype(float) - px.astype(float))
    assert dec.shape == px.shape
    assert err.mean() < 3.0 and err.max() <= 40  # chroma edges

def test_roundtrip_grayscale():
    rng = np.random.default_rng(7)
    px = (rng.integers(0, 200, (17, 23)) // 8 * 8 + 20).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(px, quality=95))
    assert dec.shape == (17, 23, 3)
    # grayscale replicates channels
    assert np.all(dec[..., 0] == dec[..., 1])
    err = np.abs(dec[..., 0].astype(float) - px.astype(float))
    assert err.mean() < 12.0          # random noise is worst-case DCT


def test_roundtrip_restart_markers():
    px = _smooth_raster(h=32, w=48)
    plain = jpeg_decode(jpeg_encode(px, quality=85))
    with_rst = jpeg_encode(px, quality=85, restart_interval=3)
    assert b"\xFF\xDD" in with_rst            # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in with_rst for k in range(8))
    dec = jpeg_decode(with_rst)
    # restart segmentation must not change a single pixel
    assert np.array_equal(dec, plain)


def test_quality_monotone_size():
    px = _smooth_raster()
    sizes = [len(jpeg_encode(px, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError):
        jpeg_decode(b"P6\n1 1\n255\nabc")
    good = jpeg_encode(_smooth_raster(8, 8))
    progressive = good.replace(b"\xFF\xC0", b"\xFF\xC2", 1)
    with pytest.raises(NotImplementedError):
        jpeg_decode(progressive)


def test_mixed_dispatch_includes_jpeg(ray_session, sf_dir):
    """decode_images routes PPM rows exactly, PNG rows exactly, and
    JPEG rows through the real lossy codec (stats within tolerance of
    the shared gradient raster)."""
    from ocgis_ray.stages.multimodal import (
        _gradient_pixels,
        _pixel_stats,
        decode_images,
        synth_image_media,
        synth_jpeg_media,
    )

    mixed = synth_image_media(sf_dir, w=32, h=24)
    jpg = synth_jpeg_media(sf_dir, w=32, h=24, quality=95)
    out = (decode_images(mixed.union(jpg))
           .to_pandas().sort_values(["media_id", "n_bytes"]))
    assert len(out) > 0
    # three containers of the same raster: for each media_id the two
    # lossless rows agree exactly and the JPEG row is close
    some = out["media_id"].unique()[:20]
    for mid in some:
        rows = out[out["media_id"] == mid]
        assert len(rows) == 2          # one lossless + one jpeg per doc
        exp, exp_luma, _ = _pixel_stats(
            _gradient_pixels(np.array([mid]), 32, 24)[0])
        lumas = rows["luma"].to_numpy()
        assert np.isclose(lumas, exp_luma, atol=4.0).all()
        assert np.isclose(lumas, exp_luma, atol=1e-9).any()  # lossless row
