"""From-scratch baseline JPEG codec + WAV decode: pure-Python unit tests
(no Spark session — the Spark-side plumbing is covered by the multimodal
tests and the `media_digest` oracle row).

Reference parity note: the reference indexes images only through Docling's
OCR/vision path (no raw-codec surface to mirror), so the contract under
test is the repo's own multimodal one: (width, height, grayscale-luma
pixels) for images, (sample_rate, int16 mono samples) for audio.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_rag_spark.operators.jpeg import (_ZIGZAG, decode_jpeg,
                                              encode_jpeg)
from docling_rag_spark.operators.multimodal import (_decode_one, build_jpeg,
                                                    build_wav)


def _smooth(h, w, channels=None, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(yy / 9) + 50 * np.cos(xx / 11)).astype(
        np.int64)
    if channels:
        return np.stack(
            [np.clip(base + rng.integers(-12, 12, (h, w)) + 20 * c, 0, 255)
             for c in range(channels)], axis=-1).astype(np.uint8)
    return np.clip(base + rng.integers(-12, 12, (h, w)), 0, 255).astype(
        np.uint8)


def _luma(img):
    i = img.astype(np.int64)
    return (299 * i[:, :, 0] + 587 * i[:, :, 1] + 114 * i[:, :, 2]) // 1000


@pytest.mark.parametrize("shape,kwargs", [
    ((24, 17), {}),                                    # gray, ragged dims
    ((16, 16, 3), {}),                                 # 4:4:4
    ((33, 22, 3), {"subsample": "420"}),               # 4:2:0, ragged
    ((40, 40), {"restart_interval": 3}),               # DRI + RSTn
    ((32, 48, 3), {"subsample": "420", "restart_interval": 2}),
])
def test_roundtrip_within_quant_error(shape, kwargs):
    img = _smooth(*shape[:2], channels=(shape[2] if len(shape) == 3
                                        else None))
    out = decode_jpeg(encode_jpeg(img, **kwargs))
    assert (out["width"], out["height"]) == (shape[1], shape[0])
    pix = out["pix"].reshape(shape[0], shape[1]).astype(np.int64)
    ref = _luma(img) if img.ndim == 3 else img.astype(np.int64)
    diff = np.abs(pix - ref)
    # quant tables peak at ~50; smooth content stays well inside
    assert diff.max() <= 40 and diff.mean() <= 8.0


def test_encode_is_deterministic():
    img = _smooth(20, 20, channels=3)
    assert encode_jpeg(img) == encode_jpeg(img.copy())


def test_zigzag_is_the_standard_order():
    # spot-pin the generated order against the first/last entries of the
    # T.81 figure (transcribed here only as a test witness)
    assert _ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                            (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(_ZIGZAG) == [(u, v) for u in range(8) for v in range(8)]


@pytest.mark.parametrize("shape,kwargs", [
    ((24, 17), {}),                                    # gray, ragged dims
    ((16, 16, 3), {}),                                 # 4:4:4
    ((33, 22, 3), {"subsample": "420"}),               # 4:2:0, ragged
    ((40, 40), {"restart_interval": 3}),               # DRI + RSTn
    ((32, 48, 3), {"subsample": "420", "restart_interval": 2}),
    ((8, 8), {}),                                      # single block
])
def test_progressive_decodes_bit_identical_to_baseline(shape, kwargs):
    """The SOF2 multi-scan path (DC/AC first + refinement, EOB runs)
    reconstructs the EXACT coefficients the baseline scan carries, so the
    decoded pixels are bit-identical between the two encodings of the
    same image."""
    img = _smooth(*shape[:2], channels=(shape[2] if len(shape) == 3
                                        else None))
    base = decode_jpeg(encode_jpeg(img, **kwargs))
    prog_bytes = encode_jpeg(img, progressive=True, **kwargs)
    assert b"\xff\xc2" in prog_bytes           # really SOF2
    assert prog_bytes.count(b"\xff\xda") >= 4  # really multi-scan
    prog = decode_jpeg(prog_bytes)
    assert (prog["width"], prog["height"]) == (base["width"],
                                               base["height"])
    assert np.array_equal(prog["pix"], base["pix"])


def test_progressive_missing_eoi_is_an_explicit_error():
    enc = encode_jpeg(_smooth(16, 16, channels=3), progressive=True)
    # drop EOI and everything after the second scan's data
    second_sos = enc.index(b"\xff\xda", enc.index(b"\xff\xda") + 2)
    with pytest.raises(ValueError):
        decode_jpeg(enc[:second_sos + 40])


def test_progressive_encode_is_deterministic():
    img = _smooth(20, 20, channels=3)
    assert (encode_jpeg(img, progressive=True)
            == encode_jpeg(img.copy(), progressive=True))


def test_other_sof_modes_are_an_explicit_error():
    enc = bytearray(encode_jpeg(_smooth(8, 8)))
    sof = enc.index(b"\xff\xc0")
    enc[sof + 1] = 0xC3                        # SOF3 (lossless)
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(enc))


def test_truncated_entropy_stream_is_an_explicit_error():
    enc = encode_jpeg(_smooth(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg(enc[:len(enc) // 2])


def test_pixel_cap_applies_before_allocation():
    enc = bytearray(encode_jpeg(_smooth(8, 8)))
    sof = enc.index(b"\xff\xc0")
    # SOF body: len(2) prec(1) h(2) w(2) — claim 65535 x 65535
    enc[sof + 5:sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg(bytes(enc))


def test_multimodal_routes_jpeg():
    d = _decode_one(build_jpeg(19, 14, seed=5))
    assert d["media_type"] == "image"
    assert (d["width"], d["height"]) == (19, 14)
    assert d["pix"].size == 19 * 14


@pytest.mark.parametrize("n_channels,bits", [(1, 16), (2, 16), (1, 8)])
def test_wav_roundtrip(n_channels, bits):
    payload = build_wav(8000, 3000, seed=3, n_channels=n_channels,
                        bits=bits)
    d = _decode_one(payload)
    assert d["media_type"] == "audio"
    assert d["sample_rate"] == 8000
    assert len(d["samples"]) == 3000
    if n_channels == 1 and bits == 16:
        rng = np.random.default_rng(3)
        expect = rng.integers(-2000, 2000, 3000, dtype=np.int16)
        assert np.array_equal(d["samples"], expect)


def test_non_pcm_wav_and_avi_are_refused_not_misdecoded():
    wav = bytearray(build_wav(8000, 100, seed=1))
    tag_off = wav.index(b"fmt ") + 8
    wav[tag_off:tag_off + 2] = struct.pack("<H", 7)   # mu-law
    with pytest.raises(NotImplementedError, match="non-PCM"):
        _decode_one(bytes(wav))
    avi = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    with pytest.raises(NotImplementedError, match="codec library"):
        _decode_one(avi)


def test_truncated_wav_chunk_is_an_explicit_error():
    payload = build_wav(8000, 100, seed=1)
    with pytest.raises(ValueError):
        _decode_one(payload[:30])
