"""Multimodal plumbing: decode/feature/resize/frame-sample over binary cols."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from docling_rag_spark.operators.multimodal import (
    FAKE_IMG,
    build_fake_audio,
    build_fake_image,
    build_fake_video,
    describe_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m://img1", build_fake_image(8, 6, seed=1)),
        ("m://img2", build_fake_image(32, 32, seed=2)),
        ("m://vid1", build_fake_video(25, seed=3)),
        ("m://vid2", build_fake_video(3, seed=4)),
        ("m://aud1", build_fake_audio(16000, 32000, seed=5)),
        ("m://real.jpg", b"\xff\xd8\xff\xe0junk"),   # corrupt jpeg → error row
        ("m://real.avi", b"RIFF\x10\x00\x00\x00AVI LIST"),  # codec → stubbed
        ("m://junk", b"not-a-container"),
    ]
    return spark.createDataFrame(rows, "url string, payload binary").coalesce(2)


def test_describe_media(spark, media):
    rows = {r["url"]: r for r in describe_media(media).collect()}
    assert rows["m://img1"]["media_type"] == "image"
    assert (rows["m://img1"]["width"], rows["m://img1"]["height"]) == (8, 6)
    assert rows["m://vid1"]["n_frames"] == 25
    assert rows["m://aud1"]["sample_rate"] == 16000
    assert abs(rows["m://aud1"]["duration_s"] - 2.0) < 1e-9
    # features are unit-normalized and deterministic
    f = np.array(rows["m://img2"]["feature"])
    assert abs(float(np.linalg.norm(f)) - 1.0) < 1e-5
    again = {r["url"]: r for r in describe_media(media).collect()}
    assert rows["m://img2"]["feature"] == again["m://img2"]["feature"]
    # corrupt real payloads + junk → fail-soft error rows, batch continues
    assert rows["m://real.jpg"]["status"] == "error"
    assert "NotImplemented" not in (rows["m://real.jpg"]["error"] or "")
    # unsupported real containers (AVI) are an explicit codec refusal
    assert rows["m://real.avi"]["status"] == "error"
    assert "codec" in rows["m://real.avi"]["error"]
    assert rows["m://junk"]["status"] == "error"
    assert sum(1 for r in rows.values() if r["status"] == "ok") == 5


def test_sample_frames_even_stride(spark, media):
    rows = [r for r in sample_frames(media, max_frames=10).collect()]
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r["frame_idx"])
    # 25 frames, k=10 → stride 2 → frames 0,2,…,18 (capped at 10)
    assert sorted(by_url["m://vid1"]) == list(range(0, 20, 2))
    # fewer frames than k → all frames
    assert sorted(by_url["m://vid2"]) == [0, 1, 2]
    assert set(by_url) == {"m://vid1", "m://vid2"}  # non-videos dropped


def test_resize_images_nearest(spark, media):
    rows = {r["url"]: r for r in
            resize_images(media, 4, 3).collect()}
    ok = rows["m://img1"]
    assert ok["status"] == "ok"
    w, h = struct.unpack_from("<II", bytes(ok["payload"]), 4)
    assert (w, h) == (4, 3)
    assert bytes(ok["payload"]).startswith(FAKE_IMG)
    # subsample grid of the original pixels
    src = build_fake_image(8, 6, seed=1)
    src_pix = np.frombuffer(src, np.uint8, 48, 12).reshape(6, 8)
    out_pix = np.frombuffer(bytes(ok["payload"]), np.uint8, 12,
                            12).reshape(3, 4)
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(4) * 8) // 4
    assert np.array_equal(out_pix, src_pix[np.ix_(ys, xs)])
    assert rows["m://vid1"]["status"].startswith("error")


def test_hostile_headers_fail_soft(spark):
    """Attacker-controlled header fields must be bounds-checked before any
    allocation: a 12-byte FVID claiming 4e9 frames, a zero-dim FIMG, and an
    FIMG claiming more pixels than the payload carries all become
    status='error' rows — never an executor OOM or task failure."""
    bomb_vid = FAKE_IMG[:0] + b"FVID" + struct.pack("<II", 0xFFFFFFFF, 1)
    zero_flen = b"FVID" + struct.pack("<II", 5, 0) + b"xxxxx"
    zero_img = FAKE_IMG + struct.pack("<II", 0, 7)
    lying_img = FAKE_IMG + struct.pack("<II", 1000, 1000) + b"\x00" * 16
    rows = [("m://bomb", bomb_vid), ("m://zflen", zero_flen),
            ("m://zimg", zero_img), ("m://lying", lying_img),
            ("m://ok", build_fake_image(4, 4, seed=9))]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in describe_media(df).collect()}
    for u in ("m://bomb", "m://zflen", "m://zimg", "m://lying"):
        assert got[u]["status"] == "error", u
    assert got["m://ok"]["status"] == "ok"
    # frame sampling and resizing just drop / error-row the hostile rows
    assert [r["url"] for r in sample_frames(df).collect()] == []
    rs = {r["url"]: r["status"] for r in resize_images(df, 2, 2).collect()}
    assert rs["m://ok"] == "ok"
    assert all(s.startswith("error") for u, s in rs.items() if u != "m://ok")


# --- real PNG decode (VERDICT r3 task 4) --------------------------------------

def test_png_roundtrip_all_filters_and_colortypes():
    """build_png forward-filters every scanline; the decoder must invert
    filters 0-4 for gray/RGB/gray+alpha/RGBA back to the exact pixels."""
    from docling_rag_spark.operators.multimodal import _decode_png, build_png

    for ct in (0, 2, 4, 6):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
        for ft in (0, 1, 2, 3, 4):
            d = _decode_png(build_png(9, 7, seed=ct * 10 + ft,
                                      color_type=ct, filter_type=ft))
            rng = np.random.default_rng(ct * 10 + ft)
            pix = rng.integers(0, 256, (7, 9 * ch), dtype=np.uint8) \
                .reshape(7, 9, ch).astype(np.int32)
            gray = (pix[:, :, 0] if ch <= 2 else
                    (299 * pix[:, :, 0] + 587 * pix[:, :, 1]
                     + 114 * pix[:, :, 2]) // 1000)
            assert (d["width"], d["height"]) == (9, 7)
            assert np.array_equal(d["pix"],
                                  gray.astype(np.uint8).reshape(-1)), (ct, ft)


def test_png_through_spark_pipeline(spark):
    """Real PNG payloads flow through describe_media and resize_images as
    first-class images; hostile/truncated/interlaced PNGs are error rows."""
    import struct as _s
    import zlib as _z

    from docling_rag_spark.operators.multimodal import (
        PNG_SIG, _png_chunk, build_png)

    interlaced = (PNG_SIG
                  + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 1))
                  + _png_chunk(b"IDAT", _z.compress(b"\x00" * 15))
                  + _png_chunk(b"IEND", b""))
    bomb = (PNG_SIG
            + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", b"x") + _png_chunk(b"IEND", b""))
    rows = [
        ("m://real1.png", build_png(10, 8, seed=1, color_type=2)),
        ("m://real2.png", build_png(5, 5, seed=2, color_type=6, filter_type=4)),
        ("m://trunc.png", build_png(4, 4, seed=3)[:-20]),
        ("m://adam7.png", interlaced),
        ("m://bomb.png", bomb),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = {r["url"]: r for r in describe_media(df).collect()}
    assert got["m://real1.png"]["status"] == "ok"
    assert (got["m://real1.png"]["width"], got["m://real1.png"]["height"]) == (10, 8)
    assert got["m://real2.png"]["media_type"] == "image"
    assert got["m://real2.png"]["feature"] is not None
    for bad in ("m://trunc.png", "m://adam7.png", "m://bomb.png"):
        assert got[bad]["status"] == "error", bad
    # resize accepts the decoded PNG and re-encodes to the fake container
    rz = {r["url"]: r for r in
          resize_images(df, 4, 4).collect()}
    assert rz["m://real1.png"]["status"] == "ok"
    assert rz["m://real1.png"]["payload"][:4] == FAKE_IMG
    w, h = struct.unpack_from("<II", bytes(rz["m://real1.png"]["payload"]), 4)
    assert (w, h) == (4, 4)
