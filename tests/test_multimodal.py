"""Real pure-numpy media codecs + the actor-pool decode stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def test_codec_roundtrips():
    from entityblockingbysimilarityjoins_ray.stages.multimodal import (
        decode_bmp, decode_ppm, decode_wav, encode_bmp, encode_ppm, encode_wav)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_bmp(encode_bmp(img)) == img).all()
    s = (np.sin(np.arange(3200) / 7.0) * 11000).astype(np.int16)
    out, rate = decode_wav(encode_wav(s))
    assert rate == 16000
    np.testing.assert_allclose(out, s / 32768.0, atol=1e-4)


def test_ppm_header_with_comment():
    from entityblockingbysimilarityjoins_ray.stages.multimodal import decode_ppm

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    assert (decode_ppm(payload) == img).all()


def test_unsupported_raises():
    from entityblockingbysimilarityjoins_ray.stages.multimodal import (
        UnsupportedMediaError, decode_ppm, decode_wav)

    with pytest.raises(UnsupportedMediaError):
        decode_ppm(b"\x89PNG\r\n\x1a\nxxxx")
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"RIFFxxxxJUNK")


def test_decode_media_stage(ray_session):
    from entityblockingbysimilarityjoins_ray.stages.multimodal import (
        MediaDecoder, decode_media, decode_ppm, resize_nearest, synthesize_media)

    tbl = synthesize_media(64, seed=9)
    out = decode_media(ray.data.from_arrow(tbl), batch_size=16).to_pandas()
    assert len(out) == 64
    counts = out["status"].value_counts().to_dict()
    assert counts["image"] == 32 and counts["audio"] == 16 and counts["unsupported"] == 16
    # spot-check one image row's feature against a direct decode
    pay = tbl.column("payload").to_pylist()
    mid = int(out[out.status == "image"].iloc[0]["media_id"])
    img = decode_ppm(pay[mid]) if pay[mid][:2] == b"P6" else None
    if img is not None:
        th = resize_nearest(img, 8, 8).reshape(-1).astype(np.float32) / 255.0
        feat = np.asarray(out.loc[out.media_id == mid, "feature"].iloc[0], dtype=np.float32)
        np.testing.assert_allclose(feat[: th.size], th)
    # decoded dims echo the true payload dims
    im = out[out.status == "image"]
    assert (im["decoded_w"] > 0).all() and (im["decoded_h"] > 0).all()
    # audio features: duration > 0, rms in (0, 1)
    au = out[out.status == "audio"]
    feats = np.stack(au["feature"].to_numpy())
    assert (feats[:, 0] > 0).all() and ((feats[:, 1] > 0) & (feats[:, 1] < 1)).all()


def test_corrupt_payloads_quarantined(ray_session):
    """A malformed payload with a recognized magic must yield a status row,
    never a crashed decode task."""
    from entityblockingbysimilarityjoins_ray.stages.multimodal import MediaDecoder

    bad = [
        b"P6",                           # bare magic
        b"P6\n3 2\n255\n\x00",           # dims exceed buffer
        b"BM" + b"\x00" * 10,            # truncated BMP header
        b"RIFF\x04\x00\x00\x00WAVE",     # WAV without fmt/data
        b"RIFFJUNK",                     # truncated RIFF
    ]
    import pyarrow as pa

    t = pa.table({
        "media_id": pa.array(list(range(len(bad))), pa.int64()),
        "payload": pa.array(bad, pa.binary()),
    })
    out = MediaDecoder()(t)
    assert out.num_rows == len(bad)
    assert set(out.column("status").to_pylist()) <= {"corrupt", "unsupported"}


def test_decode_wav_truncated_fmt_raises_media_error():
    """A truncated fmt chunk raises UnsupportedMediaError, not struct.error —
    one failure type for direct decoder callers."""
    import struct

    import pytest

    from entityblockingbysimilarityjoins_ray.stages.multimodal import (
        UnsupportedMediaError,
        decode_wav,
    )

    body = b"\x01\x00\x01\x00"  # 4-byte fmt chunk (< 16)
    payload = b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WAVE"
    payload += b"fmt " + struct.pack("<I", len(body)) + body
    with pytest.raises(UnsupportedMediaError):
        decode_wav(payload)
