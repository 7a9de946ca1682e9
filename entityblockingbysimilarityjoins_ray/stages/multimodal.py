"""Multimodal columns (image/audio as binary payload + typed metadata).

REAL decode, no external libraries: the codec step handles the uncompressed
public formats that numpy + the stdlib can parse exactly —

- PPM (P6, maxval 255)  — 3-field ASCII header + raw RGB24 rows
- BMP (BITMAPINFOHEADER, 24-bit uncompressed, bottom-up, 4-byte row padding)
- WAV (RIFF, PCM16 mono/stereo)

Compressed codecs (PNG/JPEG/MP3/video) would need PIL/libvips/ffmpeg, which
are not in this container; payloads in those formats raise a clearly-marked
``UnsupportedMediaError`` (callers may route them to a quarantine sink).
The Ray-side shape is the 100 TB pattern either way:
``read_parquet(columns=[id, payload, meta])`` ->
``map_batches(DecoderCls, batch_format="pyarrow", batch_size=small,
concurrency=pool, num_cpus=c)`` -> fixed-size feature columns, with batch
size kept small because payload rows are wide.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class UnsupportedMediaError(NotImplementedError):
    """Raised for payload formats that need codec libraries this container
    lacks (PNG/JPEG/video)."""


# ---------------------------------------------------------------------------
# pure-numpy encoders (used by the deterministic fixture synthesizer)
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PPM P6 bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR,
    4-byte-padded rows)."""
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


# ---------------------------------------------------------------------------
# pure-numpy decoders
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise UnsupportedMediaError("not a P6 PPM payload")
    # header = magic, width, height, maxval separated by whitespace/comments
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise UnsupportedMediaError("only maxval=255 PPM supported")
    arr = np.frombuffer(payload, np.uint8, count=h * w * 3, offset=pos)
    return arr.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed bottom-up BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0 or h <= 0:
        raise UnsupportedMediaError("only 24-bit uncompressed bottom-up BMP supported")
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(payload, np.uint8, count=h * stride, offset=pixel_off)
    rows = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (mono float32 samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    pos, rate, channels, data = 12, None, 1, None
    while pos + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:  # one failure type for malformed media
                raise UnsupportedMediaError("truncated WAV fmt chunk")
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise UnsupportedMediaError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if rate is None or data is None:
        raise UnsupportedMediaError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    if channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure indexing)."""
    h, w = img.shape[:2]
    yi = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xi = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[yi][:, xi]


# ---------------------------------------------------------------------------
# deterministic fixture synthesizer (REAL payload bytes)
# ---------------------------------------------------------------------------


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL decodable payloads: PPM and BMP
    gradient/noise images, PCM16 WAV tones; every third-and-one row is an
    intentionally unsupported format (PNG magic) to exercise the quarantine
    path."""
    rng = np.random.default_rng(seed)
    payloads, mimes, ws, hs, durs = [], [], [], [], []
    for i in range(n):
        kind = i % 4
        if kind == 0:  # PPM image
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img)); mimes.append("image/x-portable-pixmap")
            ws.append(w); hs.append(h); durs.append(0)
        elif kind == 1:  # BMP image
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(img)); mimes.append("image/bmp")
            ws.append(w); hs.append(h); durs.append(0)
        elif kind == 2:  # WAV tone
            ms = int(rng.integers(20, 200))
            t = np.arange(int(16000 * ms / 1000))
            freq = float(rng.uniform(100, 2000))
            wave = (np.sin(2 * np.pi * freq * t / 16000) * 12000).astype(np.int16)
            payloads.append(encode_wav(wave)); mimes.append("audio/wav")
            ws.append(0); hs.append(0); durs.append(ms)
        else:  # unsupported (PNG magic + noise)
            payloads.append(b"\x89PNG\r\n\x1a\n" + rng.integers(0, 256, 256, dtype=np.uint8).tobytes())
            mimes.append("image/png"); ws.append(16); hs.append(16); durs.append(0)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes),
            "width": pa.array(np.asarray(ws, np.int32)),
            "height": pa.array(np.asarray(hs, np.int32)),
            "duration_ms": pa.array(np.asarray(durs, np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# ---------------------------------------------------------------------------
# actor-pool decode stages
# ---------------------------------------------------------------------------


class MediaDecoder:
    """Actor-pool decode stage: PPM/BMP -> thumbnail feature vector,
    WAV -> audio feature vector, unsupported formats -> status='unsupported'
    rows (never a crashed task).  Feature layout: thumb*thumb*3 floats for
    images; [duration_s, rms, zero-cross-rate, peak] + 44 zero pad slots
    reserved for spectral features for audio — one fixed-size column so the
    output schema is stable across modalities."""

    FEAT_AUDIO = 48

    def __init__(self, thumb: int = 8):
        self.thumb = thumb
        self.feat_len = max(thumb * thumb * 3, self.FEAT_AUDIO)

    def _image_feature(self, img: np.ndarray) -> np.ndarray:
        th = resize_nearest(img, self.thumb, self.thumb)
        out = np.zeros(self.feat_len, np.float32)
        v = th.reshape(-1).astype(np.float32) / 255.0
        out[: v.size] = v
        return out

    def _audio_feature(self, samples: np.ndarray, rate: int) -> np.ndarray:
        out = np.zeros(self.feat_len, np.float32)
        n = max(samples.size, 1)
        out[0] = samples.size / rate
        out[1] = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
        out[2] = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1]))) if samples.size > 1 else 0.0
        out[3] = float(np.max(np.abs(samples))) if samples.size else 0.0
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.feat_len), np.float32)
        status = []
        wout = np.zeros(len(payloads), np.int32)
        hout = np.zeros(len(payloads), np.int32)
        for i, p in enumerate(payloads):
            try:
                if p[:2] == b"P6":
                    img = decode_ppm(p)
                    feats[i] = self._image_feature(img)
                    hout[i], wout[i] = img.shape[:2]
                    status.append("image")
                elif p[:2] == b"BM":
                    img = decode_bmp(p)
                    feats[i] = self._image_feature(img)
                    hout[i], wout[i] = img.shape[:2]
                    status.append("image")
                elif p[:4] == b"RIFF":
                    samples, rate = decode_wav(p)
                    feats[i] = self._audio_feature(samples, rate)
                    status.append("audio")
                else:
                    status.append("unsupported")
            except (UnsupportedMediaError, ValueError, struct.error, IndexError):
                # quarantine contract: a corrupt payload (truncated header,
                # dims exceeding the buffer, bad ASCII fields) must yield a
                # status row, never a crashed task
                feats[i] = 0.0
                wout[i] = hout[i] = 0
                status.append("corrupt" if (p[:2] in (b"P6", b"BM") or p[:4] == b"RIFF")
                              else "unsupported")
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.feat_len
                ),
                "status": pa.array(status, pa.string()),
                "decoded_w": pa.array(wout),
                "decoded_h": pa.array(hout),
                "payload_bytes": pa.array(
                    np.array([len(p) for p in payloads], dtype=np.int64)
                ),
            }
        )


# backwards-compatible alias (round-1 name; fake= kept for the old tests'
# signature but the decode is now REAL for PPM/BMP/WAV payloads)
class ImageDecoder(MediaDecoder):
    def __init__(self, fake: bool = True, thumb: int = 8):
        super().__init__(thumb=thumb)


def decode_media(
    media: "ray.data.Dataset", *, thumb: int = 8, batch_size: int = 64,
    concurrency=(1, 4), num_cpus: float = 1.0, fake: bool | None = None,
) -> "ray.data.Dataset":
    """The multimodal decode stage: small batches (payloads are wide),
    actor pool, typed fixed-size-list feature output.  ``fake`` is accepted
    for backwards compatibility and ignored — decode is real for the
    supported uncompressed formats."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"thumb": thumb},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
