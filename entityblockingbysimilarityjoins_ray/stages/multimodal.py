"""Multimodal column plumbing (image/audio/video as opaque binary columns).

The decode/resize/feature-extraction libraries (PIL, torchaudio, ffmpeg) are
NOT in this container, so the *codec* step is stubbed behind a clearly-marked
``NotImplementedError`` / deterministic fake — but the Ray-side plumbing is
real and tested: schema (binary payload + typed metadata), actor-pool stage
signature, small batch sizes for large payloads, and the output layout.

At 100 TB the pattern is: ``read_parquet(columns=[id, payload, meta])`` ->
``map_batches(DecoderCls, batch_format="pyarrow", batch_size=small,
concurrency=pool, num_cpus=c)`` -> feature columns, with
``DataContext.target_max_block_size`` raised so wide binary rows aren't split
into absurdly small blocks.
"""

from __future__ import annotations

import hashlib

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


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests (binary payloads)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png" if i % 3 else "audio/wav" for i in range(n)]),
            "width": pa.array(rng.integers(16, 2048, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 2048, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool decode stage.  Real deployments plug a PIL/libvips decode
    into `_decode`; here it raises unless `fake=True`, in which case a
    deterministic byte-hash 'thumbnail' stands in so the pipeline shape is
    exercised end-to-end."""

    def __init__(self, fake: bool = True, thumb: int = 8):
        self.fake = fake
        self.thumb = thumb

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/libvips, not available in this container"
            )
        # deterministic fake: md5-seeded pseudo-pixels at thumbnail size
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(self.thumb, self.thumb, 3), dtype=np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id")
        payloads = t.column("payload").to_pylist()
        widths = np.asarray(t.column("width"), dtype=np.int32)
        heights = np.asarray(t.column("height"), dtype=np.int32)
        thumbs = np.stack(
            [self._decode(p, int(w), int(h)) for p, w, h in zip(payloads, widths, heights)]
        )
        feats = thumbs.reshape(len(payloads), -1).astype(np.float32) / 255.0
        return pa.table(
            {
                "media_id": ids,
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), feats.shape[1]
                ),
                "payload_bytes": pa.array(
                    np.array([len(p) for p in payloads], dtype=np.int64)
                ),
            }
        )


def decode_media(
    media: "ray.data.Dataset", *, fake: bool = True, batch_size: int = 64,
    concurrency=(1, 4), num_cpus: float = 1.0,
) -> "ray.data.Dataset":
    """The multimodal decode stage: small batches (payloads are wide),
    actor pool, typed fixed-size-list feature output."""
    return media.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
