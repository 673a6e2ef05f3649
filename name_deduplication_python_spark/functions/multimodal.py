"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample operators.

The Spark-side contract (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec step is STUBBED because
image/audio libraries are not available in this container. Each stub is
either a clearly-marked NotImplementedError (strict mode) or a
deterministic fake decoder (test mode) so the distributed plumbing can be
exercised end-to-end. Swap `_decode_image_real` etc. with PIL/ffmpeg
calls on a real cluster — signatures stay identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),  # image/jpeg, audio/wav, video/mp4
        T.StructField("content", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id string, feat array<float>, out_width int, out_height int, n_bytes int"
)

FRAME_SAMPLE_DDL = "media_id string, frame_idx int, frame_sha256 string"


def _decode_image_real(content: bytes) -> np.ndarray:  # pragma: no cover
    """Real decoder slot (PIL/libjpeg on a real cluster)."""
    raise NotImplementedError(
        "image codec not available in this environment; install pillow and "
        "replace _decode_image_real (plumbing is codec-agnostic)"
    )


def _decode_image_fake(content: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake decode: bytes -> pseudo-pixels via sha256 stream.
    Same bytes -> same 'image' on any worker; keeps batch shapes honest."""
    need = w * h
    out = np.empty(need, dtype=np.uint8)
    pos, ctr = 0, 0
    while pos < need:
        block = hashlib.sha256(content + ctr.to_bytes(4, "big")).digest()
        take = min(len(block), need - pos)
        out[pos : pos + take] = np.frombuffer(block[:take], dtype=np.uint8)
        pos += take
        ctr += 1
    return out.reshape(h, w)


def image_features(
    media: DataFrame, target: tuple[int, int] = (8, 8), strict: bool = False
) -> DataFrame:
    """decode -> resize(target) -> flatten features. mapInPandas; one Arrow
    batch of binaries in, one batch of float feature vectors out."""
    tw, th = target

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, w, h in zip(
                pdf["media_id"], pdf["content"], pdf["width"], pdf["height"]
            ):
                if content is None:
                    continue
                if strict:
                    img = _decode_image_real(bytes(content))
                else:
                    # nullable int32 surfaces as float NaN through Arrow;
                    # NaN is truthy so `w or 16` would int(NaN) and crash
                    wv = 16 if pd.isna(w) else int(w)
                    hv = 16 if pd.isna(h) else int(h)
                    img = _decode_image_fake(bytes(content), max(wv, 1), max(hv, 1))
                # nearest-neighbor resize (pure numpy, deterministic)
                ys = (np.arange(th) * img.shape[0] // th).clip(0, img.shape[0] - 1)
                xs = (np.arange(tw) * img.shape[1] // tw).clip(0, img.shape[1] - 1)
                small = img[np.ix_(ys, xs)].astype(np.float32) / 255.0
                rows.append((mid, small.ravel().tolist(), tw, th, len(content)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "feat", "out_width", "out_height", "n_bytes"],
                )

    return media.mapInPandas(gen, schema=IMAGE_FEATURES_DDL)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """Video frame sampling: 1 row -> N frame rows (UDTF-shaped, like the
    reference's FullName splitter P2 but row-multiplying). Frames are
    sha256 slices of the content stream in fake mode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                if content is None or pd.isna(dur) or not dur:
                    continue
                if strict:
                    raise NotImplementedError(
                        "video codec not available; replace with ffmpeg probe"
                    )
                n_frames = max(1, int(dur) // every_ms)
                for i in range(n_frames):
                    digest = hashlib.sha256(
                        bytes(content) + i.to_bytes(4, "big")
                    ).hexdigest()
                    rows.append((mid, i, digest))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["media_id", "frame_idx", "frame_sha256"]
                )

    return media.mapInPandas(gen, schema=FRAME_SAMPLE_DDL)
