"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task mandate: image/audio/video are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as pandas
UDFs over ``mapInPandas``. The image/audio libraries are not in this
container, so the *decode* step is stubbed (deterministic fake derived from
the bytes, clearly marked), while everything Spark-side — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.

The reference's analog is the raw WARC payload column (BinaryType) and its
MIME sniffing (process.py:161,247-250); this module generalizes that to
non-text media.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODERS_AVAILABLE = False
try:  # pragma: no cover - the libs are absent in this container by design
    import PIL.Image  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except ImportError:
    pass


def _decode_image_real(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "real image decode requires PIL/libvips — not present in this "
        "container; the deterministic fake below exercises the same plumbing"
    )


def _decode_fake(payload: bytes, kind: str, feat_dim: int = 8) -> dict:
    """STUB decoder: deterministic pseudo-features from the payload bytes.

    Stands in for decode/resize/feature-extract so the distributed plumbing
    (Arrow batches, schema, partitioning) is real and testable. Marked fake:
    width/height/feature derive from sha1(payload), not pixels.
    """
    h = hashlib.sha1(payload).digest()
    feat = [((h[i % 20] / 255.0) * 2 - 1) for i in range(feat_dim)]
    return {
        "sha1": hashlib.sha1(payload).hexdigest(),
        "width": 16 + h[0] % 64 if kind == "image" else None,
        "height": 16 + h[1] % 64 if kind == "image" else None,
        "feature": feat,
    }


def extract_features(media: DataFrame, feat_dim: int = 8, use_real: bool = False) -> DataFrame:
    """media table -> per-item features via mapInPandas (Arrow-batched;
    narrow, no shuffle). ``use_real=True`` raises NotImplementedError until
    a decoder library is present (import-gated above)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                if use_real:
                    _decode_image_real(payload)  # raises: library absent
                d = _decode_fake(payload, r.kind, feat_dim)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "mime": r.mime,
                        "n_bytes": len(payload),
                        "sha1": d["sha1"],
                        "width": d["width"],
                        "height": d["height"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    (frame decode itself is the stubbed step). 1→N expansion via mapInPandas."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_sha1", T.StringType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if r.kind != "video":
                    continue
                payload = bytes(r.payload)
                n_frames = max(1, len(payload) // 64)
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": idx,
                            "frame_sha1": hashlib.sha1(payload + idx.to_bytes(4, "big")).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return media.mapInPandas(run, schema)


def synth_media(spark, n: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (PNG/RIFF/ftyp-prefixed byte blobs)."""
    import random

    rng = random.Random(seed)
    kinds = [("image", "image/png", b"\x89PNG\r\n\x1a\n"), ("audio", "audio/x-riff", b"RIFF"),
             ("video", "video/mp4", b"\x00\x00\x00 ftypisom")]
    rows = []
    for i in range(n):
        kind, mime, magic = kinds[i % 3]
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(200, 2000)))
        rows.append((i, kind, magic + body, mime, {"src": f"synth-{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
