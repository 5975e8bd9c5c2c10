"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Task mandate: image/audio/video are opaque ``binary`` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as pandas
UDFs over ``mapInPandas``.

Decode tiers:
- **Real, in-repo**: PPM (P6) and uncompressed 24-bit BMP decode in pure
  numpy (no external libs), then real nearest-neighbor resize and real
  per-channel + spatial-grid statistics as the feature vector.
- **Gated**: compressed formats (PNG/JPEG/…) need PIL/libvips, absent in
  this container — ``use_real=True`` on such a payload raises, per the
  import gate below.
- **Fake fallback**: payloads no real decoder claims get a clearly-marked
  deterministic pseudo-feature (sha1-derived), keeping the distributed
  plumbing exercised end-to-end; the ``decoded`` output column says which
  path each row took.

The reference's analog is the raw WARC payload column (BinaryType) and its
MIME sniffing (process.py:161,247-250); this module generalizes that to
non-text media.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import numpy as np
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
        T.StructField("decoded", T.BooleanType(), False),  # real decode vs fake
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
        "compressed-format decode (PNG/JPEG/…) requires PIL/libvips — not "
        "present in this container; PPM/BMP decode natively below"
    )


def decode_ppm(payload: bytes) -> Optional[np.ndarray]:
    """Binary PPM (P6) → (H, W, 3) uint8, pure numpy/stdlib. Handles
    comments and arbitrary whitespace in the header; maxval ≤ 255 only."""
    if payload[:2] != b"P6":
        return None
    vals, pos = [], 2
    while len(vals) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":
            pos = payload.find(b"\n", pos)
            if pos == -1:
                return None
            continue
        if c.isspace():
            pos += 1
            continue
        end = pos
        while end < len(payload) and not payload[end:end + 1].isspace():
            end += 1
        try:
            vals.append(int(payload[pos:end]))
        except ValueError:
            return None
        pos = end
    if len(vals) < 3 or vals[2] > 255 or vals[2] <= 0:
        return None
    w, h = vals[0], vals[1]
    pos += 1  # single whitespace after maxval
    if pos >= len(payload) or w <= 0 or h <= 0:
        # truncated right after the header (e.g. b"P6\n3 3 255"):
        # frombuffer raises on offset past the buffer
        return None
    px = np.frombuffer(payload, dtype=np.uint8, count=-1, offset=pos)
    if px.size < h * w * 3:
        return None
    return px[: h * w * 3].reshape(h, w, 3)


def decode_bmp(payload: bytes) -> Optional[np.ndarray]:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) → (H, W, 3) uint8 RGB,
    pure numpy: bottom-up row order, rows padded to 4 bytes, BGR storage."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < data_off + stride * h:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if flipped else img


def decode_image(payload: bytes) -> Optional[np.ndarray]:
    """Try the in-repo real decoders (PPM, BMP); None if neither claims it."""
    return decode_ppm(payload) if payload[:2] == b"P6" else decode_bmp(payload)


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize by index mapping (pure numpy, no loops)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def image_features(img: np.ndarray, grid: int = 2) -> list[float]:
    """Real feature vector: per-channel mean+std over the full image, then
    per-cell channel means on a grid×grid layout of a 32×32 NN resize —
    3+3+grid²·3 floats (8-dim default layout: 6 global + first 2 of grid)."""
    small = resize_nn(img, 32, 32).astype(np.float64) / 255.0
    feats = list(small.mean(axis=(0, 1))) + list(small.std(axis=(0, 1)))
    step = 32 // grid
    for gy in range(grid):
        for gx in range(grid):
            cell = small[gy * step:(gy + 1) * step, gx * step:(gx + 1) * step]
            feats.extend(cell.mean(axis=(0, 1)))
    return [float(x) for x in feats]


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
    narrow, no shuffle).

    Images in natively-decodable formats (PPM/BMP) get REAL decode → resize
    → statistics features and ``decoded=true``. Other payloads fall back to
    the deterministic fake (``decoded=false``) — unless ``use_real=True``,
    which makes an undecodable payload raise (the import-gated PIL slot)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                payload = bytes(r.payload)
                # a malformed record must degrade to the fake path, never
                # fail the whole mapInPandas task
                try:
                    img = decode_image(payload) if r.kind == "image" else None
                except Exception:
                    img = None
                if img is not None:
                    feats = image_features(img)
                    feats = (feats + [0.0] * feat_dim)[:feat_dim]
                    d = {
                        "sha1": hashlib.sha1(payload).hexdigest(),
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "feature": feats,
                    }
                    decoded = True
                else:
                    if use_real:
                        _decode_image_real(payload)  # raises: library absent
                    d = _decode_fake(payload, r.kind, feat_dim)
                    decoded = False
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
                        "decoded": decoded,
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


def make_ppm(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic P6 PPM test image (gradient + seed offset)."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 7 + seed) % 256, (y * 11 + seed) % 256, (x + y + seed) % 256],
                   axis=-1).astype(np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (w, h) + img.tobytes()


def make_bmp(w: int, h: int, seed: int = 0) -> bytes:
    """Deterministic uncompressed 24-bit bottom-up BMP test image."""
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 7 + seed) % 256, (y * 11 + seed) % 256, (x + y + seed) % 256],
                   axis=-1).astype(np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[:, :, ::-1].reshape(h, w * 3)  # RGB→BGR storage
    pix = rows[::-1].tobytes()  # bottom-up
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + pix


def synth_media(spark, n: int = 60, seed: int = 42) -> DataFrame:
    """Deterministic media table: real decodable PPM/BMP images interleaved
    with opaque PNG/RIFF/ftyp blobs (fake-feature path)."""
    import random

    rng = random.Random(seed)
    kinds = [("image", "image/png", b"\x89PNG\r\n\x1a\n"), ("audio", "audio/x-riff", b"RIFF"),
             ("video", "video/mp4", b"\x00\x00\x00 ftypisom")]
    rows = []
    for i in range(n):
        if i % 6 == 3:  # real decodable images in the mix
            payload = make_ppm(20 + i % 13, 14 + i % 7, seed=i)
            rows.append((i, "image", payload, "image/x-portable-pixmap", {"src": f"synth-{i}"}))
            continue
        if i % 6 == 5:
            payload = make_bmp(17 + i % 11, 9 + i % 5, seed=i)
            rows.append((i, "image", payload, "image/bmp", {"src": f"synth-{i}"}))
            continue
        kind, mime, magic = kinds[i % 3]
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(200, 2000)))
        rows.append((i, kind, magic + body, mime, {"src": f"synth-{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
