"""Multimodal column plumbing: image/audio/video as opaque binary.

The engine treats media exactly like html: an opaque BinaryType column
plus typed metadata, processed in Arrow batches via ``mapInPandas``.

What is REAL without any codec: magic-byte validity classification and
header-derived dimensions for PNG/JPEG/GIF/TIFF (O4 semantics — the
reference PIL-opens bytes only to verify integrity,
services/file_processor.py:49-62).  That is the default path.

What is stubbed (no Pillow/ffmpeg in this container — SURVEY.md §7.0):
*pixel/sample decode*.  Non-image payloads therefore yield
``processing_error`` rows unless ``fake=True`` (deterministic fake
seeded from the payload digest, for plumbing tests) or a real
``decode_fn`` (payload: bytes -> dict) is supplied — the Spark plan is
unchanged either way.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.extractor.core import parse_image_header

__all__ = ["MEDIA_SCHEMA", "decode_media", "sample_frames"]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),        # image|audio|video
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("error_msg", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: all fields derived from the payload
    sha256 — stable across partitionings, no codec needed."""
    d = hashlib.sha256(payload).digest()
    feat = [((d[i] / 255.0) * 2.0 - 1.0) for i in range(16)]
    return {
        "kind": ["image", "audio", "video"][d[0] % 3],
        "width": 64 + d[1] % 192,
        "height": 64 + d[2] % 192,
        "duration_ms": int.from_bytes(d[3:5], "big"),
        "n_frames": 1 + d[5] % 30,
        "feature": [float(round(x, 6)) for x in feat],
    }


def decode_media(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id", fake: bool = False,
                 decode_fn=None) -> DataFrame:
    """Decode / feature-extract media binaries in Arrow batches.

    Default path: header-based image classification (real, codec-free
    — kind/width/height from PNG/JPEG/GIF/TIFF headers, n_frames=1).
    Non-image payloads: ``processing_error`` rows (pixel/sample decode
    needs a codec) unless ``fake=True`` or a real ``decode_fn`` (e.g.
    PIL/torchvision decode + resize + embed) is supplied."""
    fn = decode_fn or (_fake_decode if fake else None)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                base = {"media_id": str(mid), "kind": None, "width": None,
                        "height": None, "duration_ms": None, "n_frames": None,
                        "feature": None, "status": "ok", "error_msg": None}
                if fn is None:
                    hdr = parse_image_header(bytes(payload))
                    if hdr is not None:
                        base.update({"kind": "image", "width": hdr["width"],
                                     "height": hdr["height"], "n_frames": 1})
                    else:
                        base["status"] = "processing_error"
                        base["error_msg"] = (
                            "NotImplementedError: not an image header and no "
                            "media codec in this environment; pass decode_fn "
                            "or fake=True"
                        )
                else:
                    try:
                        base.update(fn(bytes(payload)))
                    except Exception as exc:  # error rows, not exceptions
                        base["status"] = "processing_error"
                        base["error_msg"] = f"{type(exc).__name__}: {exc}"
                rows.append(base)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10,
                  payload_col: str = "payload",
                  id_col: str = "media_id", fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.
    Frame decode itself is stubbed like decode_media."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_digest", T.StringType(), True),
            T.StructField("status", T.StringType(), True),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if not fake:
                    rows.append({"media_id": str(mid), "frame_idx": -1,
                                 "frame_digest": None,
                                 "status": "processing_error"})
                    continue
                meta = _fake_decode(bytes(payload))
                for idx in range(0, meta["n_frames"], every_n):
                    # payload:index digest — ':'+decimal keeps the frame
                    # key VARCHAR-expressible so the SQL oracle can
                    # reproduce it (sha256 is VARCHAR-only in DuckDB)
                    digest = hashlib.sha256(
                        bytes(payload) + b":" + str(idx).encode()
                    ).hexdigest()[:16]
                    rows.append({"media_id": str(mid), "frame_idx": idx,
                                 "frame_digest": digest, "status": "ok"})
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
