"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The real decode libraries (PIL/ffmpeg/librosa) are not in this container,
so the *decode* step is a deterministic fake behind a clearly-marked
boundary (`FAKE` header parse; anything else raises NotImplementedError
inside the batch and is surfaced as status='unsupported'). Everything
Spark-side is real and tested: schema, Arrow batch shape, mapInPandas
signatures, partitioning, explode of frame samples.

Fake payload format (fixtures): b"FAKE" + kind byte (I/A/V) + width u16 +
height u16 + n_frames u16 + payload bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def make_fake_payload(kind: str, width: int, height: int, n_frames: int, body: bytes) -> bytes:
    return b"FAKE" + kind[0].upper().encode() + struct.pack("<HHH", width, height, n_frames) + body


def _decode_one(payload: bytes) -> dict:
    if payload[:4] != b"FAKE":
        # Real decoders (PIL / ffmpeg) would plug in here.
        raise NotImplementedError("non-fixture media codec not available in this env")
    kind = chr(payload[4])
    width, height, n_frames = struct.unpack("<HHH", payload[5:11])
    body = payload[11:]
    # Deterministic fake "feature": 4-dim byte-statistics vector.
    n = max(len(body), 1)
    mean = sum(body) / n
    feature = [float(len(body)), mean, float(min(body, default=0)), float(max(body, default=0))]
    return {
        "status": "ok", "width": width, "height": height,
        "n_frames": n_frames, "n_bytes": len(payload), "feature": feature,
        "kind": {"I": "image", "A": "audio", "V": "video"}.get(kind, "unknown"),
    }


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract. Unsupported codecs degrade
    to status='unsupported' rows instead of failing the job."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                base = {"media_id": int(mid), "kind": kind, "status": "unsupported",
                        "width": None, "height": None, "n_frames": None,
                        "n_bytes": len(payload) if payload is not None else 0,
                        "feature": None}
                try:
                    # ANY decode failure (unknown codec, null payload,
                    # truncated header -> IndexError/struct.error) must
                    # degrade to status='unsupported', never fail the task.
                    d = _decode_one(bytes(payload))
                    base.update(d)
                except Exception:
                    pass
                rows.append(base)
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(_batches, DECODED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling for video payloads: fixed-size slices of the body,
    every_n-th frame (deterministic fake of ffmpeg -vf select)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    if len(p) < 11 or p[:4] != b"FAKE" or chr(p[4]) != "V":
                        continue
                    (_, _, n_frames) = struct.unpack("<HHH", p[5:11])
                    body = p[11:]
                except Exception:
                    # null / truncated payloads are skipped, never fatal
                    continue
                for f in range(0, n_frames, every_n):
                    start = f * frame_bytes
                    out["media_id"].append(int(mid))
                    out["frame_no"].append(f)
                    out["frame"].append(body[start : start + frame_bytes])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(_batches, FRAME_SCHEMA)


def resize_stub(decoded: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize metadata transform (the pixel work would live in the decode
    UDF next to a real codec): scales width/height, keeps aspect flag."""
    return decoded.where(F.col("status") == "ok").select(
        "media_id",
        "kind",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.col("width") / F.col("height")).alias("orig_aspect"),
    )
