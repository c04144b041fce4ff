"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video content rides as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The decode kernels themselves are STUBBED in this
container (no image/audio libs) behind :data:`DECODERS` — a deterministic
fake for tests, ``NotImplementedError`` for real codecs — while the
Spark-side plumbing (schema, batching, partition passthrough) is real and
tested. Swap a real ``cv2.imdecode``/``soundfile.read`` into DECODERS on a
cluster with the libs installed.

Graft lineage: the reference's whole purpose is decode-image → extract
features (ir:384-388 imread → hashing/analysis pipeline); this module is
that pipeline's Spark shape.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row schema: id + opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("status", StringType(), False),  # ok | failed:<reason>
        StructField("byte_len", IntegerType(), True),
        StructField("content_hash", LongType(), True),
        StructField("mean_value", StringType(), True),  # decoded-domain stat
    ]
)


def _fake_decode_image(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for ``cv2.imdecode``: bytes → (h, w) uint8.

    Real decode is NOT implemented in this container (no OpenCV/Pillow);
    this fake is shape-correct and deterministic so the distributed
    plumbing is testable."""
    h = int(meta.get("height") or 4)
    w = int(meta.get("width") or 4)
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = int(np.ceil(h * w / max(len(buf), 1)))
    return np.tile(buf, reps)[: h * w].reshape(h, w)


def _real_decode_unavailable(payload: bytes, meta: dict) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio decode needs cv2/soundfile — not installed in this "
        "container; register a decoder in DECODERS on a real cluster"
    )


DECODERS: dict[str, Callable[[bytes, dict], np.ndarray]] = {
    "image": _fake_decode_image,
    "audio": _fake_decode_image,  # same deterministic fake (1-D semantics)
    "video": _real_decode_unavailable,
}


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batches).

    The UDF sees an iterator of pandas batches — constant memory per task
    regardless of partition size; binary payloads never hit the driver."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = pdf[["width", "height", "sample_rate", "n_frames"]].to_dict("records")
            means, hashes, lens, status = [], [], [], []
            for payload, kind, meta in zip(pdf["payload"], pdf["kind"], metas):
                lens.append(len(payload) if payload is not None else 0)
                try:
                    decoder = DECODERS[kind]
                    arr = decoder(bytes(payload) if payload is not None else b"", meta)
                except NotImplementedError as e:
                    # per-item error isolation (graft of reference ir:208-216):
                    # one undecodable record never aborts the batch
                    status.append("failed:decoder_unavailable")
                    means.append(None)
                    hashes.append(None)
                    continue
                status.append("ok")
                means.append(f"{float(arr.mean()):.4f}")
                hashes.append(
                    int.from_bytes(
                        np.int64(arr.astype(np.int64).sum()).tobytes(), "little", signed=True
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "status": status,
                    "byte_len": pd.array(lens, dtype="int32"),
                    "content_hash": pd.array(hashes, dtype="Int64"),
                    "mean_value": means,
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode frame indices 0, n, 2n, … per video
    row (JVM-side sequence; the decode of each sampled frame would plug into
    :func:`extract_features`)."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ),
        )
        .select("media_id", "frame_idx")
    )


def synth_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=32 + (i % 5) * 16, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                4 + i % 3,
                4,
                16000 if kind == "audio" else None,
                30 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
