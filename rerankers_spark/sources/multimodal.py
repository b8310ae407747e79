"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The reference supports image documents via base64/path fields
(rerankers/documents.py:5-12, utils.py:123-189 prep_image_docs). The
Spark-native shape is a binary column with a metadata struct; decode /
feature-extract run as Arrow-batched ``mapInPandas`` so the plumbing
(schema, partitioning, batch shape) is real and scale-correct even
though actual codecs (PIL/torchaudio/ffmpeg) are NOT in this sandbox —
the decode step is stubbed behind an import-try with a deterministic
fake, clearly marked.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta map<string,string>"
)

FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, payload_sha256 string, "
    "feature array<float>, decoder string"
)

FEATURE_DIM = 16


def _try_real_decoder():
    """Real image decode needs PIL — absent here by design."""
    try:
        from PIL import Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature: bytes of sha256 → float32 in [0,1).
    Marks the seam where a real decoder/encoder plugs in."""
    h = hashlib.sha256(payload).digest()
    return (
        np.frombuffer(h[:FEATURE_DIM], dtype=np.uint8).astype(np.float32)
        / 255.0
    )


def extract_features(media: DataFrame, require_real_decoder: bool = False
                     ) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    With ``require_real_decoder=True`` and no codec installed this raises
    NotImplementedError INSIDE the UDF (per task spec: stub the decode,
    keep the Spark plumbing real)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _try_real_decoder()
        if require_real_decoder and decoder is None:
            raise NotImplementedError(
                "real media decoding requires PIL/torchaudio — not "
                "available in this environment; use the deterministic "
                "stub (require_real_decoder=False)"
            )
        for pdf in batches:
            feats = [
                _fake_feature(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "feature": feats,
                    "decoder": decoder or "stub",
                }
            )

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: expands (doc_id, n_frames-from-meta) into
    frame rows natively (sequence+explode); actual frame decode would slot
    into extract_features. Demonstrates the partition-friendly shape: one
    row per sampled frame, no Python in the expansion."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), F.lit("n_frames")).cast("int"), F.lit(0)
    )
    return (
        media.where(F.col("media_type") == "video")
        .withColumn("n_frames", n_frames)
        .where(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def image_docs_to_df(spark: SparkSession, docs) -> DataFrame:
    """Bridge from the reference image-Document API (prep_image_docs,
    utils.py:123-189) to the Spark binary-column shape: each Document's
    base64 payload becomes the binary column, image_path/doc metadata go
    to the meta map. The result feeds extract_features directly."""
    import base64 as b64mod

    rows = []
    for d in docs:
        if d.document_type != "image":
            raise ValueError("All documents must be of type 'image'")
        payload = b64mod.b64decode(d.base64) if d.base64 else b""
        meta = {str(k): str(v) for k, v in (d.metadata or {}).items()}
        if d.image_path:
            meta["image_path"] = d.image_path
        rows.append((int(d.doc_id), "image", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (i % 5 + 1)
        mt = ["image", "audio", "video"][i % 3]
        meta = {"n_frames": str(30 * (i + 1))} if mt == "video" else {}
        rows.append((i, mt, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
