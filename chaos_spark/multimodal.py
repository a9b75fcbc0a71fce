"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a flat typed metadata struct, processed by Arrow-batched pandas UDFs
over ``mapInPandas``; that keeps the payload bytes OUT of the JVM<->Python
row path except in vectorized Arrow record batches, and lets the scan
prune the (huge) binary column whenever a query touches only metadata.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode step is STUBBED two ways (SURVEY round contract):

- ``decode_image(..., fake=True)``  — deterministic fake decoder: derives
  pixel-statistics features purely from the payload bytes (byte mean /
  histogram), so the full Spark plumbing (schema, batching, partitioning,
  UDF signature) is real and testable.
- ``decode_image(..., fake=False)`` — raises NotImplementedError with the
  dependency it would need; the call-site plumbing is identical.

``synthesize_media`` manufactures deterministic payloads from any string
column (zlib of the text + a seeded header) so test data needs no binary
fixtures on disk.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "byte_mean double, byte_entropy double, hist array<long>"
)


def synthesize_media(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media rows from a text table (one per doc):
    payload = zlib(text bytes); metadata derived from a hash of the id.
    Runs as one mapInPandas pass — no per-row Python."""

    from .shipping import ensure_shipped

    ensure_shipped(docs.sparkSession)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            h = (ids * 2654435761) % 997
            payloads = [zlib.compress(t.encode("utf-8")) for t in pdf[text_col]]
            yield pd.DataFrame({
                "doc_id": ids,
                "media_type": np.where(h % 3 == 0, "image",
                                       np.where(h % 3 == 1, "audio", "video")),
                "payload": payloads,
                "width": (64 + h % 512).astype(np.int32),
                "height": (64 + (h * 7) % 512).astype(np.int32),
                "sample_rate": np.where(h % 3 == 1, 16000, 0).astype(np.int32),
                "n_frames": np.where(h % 3 == 2, 1 + h % 120, 1).astype(np.int32),
            })

    return docs.select(id_col, text_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract pass over media rows.

    fake=True: deterministic byte-level features (mean, entropy, 16-bin
    histogram) — the real Arrow/batch/partitioning path with a stand-in
    kernel. fake=False: the real decoder, unavailable in this container."""
    if not fake:
        raise NotImplementedError(
            "real image decode needs PIL/libjpeg, not present in this "
            "container; run with fake=True for the deterministic stub"
        )

    from .shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=16).astype(np.int64)
                p = hist / max(len(b), 1)
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                rows.append((int(doc_id), mt, len(b), float(b.mean()) if len(b) else 0.0,
                             round(ent, 6), hist.tolist()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "media_type", "byte_len",
                               "byte_mean", "byte_entropy", "hist"]
            )

    return media.mapInPandas(features, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits one row per sampled
    frame index (metadata-only in the fake path; a real decoder would
    attach the frame bytes). Demonstrates the 1->N mapInPandas shape."""
    if not fake:
        raise NotImplementedError("real frame extraction needs ffmpeg")

    from .shipping import ensure_shipped

    ensure_shipped(media.sparkSession)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video"]
            out_id, out_idx = [], []
            for doc_id, n_frames in zip(vids["doc_id"], vids["n_frames"]):
                idxs = range(0, int(n_frames), every_n)
                out_id.extend([int(doc_id)] * len(list(idxs)))
                out_idx.extend(range(0, int(n_frames), every_n))
            yield pd.DataFrame({"doc_id": pd.Series(out_id, dtype="int64"),
                                "frame_idx": pd.Series(out_idx, dtype="int64")})

    return media.select("doc_id", "media_type", "n_frames").mapInPandas(
        sample, schema="doc_id long, frame_idx long"
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata transform is real (JVM-side), payload
    transform is the fake kernel (re-compress header tag)."""
    return media.withColumn("width", F.lit(width)).withColumn(
        "height", F.lit(height)
    )
