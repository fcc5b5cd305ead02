"""Multimodal column handling: image/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched pandas iterators (mapInPandas).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (see _fake_decode_meta) — but the Spark-side
plumbing is real and tested: binary columns, explicit output schemas, Arrow
batch iteration, and partition-sized batches. Swapping the fake for
PIL/librosa/ffmpeg is a one-function change.

Scale design: mapInPandas streams Arrow batches through Python with bounded
memory (spark.sql.execution.arrow.maxRecordsPerBatch); heavy media work is
per-partition parallel, and the binary payloads never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, content binary, byte_len bigint"
)

DECODED_META_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, "
    "width int, height int, n_frames int, sample_rate int"
)


def to_media_table(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as a media table: the text payload re-encoded as an
    opaque binary column plus typed metadata. (Stand-in for reading real
    image/audio bytes; the binary column IS real binary.)"""
    return documents.select(
        F.col("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.length(F.encode(F.col(text_col), "UTF-8")).alias("byte_len"),
    )


def _fake_decode_meta(media_type: str, payload: bytes) -> tuple[int, int, int, int]:
    """DETERMINISTIC FAKE decoder (no codecs in this container).

    Derives plausible metadata purely from byte length — replicable in the SQL
    oracle. A real deployment replaces this body with PIL / soundfile / ffmpeg
    probes (raise NotImplementedError there if the lib is missing).
    """
    n = len(payload)
    if media_type == "image":
        return (n % 640 + 16, n % 480 + 16, 1, 0)
    if media_type == "audio":
        return (0, 0, 0, 8000 + (n % 4) * 8000)
    return (n % 640 + 16, n % 480 + 16, n % 300 + 1, 0)  # video


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Decode/probe media metadata via Arrow-batched mapInPandas.

    The hot loop is vectorized per batch; output schema is explicit
    (DECODED_META_SCHEMA) so downstream plans don't depend on inference.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode_meta(mt, bytes(c))
                for mt, c in zip(pdf["media_type"], pdf["content"])
            ]
            out = pd.DataFrame(
                metas, columns=["width", "height", "n_frames", "sample_rate"]
            )
            out.insert(0, "byte_len", pdf["byte_len"].values)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(decode_batches, schema=DECODED_META_SCHEMA)


SEGMENT_BYTES = 64
SEGMENT_HOP = 48


def segment_media(
    media: DataFrame,
    window: int = SEGMENT_BYTES,
    hop: int = SEGMENT_HOP,
) -> DataFrame:
    """Fixed-size overlapping byte windows over the binary payload — the
    audio-chunking shape (windowed samples for feature extraction / frame
    embedding). One output row per segment: (doc_id, seg_idx, seg_start,
    seg_len, seg_md5), where seg_md5 fingerprints the actual segment bytes.

    All JVM-side: offsets come from sequence+posexplode, the slice is
    substring over the BINARY column (byte addressed), md5 hashes the raw
    bytes. No Python in the loop, no driver involvement — per-row fan-out is
    ceil(byte_len/hop), so a 100 TB corpus segments in one scan-shaped stage.

    Payloads shorter than one window yield a single truncated segment
    (seg_len = byte_len); empty payloads yield one zero-length segment.
    """
    return (
        media.select(
            "doc_id",
            "byte_len",
            "content",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("byte_len") - window, F.lit(0)),
                    F.lit(hop),
                )
            ).alias("seg_idx", "seg_start"),
        )
        .select(
            "doc_id",
            F.col("seg_idx").cast("bigint").alias("seg_idx"),
            F.col("seg_start").cast("bigint").alias("seg_start"),
            F.least(F.lit(window), F.col("byte_len") - F.col("seg_start"))
            .cast("bigint")
            .alias("seg_len"),
            F.md5(
                F.expr(f"substring(content, seg_start + 1, {window})")
            ).alias("seg_md5"),
        )
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index (explode of a sequence — no Python). Downstream frame extraction
    would be another mapInPandas over (content, frame_idx)."""
    videos = decoded.filter(F.col("media_type") == "video")
    return videos.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
