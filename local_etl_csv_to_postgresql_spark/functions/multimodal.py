"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside. The
Spark-side machinery — schema, partition-sized Arrow batches via
``mapInPandas``, deterministic metadata extraction — is real and
tested; the actual codec calls are stubbed (no image/audio libraries in
this container) behind ``decode_image_stub``, which either raises
NotImplementedError (strict mode) or produces a deterministic fake
(test mode).

At 100 TB: binaries ride in parquet as BYTE_ARRAY; mapInPandas streams
Arrow record batches so a partition never materializes as one Python
object; feature extraction parallelizes per-partition with zero
shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

METADATA_SCHEMA = (
    "media_id long, source string, n_bytes long, header_byte int, is_empty boolean"
)


def decode_image_stub(content: bytes) -> dict:
    """Codec stub: a real deployment plugs Pillow/ffmpeg here.

    Deterministic fake 'decode': reports byte-derived pseudo-dimensions
    so the downstream plumbing (schema, batching, aggregation) is
    exercised end-to-end without a codec library.
    """
    if content is None:
        return {"width": None, "height": None}
    n = len(content)
    return {"width": (n % 64) + 1, "height": (n % 48) + 1}


def extract_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    mapInPandas: each partition arrives as an iterator of pandas
    batches; output rows carry byte counts and the leading byte — the
    shape every real decode/feature-extract pass follows.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            # vectorized .str ops (C speed) instead of per-row lambdas
            n_bytes = content.str.len().fillna(0).astype("int64")
            header = content.str[0]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "source": pdf["source"],
                    "n_bytes": n_bytes,
                    "header_byte": header.astype("Int32"),
                    "is_empty": (n_bytes == 0) | content.isna(),
                }
            )

    return media.mapInPandas(op, schema=METADATA_SCHEMA)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    the multimodal path has deterministic test data (utf-8 bytes)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
        F.col("source"),
    )


RESIZE_SCHEMA = (
    "media_id long, source string, width int, height int, "
    "out_width int, out_height int"
)


def resize_images(media: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize plumbing: decode (stubbed) -> fit into a max_dim box
    preserving aspect ratio -> emit old/new dimensions.

    The arithmetic is all-integer (scale = max_dim / max(w, h, max_dim)
    applied as (d * max_dim) // m) so results are bit-identical across
    engines — a real deployment swaps ``decode_image_stub``'s
    pseudo-dimensions for a Pillow decode and emits resized bytes, and
    the partitioning/batching story is unchanged: per-partition Arrow
    batches, zero shuffle.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].str.len().fillna(0).astype("int64")
            # decode_image_stub's pseudo-dimensions, vectorized
            w = (n % 64) + 1
            h = (n % 48) + 1
            m = pd.concat([w, h], axis=1).max(axis=1).clip(lower=max_dim)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "source": pdf["source"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": ((w * max_dim) // m).clip(lower=1).astype("int32"),
                    "out_height": ((h * max_dim) // m).clip(lower=1).astype("int32"),
                }
            )

    return media.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, source string, frame_idx int, frame_offset long, "
    "frame_n_bytes long"
)


def sample_frames(media: DataFrame, stride: int = 4096) -> DataFrame:
    """Frame-sampling plumbing: treat the binary payload as a fixed-
    stride frame container and emit one row per frame (a one-to-many
    mapInPandas, the shape a real video keyframe extractor follows).

    The codec is stubbed: frames are byte ranges, not decoded pictures;
    offsets/sizes are exact so the explode is oracle-checkable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].str.len().fillna(0).astype("int64")
            out_ids, out_src, out_idx, out_off, out_len = [], [], [], [], []
            for mid, src, nb in zip(pdf["media_id"], pdf["source"], n):
                nframes = int((nb + stride - 1) // stride)
                for i in range(nframes):
                    out_ids.append(mid)
                    out_src.append(src)
                    out_idx.append(i)
                    out_off.append(i * stride)
                    out_len.append(min(stride, int(nb) - i * stride))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "source": pd.Series(out_src, dtype="object"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_offset": pd.Series(out_off, dtype="int64"),
                    "frame_n_bytes": pd.Series(out_len, dtype="int64"),
                }
            )

    return media.mapInPandas(op, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "media_id long, source string, features array<double>"
N_FEATURES = 4


def extract_features(media: DataFrame) -> DataFrame:
    """Feature-extraction plumbing: binary payload -> fixed-width
    feature vector (array<double>), the shape an image/audio embedding
    model produces. The "model" is the deterministic stub (pseudo-dims
    + byte stats); a real deployment swaps in an ONNX/torch call over
    the same Arrow batches and the schema/partitioning are unchanged.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].str.len().fillna(0).astype("int64")
            header = pdf["content"].str[0].map(
                lambda b: float(b) if pd.notna(b) else 0.0
            )
            feats = [
                [float((nb % 64) + 1), float((nb % 48) + 1), float(nb % 256), hb]
                for nb, hb in zip(n, header)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "source": pdf["source"],
                    "features": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)
