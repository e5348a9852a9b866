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
