"""Multimodal column plumbing: opaque binary payloads + typed
metadata, processed with Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind `_decode_stub` (clearly marked); everything
Spark-side — schemas, batch iteration, partitioning, UDF signatures —
is real and tested, which is the part that matters for the engine.

Scale notes: payloads stay in a single BinaryType column (parquet
keeps them out of unrelated column scans); feature extraction is
mapInPandas so batches stream through Arrow without row-at-a-time
pickling; repartition by modality before extraction so the expensive
kernels see homogeneous batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of a multimodal asset table: payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal asset table from the
    documents fixture: the text bytes stand in for an encoded payload,
    doc_id % 3 picks the modality. Real pipelines replace this with a
    parquet/tar manifest scan."""
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")).alias(
            "meta"
        ),
    )


def _decode_stub(modality: str, payload: bytes | None) -> dict:
    """STUB decode kernel — the real implementation would call PIL /
    soundfile / pyav here; the container ships none of them, so derive
    deterministic fake dimensions from the payload bytes."""
    if payload is None:
        return {"width": None, "height": None, "duration_ms": None}
    n = len(payload)
    if modality == "image":
        return {"width": 64 + n % 512, "height": 64 + (n * 7) % 512, "duration_ms": None}
    if modality == "audio":
        return {"width": None, "height": None, "duration_ms": 1000 + (n * 13) % 60000}
    return {"width": 320, "height": 240, "duration_ms": 1000 + (n * 17) % 600000}


def extract_features(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    The per-batch loop is the real plumbing: payload bytes arrive as
    numpy object arrays of `bytes`, outputs are typed columns. Only
    `_decode_stub` is fake.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else None),
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                ),
            }
            decoded = [
                _decode_stub(m, p) for m, p in zip(pdf["modality"], pdf["payload"])
            ]
            for k in ("width", "height", "duration_ms"):
                feats[k] = pd.Series([d[k] for d in decoded], dtype="object")
            yield pd.DataFrame(feats)

    # Homogeneous batches per modality keep kernel dispatch cheap.
    return assets.repartition("modality").mapInPandas(batches, FEATURE_SCHEMA)
