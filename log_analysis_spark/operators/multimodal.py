"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the pipeline as binary columns with a typed
metadata struct.  The Spark-side plumbing — schema, partitioning, Arrow
batch shape, UDF signatures — is real and tested; the actual codec work is
STUBBED (the decode libraries are not in this container): ``decode_image``
raises ``NotImplementedError``, and ``fake_feature_extract`` is the
deterministic stand-in used by tests (byte-level stats standing in for
pixel stats).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),  # 16 bins
    ]
)


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the doc text
    (stands in for encoded image bytes), typed metadata derived from it."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            (F.col(id_col) % 640 + 16).cast("int").alias("width"),
            (F.col(id_col) % 480 + 16).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real image decoding needs a codec library not present in this
    container.  The Spark plumbing calls fake_feature_extract instead."""
    raise NotImplementedError(
        "image decode requires a codec library (e.g. Pillow) not installed here; "
        "use fake_feature_extract for the deterministic test path"
    )


def fake_feature_extract(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: per Arrow
    batch, numpy computes byte-level stats (the deterministic stand-in for
    decode→resize→embed).  Batch shape and schema match what a real codec
    UDF would use."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                feats.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "n_bytes": int(arr.size),
                        "sha1": hashlib.sha1(payload).hexdigest(),
                        "byte_mean": float(arr.mean()) if arr.size else 0.0,
                        "byte_std": float(arr.std()) if arr.size else 0.0,
                        "histogram": hist.tolist(),
                    }
                )
            yield pd.DataFrame(feats)

    return media.select("media_id", "kind", "payload").mapInPandas(
        extract, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index, derived
    from metadata only (the decode itself is the stubbed step).  Shows the
    explode-based fan-out a real frame sampler would use."""
    n_frames = (F.col("meta.n_bytes") / 100).cast("int")  # fake: 100 B/frame
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "meta")
    )
