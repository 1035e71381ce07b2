"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so payload bytes never round-trip through
row-at-a-time Python.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this environment, so
the decode kernels are STUBS: ``fake_decode=True`` (default) derives
deterministic pseudo-metadata from the payload hash — schema,
batching, partitioning, and UDF signatures are real and tested;
``fake_decode=False`` raises NotImplementedError where the codec
call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.registry import register

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
])


@register("attach_binary")
def op_attach_binary(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Wrap a column's bytes as an opaque media payload + metadata
    struct (content hash JVM-side, one pass)."""
    field = config.get("field", "text")
    media_type = config.get("media_type", "application/octet-stream")
    payload = (F.col(field) if dict(df.dtypes).get(field) == "binary"
               else F.encode(F.col(field), "UTF-8"))
    return (
        df.withColumn("payload", payload)
        .withColumn("media_meta", F.struct(
            F.lit(media_type).alias("media_type"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("sha256"),
        ))
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic pseudo width/height from the payload hash —
    stands in for a real image decode."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


@register("decode_image")
def op_decode_image(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Decode image payloads to (width, height, mode) metadata.

    Real path (fake_decode=False) is where PIL's ``Image.open`` on the
    byte buffer belongs — not available in this environment.
    """
    fake = bool(config.get("fake_decode", True))
    payload_field = config.get("field", "payload")
    out_fields = [f for f in df.schema.fields]
    schema = T.StructType(out_fields + [
        T.StructField("img_width", T.IntegerType()),
        T.StructField("img_height", T.IntegerType()),
        T.StructField("img_mode", T.StringType()),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL; run with fake_decode=True")
            dims = pdf[payload_field].map(lambda b: _fake_dims(bytes(b)))
            pdf = pdf.assign(
                img_width=dims.map(lambda d: d[0]).astype("int32"),
                img_height=dims.map(lambda d: d[1]).astype("int32"),
                img_mode="RGB",
            )
            yield pdf

    return df.mapInPandas(decode, schema)


@register("frame_sample")
def op_frame_sample(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Sample n_frames pseudo-frames per video payload — one output
    row per frame (explode shape). Real path is ffmpeg keyframe
    extraction; the stub emits deterministic frame offsets."""
    n_frames = int(config.get("n_frames", 4))
    id_field = config.get("id_field", "doc_id")
    payload_field = config.get("field", "payload")
    schema = T.StructType([
        T.StructField(id_field, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset_bytes", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_field])
                step = max(1, len(payload) // max(n_frames, 1))
                for i in range(n_frames):
                    off = min(i * step, max(len(payload) - 1, 0))
                    rows.append((row[id_field], i, off,
                                 payload[off:off + 16]))  # stub: 16-byte "frame"
            yield pd.DataFrame(rows, columns=[id_field, "frame_idx",
                                              "frame_offset_bytes", "frame_payload"])

    return df.select(id_field, payload_field).mapInPandas(sample, schema)
