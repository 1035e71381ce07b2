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


@register("resize_image")
def op_resize_image(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Resize image payloads to (target_w, target_h).

    Real path (fake_decode=False) is PIL ``Image.resize`` over the
    byte buffer — not available in this environment. The stub keeps
    the Spark contract real: payload column in, payload column +
    dimensions out, Arrow-batched, schema fixed up front.
    """
    fake = bool(config.get("fake_decode", True))
    payload_field = config.get("field", "payload")
    tw = int(config.get("target_w", 224))
    th = int(config.get("target_h", 224))
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField("resized_payload", T.BinaryType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL; run with fake_decode=True")
            # stub: deterministic truncation stands in for re-encoding
            pdf = pdf.assign(
                resized_payload=pdf[payload_field].map(
                    lambda b: bytes(b)[: tw * th // 64 or 1]),
                resized_w=tw,
                resized_h=th,
            )
            pdf["resized_w"] = pdf["resized_w"].astype("int32")
            pdf["resized_h"] = pdf["resized_h"].astype("int32")
            yield pdf

    return df.mapInPandas(resize, schema)


@register("audio_features")
def op_audio_features(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Extract per-clip audio features (duration, sample count, RMS
    level). Real path is soundfile/librosa decode — stubbed here with
    deterministic pseudo-features from the payload hash; the Spark
    plumbing (Arrow batches, fixed schema, no shuffle) is real."""
    fake = bool(config.get("fake_decode", True))
    payload_field = config.get("field", "payload")
    sample_rate = int(config.get("sample_rate", 16000))
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField("audio_seconds", T.DoubleType()),
        T.StructField("audio_samples", T.LongType()),
        T.StructField("audio_rms", T.DoubleType()),
    ])

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires soundfile; run with fake_decode=True")

            def one(b: bytes):
                h = hashlib.sha256(bytes(b)).digest()
                n = len(b) * 4  # pretend 4 samples per byte
                return n / sample_rate, n, (h[2] / 255.0)

            trip = pdf[payload_field].map(one)
            pdf = pdf.assign(
                audio_seconds=trip.map(lambda t: t[0]),
                audio_samples=trip.map(lambda t: t[1]).astype("int64"),
                audio_rms=trip.map(lambda t: t[2]),
            )
            yield pdf

    return df.mapInPandas(feats, schema)


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
