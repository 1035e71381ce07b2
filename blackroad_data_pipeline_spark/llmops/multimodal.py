"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so payload bytes never round-trip through
row-at-a-time Python.

The decode kernels carry a CODEC SEAM: each probes for its real codec
(PIL for images, soundfile for audio) on the executor at call time.
``fake_decode`` is tri-state — None (default) uses the real codec when
present and falls back per payload to a deterministic stub (pseudo-
metadata from the payload hash); True always stubs; False is strict
(raises when the codec is missing or a payload fails to decode).
Schema, batching, partitioning, and UDF signatures are identical on
every path and are what the tests pin; real-codec tests skip cleanly
when the libraries are absent (they are not in this environment).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.parallel import fan_out
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


def _on_error(config: Mapping, op: str) -> str:
    """Corrupt-payload policy for the AUTO decode path (round 12,
    VERDICT r11 #7): "stub" (default, pinned since round 10) falls
    back to the deterministic stub when non-NULL bytes fail to
    decode; "null" treats an undecodable payload like an ABSENT one
    (NULL metadata — the round-11 NULL-payload contract), which is
    the production posture when garbage blobs are data errors to be
    audited, not silently stubbed. Ignored when fake_decode=True
    (stub never decodes) and when fake_decode=False (strict raises
    first)."""
    v = config.get("on_error", "stub")
    if v not in ("stub", "null"):
        raise ValueError(f"{op}: on_error must be stub|null, got {v!r}")
    return v


def _pil():
    """PIL probe, resolved lazily on the EXECUTOR at call time — the
    codec seam. Returns the Image module or None."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


@register("decode_image")
def op_decode_image(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Decode image payloads to (width, height, mode) metadata.

    ``fake_decode`` is tri-state: None (default) tries a real decode
    per payload — PIL when installed, else the pure-stdlib PNG codec
    (``_png.py``) — and falls back to the deterministic stub when the
    bytes aren't a decodable image (img_mode='STUB' marks those rows);
    True always stubs; False is strict — any payload that fails to
    decode raises.
    """
    fake = config.get("fake_decode")
    on_error = _on_error(config, "decode_image")
    payload_field = config.get("field", "payload")
    out_fields = [f for f in df.schema.fields]
    schema = T.StructType(out_fields + [
        T.StructField("img_width", T.IntegerType()),
        T.StructField("img_height", T.IntegerType()),
        T.StructField("img_mode", T.StringType()),
    ])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from blackroad_data_pipeline_spark.llmops import _png

        image_mod = None if fake is True else _pil()

        def one(b):
            if b is None:  # NULL payload -> NULL metadata (the
                return (None, None, None)  # valid_vec policy for media)
            data = bytes(b)
            if image_mod is not None:
                try:
                    with image_mod.open(io.BytesIO(data)) as img:
                        return img.width, img.height, img.mode
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":  # corrupt == absent
                        return (None, None, None)
            elif fake is not True:
                # stdlib fallback codec: REAL decode of genuine PNGs
                # (IHDR parse) even without PIL — see _png.py
                try:
                    return _png.png_meta(data)
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":
                        return (None, None, None)
            w, h = _fake_dims(data)
            return w, h, "STUB"

        for pdf in batches:
            trip = pdf[payload_field].map(one)
            pdf = pdf.assign(
                img_width=trip.map(lambda t: t[0]).astype("Int32"),
                img_height=trip.map(lambda t: t[1]).astype("Int32"),
                img_mode=trip.map(lambda t: t[2]),
            )
            yield pdf

    return df.mapInPandas(decode, schema)


@register("resize_image")
def op_resize_image(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Resize image payloads to (target_w, target_h).

    Same tri-state ``fake_decode`` seam as decode_image: None tries a
    real open+resize+re-encode per payload (PIL when installed, else
    the stdlib PNG codec with nearest-neighbor resampling) with stub
    fallback; True always stubs (deterministic truncation); False is
    strict. The Spark contract is identical on every path: payload
    column in, payload column + dimensions out, Arrow-batched, schema
    fixed up front.
    """
    fake = config.get("fake_decode")
    on_error = _on_error(config, "resize_image")
    payload_field = config.get("field", "payload")
    tw = int(config.get("target_w", 224))
    th = int(config.get("target_h", 224))
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField("resized_payload", T.BinaryType()),
        T.StructField("resized_w", T.IntegerType()),
        T.StructField("resized_h", T.IntegerType()),
    ])

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from blackroad_data_pipeline_spark.llmops import _png

        image_mod = None if fake is True else _pil()

        def one(b):
            if b is None:  # NULL payload -> NULL resize
                return None
            data = bytes(b)
            if image_mod is not None:
                try:
                    with image_mod.open(io.BytesIO(data)) as img:
                        buf = io.BytesIO()
                        img.resize((tw, th)).save(buf, format="PNG")
                        return buf.getvalue()
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":  # corrupt == absent
                        return None
            elif fake is not True:
                # stdlib fallback: real PNG decode + nearest-neighbor
                # resample + filter-0 re-encode, no third-party codec
                try:
                    return _png.png_resize(data, tw, th)
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":
                        return None
            # stub: deterministic truncation stands in for re-encoding
            return data[: tw * th // 64 or 1]

        for pdf in batches:
            resized = pdf[payload_field].map(one)
            notnull = resized.notna()
            pdf = pdf.assign(
                resized_payload=resized,
                resized_w=pd.Series(tw, index=pdf.index
                                    ).where(notnull).astype("Int32"),
                resized_h=pd.Series(th, index=pdf.index
                                    ).where(notnull).astype("Int32"),
            )
            yield pdf

    return df.mapInPandas(resize, schema)


@register("audio_features")
def op_audio_features(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Extract per-clip audio features (duration, sample count, RMS
    level). Tri-state ``fake_decode`` seam like the image ops, with
    ``soundfile`` as the real codec: None tries a real decode per
    payload with deterministic-stub fallback, True always stubs, False
    is strict. The Spark plumbing (Arrow batches, fixed schema, no
    shuffle) is identical on every path."""
    fake = config.get("fake_decode")
    on_error = _on_error(config, "audio_features")
    payload_field = config.get("field", "payload")
    sample_rate = int(config.get("sample_rate", 16000))
    schema = T.StructType(list(df.schema.fields) + [
        T.StructField("audio_seconds", T.DoubleType()),
        T.StructField("audio_samples", T.LongType()),
        T.StructField("audio_rms", T.DoubleType()),
    ])

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        sf_mod = None
        if fake is not True:
            try:
                import soundfile as sf_mod  # noqa: N813
            except ImportError:
                sf_mod = None

        def _wav_stdlib(data):
            # stdlib fallback codec: PCM WAV via the `wave` module —
            # the real branch stays exercisable without soundfile.
            # Normalizes ints to [-1, 1) like soundfile's float read.
            import struct
            import wave

            with wave.open(io.BytesIO(data), "rb") as wv:
                n = wv.getnframes()
                sr = wv.getframerate()
                width = wv.getsampwidth()
                nch = wv.getnchannels()
                raw = wv.readframes(n)
            fmt = {1: "b", 2: "h", 4: "i"}.get(width)
            if fmt is None:
                raise ValueError(f"unsupported WAV sample width {width}")
            vals = struct.unpack(f"<{n * nch}{fmt}", raw)
            if width == 1:  # 8-bit WAV is unsigned
                vals = [v - 128 for v in vals]
            scale = float(1 << (8 * width - 1))
            acc = 0.0
            for v in vals:
                x = v / scale
                acc += x * x
            rms = (acc / len(vals)) ** 0.5 if vals else 0.0
            return n / sr, n, rms

        def one(b):
            if b is None:  # NULL payload -> NULL features
                return (None, None, None)
            data = bytes(b)
            if sf_mod is not None:
                try:
                    samples, sr = sf_mod.read(io.BytesIO(data))
                    n = int(samples.shape[0])
                    rms = float((samples.astype("float64") ** 2).mean() ** 0.5)
                    return n / sr, n, rms
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":  # corrupt == absent
                        return (None, None, None)
            elif fake is not True:
                try:
                    return _wav_stdlib(data)
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":
                        return (None, None, None)
            h = hashlib.sha256(data).digest()
            n = len(data) * 4  # stub: pretend 4 samples per byte
            return n / sample_rate, n, (h[2] / 255.0)

        for pdf in batches:
            trip = pdf[payload_field].map(one)
            # object-dtype BEFORE astype("Int64"): with NULL payloads
            # the map output infers float64 first, the phash
            # inference trap — harmless only while sample counts stay
            # below 2^53; keep the invariant uniform (ADVICE r11)
            samples = pd.Series([t[1] for t in trip],
                                index=pdf.index, dtype="object")
            pdf = pdf.assign(
                audio_seconds=trip.map(lambda t: t[0]).astype("float64"),
                audio_samples=samples.astype("Int64"),
                audio_rms=trip.map(lambda t: t[2]).astype("float64"),
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
                if row[payload_field] is None:
                    continue  # NULL payload -> zero frames
                payload = bytes(row[payload_field])
                step = max(1, len(payload) // max(n_frames, 1))
                for i in range(n_frames):
                    off = min(i * step, max(len(payload) - 1, 0))
                    rows.append((row[id_field], i, off,
                                 payload[off:off + 16]))  # stub: 16-byte "frame"
            yield pd.DataFrame(rows, columns=[id_field, "frame_idx",
                                              "frame_offset_bytes", "frame_payload"])

    return fan_out(df.select(id_field, payload_field)).mapInPandas(sample, schema)


def _stub_gray_grid(data: bytes) -> list:
    """Deterministic 9x8 pseudo-grayscale grid from iterated sha256 —
    the decode-free stand-in, reproducible by ANY engine (the phash
    oracle regenerates it from sha256 hex in SQL)."""
    d0 = hashlib.sha256(data).hexdigest()
    d1 = hashlib.sha256(d0.encode()).hexdigest()
    d2 = hashlib.sha256(d1.encode()).hexdigest()
    return list(bytes.fromhex(d0 + d1 + d2)[:72])


def _dhash_from_grid(g: list) -> int:
    """64-bit difference hash over a 9x8 grid (row-major): bit
    (r*8+c) = g[r][c] > g[r][c+1], returned as SIGNED int64 (two's
    complement) so it fits a Spark LongType."""
    v = 0
    for r in range(8):
        for c in range(8):
            if g[r * 9 + c] > g[r * 9 + c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v


@register("phash_image")
def op_phash_image(df: DataFrame, config: Mapping, views) -> DataFrame:
    """Perceptual (difference) hash of image payloads — the
    image-dedup primitive: near-identical images (re-encodes, small
    crops, brightness shifts) land within a few bits of hamming
    distance, so near-dup pairs come from ``near_dup_hamming`` over
    the ``phash`` column, exactly like simhash over text.

    Same tri-state ``fake_decode`` seam as decode_image: None tries a
    real decode (PIL when installed, else the stdlib PNG codec) and
    computes dHash over a nearest-neighbor 9x8 grayscale grid; bytes
    that aren't decodable fall back to the deterministic sha256 stub
    grid (True always stubs; False is strict). NOTE: real-path hash
    values depend on the resampling codec (PIL NEAREST vs the stdlib
    sampler) — cross-engine-stable values come from the STUB path,
    which the contract oracle recomputes bit-for-bit in SQL.

    Arrow-batched mapInPandas, fixed schema, no shuffle.
    """
    fake = config.get("fake_decode")
    on_error = _on_error(config, "phash_image")
    payload_field = config.get("field", "payload")
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("phash", T.LongType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from blackroad_data_pipeline_spark.llmops import _png

        image_mod = None if fake is True else _pil()

        def grid_real_png(data: bytes) -> list:
            w, h, ch, px = _png.png_decode(data)
            g = []
            for ty in range(8):
                sy = min(h - 1, (ty * h) // 8)
                for tx in range(9):
                    sx = min(w - 1, (tx * w) // 9)
                    s = (sy * w + sx) * ch
                    if ch >= 3:
                        g.append((px[s] + px[s + 1] + px[s + 2]) // 3)
                    else:
                        g.append(px[s])
            return g

        def one(b):
            if b is None:  # NULL payload -> NULL hash
                return None
            data = bytes(b)
            if image_mod is not None:
                try:
                    with image_mod.open(io.BytesIO(data)) as img:
                        small = img.convert("L").resize(
                            (9, 8), image_mod.NEAREST)
                        return _dhash_from_grid(list(small.getdata()))
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":  # corrupt == absent
                        return None
            elif fake is not True:
                try:
                    return _dhash_from_grid(grid_real_png(data))
                except Exception:
                    if fake is False:
                        raise
                    if on_error == "null":
                        return None
            return _dhash_from_grid(_stub_gray_grid(data))

        for pdf in batches:
            # object-dtype construction: a list of >2^53 ints + None
            # would INFER float64 and silently round 64-bit hashes
            # before the Int64 cast (round-11 NULL-text sweep find)
            vals = pd.Series([one(b) for b in pdf[payload_field]],
                             index=pdf.index, dtype="object")
            yield pdf.assign(phash=vals.astype("Int64"))

    return fan_out(df).mapInPandas(kernel, schema)
