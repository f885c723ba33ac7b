"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition sizing,
Arrow-batched UDF signatures, frame-sampling fan-out — is real and tested;
the codec step is import-guarded per kind (``_pick_decoder``): the real
PIL path for images and the real PyAV path for video when the libraries
are importable on the executor, the stdlib-``wave``+numpy path for PCM
audio (always available), else the clearly marked deterministic
``_decode_stub`` (this environment ships no PIL/ffmpeg, so images and
video exercise the fallback branch here while audio runs real).

Scale notes: payload rows are large and skew-prone — ``pack_for_batching``
repartitions by a payload-size-aware key so Arrow batches stay bounded;
decode runs through ``mapInPandas`` (per-partition Arrow batch iterator), the
right shape for heavyweight per-record work.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB: returns a deterministic fake feature vector derived from the
    payload digest — stable, testable plumbing; NOT a real decoder. Used
    whenever the real codec libraries are absent (see ``_pick_decoder``)."""
    h = hashlib.sha256(payload or b"").digest()
    return [((b / 255.0) * 2.0 - 1.0) for b in h[:16]]


def _decode_pil_image(payload: bytes, kind: str) -> list[float]:
    """Real image path (import-guarded; only selected when PIL is present):
    decode the payload, downsample to a 4×4 grayscale grid, and emit the 16
    pixel intensities scaled to [-1, 1] — same shape/range contract as the
    stub, so downstream schema and tests are identical. Non-image kinds and
    undecodable payloads fall back to the stub (a corrupt record must not
    kill the Arrow batch)."""
    if kind != "image" or not payload:
        return _decode_stub(payload, kind)
    import io

    from PIL import Image  # resolved only on executors that selected it

    try:
        with Image.open(io.BytesIO(payload)) as img:
            g = img.convert("L").resize((4, 4))
            return [((px / 255.0) * 2.0 - 1.0) for px in g.getdata()]
    except Exception:
        return _decode_stub(payload, kind)


def _decode_wav_audio(payload: bytes, kind: str) -> list[float]:
    """Real audio path — stdlib ``wave`` + numpy, no external codec needed:
    decode PCM WAV, emit a 16-bin RMS envelope scaled to [-1, 1] (same
    shape/range contract as the stub and the image path). Non-WAV bytes,
    empty frames, or exotic sample widths fall back to the stub — a corrupt
    record must not kill the Arrow batch."""
    if kind != "audio" or not payload:
        return _decode_stub(payload, kind)
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(width)
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64) if dtype else None
        if x is None or x.size == 0:
            return _decode_stub(payload, kind)
        peak = float(np.max(np.abs(x))) or 1.0
        return [
            float(np.sqrt(np.mean((b / peak) ** 2)) * 2.0 - 1.0) if b.size else -1.0
            for b in np.array_split(x, 16)
        ]
    except Exception:
        return _decode_stub(payload, kind)


def _decode_av_video(payload: bytes, kind: str) -> list[float]:
    """Real video path (import-guarded; only selected when PyAV/ffmpeg is
    present — this sandbox ships neither, so here the guard's fallback
    branch is what runs): decode the first frame, 4×4 mean-pool the
    grayscale plane, emit 16 intensities in [-1, 1] — the shared feature
    contract. Undecodable payloads fall back to the stub."""
    if kind != "video" or not payload:
        return _decode_stub(payload, kind)
    import io

    import av  # resolved only on executors that selected it
    import numpy as np

    try:
        with av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                g = frame.to_ndarray(format="gray").astype(np.float64)
                h, w = g.shape
                if h < 4 or w < 4:
                    return _decode_stub(payload, kind)
                pooled = (
                    g[: h - h % 4, : w - w % 4]
                    .reshape(4, h // 4, 4, w // 4)
                    .mean(axis=(1, 3))
                )
                return [float(v / 255.0 * 2.0 - 1.0) for v in pooled.ravel()]
        return _decode_stub(payload, kind)
    except Exception:
        return _decode_stub(payload, kind)


def _pick_decoder():
    """Import-guarded codec selection, evaluated on the EXECUTOR (inside the
    Arrow UDF) so a heterogeneous cluster image doesn't break planning:
    per-kind dispatch — PIL for images and PyAV for video when importable
    (stub otherwise), stdlib-WAV for audio (always available). Unknown
    kinds take the stub."""
    try:
        import PIL.Image  # noqa: F401

        img = _decode_pil_image
    except ImportError:
        img = _decode_stub
    try:
        import av  # noqa: F401

        vid = _decode_av_video
    except Exception:  # ImportError, or ffmpeg sonames missing (OSError)
        vid = _decode_stub
    table = {"image": img, "audio": _decode_wav_audio, "video": vid}

    def dispatch(payload: bytes, kind: str) -> list[float]:
        return table.get(kind, _decode_stub)(payload, kind)

    return dispatch


def decode_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (Arrow batches).

    The UDF body is vectorized per batch; only the codec call is per-record
    (inherent — codecs are per-payload). The codec itself is import-guarded:
    the real PIL image path when the library exists, the deterministic stub
    otherwise (this sandbox has no PIL/ffmpeg)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pick_decoder()  # once per task, not per record
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "digest": pdf["payload"].map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": [
                        decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def pack_for_batching(media: DataFrame, target_partition_bytes: int = 64 << 20) -> DataFrame:
    """Size-aware repartition: large payloads are skew bombs for Arrow
    batching; spread rows by (size-band, hash) so each partition's payload
    volume is bounded."""
    size_band = (F.log2(F.length("payload").cast("double") + 2.0)).cast("int")
    return media.repartition(F.col("kind"), size_band, F.pmod(F.xxhash64("media_id"), F.lit(64)))


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling fan-out: one row per sampled timestamp. The
    per-frame decode is the stubbed step; the fan-out (explode over a
    deterministic timestamp grid from metadata) is the real Spark plumbing."""
    grid = F.sequence(
        F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(grid))
        .select("media_id", "frame_ts_ms", "payload", "meta")
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: metadata from plain modular
    arithmetic on (id, seed) — deliberately SQL-expressible so an external
    oracle (DuckDB) can reproduce kind/duration and verify the frame grid —
    payload bytes from a sha2 chain (opaque, never oracled)."""
    df = spark.range(n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        ((F.col("id") * 7919 + F.lit(seed)) % 3 + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256).cast("binary")
    return df.select(
        F.concat(F.lit("m-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            ((F.col("id") * 997 + F.lit(seed * 31)) % 5000 + 1000)
            .cast("int")
            .alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
