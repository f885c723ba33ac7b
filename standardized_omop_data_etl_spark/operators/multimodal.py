"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition sizing,
Arrow-batched UDF signatures, frame-sampling fan-out — is real and tested;
the codec step is import-guarded (``_pick_decoder``): the real PIL image
path when the library is importable on the executor, else the clearly
marked deterministic ``_decode_stub`` (this environment ships no
PIL/ffmpeg). Audio/video decode remains stub-only — wiring
torchaudio/ffmpeg follows the same one-function pattern.

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


def _pick_decoder():
    """Import-guarded codec selection, evaluated on the EXECUTOR (inside the
    Arrow UDF) so a heterogeneous cluster image doesn't break planning:
    PIL when importable, the deterministic stub otherwise."""
    try:
        import PIL.Image  # noqa: F401

        return _decode_pil_image
    except ImportError:
        return _decode_stub


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
