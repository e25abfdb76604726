"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED (`pillow`/`ffmpeg`/`librosa` are not in
this container): :func:`decode_image` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
content hash) produces stable pseudo-features. Everything Spark-side — the
media schema, batch iteration shape, partition sizing, UDF signatures — is
real and tested, so swapping in a real codec is a one-function change.

Scale notes:
- media bytes stay in executors end-to-end (mapInPandas streams Arrow record
  batches; nothing collects);
- ``spark.sql.files.maxPartitionBytes`` governs scan granularity for big
  binary files; for huge blobs store pointers (path + range) instead and
  fetch inside the batch iterator;
- feature extraction emits fixed-width ``array<float>`` columns that feed
  straight into operators/similarity.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter for tests/benchmarks: treat document text bytes as opaque
    media payloads so the binary pipeline can run against TESTDATA."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_decode(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector: md5 of the payload expands into
    ``dim`` floats in [0, 1). Stable across runs/machines — usable in tests
    and as a placeholder embedding."""
    out = np.empty(dim, dtype=np.float32)
    h = content or b""
    for i in range(dim):
        d = hashlib.md5(h + i.to_bytes(2, "little")).digest()
        out[i] = int.from_bytes(d[:4], "little") / 2**32
    return out


def extract_features(media: DataFrame, fake: bool = False, batch_size: int = 256) -> DataFrame:
    """Decode + feature-extract media content via mapInPandas.

    With ``fake=False`` this raises NotImplementedError at execution time —
    the honest marker that no codec library exists in this environment. The
    plumbing (Arrow batching, schema, null handling) is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires pillow/ffmpeg/librosa; "
                    "re-run with fake=True for the deterministic stub"
                )
            feats = [
                _fake_decode(c if c is not None else b"").tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Image resize: binary in → binary out with updated dimensions.

    Spark-side shape: a 1:1 mapInPandas over Arrow batches — payloads never
    leave the executor, output rows carry the new (width, height) metadata
    so downstream decode knows the geometry. The pixel work is stubbed like
    :func:`extract_features`; ``fake=True`` emits a deterministic
    md5-expanded payload of exactly ``width*height`` bytes (a stable
    stand-in for a grayscale thumbnail)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("content", BinaryType(), True),
            StructField("mime", StringType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires pillow; use fake=True"
                )
            out = []
            for c in pdf["content"]:
                seed = hashlib.md5(c if c is not None else b"").digest()
                reps = -(-n // len(seed))  # ceil
                out.append((seed * reps)[:n])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out,
                    "mime": pdf["mime"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    Spark-side shape: flat-map via mapInPandas (a batch row explodes into
    ceil(duration/every_ms) frame rows). The actual frame grab is stubbed
    like :func:`extract_features`."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; use fake=True"
                )
            ids, offs, feats = [], [], []
            for _, row in pdf.iterrows():
                # Nullable LongType arrives in pandas as float64 with NaN —
                # NaN is truthy, so `or 0` can't guard it; pd.isna can.
                v = row["duration_ms"]
                dur = 0 if pd.isna(v) else int(v)
                content = row["content"] or b""
                for off in range(0, max(dur, 1), every_ms):
                    ids.append(row["media_id"])
                    offs.append(off)
                    feats.append(
                        _fake_decode(content + off.to_bytes(8, "little")).tolist()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_ms": offs, "features": feats})

    return media.mapInPandas(run, schema=schema)


def audio_segments(
    media: DataFrame, segment_ms: int = 5000, fake: bool = False
) -> DataFrame:
    """Audio segmentation: fixed-duration windows per clip, one output row
    per segment with its byte-slice and a feature digest — the audio twin
    of :func:`frame_sample` (video) and :func:`resize_images` (image).

    Spark-side shape: a mapInPandas flat-map; each clip row explodes into
    ceil(duration/segment_ms) segment rows, bytes sliced proportionally to
    the segment's time span (a real decoder would resample; the slice keeps
    the plumbing — schema, batch shape, byte movement — honest). Decode is
    stubbed like every other modality here (no codec libs in this
    container): ``fake=False`` raises."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("seg_id", LongType(), False),
            StructField("start_ms", LongType(), False),
            StructField("end_ms", LongType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires an audio codec; use fake=True"
                )
            ids, segs, starts, ends, sizes, feats = [], [], [], [], [], []
            for _, row in pdf.iterrows():
                # NULL duration_ms surfaces as NaN (truthy!) in pandas; take
                # the documented unknown-duration path instead of crashing.
                v = row["duration_ms"]
                dur = 0 if pd.isna(v) else int(v)
                content = row["content"] or b""
                if dur <= 0:
                    # Unknown/zero duration: one whole-clip segment with an
                    # honest [0, 0] span (no phantom 1 ms of audio).
                    ids.append(row["media_id"])
                    segs.append(0)
                    starts.append(0)
                    ends.append(0)
                    sizes.append(len(content))
                    feats.append(_fake_decode(content).tolist())
                    continue
                n_seg = (dur + segment_ms - 1) // segment_ms
                for s in range(n_seg):
                    lo = s * segment_ms
                    hi = min((s + 1) * segment_ms, dur)
                    b0 = len(content) * lo // dur
                    b1 = len(content) * hi // dur
                    chunk = content[b0:b1]
                    ids.append(row["media_id"])
                    segs.append(s)
                    starts.append(lo)
                    ends.append(hi)
                    sizes.append(len(chunk))
                    feats.append(_fake_decode(chunk).tolist())
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "seg_id": segs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=schema)
