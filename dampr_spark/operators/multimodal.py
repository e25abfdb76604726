"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode is REAL when the optional codec libraries are importable on the
executors (pillow for images, PyAV for audio/video) and honestly stubbed
otherwise: with no codec lib and ``fake=False`` the operators raise
``NotImplementedError`` at execution time; ``fake=True`` always selects the
hermetic deterministic fake decoder (seeded by the content hash), which is
what the catalog queries and tests in this container use. The probe happens
inside the mapInPandas body — i.e. on the EXECUTOR, where the library must
actually live — so a driver-only install can't lie about cluster capability.
Real-decode tests auto-skip when the libraries are absent
(tests/test_dedup.py::test_real_image_decode).

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


def _pil_image():
    """``PIL.Image`` if pillow is importable, else None. Called inside the
    batch functions so the probe runs executor-side."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _pyav():
    """``av`` (PyAV) if importable, else None — the audio/video decoder."""
    try:
        import av  # noqa: PLC0415

        return av
    except ImportError:
        return None


def _real_image_features(Image, content: bytes | None, dim: int = FEATURE_DIM):
    """Pillow decode → grayscale → 4×4 thumbnail → ``dim`` floats in [0, 1].
    Corrupt/undecodable payloads return None (a null feature row) instead of
    raising: at corpus scale bad media is routine and one rotten blob must
    not kill a 10k-row Arrow batch."""
    if not content:
        return None
    try:
        import io  # noqa: PLC0415

        side = int(dim**0.5)
        img = Image.open(io.BytesIO(content)).convert("L").resize((side, side))
        return (np.asarray(img, dtype=np.float32) / 255.0).reshape(-1)[:dim].tolist()
    except Exception:
        return None


def _gray_features(arr: np.ndarray, dim: int) -> list[float]:
    """Grayscale frame -> ``dim`` floats in [0, 1]: subsample a
    sqrt(dim)-sided grid of pixels. Shared by still-image-free AV paths
    (first-frame features, per-frame sampling)."""
    side = int(dim**0.5)
    ys = np.linspace(0, arr.shape[0] - 1, side).astype(int)
    xs = np.linspace(0, arr.shape[1] - 1, side).astype(int)
    return (arr[np.ix_(ys, xs)].astype(np.float32) / 255.0).reshape(-1)[:dim].tolist()


def _energy_bins(wave: np.ndarray, dim: int) -> list[float]:
    """Mean-abs amplitude over ``dim`` equal windows of a waveform."""
    bins = np.array_split(np.abs(wave), dim)
    return [float(b.mean()) if len(b) else 0.0 for b in bins]


def _real_av_features(av, kind: str, content: bytes | None, dim: int = FEATURE_DIM):
    """PyAV decode → ``dim`` floats. Video: first frame, grayscale 4×4
    thumbnail. Audio: mean-abs amplitude over ``dim`` equal time windows.
    None on corrupt/empty payloads (same no-crash policy as images)."""
    if not content:
        return None
    try:
        import io  # noqa: PLC0415

        with av.open(io.BytesIO(content)) as container:
            if kind == "video":
                for frame in container.decode(video=0):
                    return _gray_features(frame.to_ndarray(format="gray"), dim)
                return None
            samples = [
                f.to_ndarray().astype(np.float32).reshape(-1)
                for f in container.decode(audio=0)
            ]
            if not samples:
                return None
            return _energy_bins(np.concatenate(samples), dim)
    except Exception:
        return None


def _fake_decode(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature vector: md5 of the payload expands into
    ``dim`` floats in [0, 1). Stable across runs/machines — usable in tests
    and as a placeholder embedding.

    The per-component salt is the ASCII decimal index (not raw bytes) ON
    PURPOSE: every step — md5, little-endian uint32 of the first four
    digest bytes, /2^32, float32 narrowing — is then expressible in ANSI
    SQL over the text payload, which is what lets the `multimodal_features`
    catalog query carry a full DuckDB oracle (plans/dedupops.py) instead of
    a rows-only check."""
    out = np.empty(dim, dtype=np.float32)
    h = content or b""
    for i in range(dim):
        d = hashlib.md5(h + str(i).encode()).digest()
        out[i] = int.from_bytes(d[:4], "little") / 2**32
    return out


def extract_features(
    media: DataFrame,
    fake: bool = False,
    batch_size: int = 256,
    image_codec=None,
    av_codec=None,
) -> DataFrame:
    """Decode + feature-extract media content via mapInPandas.

    With ``fake=False`` the executor probes for the codec library matching
    each row's kind (pillow for images, PyAV for audio/video) and uses it;
    if the library is absent it raises NotImplementedError — the honest
    marker that this environment can't decode. Rows whose payload fails to
    decode yield null features (corrupt media must not kill the batch). The
    plumbing (Arrow batching, schema, null handling) is identical either way.

    ``image_codec`` / ``av_codec`` override the probe with an explicit
    decoder exposing pillow's / PyAV's ``open`` surface (e.g.
    ``operators.minicodec.image`` / ``.av``) — the bring-your-own-decoder
    seam; the object ships to executors via cloudpickle, so it works on
    clusters where the library isn't installed. Ignored when ``fake=True``.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None if fake else (image_codec or _pil_image())
        av = None if fake else (av_codec or _pyav())
        for pdf in batches:
            if fake:
                feats = [
                    _fake_decode(c if c is not None else b"").tolist()
                    for c in pdf["content"]
                ]
            else:
                feats = []
                for kind, c in zip(pdf["kind"], pdf["content"]):
                    if kind == "image":
                        if Image is None:
                            raise NotImplementedError(
                                "real image decode requires pillow on the "
                                "executors; re-run with fake=True for the "
                                "deterministic stub"
                            )
                        feats.append(_real_image_features(Image, c))
                    else:
                        if av is None:
                            raise NotImplementedError(
                                f"real {kind} decode requires PyAV on the "
                                "executors; re-run with fake=True for the "
                                "deterministic stub"
                            )
                        feats.append(_real_av_features(av, kind, c))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    # Project to exactly the columns the function reads BEFORE the opaque
    # mapInPandas (round 14, guide §4.1): Spark cannot see which columns
    # the Python body touches, so an unprojected input ships (and scans)
    # every media column — mime/width/height/duration_ms here — through
    # Arrow for nothing.
    return media.select("media_id", "kind", "content").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    fake: bool = False,
    image_codec=None,
) -> DataFrame:
    """Image resize: binary in → binary out with updated dimensions.

    Spark-side shape: a 1:1 mapInPandas over Arrow batches — payloads never
    leave the executor, output rows carry the new (width, height) metadata
    so downstream decode knows the geometry. The pixel work uses pillow when
    present (PNG re-encode; corrupt payloads → null content); ``fake=True``
    emits a deterministic md5-expanded payload of exactly ``width*height``
    bytes (a stable stand-in for a grayscale thumbnail)."""
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
        Image = None if fake else (image_codec or _pil_image())
        for pdf in batches:
            if not fake and Image is None:
                raise NotImplementedError(
                    "real image resize requires pillow on the executors; "
                    "use fake=True for the deterministic stub"
                )
            out = []
            mimes = []
            for c, mime in zip(pdf["content"], pdf["mime"]):
                if fake:
                    seed = hashlib.md5(c if c is not None else b"").digest()
                    reps = -(-n // len(seed))  # ceil
                    out.append((seed * reps)[:n])
                    mimes.append(mime)
                    continue
                try:
                    import io  # noqa: PLC0415

                    img = Image.open(io.BytesIO(c)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(buf.getvalue())
                    mimes.append("image/png")
                except Exception:
                    # corrupt payload: null thumbnail, original mime kept
                    out.append(None)
                    mimes.append(mime)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out,
                    "mime": mimes,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    # Column-pruned Python boundary (round 14, guide §4.1).
    return media.select("media_id", "kind", "content", "mime").mapInPandas(
        run, schema=schema
    )


def _real_frame_sample(av, content: bytes, every_ms: int, dim: int = FEATURE_DIM):
    """PyAV sequential decode, keeping the first frame at or past each
    ``every_ms`` boundary — one pass, no per-sample seeks (seekable
    containers could seek, but a single forward decode is the shape that
    streams through an Arrow batch without rewinding byte buffers).
    Yields (frame_ms, features) tuples; corrupt payloads yield nothing."""
    if not content:
        return
    try:
        import io  # noqa: PLC0415

        with av.open(io.BytesIO(content)) as container:
            next_ms = 0
            for frame in container.decode(video=0):
                if frame.time is None:
                    continue
                ms = int(frame.time * 1000)
                if ms < next_ms:
                    continue
                yield ms, _gray_features(frame.to_ndarray(format="gray"), dim)
                next_ms = ms - (ms % every_ms) + every_ms
    except Exception:
        return


def frame_sample(
    media: DataFrame, every_ms: int = 1000, fake: bool = False, av_codec=None
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.

    Spark-side shape: flat-map via mapInPandas (a batch row explodes into
    ceil(duration/every_ms) frame rows). The frame grab uses PyAV when
    present (one sequential decode pass per clip); otherwise it is stubbed
    like :func:`extract_features`."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", LongType(), False),
            StructField("features", ArrayType(FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = None if fake else (av_codec or _pyav())
        for pdf in batches:
            if not fake and av is None:
                raise NotImplementedError(
                    "real frame sampling requires PyAV on the executors; "
                    "use fake=True for the deterministic stub"
                )
            ids, offs, feats = [], [], []
            for _, row in pdf.iterrows():
                # Nullable LongType arrives in pandas as float64 with NaN —
                # NaN is truthy, so `or 0` can't guard it; pd.isna can.
                v = row["duration_ms"]
                dur = 0 if pd.isna(v) else int(v)
                content = row["content"] or b""
                if not fake:
                    for off, feat in _real_frame_sample(av, content, every_ms):
                        ids.append(row["media_id"])
                        offs.append(off)
                        feats.append(feat)
                    continue
                for off in range(0, max(dur, 1), every_ms):
                    ids.append(row["media_id"])
                    offs.append(off)
                    feats.append(
                        _fake_decode(content + off.to_bytes(8, "little")).tolist()
                    )
            yield pd.DataFrame({"media_id": ids, "frame_ms": offs, "features": feats})

    # Column-pruned Python boundary (round 14, guide §4.1).
    return media.select("media_id", "content", "duration_ms").mapInPandas(
        run, schema=schema
    )


def _real_audio_segments(av, content: bytes | None, segment_ms: int, dim: int = FEATURE_DIM):
    """PyAV audio decode → fixed-duration segments of the actual waveform.
    Yields (seg_id, start_ms, end_ms, n_bytes, features); features is the
    mean-abs amplitude over ``dim`` equal windows of the segment. Duration
    comes from the decoded sample count (metadata duration_ms can lie);
    corrupt payloads yield nothing."""
    if not content:
        return
    try:
        import io  # noqa: PLC0415

        with av.open(io.BytesIO(content)) as container:
            stream = container.streams.audio[0]
            rate = int(stream.rate or 0)
            frames = [
                f.to_ndarray().astype(np.float32).reshape(-1)
                for f in container.decode(audio=0)
            ]
        if not frames or rate <= 0:
            return
        wave = np.concatenate(frames)
        per_seg = max(rate * segment_ms // 1000, 1)
        total_ms = len(wave) * 1000 // rate
        for s in range(0, -(-len(wave) // per_seg)):
            chunk = wave[s * per_seg : (s + 1) * per_seg]
            yield (
                s,
                s * segment_ms,
                min((s + 1) * segment_ms, total_ms),
                int(chunk.nbytes),
                _energy_bins(chunk, dim),
            )
    except Exception:
        return


def audio_segments(
    media: DataFrame, segment_ms: int = 5000, fake: bool = False, av_codec=None
) -> DataFrame:
    """Audio segmentation: fixed-duration windows per clip, one output row
    per segment with its byte-slice and a feature digest — the audio twin
    of :func:`frame_sample` (video) and :func:`resize_images` (image).

    Spark-side shape: a mapInPandas flat-map; each clip row explodes into
    ceil(duration/segment_ms) segment rows, bytes sliced proportionally to
    the segment's time span (a real decoder would resample; the slice keeps
    the plumbing — schema, batch shape, byte movement — honest). With PyAV
    present, ``fake=False`` decodes the real waveform and segments it by
    actual sample count; without it, ``fake=False`` raises."""
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
        av = None if fake else (av_codec or _pyav())
        for pdf in batches:
            if not fake and av is None:
                raise NotImplementedError(
                    "real audio decode requires PyAV on the executors; "
                    "use fake=True for the deterministic stub"
                )
            ids, segs, starts, ends, sizes, feats = [], [], [], [], [], []
            if not fake:
                for _, row in pdf.iterrows():
                    for seg in _real_audio_segments(
                        av, row["content"], segment_ms
                    ):
                        ids.append(row["media_id"])
                        segs.append(seg[0])
                        starts.append(seg[1])
                        ends.append(seg[2])
                        sizes.append(seg[3])
                        feats.append(seg[4])
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
                continue
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

    # Column-pruned Python boundary (round 14, guide §4.1).
    return media.select("media_id", "content", "duration_ms").mapInPandas(
        run, schema=schema
    )
