"""Dependency-free minimal codecs for the multimodal REAL decode paths.

operators/multimodal.py's real-path functions take the decoder module as a
parameter (``Image`` = anything exposing pillow's ``open``; ``av`` =
anything exposing PyAV's ``open``). This module provides stdlib+numpy
implementations of those exact call surfaces for three self-describing
formats:

- **image**: binary PPM (``P6`` RGB / ``P5`` grayscale) — the simplest
  real raster format; written by netpbm tools and ImageMagick.
- **audio**: WAV PCM via the stdlib ``wave`` module (16-bit mono/stereo).
- **video**: ``GRV1``, a trivial raw-grayscale clip container
  (magic + width + height + fps + frame count + raw frames) defined here,
  with an encoder, for hermetic fixtures.

Why this exists: pillow/PyAV are optional executor-side dependencies, and
CI environments without them previously could only exercise the real
decode paths as honest ``NotImplementedError`` stubs. Injecting
``minicodec.image`` / ``minicodec.av`` via the operators' ``codec``
parameters runs the REAL feature/segment/sampling logic end-to-end over
Arrow batches against known pixels — and gives bring-your-own-decoder
environments a documented seam (the codec object is shipped to executors
by cloudpickle, so it works even when the library isn't installed
cluster-wide).

Deliberate non-goals: pillow resampling parity (``resize`` here is
nearest-neighbor grid subsampling; pillow defaults to bicubic) and
compressed formats. The geometry/normalization contracts are what the
real-path logic depends on.
"""

from __future__ import annotations

import io
import struct
import wave as _wave

import numpy as np

# ---------------------------------------------------------------------------
# image: pillow-API subset over PPM (P6) / PGM (P5)
# ---------------------------------------------------------------------------


class _PnmImage:
    """The pillow ``Image`` object subset the real paths use: ``convert``,
    ``resize``, ``save``, ``size``, and numpy coercion via ``__array__``."""

    def __init__(self, arr: np.ndarray):
        self._arr = arr  # HxW uint8 (gray) or HxWx3 uint8 (RGB)

    @property
    def size(self) -> tuple[int, int]:
        return (self._arr.shape[1], self._arr.shape[0])

    def convert(self, mode: str) -> "_PnmImage":
        if mode != "L":
            raise ValueError(f"minicodec supports convert('L') only, got {mode!r}")
        if self._arr.ndim == 2:
            return _PnmImage(self._arr)
        # Integer ITU-R 601 luma, same rounding pillow uses.
        r = self._arr[:, :, 0].astype(np.uint32)
        g = self._arr[:, :, 1].astype(np.uint32)
        b = self._arr[:, :, 2].astype(np.uint32)
        gray = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        return _PnmImage(gray.astype(np.uint8))

    def resize(self, wh: tuple[int, int]) -> "_PnmImage":
        w, h = wh
        if w <= 0 or h <= 0:
            raise ValueError("resize target must be positive")
        ys = np.linspace(0, self._arr.shape[0] - 1, h).astype(int)
        xs = np.linspace(0, self._arr.shape[1] - 1, w).astype(int)
        if self._arr.ndim == 2:
            return _PnmImage(self._arr[np.ix_(ys, xs)])
        return _PnmImage(self._arr[np.ix_(ys, xs)][:, :, :])

    def save(self, fp, format: str | None = None) -> None:
        # Always writes PNM regardless of the requested format name — the
        # real-path caller (resize_images) treats the payload as opaque
        # bytes; decodability by THIS codec is the round-trip contract.
        fp.write(encode_pnm(self._arr))

    def __array__(self, dtype=None, copy=None):
        a = self._arr
        return a.astype(dtype) if dtype is not None else a


def encode_pnm(arr: np.ndarray) -> bytes:
    """HxW (gray → P5) or HxWx3 (RGB → P6) uint8 array → binary PNM bytes.
    Fixture builder for tests and the ``_PnmImage.save`` round-trip."""
    arr = np.asarray(arr, dtype=np.uint8)
    magic = b"P5" if arr.ndim == 2 else b"P6"
    h, w = arr.shape[0], arr.shape[1]
    return magic + f" {w} {h} 255\n".encode() + arr.tobytes()


class image:
    """Namespace matching ``PIL.Image``'s used surface: ``image.open``."""

    @staticmethod
    def open(fp) -> _PnmImage:
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        if data[:2] not in (b"P5", b"P6"):
            raise ValueError("minicodec.image: not a binary PNM payload")
        # Header: magic, width, height, maxval as whitespace-separated
        # tokens (comments unsupported), then a single whitespace byte,
        # then raw samples. Parsed positionally — bytes.split() with a None
        # separator would strip whitespace-VALUED pixel bytes (9..13, 32)
        # off the front of the payload, corrupting e.g. a top-left gray-32
        # pixel into a "truncated pixel data" error.
        ws = b" \t\n\r\x0b\x0c"
        pos = 2
        vals = []
        for _ in range(3):
            while pos < len(data) and data[pos : pos + 1] in ws:
                pos += 1
            start = pos
            while pos < len(data) and data[pos : pos + 1].isdigit():
                pos += 1
            if pos == start:
                raise ValueError("minicodec.image: truncated PNM header")
            vals.append(int(data[start:pos]))
        # Exactly ONE whitespace byte separates maxval from the samples.
        if pos >= len(data) or data[pos : pos + 1] not in ws:
            raise ValueError("minicodec.image: truncated PNM header")
        pos += 1
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError("minicodec.image: only maxval 255 supported")
        raw = data[pos:]
        ch = 1 if data[:2] == b"P5" else 3
        need = w * h * ch
        if len(raw) < need:
            raise ValueError("minicodec.image: truncated pixel data")
        arr = np.frombuffer(raw[:need], dtype=np.uint8)
        arr = arr.reshape((h, w)) if ch == 1 else arr.reshape((h, w, 3))
        return _PnmImage(arr)


# ---------------------------------------------------------------------------
# av: PyAV-API subset over WAV (audio) and GRV1 (raw grayscale video)
# ---------------------------------------------------------------------------

_GRV1_MAGIC = b"GRV1"


def encode_grv1(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w) uint8 grayscale frames → GRV1 clip bytes."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w = frames.shape
    return (
        _GRV1_MAGIC
        + struct.pack("<HHHI", w, h, fps, n)
        + frames.tobytes()
    )


class _AudioFrame:
    def __init__(self, samples: np.ndarray):
        self._samples = samples

    def to_ndarray(self) -> np.ndarray:
        return self._samples


class _VideoFrame:
    def __init__(self, arr: np.ndarray, time_s: float):
        self._arr = arr
        self.time = time_s

    def to_ndarray(self, format: str = "gray") -> np.ndarray:
        if format != "gray":
            raise ValueError("minicodec video frames are grayscale only")
        return self._arr


class _AudioStream:
    def __init__(self, rate: int):
        self.rate = rate


class _Streams:
    def __init__(self, audio_rate: int | None):
        self.audio = [_AudioStream(audio_rate)] if audio_rate else []


_AUDIO_CHUNK = 1024  # samples per yielded frame: forces the real paths to
# exercise their multi-frame concatenation logic, like a real decoder would.


class _Container:
    """Context-manager container dispatching on payload magic: RIFF → WAV
    audio, GRV1 → raw grayscale video."""

    def __init__(self, data: bytes):
        self._data = data
        if data[:4] == b"RIFF":
            with _wave.open(io.BytesIO(data), "rb") as w:
                if w.getsampwidth() != 2:
                    raise ValueError("minicodec.av: 16-bit PCM only")
                self._rate = w.getframerate()
                pcm = np.frombuffer(
                    w.readframes(w.getnframes()), dtype="<i2"
                ).astype(np.float32)
                nch = w.getnchannels()
                if nch > 1:  # average channels down to mono
                    pcm = pcm.reshape(-1, nch).mean(axis=1)
            self._wave = pcm / 32768.0
            self._video = None
        elif data[:4] == _GRV1_MAGIC:
            w, h, fps, n = struct.unpack_from("<HHHI", data, 4)
            need = n * h * w
            hdr_end = 4 + struct.calcsize("<HHHI")
            raw = data[hdr_end : hdr_end + need]
            if len(raw) < need or fps <= 0:
                raise ValueError("minicodec.av: truncated GRV1 payload")
            self._video = (
                np.frombuffer(raw, dtype=np.uint8).reshape((n, h, w)),
                fps,
            )
            self._wave = None
            self._rate = None
        else:
            raise ValueError("minicodec.av: unrecognized container magic")
        self.streams = _Streams(self._rate)

    def __enter__(self) -> "_Container":
        return self

    def __exit__(self, *exc) -> None:
        return None

    def decode(self, audio: int | None = None, video: int | None = None):
        if audio is not None:
            if self._wave is None:
                raise ValueError("minicodec.av: no audio stream")
            for i in range(0, len(self._wave), _AUDIO_CHUNK):
                yield _AudioFrame(self._wave[i : i + _AUDIO_CHUNK])
            return
        if self._video is None:
            raise ValueError("minicodec.av: no video stream")
        frames, fps = self._video
        for i, fr in enumerate(frames):
            yield _VideoFrame(fr, i / fps)


class av:
    """Namespace matching PyAV's used surface: ``av.open``."""

    @staticmethod
    def open(fp) -> _Container:
        data = fp.read() if hasattr(fp, "read") else bytes(fp)
        return _Container(data)
