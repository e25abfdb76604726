"""Hermetic REAL-decode-path tests for operators/multimodal.py.

pillow/PyAV are absent in this container, so the real paths previously ran
in CI only as honest NotImplementedError stubs (2 pytest skips). These
tests inject operators/minicodec's pillow/PyAV-surface codecs instead —
the real functions (`_real_image_features`, `_real_av_features`,
`_real_audio_segments`, `_real_frame_sample`) and the full mapInPandas
operators execute end-to-end against KNOWN pixels/samples, with the codec
objects cloudpickled to the executors exactly as a bring-your-own-decoder
deployment would.
"""

from __future__ import annotations

import io
import struct
import wave as wave_mod

import numpy as np
import pytest

from dampr_spark.operators import minicodec, multimodal

pytestmark = pytest.mark.usefixtures("spark")


def _pgm_4x4() -> tuple[bytes, np.ndarray]:
    """4x4 grayscale PNM with distinct known pixels. dim=16 -> side 4, so
    resize((4,4)) is the identity and features are exactly pixel/255."""
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16  # 0,16,...,240
    return minicodec.encode_pnm(arr), arr


def _wav_halfsilent() -> bytes:
    """2 s of 8 kHz 16-bit mono: first second amplitude 16384 (0.5 after
    PCM normalization), second second silent."""
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<8000h", *([16384] * 8000)))
        w.writeframes(struct.pack("<8000h", *([0] * 8000)))
    return buf.getvalue()


def _grv1_3frames() -> bytes:
    """3 8x8 grayscale frames at 2 fps (t = 0, 0.5, 1.0 s), frame i filled
    with value 10*(i+1)."""
    frames = np.stack(
        [np.full((8, 8), 10 * (i + 1), dtype=np.uint8) for i in range(3)]
    )
    return minicodec.encode_grv1(frames, fps=2)


def test_real_image_features_known_pixels():
    payload, arr = _pgm_4x4()
    feats = multimodal._real_image_features(minicodec.image, payload)
    assert feats == pytest.approx((arr.astype(np.float32) / 255.0).reshape(-1).tolist())
    # P6 RGB: pure red -> integer ITU-R 601 luma 76
    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[:, :, 0] = 255
    feats_rgb = multimodal._real_image_features(
        minicodec.image, minicodec.encode_pnm(rgb)
    )
    assert feats_rgb == pytest.approx([76 / 255.0] * 16)
    # corrupt and empty payloads -> None, no crash
    assert multimodal._real_image_features(minicodec.image, b"not-an-image") is None
    assert multimodal._real_image_features(minicodec.image, None) is None


def test_real_av_features_audio_energy_bins():
    feats = multimodal._real_av_features(minicodec.av, "audio", _wav_halfsilent())
    assert feats == pytest.approx([0.5] * 8 + [0.0] * 8)
    assert multimodal._real_av_features(minicodec.av, "audio", b"garbage") is None


def test_real_av_features_video_first_frame():
    feats = multimodal._real_av_features(minicodec.av, "video", _grv1_3frames())
    assert feats == pytest.approx([10 / 255.0] * 16)


def test_real_frame_sample_keeps_boundary_frames():
    got = list(
        multimodal._real_frame_sample(minicodec.av, _grv1_3frames(), every_ms=1000)
    )
    # frames at 0/500/1000 ms with every_ms=1000: keep 0 and 1000, skip 500
    assert [ms for ms, _ in got] == [0, 1000]
    assert got[0][1] == pytest.approx([10 / 255.0] * 16)
    assert got[1][1] == pytest.approx([30 / 255.0] * 16)


def test_real_audio_segments_from_decoded_waveform():
    segs = list(
        multimodal._real_audio_segments(minicodec.av, _wav_halfsilent(), 1000)
    )
    assert [(s[0], s[1], s[2]) for s in segs] == [(0, 0, 1000), (1, 1000, 2000)]
    # 8000 float32 samples per segment
    assert all(s[3] == 8000 * 4 for s in segs)
    assert segs[0][4] == pytest.approx([0.5] * 16)
    assert segs[1][4] == pytest.approx([0.0] * 16)


def test_extract_features_end_to_end_with_injected_codecs(spark):
    """The full mapInPandas operator on the REAL path, codecs shipped to
    executors: image + audio + video + corrupt in one frame."""
    img, arr = _pgm_4x4()
    rows = [
        (1, "image", img, "image/x-portable-graymap", 4, 4, None),
        (2, "image", b"corrupt", "image/x-portable-graymap", None, None, None),
        (3, "audio", _wav_halfsilent(), "audio/wav", None, None, 2000),
        (4, "video", _grv1_3frames(), "video/x-grv1", 8, 8, 1500),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    got = {
        r.media_id: r
        for r in multimodal.extract_features(
            media, image_codec=minicodec.image, av_codec=minicodec.av
        ).collect()
    }
    assert got[1].features == pytest.approx(
        (arr.astype(np.float32) / 255.0).reshape(-1).tolist()
    )
    assert got[2].features is None
    assert got[3].features == pytest.approx([0.5] * 8 + [0.0] * 8)
    assert got[4].features == pytest.approx([10 / 255.0] * 16)


def test_resize_images_real_path_round_trip(spark):
    img, arr = _pgm_4x4()
    rows = [
        (1, "image", img, "image/x-portable-graymap", 4, 4, None),
        (2, "image", b"corrupt", "image/x-portable-graymap", None, None, None),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    got = {
        r.media_id: r
        for r in multimodal.resize_images(
            media, width=2, height=2, image_codec=minicodec.image
        ).collect()
    }
    back = np.asarray(minicodec.image.open(io.BytesIO(bytes(got[1].content))))
    # nearest-neighbor grid: corners of the 4x4 source
    assert back.tolist() == [
        [int(arr[0, 0]), int(arr[0, 3])],
        [int(arr[3, 0]), int(arr[3, 3])],
    ]
    assert (got[1].width, got[1].height) == (2, 2)
    assert got[2].content is None  # corrupt -> null thumbnail, no crash


def test_frame_sample_and_audio_segments_operators_real_path(spark):
    media = spark.createDataFrame(
        [
            (1, "video", _grv1_3frames(), "video/x-grv1", 8, 8, 1500),
            (2, "audio", _wav_halfsilent(), "audio/wav", None, None, 2000),
        ],
        schema=multimodal.MEDIA_SCHEMA,
    )
    frames = multimodal.frame_sample(
        media.filter("kind = 'video'"), every_ms=1000, av_codec=minicodec.av
    ).collect()
    assert [(f.media_id, f.frame_ms) for f in frames] == [(1, 0), (1, 1000)]

    segs = multimodal.audio_segments(
        media.filter("kind = 'audio'"), segment_ms=1000, av_codec=minicodec.av
    ).collect()
    assert [(s.seg_id, s.start_ms, s.end_ms) for s in segs] == [
        (0, 0, 1000),
        (1, 1000, 2000),
    ]
    assert segs[0].features == pytest.approx([0.5] * 16)
    assert segs[1].features == pytest.approx([0.0] * 16)
