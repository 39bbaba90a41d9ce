"""Audio/video multimodal paths: real WAV + npy decode, frame fan-out,
per-row quarantine for codecs that genuinely need external libs."""

import io
import math
import wave

import numpy as np
import pytest

from jochre3_ocr_spark.operators import multimodal as M


def _wav_bytes(sr=8000, seconds=0.5, freq=440.0, width=2, nch=1) -> bytes:
    n = int(sr * seconds)
    t = np.arange(n) / sr
    sig = np.sin(2 * math.pi * freq * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            data = (sig * 32767).astype("<i2")
            if nch > 1:
                data = np.repeat(data[:, None], nch, axis=1).ravel()
            w.writeframes(data.tobytes())
        else:
            data = ((sig * 127) + 128).astype(np.uint8)
            w.writeframes(data.tobytes())
    return buf.getvalue()


def test_decode_wav_16bit_and_8bit():
    samples, sr = M.decode_audio(_wav_bytes(width=2), "audio/wav")
    assert sr == 8000 and len(samples) == 4000
    assert abs(float(np.sqrt(np.mean(samples**2))) - 1 / math.sqrt(2)) < 0.01
    s8, _ = M.decode_audio(_wav_bytes(width=1), "audio/wav")
    assert abs(float(np.sqrt(np.mean(s8**2))) - 1 / math.sqrt(2)) < 0.02


def test_decode_wav_stereo_downmixes():
    samples, sr = M.decode_audio(_wav_bytes(nch=2), "audio/wav")
    assert len(samples) == 4000


def test_decode_audio_compressed_raises():
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"\xff\xfb\x90\x00", "audio/mp3")


def test_audio_features_df(spark):
    rows = [
        ("a1", "audio/wav", bytearray(_wav_bytes())),
        ("a2", "audio/mp3", bytearray(b"\xff\xfb\x90\x00")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary"
    )
    out = {r.media_ref: r for r in M.audio_features(df).collect()}
    ok = out["a1"]
    assert ok.status == "ok" and ok.sample_rate == 8000
    assert ok.duration_sec == pytest.approx(0.5)
    assert ok.rms == pytest.approx(1 / math.sqrt(2), abs=0.01)
    # 440 Hz → ~880 zero crossings/sec → rate ≈ 0.11 at 8 kHz
    assert ok.zero_cross_rate == pytest.approx(0.11, abs=0.01)
    assert out["a2"].status.startswith("stub:")


def _video_bytes(n_frames=25, h=24, w=32) -> bytes:
    frames = np.stack(
        [np.full((h, w), 10 * i % 256, dtype=np.uint8) for i in range(n_frames)]
    )
    buf = io.BytesIO()
    np.save(buf, frames, allow_pickle=False)
    return buf.getvalue()


def test_sample_frames_stride():
    frames = M.sample_frames(_video_bytes(25), "video/npy", every_n=10)
    assert [i for i, _ in frames] == [0, 10, 20]
    assert frames[1][1].shape == (24, 32)
    with pytest.raises(NotImplementedError):
        M.sample_frames(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_sample_frames_df_fan_out(spark):
    from jochre3_ocr_spark.sources.png_codec import decode_png

    rows = [
        ("v1", "video/npy", bytearray(_video_bytes(25))),
        ("v2", "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary"
    )
    out = M.sample_frames_df(df, every_n=10).collect()
    v1 = sorted((r.frame_idx for r in out if r.media_ref == "v1"))
    assert v1 == [0, 10, 20]
    frame = next(r for r in out if r.media_ref == "v1" and r.frame_idx == 10)
    img = decode_png(bytes(frame.image))
    assert img.shape == (24, 32) and int(img[0, 0]) == 100
    v2 = [r for r in out if r.media_ref == "v2"]
    assert len(v2) == 1 and v2[0].status.startswith("stub:")


def test_resize_images_df(spark):
    from jochre3_ocr_spark.operators import transforms as T
    from jochre3_ocr_spark.sources.png_codec import decode_png, encode_png

    big = np.full((400, 200), 180, dtype=np.uint8)
    small = np.full((50, 40), 90, dtype=np.uint8)
    rows = [
        ("big", "image/png", bytearray(encode_png(big))),
        ("small", "image/npy", bytearray(T.encode_image(small))),
        ("bad", "image/png", bytearray(b"nope")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary"
    )
    out = {r.media_ref: r for r in M.resize_images(df, max_side=100).collect()}
    b = out["big"]
    assert (b.height, b.width) == (100, 50) and b.scale == 0.25
    assert decode_png(bytes(b.image)).shape == (100, 50)
    s = out["small"]  # under max side: unchanged, scale 1
    assert (s.height, s.width) == (50, 40) and s.scale == 1.0
    assert out["bad"].status.startswith("error:")
