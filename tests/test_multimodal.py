"""Multimodal (audio/video) stub plumbing tests: real schemas, real Arrow
batching, deterministic fake codecs."""

import numpy as np
import pytest

from libgeodesk_spark.media import codec, multimodal as mm


class TestFakeCodecs:
    def test_audio_roundtrip(self):
        s = mm.synth_audio(7, 16000)
        back, sr = mm.decode_audio(mm.encode_audio(s, 16000))
        assert sr == 16000 and len(back) == len(s)
        assert float(np.max(np.abs(back - s))) < 1e-4  # 16-bit quantization

    def test_video_roundtrip(self):
        v = mm.synth_video(3, 16, 8, 6)
        back, fps = mm.decode_video(mm.encode_video(v, fps=8))
        assert fps == 8
        assert np.array_equal(back, v)

    def test_real_codec_gate(self, monkeypatch):
        monkeypatch.setattr(mm, "REAL_CODECS", True)
        with pytest.raises(NotImplementedError, match="audio decode"):
            mm.decode_audio(b"FAUD" + b"\x00" * 10)


@pytest.fixture(scope="module")
def audio_df(spark):
    rows = [(f"clip{i}",
             mm.encode_audio(mm.synth_audio(i, 8000 + 1000 * i), 16000),
             16000, 8000 + 1000 * i, 1, "faud") for i in range(6)]
    return spark.createDataFrame(rows, mm.AUDIO_SCHEMA)


@pytest.fixture(scope="module")
def video_df(spark):
    rows = [(f"vid{i}", mm.encode_video(mm.synth_video(i, 16, 16, 8), 8),
             16, 16, 8, 8, "fvid") for i in range(3)]
    return spark.createDataFrame(rows, mm.VIDEO_SCHEMA)


class TestPlumbing:
    def test_audio_features(self, audio_df):
        got = mm.audio_features(audio_df).toPandas().sort_values("clip_id")
        assert len(got) == 6
        assert (got.duration_ms == [(8000 + 1000 * i) * 1000 // 16000
                                    for i in range(6)]).all()
        # sine-dominated clips: healthy RMS and crossings
        assert (got.rms_ppm > 500_000).all()
        assert (got.zero_crossings > 10).all()

    def test_frame_sampling(self, video_df):
        got = mm.sample_frames(video_df, every_n=4).toPandas()
        assert len(got) == 3 * 2          # frames 0 and 4 per video
        px, fmt = codec.decode(bytes(got.iloc[0].frame_png))
        assert fmt == "png" and px.shape == (16, 16, 3)
        # sampled frame content matches the source frame exactly
        vid0 = got[got.video_id == "vid0"].sort_values("frame_no")
        src = mm.synth_video(0, 16, 16, 8)
        f4, _ = codec.decode(bytes(vid0.iloc[1].frame_png))
        assert np.array_equal(f4, src[4])

    def test_resize(self, spark):
        from libgeodesk_spark.sources.images import images_table
        img = images_table(spark, "/root/testdata/sf0.001").limit(20)
        small = mm.resize_images(img, target=8).toPandas()
        assert (small.w == 8).all() and (small.h == 8).all()
        for blob, fmt in zip(small["bytes"], small.fmt):
            px, f = codec.decode(bytes(blob))
            assert f == fmt and px.shape == (8, 8, 3)
