"""Multimodal stages (decode/resize real; audio/video stubs) and the
embedding actor-pool stage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jobscrawler_ray.functions import codecs
from jobscrawler_ray.functions.dedupe import hamming64
from jobscrawler_ray.stages.embed import EMBED_DIM, EmbedDocuments
from jobscrawler_ray.stages.multimodal import (
    AudioFeatures,
    DecodeImages,
    FrameSample,
    ResizeImages,
    resize_nearest,
)

SF = "/root/testdata/sf0.001"


def _img_table(n=6):
    rows = {"image_id": [], "bytes": []}
    for i in range(n):
        px = codecs.gen_pixels(100 + i, 48 + i, 40)
        rows["image_id"].append(f"img{i}")
        rows["bytes"].append(codecs.encode(px, ["raw", "pngz", "qjpg"][i % 3]))
    return pa.table(rows)


class TestImages:
    def test_decode_stage(self):
        out = DecodeImages()(_img_table())
        assert out["w"].to_pylist() == [48 + i for i in range(6)]
        assert out["fmt"].to_pylist() == ["raw", "pngz", "qjpg"] * 2

    def test_resize_kernel(self):
        px = codecs.gen_pixels(1, 64, 48)
        th = resize_nearest(px, 32, 32)
        assert th.shape == (32, 32, 3)
        # resize of a constant image is constant
        const = np.full((40, 40, 3), 77, dtype=np.uint8)
        assert (resize_nearest(const, 16, 16) == 77).all()

    def test_resize_stage_phash_near_original(self):
        t = _img_table()
        dec = DecodeImages()(t)
        th = ResizeImages(32, 32)(t)
        for orig, thumb in zip(dec["phash"].to_pylist(), th["thumb_phash"].to_pylist()):
            assert hamming64(orig, thumb) <= 10  # avg-hash is resize-robust

    def test_external_format_seam_raises(self):
        # buffers NOT in this repo's jaud/jvid containers hit the
        # NotImplementedError seam where soundfile/PyAV would plug in
        with pytest.raises(NotImplementedError):
            AudioFeatures()(pa.table({"clip_id": [1], "bytes": [b"RIFFxxxx"]}))
        with pytest.raises(NotImplementedError):
            FrameSample(every_n=1)(pa.table({"video_id": [1], "bytes": [b"\x00\x00\x00 ftypmp4"]}))


class TestAVCodecs:
    def test_audio_roundtrip_bit_exact(self):
        from jobscrawler_ray.functions import av_codecs

        for seed in (0, 7, 123456789):
            wave = av_codecs.gen_wave(seed)
            buf = av_codecs.encode_audio(wave, 16000)
            back, sr = av_codecs.decode_audio(buf)
            assert sr == 16000
            assert np.array_equal(back, wave)
        # delta coding actually compresses the smooth waveform
        assert len(buf) < 2 * wave.size

    def test_video_roundtrip_and_skip_sampler(self):
        from jobscrawler_ray.functions import av_codecs

        frames = av_codecs.gen_frames(42)
        buf = av_codecs.encode_video(frames, fmt="pngz")  # lossless
        back = av_codecs.decode_video(buf)
        assert len(back) == len(frames)
        for a, b in zip(frames, back):
            assert np.array_equal(a, b)
        # skip-by-offset sampler == modulo over a full decode
        sampled = av_codecs.sample_video(buf, every_n=3)
        assert [i for i, _ in sampled] == [i for i in range(len(frames)) if i % 3 == 0]
        for i, fr in sampled:
            assert np.array_equal(fr, frames[i])

    def test_audio_features_stage_real(self):
        from jobscrawler_ray.functions import av_codecs

        t = pa.table({
            "clip_id": pa.array([3, 4], type=pa.int64()),
            "bytes": pa.array(
                [av_codecs.encode_audio(av_codecs.gen_wave(s), 16000) for s in (3, 4)],
                type=pa.binary()),
        })
        out = AudioFeatures()(t)
        assert out["sample_rate"].to_pylist() == [16000, 16000]
        for d, r in zip(out["duration_s"].to_pylist(), out["rms"].to_pylist()):
            assert 0.2 < d < 1.3
            assert 0.0 < r < 1.0

    def test_frame_sample_stage_real(self):
        from jobscrawler_ray.functions import av_codecs

        frames = av_codecs.gen_frames(9)
        t = pa.table({
            "video_id": pa.array([9], type=pa.int64()),
            "bytes": pa.array([av_codecs.encode_video(frames)], type=pa.binary()),
        })
        out = FrameSample(every_n=4)(t)
        assert out["frame_idx"].to_pylist() == [i for i in range(len(frames)) if i % 4 == 0]
        # sampled frames decode to real pixels: phash is discriminative
        assert len(set(out["frame_phash"].to_pylist())) >= 1


class TestEmbed:
    def test_deterministic_unit_vectors(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta gamma", "delta"]})
        a = EmbedDocuments()(df)
        b = EmbedDocuments()(df)
        for v, w in zip(a["embedding"], b["embedding"]):
            assert len(v) == EMBED_DIM
            assert np.allclose(v, w)
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    def test_truncation_matters(self):
        long = " ".join(f"tok{i}" for i in range(2000))
        short = " ".join(f"tok{i}" for i in range(1000))
        e = EmbedDocuments(max_tokens=1000)
        va = e._embed([long])[0]
        vb = e._embed([short])[0]
        assert np.allclose(va, vb)  # truncated at 1000 → identical


class TestQueries:
    def test_embed_documents_query(self, ray_session):
        from jobscrawler_ray.pipelines.queries import QUERIES

        df = QUERIES["embed_documents"](SF).to_pandas()
        assert len(df) == 500
        assert (df["dim"] == EMBED_DIM).all()
        assert (np.abs(df["norm"] - 1.0) < 1e-3).all()

    def test_multimodal_resize_and_phash_neardup(self, ray_session):
        from jobscrawler_ray.pipelines.queries import QUERIES

        th = QUERIES["multimodal_resize"](SF).to_pandas()
        assert len(th) > 0 and (th["w"] == 32).all()
        pairs = QUERIES["phash_neardup"](SF).to_pandas()  # Dataset since r3
        assert len(pairs) > 0
        # the guaranteed positives: original ↔ its thumbnail
        self_pairs = [
            (a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])
            if a + "#thumb" == b or b + "#thumb" == a
        ]
        assert len(self_pairs) > 0
        assert (pairs["hamming"] <= 8).all()

    def test_session_windows_total(self, ray_session):
        from jobscrawler_ray.pipelines.queries import QUERIES

        df = QUERIES["session_windows"](SF).to_pandas()
        assert df["n"].sum() == 1000  # every event in exactly one session
        assert (df["sid"] >= 1).all()
