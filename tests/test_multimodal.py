"""Multimodal plumbing: binary columns, Arrow-batched decode stub, frames."""

import hashlib

import pytest

from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
    attach_binary,
    decode_features,
    sample_frames,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestAttachBinary:
    def test_binary_and_metadata(self, spark):
        out = attach_binary(_docs(spark, [(1, "hello")])).collect()[0]
        assert bytes(out["content"]) == b"hello"
        assert out["byte_len"] == 5
        assert out["content_md5"] == hashlib.md5(b"hello").hexdigest()
        assert out["mime"] == "text/plain"


class TestDecodeStub:
    def test_real_decode_is_stubbed(self, spark):
        media = attach_binary(_docs(spark, [(1, "hello")]))
        with pytest.raises(Exception) as exc:
            decode_features(media, fake=False).collect()
        assert "NotImplementedError" in str(exc.value) or "media decoding" in str(exc.value)

    def test_fake_decode_deterministic(self, spark):
        media = attach_binary(_docs(spark, [(1, "hello"), (2, "x" * 700)]))
        rows = {r["doc_id"]: r for r in decode_features(media, fake=True).collect()}
        assert rows[1]["width"] == 5 % 640 + 64
        assert rows[2]["width"] == 700 % 640 + 64
        assert rows[1]["n_channels"] == 3
        assert abs(rows[1]["mean_intensity"] - ord("h") / 255.0) < 1e-12
        # schema is the declared FEATURE_SCHEMA
        out = decode_features(media, fake=True)
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "byte_len", "width", "height", "n_channels", "mean_intensity",
        ]

    def test_parallel_partitions(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
        out = decode_features(attach_binary(docs), fake=True)
        assert out.count() == docs.count()


class TestFrameSampling:
    def test_frame_counts(self, spark):
        media = attach_binary(_docs(spark, [(1, "short"), (2, "y" * 250)]))
        rows = sample_frames(media, every_n_bytes=100).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r["doc_id"], []).append(r)
        assert len(by_id[1]) == 1  # <100 bytes -> 1 frame
        assert len(by_id[2]) == 2  # 250 bytes -> 2 frames
        assert sorted(r["byte_offset"] for r in by_id[2]) == [0, 100]


class TestRealHeaderDecode:
    """decode_image_dimensions: real PNG/JPEG byte parsing, pure column ops."""

    @staticmethod
    def _png(w, h):
        import struct
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00" + b"\x00" * 4)

    @staticmethod
    def _jpeg(w, h, n_filler_segments=1):
        import struct
        out = b"\xff\xd8"                       # SOI
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        for _ in range(n_filler_segments):      # COM segments before SOF
            out += b"\xff\xfe" + struct.pack(">H", 8) + b"abcdef"
        out += (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
                + struct.pack(">HH", h, w)
                + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
        return out + b"\xff\xd9"

    def _decode(self, spark, payloads):
        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            decode_image_dimensions,
        )

        media = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "doc_id long, content binary",
        )
        return {r["doc_id"]: (r["kind"], r["width"], r["height"])
                for r in decode_image_dimensions(media).collect()}

    def test_png_and_jpeg_roundtrip(self, spark):
        got = self._decode(spark, [self._png(640, 480), self._jpeg(1920, 1080)])
        assert got[0] == ("png", 640, 480)
        assert got[1] == ("jpeg", 1920, 1080)

    def test_jpeg_many_segments_and_progressive(self, spark):
        deep = self._jpeg(33, 44, n_filler_segments=10)
        prog = self._jpeg(55, 66).replace(b"\xff\xc0", b"\xff\xc2")  # SOF2
        got = self._decode(spark, [deep, prog])
        assert got[0] == ("jpeg", 33, 44)
        assert got[1] == ("jpeg", 55, 66)

    def test_non_image_and_truncated(self, spark):
        truncated_jpeg = self._jpeg(10, 10)[:6]  # dies mid-APP0
        got = self._decode(spark, [b"plain text bytes", truncated_jpeg, b""])
        assert got[0] == ("unknown", None, None)
        assert got[1] == ("jpeg", None, None)  # sniffed, but no SOF found
        assert got[2] == ("unknown", None, None)


class TestBmpPixelDecode:
    def _media(self, spark, arrays):
        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            build_bmp,
        )

        rows = [(i, bytearray(build_bmp(a))) for i, a in enumerate(arrays)]
        return spark.createDataFrame(rows, "doc_id long, content binary")

    def test_pixels_roundtrip_exactly(self, spark):
        import hashlib

        import numpy as np

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            decode_bmp_pixels,
        )

        rng = np.random.RandomState(7)
        # widths 3 and 5 force nonzero row padding; 4 exercises pad == 0
        arrays = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                  for (h, w) in [(2, 3), (3, 4), (5, 5), (1, 1)]]
        out = {r.doc_id: r
               for r in decode_bmp_pixels(self._media(spark, arrays)).collect()}
        assert len(out) == len(arrays)
        for i, a in enumerate(arrays):
            r = out[i]
            assert (r.height, r.width) == a.shape[:2]
            assert r.n_pixels == a.shape[0] * a.shape[1]
            assert r.sum_r == int(a[:, :, 0].sum(dtype=np.int64))
            assert r.sum_g == int(a[:, :, 1].sum(dtype=np.int64))
            assert r.sum_b == int(a[:, :, 2].sum(dtype=np.int64))
            assert r.pixel_md5 == hashlib.md5(
                np.ascontiguousarray(a).tobytes()).hexdigest()

    def test_non_bmp_payload_raises(self, spark):
        from py4j.protocol import Py4JJavaError

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            decode_bmp_pixels,
        )

        bad = spark.createDataFrame(
            [(1, bytearray(b"\x89PNG not a bmp"))],
            "doc_id long, content binary",
        )
        try:
            decode_bmp_pixels(bad).collect()
            raise AssertionError("expected decode failure")
        except Py4JJavaError:
            pass
        except Exception as exc:  # PySpark wraps worker errors variously
            assert "not a BMP" in str(exc) or "ValueError" in str(exc)


class TestWavDecode:
    def test_pcm_roundtrip_exactly(self, spark):
        import hashlib

        import numpy as np

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            build_wav,
            decode_wav_features,
        )

        rng = np.random.RandomState(11)
        clips = [
            (rng.randint(-32768, 32768, size=(1600, 1), dtype=np.int16), 16000, 1),
            (rng.randint(-32768, 32768, size=(441, 2), dtype=np.int16), 44100, 2),
            (np.zeros((10, 1), dtype=np.int16), 8000, 1),
        ]
        rows = [(i, bytearray(build_wav(pcm, rate, ch)))
                for i, (pcm, rate, ch) in enumerate(clips)]
        media = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r.doc_id: r for r in decode_wav_features(media).collect()}
        for i, (pcm, rate, ch) in enumerate(clips):
            r = out[i]
            assert (r.sample_rate, r.n_channels) == (rate, ch)
            assert r.n_samples == pcm.shape[0]
            assert r.duration_ms == pcm.shape[0] * 1000 // rate
            a = pcm.astype(np.int64)
            assert r.peak_abs == int(np.abs(a).max())
            assert r.sum_sq == int((a * a).sum())
            assert r.sample_md5 == hashlib.md5(pcm.tobytes()).hexdigest()

    def test_non_wav_raises(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            decode_wav_features,
        )

        bad = spark.createDataFrame(
            [(1, bytearray(b"ID3 not a wav file at all"))],
            "doc_id long, content binary",
        )
        try:
            decode_wav_features(bad).collect()
            raise AssertionError("expected decode failure")
        except Exception as exc:
            assert "RIFF" in str(exc) or "Error" in type(exc).__name__


class TestAviFrameSampling:
    def test_container_walk_and_sampling(self, spark):
        import hashlib

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            build_avi,
            sample_avi_frames,
        )

        # odd-length frame payloads force word-aligned chunk padding
        frames_a = [bytes([i]) * (10 + i) for i in range(5)]
        frames_b = [b"xyz", b"pq"]
        media = spark.createDataFrame(
            [(1, bytearray(build_avi(frames_a, 33333, 320, 240))),
             (2, bytearray(build_avi(frames_b, 40000, 64, 48)))],
            "doc_id long, content binary",
        )
        rows = sample_avi_frames(media, every_n=2).collect()
        a = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in a] == [0, 2, 4]
        assert all((r.n_frames, r.frame_rate_us, r.width, r.height)
                   == (5, 33333, 320, 240) for r in a)
        for r in a:
            assert r.frame_bytes == len(frames_a[r.frame_idx])
            assert r.frame_md5 == hashlib.md5(frames_a[r.frame_idx]).hexdigest()
        b = [r for r in rows if r.doc_id == 2]
        assert [r.frame_idx for r in b] == [0]

    def test_frame_count_mismatch_raises(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            build_avi,
            sample_avi_frames,
        )

        good = build_avi([b"aa", b"bb"])
        # corrupt: header claims 2 frames; drop the last movi chunk (10 bytes)
        bad = bytearray(good[:-10])
        media = spark.createDataFrame(
            [(1, bad)], "doc_id long, content binary")
        import pytest as _pytest

        # a truncated container must FAIL loudly (either the frame-count
        # cross-check or the chunk walk hitting the cut), never silently
        # yield fewer frames than the header declares
        with _pytest.raises(Exception):
            sample_avi_frames(media).collect()

    def test_truncated_final_frame_raises(self, spark):
        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            build_avi,
            sample_avi_frames,
        )

        good = build_avi([b"aaaa", b"bbbb"])
        bad = bytearray(good[:-2])  # cut INSIDE the last frame payload
        media = spark.createDataFrame([(1, bad)], "doc_id long, content binary")
        import pytest as _pytest

        with _pytest.raises(Exception):
            sample_avi_frames(media).collect()
