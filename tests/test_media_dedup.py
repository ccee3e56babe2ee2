"""Perceptual media dedup (operators/media_dedup.py): decode-path
integrity, pigeonhole completeness of the banded candidate join, and
plan shape. Value parity vs the arithmetic DuckDB oracles is proven by
scripts/check_oracle.py (registry_media.py gates)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from defi_etl_platform_sqlglot_implementation__spark.operators.media_dedup import (
    _media_base,
    ahash_near_pairs,
    audio_fingerprint_pairs,
    audio_fingerprint_signatures,
    image_ahash_signatures,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, n=60):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


class TestImageAhash:
    def test_same_class_members_are_near(self, spark):
        # doc 0 and doc 250 share base (both %10==0, (//10)%25 equal);
        # they differ only in their noise pixels -> small Hamming
        df = spark.createDataFrame([(0,), (250,)], "doc_id long")
        sigs = image_ahash_signatures(df).toPandas().set_index("doc_id")
        ham = sum(
            bin(int(sigs.loc[0, f"band{j}"]) ^ int(sigs.loc[250, f"band{j}"])).count("1")
            for j in range(4)
        )
        assert ham <= 3

    def test_unrelated_docs_are_far(self, spark):
        # consecutive unique-base docs decorrelate: expect Hamming >> 3
        df = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
        sigs = image_ahash_signatures(df).toPandas().set_index("doc_id")
        for a, b in [(1, 2), (2, 3), (1, 3)]:
            ham = sum(
                bin(int(sigs.loc[a, f"band{j}"]) ^ int(sigs.loc[b, f"band{j}"])).count("1")
                for j in range(4)
            )
            assert ham > 3, f"docs {a},{b} collide at hamming {ham}"

    def test_banded_join_is_pigeonhole_complete(self, spark):
        # brute-force all-pairs Hamming over the signature frame must
        # equal the banded candidate path exactly
        sigs = image_ahash_signatures(_docs(spark, 80))
        pdf = sigs.toPandas().set_index("doc_id")
        brute = set()
        ids = sorted(pdf.index)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                ham = sum(
                    bin(int(pdf.loc[a, f"band{j}"]) ^ int(pdf.loc[b, f"band{j}"])).count("1")
                    for j in range(4)
                )
                if ham <= 3:
                    brute.add((a, b, ham))
        banded = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in ahash_near_pairs(sigs, 3).collect()
        }
        assert banded == brute

    def test_bands_cover_64_bits(self, spark):
        pdf = image_ahash_signatures(_docs(spark, 20)).toPandas()
        for j in range(4):
            assert (pdf[f"band{j}"] < (1 << 16)).all()
            assert (pdf[f"band{j}"] >= 0).all()


class TestAudioFingerprint:
    def test_pristine_class_members_are_exact(self, spark):
        # docs 0 and 500 share a base and both are pristine (%20 < 10)
        # -> identical samples -> same signature and fingerprint
        df = spark.createDataFrame([(0,), (500,)], "doc_id long")
        pdf = audio_fingerprint_signatures(df).toPandas().set_index("doc_id")
        assert pdf.loc[0, "sample_sig"] == pdf.loc[500, "sample_sig"]
        assert pdf.loc[0, "fingerprint"] == pdf.loc[500, "fingerprint"]

    def test_noised_member_differs_in_content(self, spark):
        # docs 250 and 0 share a base but 250 is noised (%20 == 10)
        df = spark.createDataFrame([(0,), (250,)], "doc_id long")
        pdf = audio_fingerprint_signatures(df).toPandas().set_index("doc_id")
        assert pdf.loc[0, "sample_sig"] != pdf.loc[250, "sample_sig"]

    def test_pairs_flag_exactness(self, spark):
        df = spark.createDataFrame([(0,), (250,), (500,)], "doc_id long")
        sigs = audio_fingerprint_signatures(df)
        pairs = audio_fingerprint_pairs(sigs).toPandas()
        exact = pairs[pairs.same_audio]
        assert {(r.doc_a, r.doc_b) for _, r in exact.iterrows()} >= {(0, 500)}

    def test_fingerprint_is_16_bits(self, spark):
        pdf = audio_fingerprint_signatures(_docs(spark, 30)).toPandas()
        assert (pdf.fingerprint < (1 << 16)).all()
        assert (pdf.fingerprint >= 0).all()


class TestPlanShape:
    def test_pair_join_is_banded_no_cartesian(self, spark):
        sigs = image_ahash_signatures(_docs(spark, 40))
        plan = (
            ahash_near_pairs(sigs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan

    def test_base_assignment(self):
        assert _media_base(0) == 0
        assert _media_base(250) == 0      # same class as 0
        assert _media_base(10) == 1
        assert _media_base(7) == 10007    # unique base


class TestDecodeCoreEdges:
    def test_top_down_bmp_negative_height(self):
        """BMPs with negative height store rows top-down; the decode core
        must NOT flip them. Hand-craft the header around build_bmp's
        bottom-up output and compare."""
        import struct

        import numpy as np

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            bmp_rgb_array, build_bmp)

        px = (np.arange(2 * 3 * 3, dtype=np.uint8)).reshape(2, 3, 3)
        normal = bmp_rgb_array(0, build_bmp(px))
        assert (normal == px).all()
        # top-down variant: same pixel rows in file order, height negative
        data_offset = 54
        row = np.ascontiguousarray(px[:, :, ::-1])  # RGB->BGR, top-down order
        stride = (3 * 3 + 3) // 4 * 4
        body = b"".join(row[y].tobytes() + b"\x00" * (stride - 9)
                        for y in range(2))
        header = struct.pack("<2sIHHI", b"BM", data_offset + len(body), 0, 0,
                             data_offset)
        info = struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 24, 0, len(body),
                           2835, 2835, 0, 0)
        td = bmp_rgb_array(1, header + info + body)
        assert (td == px).all()

    def test_truncated_and_foreign_payloads_raise(self):
        import numpy as np
        import pytest as _pytest

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            bmp_rgb_array, build_bmp, build_wav, wav_pcm_array)

        with _pytest.raises(ValueError, match="not a BMP"):
            bmp_rgb_array(0, b"RIFFxxxxWAVE")
        with _pytest.raises(ValueError, match="not a RIFF"):
            wav_pcm_array(0, build_bmp(np.zeros((1, 1, 3), dtype=np.uint8)))
        # WAV with a fmt chunk claiming a non-PCM codec
        import struct
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 85, 1, 16000, 32000, 2, 16)
        data = struct.pack("<4sI", b"data", 4) + b"\x00" * 4
        riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
        with _pytest.raises(ValueError, match="unsupported WAV"):
            wav_pcm_array(0, riff + fmt + data)

    def test_wav_skips_unknown_chunks(self):
        """RIFF chunk walk must skip LIST/INFO chunks before data."""
        import struct

        import numpy as np

        from defi_etl_platform_sqlglot_implementation__spark.operators.multimodal import (
            wav_pcm_array)

        samples = np.array([1, -2, 3, -4], dtype=np.int16)
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 16000, 32000, 2, 16)
        junk = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd size padded
        data = struct.pack("<4sI", b"data", 8) + samples.tobytes()
        body = fmt + junk + data
        riff = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE")
        rate, ch, pcm = wav_pcm_array(0, riff + body)
        assert rate == 16000 and ch == 1
        assert (pcm == samples).all()
