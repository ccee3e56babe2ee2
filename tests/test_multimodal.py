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
