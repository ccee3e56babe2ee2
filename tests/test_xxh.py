"""Bit-exactness pins for the NumPy xxHash64 twin (functions/xxh.py) and
the vectorized minhash signature kernel that rides it.

The LSH candidate sets of every minhash gate depend on these exact hash
values, so the vectorized kernel must agree with Spark's ``xxhash64`` /
the Catalyst expression fold to the BIT — these tests enforce that on:

- every byte length crossing an algorithm boundary (0..130 covers the
  <32 path, the 32-byte stripe loop, the 8-byte word tail, the 4-byte
  word, and the single-byte tail, plus two full stripes);
- multi-byte UTF-8 (2/3/4-byte code points, so byte length != char length);
- the real testdata corpus end-to-end through ``minhash_signatures``,
  including null text and adversarial token shapes.
"""

from __future__ import annotations

import random
import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.functions.xxh import (
    xxh64_int32,
    xxh64_utf8,
)
from defi_etl_platform_sqlglot_implementation__spark.operators.dedup import (
    minhash_signatures,
    token_shingles,
)


def _np_hash_strings(strs: list[str]) -> list[int]:
    bs = [s.encode("utf-8") for s in strs]
    data = np.frombuffer(b"".join(bs), np.uint8)
    offs = np.cumsum([0] + [len(x) for x in bs])
    return [int(v) for v in xxh64_utf8(data, offs).view(np.int64)]


def test_known_vectors():
    """Reference xxHash64 vectors (seed 0) from the public test suite."""
    bs = [b"", b"a", b"abc", b"Nobody inspects the spammish repetition"]
    data = np.frombuffer(b"".join(bs), np.uint8)
    offs = np.cumsum([0] + [len(x) for x in bs])
    got = [int(v) for v in xxh64_utf8(data, offs, seed=0)]
    assert got == [
        0xEF46DB3751D8E999,
        0xD24EC4F1A98C6E5B,
        0x44BC2CF5AD770999,
        0xFBCEA83C8A378BF1,
    ]


def test_every_length_boundary_matches_spark(spark):
    """One random ASCII string per byte length 0..130 must hash exactly
    as Spark's xxhash64(col) and xxhash64(col, 1)."""
    rng = random.Random(42)
    strs = ["".join(rng.choices(string.printable, k=n)) for n in range(131)]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = (df.select(F.xxhash64("s").alias("a"),
                      F.xxhash64("s", F.lit(1)).alias("b"))
            .collect())
    a_np = _np_hash_strings(strs)
    assert [r["a"] for r in rows] == a_np
    b_np = [int(v) for v in
            xxh64_int32(1, np.array(a_np, np.int64).view(np.uint64))
            .view(np.int64)]
    assert [r["b"] for r in rows] == b_np


def test_multibyte_utf8_matches_spark(spark):
    strs = ["héllo", "wörld", "❤", "日本語テスト", "a❤b", "ü" * 40,
            "🎉 mixed ascii and emoji 🎉", "é́ combining"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    rows = df.select(F.xxhash64("s").alias("a")).collect()
    assert [r["a"] for r in rows] == _np_hash_strings(strs)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001"])
def test_minhash_signatures_vectorized_exact_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = docs.select("doc_id", token_shingles("text", 3).alias("sharr"))
    expr = minhash_signatures(arr, 32, vectorized=False).orderBy("doc_id")
    vec = minhash_signatures(arr, 32, vectorized=True).orderBy("doc_id")
    a, b = expr.collect(), vec.collect()
    assert len(a) == len(b) > 0
    assert a == b


def test_minhash_signatures_vectorized_exact_adversarial(spark):
    rows = [(1, ""), (2, None), (3, "a"), (4, "héllo wörld ünïcode ❤ tok x"),
            (5, "x " * 200), (6, "tok1 tok2"), (7, " "),
            (8, "日本語 テスト 文字 列 その他"), (9, "one two three four five")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    arr = docs.select("doc_id", token_shingles("text", 3).alias("sharr"))
    a = minhash_signatures(arr, 32, vectorized=False).orderBy("doc_id").collect()
    b = minhash_signatures(arr, 32, vectorized=True).orderBy("doc_id").collect()
    assert a == b
    # null text -> null signature row (transform(null) -> null)
    null_row = [r for r in b if r["doc_id"] == 2][0]
    assert all(null_row[f"h{i}"] is None for i in range(32))


def test_minhash_signatures_vectorized_empty_frame(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    arr = docs.select("doc_id", token_shingles("text", 3).alias("sharr"))
    assert minhash_signatures(arr, 32, vectorized=True).collect() == []
