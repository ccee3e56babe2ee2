"""Bit-exactness pins for the kernel-closure kNN scoring pass
(operators/similarity.cross_cosine_scores) against the crossJoin +
vectorized-DOT-fold + interpreted-norm shape it replaced in r12.

The kNN gates' votes, ranks, and accuracies all derive from these
cosines, so the kernel must reproduce them to the BIT — asserted here
on the real testdata corpus and on an adversarial frame with exact
float ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defi_etl_platform_sqlglot_implementation__spark.operators.similarity import (
    cross_cosine_scores,
    dot,
    with_norm,
)

SF = "/root/testdata/sf0.001"


def _old_shape(tr, q):
    qn = with_norm(q, "eq", "nq")
    tn = with_norm(tr, "etr", "ntr")
    return tn.crossJoin(F.broadcast(qn)).select(
        "qid", "qlabel", "nid", "nlabel",
        (dot("eq", "etr", vectorized=True)
         / (F.col("nq") * F.col("ntr"))).alias("cosine"),
    )


def _split(e):
    q = e.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel"),
        F.col("embedding").alias("eq"))
    tr = e.filter(F.col("vec_id") % 10 != 0).select(
        F.col("vec_id").alias("nid"), F.col("label").alias("nlabel"),
        F.col("embedding").alias("etr"))
    return tr, q


def test_bit_identical_on_corpus(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    tr, q = _split(e)
    old = _old_shape(tr, q).orderBy("qid", "nid").collect()
    new = cross_cosine_scores(tr, q).orderBy("qid", "nid").collect()
    assert len(old) == len(new) > 0
    assert old == new  # Row equality is exact on the double cosine


def test_bit_identical_adversarial(spark):
    # exact ties, negative components, zeros, repeated vectors
    rows = [
        (0, "a", [1.0, 0.0, 0.0, 0.0]),
        (10, "b", [0.0, 1.0, 0.0, 0.0]),
        (1, "a", [1.0, 0.0, 0.0, 0.0]),
        (2, "b", [-1.0, 0.0, 0.0, 0.0]),
        (3, "a", [0.5, -0.5, 0.5, -0.5]),
        (4, "b", [1e-30, 1e30, -1e30, 1.0]),
    ]
    e = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    tr, q = _split(e)
    old = _old_shape(tr, q).orderBy("qid", "nid").collect()
    new = cross_cosine_scores(tr, q).orderBy("qid", "nid").collect()
    assert old == new


def test_empty_queries(spark):
    e = spark.createDataFrame(
        [(1, "a", [1.0, 2.0])],
        "vec_id long, label string, embedding array<float>")
    tr, q = _split(e)  # no vec_id % 10 == 0 rows
    assert cross_cosine_scores(tr, q).collect() == []
