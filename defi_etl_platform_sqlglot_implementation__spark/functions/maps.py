"""Selector -> function-name lookup (reference etl_pipeline.py:41-47).

Two idiomatic Spark forms of the same 5-entry dict:

- ``token_standards_col``: a ``create_map`` literal — Catalyst constant-folds
  the lookup into the projection; zero shuffle, stays in codegen. This is the
  right shape for a literal this small at any scale.
- ``token_standards_df``: the same mapping as a tiny DataFrame for an explicit
  ``broadcast`` hash join, the pattern that generalizes when the lookup grows
  beyond a literal (SURVEY.md §2.3 J3).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_STANDARDS = {
    "0xa9059cbb": "ERC20.transfer",
    "0x23b872dd": "ERC20.transferFrom",
    "0x095ea7b3": "ERC20.approve",
    "0x42842e0e": "ERC721.safeTransferFrom",
    "0xf242432a": "ERC1155.safeTransferFrom",
}

def _map_literal() -> Column:
    # built lazily — Column construction needs an active SparkContext
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(TOKEN_STANDARDS.items())])


def token_standards_col(selector: Column) -> Column:
    """Map lookup with the reference's ``.fillna("unknown")`` semantics."""
    return F.coalesce(_map_literal()[selector], F.lit("unknown"))


def token_standards_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(k, v) for k, v in TOKEN_STANDARDS.items()], ["fn_selector", "fn_name"]
    )
