"""Hex-decode helpers: the engine's only irreducible Python UDF surface.

SURVEY.md §2.10: after rewriting everything else to built-ins, the custom
surface is (1) uint256-hex -> float64 and (2) EIP-55 checksumming. Both are
Arrow-batched pandas UDFs (never row-at-a-time ``udf``). Everything else in
this module is pure column expressions that stay inside whole-stage codegen.

Numeric semantics deliberately match the reference: token amounts are
``int(hex, 16)`` then degraded to float64 (reference etl_pipeline.py:97,129)
— Python's int->float conversion is correctly rounded, and so is ours, since
we do exactly that inside the UDF.

Scale note (100 TB): ``hex_to_double_cols`` is a JVM-only alternative that
chunks the hex string through ``conv`` in 48-bit limbs and combines in
double arithmetic — no Python boundary at all. It can differ from the exact
path by 1 ulp on >53-bit values (double addition rounds per-limb), which is
why the exact pandas UDF remains the parity default.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from .keccak import to_checksum_address as _checksum


@pandas_udf(DoubleType())
def hex_to_double(s: pd.Series) -> pd.Series:
    """uint256 hex string ('0x…' or bare, '' / '0x' / null -> 0) -> float64.

    Exactly ``float(int(h, 16))`` per the reference decoder
    (etl_pipeline.py:96-97): correctly-rounded nearest double.
    """

    def conv(h: object) -> float:
        if h is None:
            return 0.0
        h = str(h)
        if h in ("", "0x"):
            return 0.0
        try:
            return float(int(h, 16))
        except ValueError:
            return float("nan")

    return s.map(conv).astype("float64")


@pandas_udf(LongType())
def hex_to_long(s: pd.Series) -> pd.Series:
    """hex string -> int64 (token ids; reference etl_pipeline.py:86)."""

    def conv(h: object) -> object:
        if h is None:
            return None
        h = str(h)
        if h in ("", "0x"):
            return 0
        try:
            return int(h, 16)
        except ValueError:
            return None

    return s.map(conv).astype("Int64")


@pandas_udf(StringType())
def eip55_checksum(s: pd.Series) -> pd.Series:
    """EIP-55 checksum address (reference etl_pipeline.py:81-82).

    Uses the NumPy-vectorized single-block keccak when the batch is the
    normal shape (42-char 0x-addresses) — ~1000x the scalar throughput;
    falls back to the scalar implementation for irregular inputs.
    """
    if len(s) and s.dropna().str.len().eq(42).all():
        from .keccak_batch import eip55_checksum_batch

        # dictionary-encode the Arrow batch first: keccak only the UNIQUE
        # addresses, then map back.  Row-local (no shuffle, works inside
        # any executor batch at any scale); pays one pd.unique() pass and
        # wins whenever addresses repeat within a batch — hot
        # contracts/wallets dominate real transfer streams, so per-batch
        # repetition is the norm, not a synthetic-data artifact.
        uniq = pd.Index(s.dropna().unique())
        if len(uniq) < len(s):
            mapped = pd.Series(
                eip55_checksum_batch(uniq.to_series().reset_index(drop=True))
                .to_numpy(), index=uniq)
            return s.map(mapped)
        return eip55_checksum_batch(s)
    return s.map(lambda a: None if a is None else _checksum(a))


def hex_to_double_cols(col: Column) -> Column:
    """JVM-only uint256-hex -> double via 48-bit ``conv`` limbs.

    Splits the (0x-stripped, left-zero-padded-to-64) hex into 6 limbs of 12
    hex chars (48 bits each — safely inside ``conv``'s unsigned-64 range),
    then combines ``limb_i * 16^(12*i)`` in double arithmetic. 1-ulp
    tolerance vs the exact UDF for values needing >53 bits.
    """
    h = F.lpad(F.regexp_replace(F.coalesce(col, F.lit("0")), "^0x", ""), 72, "0")
    out = F.lit(0.0)
    for i in range(6):
        limb = F.substring(h, 1 + 12 * i, 12)
        scale = float(16 ** (12 * (5 - i)))
        out = out + F.conv(limb, 16, 10).cast("double") * F.lit(scale)
    return out


def topic_address(topic: Column) -> Column:
    """'0x' + last 40 hex chars of a 32-byte topic (etl_pipeline.py:81)."""
    return F.concat(F.lit("0x"), F.substring(topic, -40, 40))


def fn_selector(input_col: Column) -> Column:
    """First 10 chars ('0x' + 8 hex) of calldata (etl_pipeline.py:221)."""
    return F.substring(input_col, 1, 10)
