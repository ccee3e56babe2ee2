"""Driver-contract query registry: SURVEY.md §2 operator inventory phrased
over the driver's tables (TESTDATA.md), each with a DuckDB oracle twin.

Float-parity policy
-------------------
The driver hash-compares Spark vs DuckDB values. Three classes:

1. **Exact** (ints, strings, formatted timestamps, per-row double arithmetic
   with identical operation order, sums of integral doubles): emitted raw —
   IEEE ops on identical inputs are bit-identical across engines.
2. **Near-exact** (multi-row double aggregates — sum/avg/stddev/percentile —
   where partial-aggregation order differs): emitted as ``%.6e`` strings via
   printf-style formatting on BOTH engines. printf rounds the true binary
   value (unlike Spark's ``round``, which rounds the shortest decimal repr),
   so a 1-ulp cross-engine difference flips the 7th significant digit with
   probability ~1e-9 instead of breaking the hash.
3. **Not comparable** (genuinely engine-specific): no oracle (rows-only).

Every query aliases computed columns identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType, TimestampNTZType

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        # query_scope bounds materialization lifetime to one driver-
        # contract call: entering a new top-level query releases the
        # PREVIOUS query's scoped_persist frames, so a 50-query sweep in
        # one SparkSession holds at most one gate's intermediates (the
        # r5 sweep OOM'd the host precisely because it didn't — see
        # operators/materialize.py).  Both the registry dict entry and
        # the module-level name get the wrapped fn, so direct cross-
        # gate composition stays inside the outer scope via _DEPTH.
        # Single-threaded by contract (as is the driver harness):
        # the scope state is module-global, not thread-local.
        from .operators.materialize import query_scope

        wrapped = query_scope(fn)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped
    return deco


def ensure_session(spark: SparkSession) -> SparkSession:
    """The ONE sanctioned session-conf touch point for driver-contract
    queries: pin the session timezone to UTC so timestamp arithmetic and
    formatting match the DuckDB oracles byte-for-byte. Every query builder
    goes through here (directly or via ``t``); no other code in the
    package calls ``spark.conf.set`` except the data-dependent legacy
    nanos fallback inside ``t`` below, which cannot live here because it
    only applies after a failed read."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        if name != "events":
            raise
        # A TIMESTAMP(NANOS) events file (the round-1 era format) is
        # rejected by Spark's reader unless nanos are surfaced as raw
        # longs. The conf is deliberately LEFT SET in this branch: it is
        # consumed again at scan execution (a set-and-restore would break
        # the lazy plan), and it only changes how nanos columns — which
        # are otherwise unreadable — are decoded. With micros testdata
        # this path never runs, so no session mutation occurs.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # nanos-as-long (via the retry above): floor to micros — the
            # same truncation DuckDB applies reading a nanos file.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Current testdata stores ts as parquet TIMESTAMP(MICROS) without
            # isAdjustedToUTC, which Spark reads as TIMESTAMP_NTZ. Downstream
            # operators (unix_micros range frames, now()-interval predicates,
            # watermarks) were written against TIMESTAMP; with the session
            # timezone pinned UTC above, casting reproduces the exact same
            # instants DuckDB computes on the naive file values.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


@pandas_udf(StringType())
def _fmt6(s: pd.Series) -> pd.Series:
    # Python's float formatting is correctly rounded with round-half-even
    # ties — identical to DuckDB's printf. Java's format_string is HALF_UP,
    # which diverges on the exact ties that 2-decimal money data hits
    # constantly; hence a (post-aggregation, tiny-cardinality) pandas UDF.
    return s.map(lambda v: None if pd.isna(v) else f"{v:.6e}")


def fmt(c: Column | str) -> Column:
    """%.6e emission for near-exact doubles (policy class 2)."""
    col = c if isinstance(c, Column) else F.col(c)
    return _fmt6(col.cast("double"))


def cents(c: Column | str) -> Column:
    """Exact long-cents conversion for 2-decimal money stored as double.

    The true value is an integer number of cents, so ``round(x*100)`` is
    exact while ``x*100`` sits below 2**53 — i.e. |x| < ~9e13 dollars per
    row (beyond that the double spacing at x*100 exceeds 1 and the stored
    value can already be off by whole cents BEFORE round() runs; raw-unit
    token amounts must be decimalized first, never fed here).  The result
    is a 64-bit long — Σcents is an order-free exact integer sum that
    stays inside whole-stage codegen, unlike a DECIMAL(12,2) accumulator
    which pays 128-bit arithmetic per row.  Σ per group must stay below
    9.2e18 cents (cast the SUM to decimal(38,0) on the way out if a group
    could exceed that).  DuckDB twin:
    ``CAST(round(x*100) AS BIGINT)`` (DuckDB sums BIGINT into HUGEINT, so
    the oracle side never overflows).
    """
    col = c if isinstance(c, Column) else F.col(c)
    return F.round(col * 100).cast("long")


# =========================================================================
# A2/Q5 — hourly transfer-volume aggregate (flagship; etl_pipeline.py:267-282)
# =========================================================================

@register(
    "transfer_volume_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
           event_type,
           COUNT(*) AS transfer_count,
           printf('%.6e', SUM(value)) AS volume,
           COUNT(DISTINCT user_id) AS unique_users
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY 1, 2
    """,
)
def transfer_volume_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("transfer_count"),
            fmt(F.sum("value")).alias("volume"),
            F.countDistinct("user_id").alias("unique_users"),
        )
    )


# =========================================================================
# A3/Q6 — grouped price-impact stats + HAVING (etl_pipeline.py:284-297)
# =========================================================================

@register(
    "swap_price_impact",
    """
    WITH c AS (
        SELECT l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round((l_extendedprice + l_tax) * 100) AS BIGINT) AS vc
        FROM lineitem
    )
    SELECT l_partkey AS pool,
           printf('%.6e', CAST(SUM(pc) AS DOUBLE) / 100.0 / COUNT(*))
               AS avg_price,
           printf('%.6e', sqrt(
               (CAST(SUM(pc * pc) AS DOUBLE) / 10000.0
                - (CAST(SUM(pc) AS DOUBLE) / 100.0)
                  * (CAST(SUM(pc) AS DOUBLE) / 100.0) / COUNT(*))
               / (COUNT(*) - 1))) AS price_volatility,
           printf('%.6e', CAST(SUM(vc) AS DOUBLE) / 100.0) AS total_volume,
           COUNT(*) AS swap_count
    FROM c
    GROUP BY 1
    HAVING COUNT(*) > 5
    """,
)
def swap_price_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — price-impact aggregate. Money columns are 2-decimal, so every
    multi-row aggregate rides an order-free exact LONG-CENTS sum: avg =
    cent-sum / 100 / count, and the sample stddev comes from exact Σc and
    Σc² folded through ONE double expression — an sf1 stress sweep caught
    the plain double AVG flipping the 7th %.6e digit (partial-agg
    reassociation); integer cent sums make the result bit-identical at
    any scale factor and any partitioning, at long-add cost instead of
    the 128-bit DECIMAL accumulation this rode in round 3 (which was the
    one r3 bench regression, 0.75→1.27 s).  Σc² rides a long multiply
    (exact below ~$3×10^8 per row) summed into decimal(38,0) so hot keys
    can never overflow the accumulator."""
    li = t(spark, sf_dir, "lineitem")
    pc = cents("l_extendedprice")
    vc = cents(F.col("l_extendedprice") + F.col("l_tax"))
    out = (
        li.groupBy(F.col("l_partkey").alias("pool"))
        .agg(
            F.sum(pc).alias("_s1"),
            F.sum((pc * pc).cast("decimal(38,0)")).alias("_s2"),
            F.sum(vc).alias("_sv"),
            F.count("*").alias("swap_count"),
        )
        .filter(F.col("swap_count") > 5)
    )
    n = F.col("swap_count")
    s1 = F.col("_s1").cast("double") / 100.0
    return out.select(
        "pool",
        fmt(s1 / n).alias("avg_price"),
        fmt(F.sqrt((F.col("_s2").cast("double") / 10000.0 - s1 * s1 / n)
                   / (n - 1))).alias("price_volatility"),
        fmt(F.col("_sv").cast("double") / 100.0).alias("total_volume"),
        "swap_count",
    )


# =========================================================================
# A1 — per-block multi-aggregate (etl_pipeline.py:238-252)
# =========================================================================

@register(
    "block_agg_daily",
    """
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           COUNT(*) AS tx_count,
           printf('%.6e', CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                               AS DOUBLE) / 100.0) AS total_volume,
           printf('%.6e', CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                               AS DOUBLE) / 100.0 / COUNT(*)) AS avg_price,
           printf('%.6e', MAX(o_totalprice)) AS max_price,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS filled_count,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_count
    FROM orders
    GROUP BY 1
    """,
)
def block_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — per-day multi-agg. o_totalprice is 2-decimal money, so SUM and
    AVG ride order-free exact long-cents sums (see swap_price_impact) —
    exact at any SF; MAX needs no protection (no accumulation)."""
    o = t(spark, sf_dir, "orders")
    c = cents("o_totalprice")
    return o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date")
    ).agg(
        F.count("*").alias("tx_count"),
        fmt(F.sum(c).cast("double") / 100.0).alias("total_volume"),
        fmt(F.sum(c).cast("double") / 100.0 / F.count("*")).alias("avg_price"),
        fmt(F.max("o_totalprice")).alias("max_price"),
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("filled_count"),
        F.sum(F.col("o_orderpriority").startswith("1").cast("long")).alias("urgent_count"),
    )


# =========================================================================
# A5/O4 — top-K by group sum (data_service.py:295-301); deterministic
# tie-break on the key, summed measure is integral => exact
# =========================================================================

@register(
    "topk_parts_by_quantity",
    """
    SELECT l_partkey, SUM(l_quantity) AS total_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_partkey
    ORDER BY total_qty DESC, l_partkey
    LIMIT 10
    """,
)
def topk_parts_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("total_qty"), F.count("*").alias("n"))
        .orderBy(F.desc("total_qty"), F.asc("l_partkey"))
        .limit(10)
    )


# =========================================================================
# J1 — hour-spine LEFT join with zero-fill (data_service.py:286-293)
# =========================================================================

@register(
    "hour_spine_join",
    """
    WITH spine AS (
        SELECT gs AS hour
        FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                             TIMESTAMP '2024-01-07 23:00:00',
                             INTERVAL '1 hour') AS t(gs)
    ),
    agg AS (
        SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               SUM(value) AS vol
        FROM events
        WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY 1
    )
    SELECT strftime(spine.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(agg.n, 0) AS purchase_count,
           printf('%.6e', COALESCE(agg.vol, 0e0)) AS volume
    FROM spine LEFT JOIN agg ON spine.hour = agg.hour
    """,
)
def hour_spine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    spine = spark.sql(
        "SELECT explode(sequence(timestamp'2024-01-01 00:00:00', "
        "timestamp'2024-01-07 23:00:00', interval 1 hour)) AS hour"
    )
    agg = (
        ev.filter((F.col("event_type") == "purchase")
                  & (F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")))
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("vol"))
    )
    return spine.join(agg, "hour", "left").select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).alias("purchase_count"),
        fmt(F.coalesce(F.col("vol"), F.lit(0.0))).alias("volume"),
    )


# =========================================================================
# J3 — broadcast lookup enrichment (etl_pipeline.py:222 as a real join)
# =========================================================================

@register(
    "region_enrichment",
    """
    SELECT r.r_name AS region, COUNT(*) AS customer_count,
           printf('%.6e', CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT))
                               AS DOUBLE) / 100.0) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def region_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("customer_count"),
            fmt(F.sum(cents("c_acctbal")).cast("double") / 100.0).alias("total_acctbal"),
        )
    )


# =========================================================================
# J2 — full-outer pairing of two per-key aggregates (risk_models.py:225-234)
# =========================================================================

@register(
    "order_lineitem_pairing",
    """
    WITH o AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d, COUNT(*) AS order_count
               FROM orders GROUP BY 1),
         l AS (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d, COUNT(*) AS ship_count
               FROM lineitem GROUP BY 1)
    SELECT COALESCE(o.d, l.d) AS d,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(l.ship_count, 0) AS ship_count
    FROM o FULL OUTER JOIN l ON o.d = l.d
    """,
)
def order_lineitem_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("order_count"))
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("ship_count"))
    )
    return o.join(li, "d", "full_outer").select(
        "d",
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.coalesce("ship_count", F.lit(0)).alias("ship_count"),
    )


# =========================================================================
# P1/P5/P6/F6/F16 — filters + per-row projections (exact: same scalar ops)
# =========================================================================

@register(
    "event_projection",
    """
    SELECT event_id,
           upper(event_type) AS event_type_uc,
           substr(props, 1, 6) AS props_prefix,
           value / 1e3 AS value_k,
           value > 1e2 AS is_large,
           nullif(event_type, 'error') IS NULL AS is_error,
           CASE WHEN value > 66 THEN 'red' WHEN value > 33 THEN 'amber'
                ELSE 'green' END AS score_color,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    WHERE event_type IN ('signup', 'error')
    """,
)
def event_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("signup", "error")).select(
        "event_id",
        F.upper("event_type").alias("event_type_uc"),
        F.substring("props", 1, 6).alias("props_prefix"),
        (F.col("value") / 1e3).alias("value_k"),
        (F.col("value") > 1e2).alias("is_large"),
        F.nullif(F.col("event_type"), F.lit("error")).isNull().alias("is_error"),
        F.when(F.col("value") > 66, "red")
        .when(F.col("value") > 33, "amber")
        .otherwise("green")
        .alias("score_color"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


# =========================================================================
# P14/O3/Q2 — BETWEEN range + order (etl_pipeline.py:329-351)
# =========================================================================

@register(
    "block_range_scan",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
           o_orderpriority
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 5000
    """,
)
def block_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey").between(1000, 5000)).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
        "o_orderpriority",
    )


# =========================================================================
# W1 — trailing-100-row exact p90 (etl_pipeline.py:226-233)
# =========================================================================

@register(
    "rolling_p90",
    """
    SELECT o_orderkey,
           printf('%.6e', quantile_cont(o_totalprice, 0.9) OVER (
               ORDER BY o_orderkey ROWS BETWEEN 99 PRECEDING AND CURRENT ROW
           )) AS p90
    FROM orders
    """,
)
def rolling_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.scale import rolling_quantile_exact

    o = t(spark, sf_dir, "orders")
    out = rolling_quantile_exact(
        o.select("o_orderkey", "o_totalprice"), ["o_orderkey"],
        "o_totalprice", 0.9, 100, out="p90_raw",
    )
    return out.select("o_orderkey", fmt("p90_raw").alias("p90"))


# =========================================================================
# W2 — rolling VaR with min_periods (risk_models.py:110-122)
# =========================================================================

@register(
    "rolling_var_minperiods",
    """
    SELECT event_id,
           CASE WHEN COUNT(value) OVER w >= 15
                THEN printf('%.6e', -1e6 * quantile_cont(value, 0.05) OVER w)
           END AS rolling_var
    FROM events
    WINDOW w AS (ORDER BY event_id ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_var_minperiods(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(-29, 0)
    q = F.expr("percentile(value, 0.05)").over(w)
    cnt = F.count("value").over(w)
    return ev.select(
        "event_id",
        F.when(cnt >= 15, fmt(F.lit(-1e6) * q)).alias("rolling_var"),
    )


@register(
    "rolling_var_minperiods_partitioned",
    """
    SELECT event_id,
           CASE WHEN COUNT(value) OVER w >= 15
                THEN printf('%.6e', -1e6 * quantile_cont(value, 0.05) OVER w)
           END AS rolling_var
    FROM events
    WINDOW w AS (PARTITION BY user_id % 16 ORDER BY event_id
                 ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_var_minperiods_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2's scale variant (same pattern as W1's rolling_p90_partitioned):
    per-series windows sort inside hash partitions in parallel instead of
    one global single-task sort; windows reset at series boundaries."""
    from .operators.risk import rolling_var

    ev = t(spark, sf_dir, "events").withColumn("_series", F.col("user_id") % 16)
    out = rolling_var(
        ev.select("_series", "event_id", F.col("value").alias("r")),
        order_cols=["event_id"], value_col="r", window=30,
        confidence=0.95, position_size=1e6, partition_col="_series",
    )
    return out.select("event_id", fmt("rolling_var").alias("rolling_var"))


# =========================================================================
# W3 — rolling VaR/CVaR, window excludes current row (data_service.py:141-150)
# =========================================================================

@register(
    "rolling_var_cvar",
    """
    WITH r AS (
        SELECT event_id, value,
               ROW_NUMBER() OVER (ORDER BY event_id) AS rn
        FROM events WHERE user_id % 20 = 7
    ),
    anchors AS (
        SELECT event_id, rn,
               quantile_cont(value, 0.05) OVER w AS q,
               COUNT(value) OVER w AS cnt
        FROM r
        WINDOW w AS (ORDER BY rn ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT a.event_id,
           printf('%.6e', -a.q) AS var,
           printf('%.6e', -AVG(r.value)) AS cvar
    FROM anchors a
    JOIN r ON r.rn BETWEEN a.rn - 30 AND a.rn - 1
    WHERE a.cnt = 30 AND r.value <= a.q
    GROUP BY a.event_id, a.q
    """,
)
def rolling_var_cvar_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.risk import rolling_var_cvar

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 7)
    out = rolling_var_cvar(
        ev.select("event_id", F.col("value").alias("r")),
        idx_col="event_id", value_col="r", window=30,
        confidence=0.95, position_size=1.0,
    )
    return out.select("event_id", fmt("var").alias("var"), fmt("cvar").alias("cvar"))


@register(
    "rolling_var_cvar_partitioned",
    """
    WITH r AS (
        SELECT event_id, user_id % 8 AS series, value,
               ROW_NUMBER() OVER (PARTITION BY user_id % 8 ORDER BY event_id) AS rn
        FROM events WHERE user_id % 20 = 7
    ),
    anchors AS (
        SELECT event_id, series, rn,
               quantile_cont(value, 0.05) OVER w AS q,
               COUNT(value) OVER w AS cnt
        FROM r
        WINDOW w AS (PARTITION BY series ORDER BY rn
                     ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)
    )
    SELECT a.series, a.event_id,
           printf('%.6e', -a.q) AS var,
           printf('%.6e', -AVG(r.value)) AS cvar
    FROM anchors a
    JOIN r ON r.series = a.series AND r.rn BETWEEN a.rn - 30 AND a.rn - 1
    WHERE a.cnt = 30 AND r.value <= a.q
    GROUP BY a.series, a.event_id, a.q
    """,
)
def rolling_var_cvar_partitioned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 at the 100 TB shape: per-series windows sort in parallel and the
    range self-join gains a series equality key (shuffled hash join, range
    residual) — no single-task global sort, no broadcast-nested-loop join.
    Windows reset at series boundaries (the documented semantic trade,
    SCALE.md §Windows); the oracle encodes the same partitioned semantics."""
    from .operators.risk import rolling_var_cvar

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 7)
        .withColumn("series", F.col("user_id") % 8)
    )
    out = rolling_var_cvar(
        ev.select("series", "event_id", F.col("value").alias("r")),
        idx_col="event_id", value_col="r", window=30,
        confidence=0.95, position_size=1.0, partition_col="series",
    )
    return out.select(
        "series", "event_id", fmt("var").alias("var"), fmt("cvar").alias("cvar")
    )


# =========================================================================
# A9 — scalar VaR/CVaR (risk_models.py:76-108)
# =========================================================================

@register(
    "var_cvar_scalar",
    """
    WITH q AS (SELECT quantile_cont(value, 0.05) AS q, COUNT(value) AS returns_used
               FROM events)
    SELECT 0.95 AS confidence,
           printf('%.6e', -q.q * 1e6) AS var,
           printf('%.6e', -(SELECT AVG(value) FROM events WHERE value <= q.q) * 1e6) AS cvar,
           q.returns_used,
           'historical_simulation' AS method
    FROM q
    """,
)
def var_cvar_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.risk import var_cvar

    ev = t(spark, sf_dir, "events").select(F.col("value").alias("r"))
    out = var_cvar(ev, value_col="r", confidence=0.95, position_size=1e6)
    return out.select(
        "confidence", fmt("var").alias("var"), fmt("cvar").alias("cvar"),
        "returns_used", "method",
    )


# =========================================================================
# F19 — stress-test table (risk_models.py:124-143); exact doubles
# =========================================================================

@register(
    "stress_test_table",
    """
    SELECT shock * 1e2 AS shock_pct,
           shock * 1e6 AS pnl_usd,
           1e6 + shock * 1e6 AS position_remaining
    FROM (SELECT unnest([CAST(-0.10 AS DOUBLE), CAST(-0.20 AS DOUBLE),
                         CAST(-0.30 AS DOUBLE), CAST(-0.50 AS DOUBLE),
                         CAST(-0.80 AS DOUBLE)]) AS shock)
    """,
)
def stress_test_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    shocks = spark.createDataFrame(
        [(-0.10,), (-0.20,), (-0.30,), (-0.50,), (-0.80,)], "shock: double"
    )
    return shocks.select(
        (F.col("shock") * 1e2).alias("shock_pct"),
        (F.col("shock") * 1e6).alias("pnl_usd"),
        (F.lit(1e6) + F.col("shock") * 1e6).alias("position_remaining"),
    )


# =========================================================================
# F12/F20 — impermanent-loss curve (risk_models.py:158-204); exact doubles
# (identical op order both sides => bit-identical)
# =========================================================================

@register(
    "il_curve",
    """
    SELECT i * 5e-2 AS price_ratio,
           2 * sqrt(i * 5e-2) / (1 + i * 5e-2) - 1 AS il_frac,
           (2 * sqrt(i * 5e-2) / (1 + i * 5e-2) - 1) * 1e2 AS il_pct,
           1e4 * (2 * sqrt(i * 5e-2) / (1 + i * 5e-2)) AS lp_value,
           1e4 * (1 + i * 5e-2) / 2 AS hold_value
    FROM range(2, 101) t(i)
    """,
)
def il_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    grid = spark.range(2, 101)
    r = F.col("id") * 5e-2
    lp_rel = F.lit(2) * F.sqrt(r) / (F.lit(1) + r)
    return grid.select(
        r.alias("price_ratio"),
        (lp_rel - 1).alias("il_frac"),
        ((lp_rel - 1) * 1e2).alias("il_pct"),
        (F.lit(1e4) * lp_rel).alias("lp_value"),
        (F.lit(1e4) * (F.lit(1) + r) / 2).alias("hold_value"),
    )


# =========================================================================
# MEV composite scoring, set-based (risk_models.py:225-284)
# =========================================================================

@register(
    "mev_scores",
    """
    WITH tx AS (SELECT l_orderkey AS b, l_extendedprice / 1e3 AS g FROM lineitem),
    ta AS (SELECT b, MAX(g) AS gmax, quantile_cont(g, 0.5) AS gmed
           FROM tx GROUP BY b),
    pc AS (SELECT l_orderkey AS b, l_suppkey AS pool, COUNT(*) AS n
           FROM lineitem GROUP BY 1, 2),
    sa AS (SELECT b, SUM(CASE WHEN n >= 3 THEN 1 ELSE 0 END) AS high,
                  SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS back
           FROM pc GROUP BY b),
    j AS (SELECT ta.b, ta.gmax, ta.gmed,
                 LEAST(1e2, COALESCE(sa.high, 0) * 2.5e1) AS sandwich,
                 CASE WHEN ta.gmed = 0e0 THEN 0e0
                      ELSE LEAST(1e2, GREATEST(0e0, (ta.gmax / ta.gmed - 1) * 2e1))
                 END AS frontrun,
                 COALESCE(sa.back, 0) AS backrun
          FROM ta LEFT JOIN sa ON ta.b = sa.b)
    SELECT b AS block_number,
           printf('%.6e', LEAST(1e2, sandwich * 5e-1 + frontrun * 4e-1
                                     + backrun * 2e0)) AS mev_score,
           printf('%.6e', sandwich) AS sandwich_risk,
           printf('%.6e', frontrun) AS frontrun_risk,
           CAST(backrun AS BIGINT) AS backrun_opportunities
    FROM j
    """,
)
def mev_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    tx = li.select(
        F.col("l_orderkey").alias("block_number"),
        (F.col("l_extendedprice") / 1e3).alias("gas_price_gwei"),
    )
    swaps = li.select(
        F.col("l_orderkey").alias("block_number"),
        F.col("l_suppkey").alias("pool"),
    )
    ta = tx.groupBy("block_number").agg(
        F.max("gas_price_gwei").alias("gmax"),
        F.expr("percentile(gas_price_gwei, 0.5)").alias("gmed"),
    )
    pc = swaps.groupBy("block_number", "pool").agg(F.count("*").alias("n"))
    sa = pc.groupBy("block_number").agg(
        F.sum((F.col("n") >= 3).cast("long")).alias("high"),
        F.sum((F.col("n") >= 2).cast("long")).alias("back"),
    )
    j = ta.join(sa, "block_number", "left")
    sandwich = F.least(F.lit(1e2), F.coalesce(F.col("high"), F.lit(0)) * 2.5e1)
    frontrun = F.when(F.col("gmed") == 0e0, F.lit(0e0)).otherwise(
        F.least(F.lit(1e2), F.greatest(F.lit(0e0), (F.col("gmax") / F.col("gmed") - 1) * 2e1))
    )
    backrun = F.coalesce(F.col("back"), F.lit(0))
    return j.select(
        "block_number",
        fmt(F.least(F.lit(1e2), sandwich * 5e-1 + frontrun * 4e-1 + backrun * 2e0)).alias("mev_score"),
        fmt(sandwich).alias("sandwich_risk"),
        fmt(frontrun).alias("frontrun_risk"),
        backrun.alias("backrun_opportunities"),
    )


# =========================================================================
# A10/A11/A12 — distincts, summary scalars, count-if
# =========================================================================

@register(
    "distinct_counts",
    """
    SELECT COUNT(DISTINCT user_id) AS unique_users,
           COUNT(DISTINCT event_type) AS unique_types,
           COUNT(DISTINCT strftime(ts, '%Y-%m-%d')) AS active_days
    FROM events
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("unique_users"),
        F.countDistinct("event_type").alias("unique_types"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("active_days"),
    )


@register(
    "summary_stats",
    """
    SELECT COUNT(*) AS n,
           printf('%.6e', AVG(value)) AS avg_value,
           printf('%.6e', MAX(value)) AS max_value,
           printf('%.6e', SUM(value)) AS total_value,
           CAST(SUM(CASE WHEN value > 1e2 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
    FROM events
    """,
)
def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n"),
        fmt(F.avg("value")).alias("avg_value"),
        fmt(F.max("value")).alias("max_value"),
        fmt(F.sum("value")).alias("total_value"),
        F.sum((F.col("value") > 1e2).cast("long")).alias("n_large"),
    )


# =========================================================================
# P7/F18 — literal-map enrichment with unknown-fill (etl_pipeline.py:41-47)
# =========================================================================

@register(
    "selector_map_lookup",
    """
    SELECT CASE event_type
               WHEN 'purchase' THEN 'commerce'
               WHEN 'click' THEN 'engagement'
               WHEN 'view' THEN 'engagement'
               ELSE 'unknown'
           END AS category,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def selector_map_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itertools import chain

    ev = t(spark, sf_dir, "events")
    mapping = {"purchase": "commerce", "click": "engagement", "view": "engagement"}
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(mapping.items())])
    return (
        ev.select(F.coalesce(m[F.col("event_type")], F.lit("unknown")).alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# S4/F17 — JSON extraction (etl_pipeline.py:54-58 as columnar from_json)
# =========================================================================

@register(
    "json_props_extract",
    """
    SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


# =========================================================================
# F8/F9/F10/P12 — time bucketing, formatting, interval arithmetic
# =========================================================================

@register(
    "time_formats",
    """
    SELECT strftime(date_trunc('hour', ts), '%H:%M') AS hour_label,
           COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-30 23:57:12' - INTERVAL '168 hours'
    GROUP BY 1
    """,
)
def time_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cutoff = F.expr("timestamp'2024-01-30 23:57:12' - INTERVAL 168 HOURS")
    return (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy(F.date_format(F.date_trunc("hour", "ts"), "HH:mm").alias("hour_label"))
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# W4/O5 — last-K by ordered key (data_service.py:241)
# =========================================================================

@register(
    "last_k_events",
    """
    SELECT event_id, value, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    ORDER BY event_id DESC
    LIMIT 48
    """,
)
def last_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("event_id"))
        .limit(48)
        .select("event_id", "value",
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"))
    )


# =========================================================================
# S6/S7/§2.7 — conditional routing + schema-union (unionByName)
# =========================================================================

@register(
    "routed_union",
    """
    SELECT event_id, user_id, 'signup_route' AS route, value AS signup_value,
           NULL AS error_code
    FROM events WHERE event_type = 'signup'
    UNION ALL BY NAME
    SELECT event_id, user_id, 'error_route' AS route,
           NULL AS signup_value,
           CAST(props->>'$.k' AS BIGINT) AS error_code
    FROM events WHERE event_type = 'error'
    """,
)
def routed_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id",
        F.lit("signup_route").alias("route"),
        F.col("value").alias("signup_value"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id",
        F.lit("error_route").alias("route"),
        F.get_json_object("props", "$.k").cast("long").alias("error_code"),
    )
    return signups.unionByName(errors, allowMissingColumns=True)


# =========================================================================
# TPC-H Q1-shaped pricing summary (bench flagship; exercises the classic
# scan -> filter -> wide hash-agg shape)
# =========================================================================

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           printf('%.6e', CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                               AS DOUBLE) / 100.0) AS sum_base_price,
           printf('%.6e', CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                               AS DOUBLE) / 10000.0) AS sum_disc_price,
           printf('%.6e', SUM(l_quantity) / COUNT(*)) AS avg_qty,
           printf('%.6e', CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                               AS DOUBLE) / 100.0 / COUNT(*)) AS avg_price,
           printf('%.6e', CAST(SUM(CAST(round(l_discount * 100) AS BIGINT))
                               AS DOUBLE) / 100.0 / COUNT(*)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. Money columns are 2-decimal values stored as
    doubles; both engines aggregate them as exact long cents (order-free
    integer sums; see ``cents``) and only then cast to double, so the
    sums are bit-identical at ANY scale factor — no reassociation tail
    risk (a %.6e 7th-digit flip was observed on the double path at
    sf0.1).  price*(1-disc) is exact in centi-cent units: a long×long
    per-row product summed into decimal(38,0), because this query's
    groups span the whole table and a BIGINT Σ of ~1e9-scale products
    would overflow around 1e10 rows.  Averages divide the exact sum by
    the count in double space (same operands → same result)."""
    li = t(spark, sf_dir, "lineitem")
    pc = cents("l_extendedprice")
    dc = cents("l_discount")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            fmt(F.sum(pc).cast("double") / 100.0).alias("sum_base_price"),
            fmt(F.sum((pc * (F.lit(100) - dc)).cast("decimal(38,0)"))
                .cast("double") / 10000.0).alias("sum_disc_price"),
            fmt(F.sum("l_quantity") / cnt).alias("avg_qty"),
            fmt(F.sum(pc).cast("double") / 100.0 / cnt).alias("avg_price"),
            fmt(F.sum(dc).cast("double") / 100.0 / cnt).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
