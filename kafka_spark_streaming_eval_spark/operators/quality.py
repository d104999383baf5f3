"""Data-quality / profiling extensions (north-star surface, SURVEY.md §2.b):
exact heavy-hitter detection, a single-scan constraint audit, OHLC
time-series resampling, and a bitwise-expression battery.

These are the operational queries a 100 TB training-data pipeline runs
continuously: "which keys dominate the traffic" (skew detection feeding the
salting strategies in ``agg_salted_skew``/``join_salted_skew``), "does
today's drop satisfy the schema contract" (the audit gate before a
partition is published), and "downsample the raw stream to bars" (the
storage-side rollup that turns 10^12 raw events into 10^7 plottable rows).

Everything is built-in column functions — single scans, map-side partial
aggregation, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.functions.numeric import dsum, dsum_sql
from kafka_spark_streaming_eval_spark.operators.metrics import _EV
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return table(spark, sf_dir, name)


@register(
    "agg_heavy_hitters",
    "relational",
    oracle="""
    WITH counts AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    )
    SELECT user_id, n_events
    FROM counts
    WHERE n_events * 135 > (SELECT count(*) FROM events)
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitters: users contributing more than 1/135 of all
    events.  Two aggregates over one scan — the per-key counts (map-side
    partial agg, one shuffle on user_id) and a global count broadcast as a
    1-row scalar — compared in pure integer arithmetic (``n * 135 > total``,
    no float threshold).  This is the exact verification pass behind sketch
    pipelines (count-min / SpaceSaving find candidates cheaply, this query
    confirms them); it is also the skew detector that decides which keys the
    salted-join/agg strategies treat specially.  At 100 TB the per-key agg
    is the classic combiner shape and the scalar side is a broadcast — the
    plan has exactly one wide dependency.  Mirrors the scalar-subquery
    threshold pattern of the reference's warm-up window
    (analyze_exp1.py:53-68: filter against an aggregate of the same scan).
    """
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    # total = sum of the per-key counts: derives from the SAME aggregation
    # subtree, so the corpus is scanned once and AQE reuses the exchange
    # (the second pass runs over |distinct keys| rows, not |events| rows)
    total = counts.agg(F.sum("n_events").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n_events") * 135 > F.col("_total"))
        .select("user_id", "n_events")
    )


@register(
    "timeseries_resample_ohlc",
    "timeseries",
    oracle=f"""
    WITH ordered AS (
      SELECT event_type, date_trunc('day', ts) AS day, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM {_EV}
    )
    SELECT event_type, epoch_ms(day) AS day_ms,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS volume,
           {dsum_sql('value')} AS turnover
    FROM ordered
    GROUP BY event_type, day
    """,
)
def timeseries_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to daily OHLC bars per event_type — the
    standard downsample that turns a raw tick stream into chartable
    open/high/low/close/volume aggregates.  Open/close are first/last by
    event time with (ts, event_id) as the deterministic tie-breaker,
    expressed as ascending/descending ``row_number`` flags folded into one
    hash aggregate (no self-join, no ``first()`` nondeterminism).  Plan:
    one shuffle on (event_type, day) serving both windows and the final
    agg — the window partition key equals the grouping key, so AQE reuses
    the exchange.  At 100 TB the partition key is (type × day), fine-
    grained and uniform; bars are tiny and the output is ~10^5 smaller
    than the input, the canonical rollup-for-storage shape."""
    ev = _t(spark, sf_dir, "events")
    # project `day` FIRST so the window partition spec and the final
    # groupBy reference the same attribute — expression-keyed windows plan
    # a second exchange even when semantically equal to the grouping key
    based = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("day"), "value", "ts", "event_id"
    )
    wa = W.partitionBy("event_type", "day").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    flagged = based.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return flagged.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        dsum("value").alias("turnover"),
    ).select(
        "event_type",
        F.unix_millis("day").alias("day_ms"),
        "open",
        "high",
        "low",
        "close",
        "volume",
        "turnover",
    )


@register(
    "etl_quality_audit",
    "etl",
    oracle="""
    SELECT 'null_custkey' AS check_name,
           count(*) FILTER (WHERE o_custkey IS NULL) AS n_bad FROM orders
    UNION ALL
    SELECT 'nonpositive_price', count(*) FILTER (WHERE o_totalprice <= 0)
    FROM orders
    UNION ALL
    SELECT 'bad_status',
           count(*) FILTER (WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    FROM orders
    UNION ALL
    SELECT 'date_out_of_range',
           count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1992-01-01'
                               OR o_orderdate >= TIMESTAMP '2026-01-01')
    FROM orders
    UNION ALL
    SELECT 'legacy_pre_1996', count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1996-01-01')
    FROM orders
    UNION ALL
    SELECT 'dup_orderkey', count(*) - count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'orphan_custkey', count(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def etl_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-publish data-quality gate: one audit row per constraint with its
    violation count — nullability, value-range, domain membership, date
    sanity, key uniqueness, and referential integrity (orphan foreign
    keys).  The six column-level checks fuse into a SINGLE scan of orders
    (one agg emitting six conditional counts, unpivoted via ``stack``);
    the referential check is a broadcast anti-join (customer keys are the
    small side).  This is the defensive-ingestion layer of the reference
    (analyze_exp1.py:35-44 column whitelist + coercion + null-drop)
    promoted to a first-class, reportable operator.  At 100 TB the scan is
    embarrassingly parallel, the agg collapses to 7 numbers, and the gate
    runs per-partition before a partition is published."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    cnt = lambda cond: F.count_if(cond).cast("long")  # noqa: E731
    stats = o.agg(
        cnt(F.col("o_custkey").isNull()).alias("null_custkey"),
        cnt(F.col("o_totalprice") <= 0).alias("nonpositive_price"),
        cnt(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        cnt(
            (F.col("o_orderdate") < "1992-01-01")
            | (F.col("o_orderdate") >= "2026-01-01")
        ).alias("date_out_of_range"),
        cnt(F.col("o_orderdate") < "1996-01-01").alias("legacy_pre_1996"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    unpivoted = stats.selectExpr(
        "stack(6, 'null_custkey', null_custkey,"
        " 'nonpositive_price', nonpositive_price,"
        " 'bad_status', bad_status,"
        " 'date_out_of_range', date_out_of_range,"
        " 'legacy_pre_1996', legacy_pre_1996,"
        " 'dup_orderkey', dup_orderkey) AS (check_name, n_bad)"
    )
    orphans = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_bad"))
        .select(F.lit("orphan_custkey").alias("check_name"), "n_bad")
    )
    return unpivoted.unionByName(orphans)


@register(
    "scalar_bitwise_battery",
    "relational",
    oracle="""
    SELECT p_partkey,
           bit_count(p_partkey) AS bc,
           p_partkey & 255 AS band,
           p_partkey | 4096 AS bor,
           xor(p_partkey, 21845) AS bxor,
           (~p_partkey) & 65535 AS bnot_masked,
           p_partkey << 3 AS shl,
           p_partkey >> 2 AS shr
    FROM part
    """,
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-expression battery over bigint keys: popcount, AND/OR/XOR,
    masked NOT, shifts.  These are the primitives under the engine's
    bit-level operators (simhash Hamming distance in ``dedup_simhash``,
    Morton-curve interleave in ``src_zorder_clustered_scan``, HLL register
    packing) — all pure JVM integer arithmetic inside whole-stage codegen,
    identical two's-complement semantics on both engines."""
    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    return p.select(
        "p_partkey",
        F.bit_count(k).alias("bc"),
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(21845)).alias("bxor"),
        F.bitwise_not(k).bitwiseAND(F.lit(65535)).alias("bnot_masked"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
    )


@register(
    "agg_histogram_bins",
    "relational",
    oracle="""
    WITH bounds AS (
      SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)), 19)
                AS INTEGER) AS bin,
           count(*) AS n_orders,
           min(o_totalprice) AS bin_min,
           max(o_totalprice) AS bin_max
    FROM orders, bounds
    GROUP BY 1
    """,
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins over [min, max]) of order totals —
    the profiling primitive under every "distribution drifted?" check.
    Two aggregates over one scan: global min/max (6 numbers, broadcast as
    a 1-row dimension) then a bin-keyed count.  The bin formula is the
    same double arithmetic on both engines (identical IEEE operation
    order), so bin edges are bit-identical — the reason the formula is
    spelled out instead of ``width_bucket`` (DuckDB lacks it, and pinning
    one formula beats trusting two implementations' rounding).  At 100 TB:
    a map-side-combinable count on a 20-value key — no skew, no state."""
    o = _t(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 20.0
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.least(F.floor((F.col("o_totalprice") - F.col("lo")) / width), F.lit(19))
        .cast("int")
        .alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("bin_min"),
        F.max("o_totalprice").alias("bin_max"),
    )


@register(
    "obs_pipeline_metrics",
    "etl",
    oracle=f"""
    SELECT count(*) AS n_rows,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_large,
           {dsum_sql('o_totalprice')} AS total_price,
           min(epoch_ms(o_orderdate)) AS first_order_ms
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def obs_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piggybacked pipeline metrics via the Observation API: the metrics
    (row count, conditional count, exact decimal sum, min) are computed BY
    THE SAME JOB that executes the query — Spark attaches an accumulator-
    backed observer to the plan, so auditing costs zero extra scans, the
    engine answer to the reference's per-batch metric rows (which launched
    up to 4 extra jobs per batch, spark_stream_metrics.py:56-62).  The
    observed values are then lifted into a 1-row DataFrame and must match
    the oracle's standalone aggregation exactly — proving piggybacked
    metrics equal dedicated-scan metrics."""
    from pyspark.sql import Observation

    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        # observe() metrics must aggregate resolved attributes: project the
        # epoch-ms column first, then aggregate it
        .withColumn(
            "order_ms", F.unix_millis(F.col("o_orderdate").cast("timestamp"))
        )
    )
    obs = Observation("pipeline_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        dsum("o_totalprice").alias("total_price"),
        F.min("order_ms").alias("first_order_ms"),
    )
    observed.write.format("noop").mode("overwrite").save()  # one real pass
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_large"], m["total_price"], m["first_order_ms"])],
        "n_rows bigint, n_large bigint, total_price double, first_order_ms bigint",
    )


# Benford expected first-digit shares, log10(1 + 1/d) pre-rounded to 6 dp so
# neither engine's libm log10 enters the comparison.
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@register(
    "quality_benford_audit",
    "quality",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    counts AS (
      SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ),
    total AS (SELECT sum(n) AS t FROM counts),
    expected (digit, exp_share) AS (
      VALUES {", ".join(f"({d}, {s})" for d, s in sorted(_BENFORD.items()))}
    )
    SELECT e.digit,
           coalesce(c.n, 0) AS n,
           round(coalesce(c.n, 0) / CAST(t.t AS DOUBLE), 6) AS obs_share,
           e.exp_share,
           round(abs(coalesce(c.n, 0) / CAST(t.t AS DOUBLE) - e.exp_share), 6)
             AS abs_dev
    FROM expected e
    LEFT JOIN counts c ON e.digit = c.digit
    CROSS JOIN total t
    """,
)
def quality_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the forensic
    data-quality check for fabricated or truncated numeric columns (a
    synthetic uniform price column deviates wildly from Benford; a natural
    multiplicative one doesn't — either way the DEVIATION per digit is the
    artifact reviewers read).  First digits come from the DECIMAL's string
    form (both engines print DECIMAL(15,2) identically), never from
    log10 — so no libm enters the comparison; expected shares are 6-dp
    literals for the same reason.  One scan, one 9-group aggregation, a
    broadcast of the 9-row expectation table: trivially 100 TB-safe."""
    prep(spark)
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    counts = (
        o.select(
            F.substring(F.col("o_totalprice").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    expected = spark.createDataFrame(
        sorted(_BENFORD.items()), "digit long, exp_share double"
    )
    return (
        expected.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)) / F.col("t").cast("double"), 6
            ).alias("obs_share"),
            "exp_share",
            F.round(
                F.abs(
                    F.coalesce(F.col("n"), F.lit(0)) / F.col("t").cast("double")
                    - F.col("exp_share")
                ),
                6,
            ).alias("abs_dev"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorized statistics (outlier-robust feature cleaning)
# ---------------------------------------------------------------------------


@register(
    "quality_winsorized_stats",
    "relational",
    oracle=f"""
    WITH bounds AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           count(*) FILTER (WHERE e.value < b.lo) AS n_clamped_low,
           count(*) FILTER (WHERE e.value > b.hi) AS n_clamped_high,
           {dsum_sql('least(greatest(e.value, b.lo), b.hi)')} AS winsorized_sum,
           round({dsum_sql('least(greatest(e.value, b.lo), b.hi)')}
                 / count(*), 6) AS winsorized_mean,
           b.lo AS p05, b.hi AS p95
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.lo, b.hi
    """,
)
def quality_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics: clamp values to the exact
    [p05, p95] band and report the outlier-robust sum/mean plus how many
    rows were clamped at each tail — the standard feature-cleaning step
    before training on heavy-tailed telemetry.  The exact percentiles use
    linear interpolation on both engines, rounded to 6 dp BEFORE clamping
    so the band edges are the identical double cross-engine; clamped
    values then go through the usual DECIMAL sum.

    Plan shape: two passes over the fact table (one to aggregate the
    per-group bounds — 5 rows, broadcast back — one to clamp + aggregate).
    At 100 TB the second pass's clamp is a map-side expression; a
    single-pass variant would substitute `percentile_approx` sketch bounds
    (the `ref_flagship_batch_metrics` path) at the cost of exactness."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return j.groupBy("event_type", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("value") < F.col("lo")).alias("n_clamped_low"),
        F.count_if(F.col("value") > F.col("hi")).alias("n_clamped_high"),
        dsum(clamped).alias("winsorized_sum"),
        F.round(dsum(clamped) / F.count(F.lit(1)), 6).alias("winsorized_mean"),
    ).select(
        "event_type", "n", "n_clamped_low", "n_clamped_high",
        "winsorized_sum", "winsorized_mean",
        F.col("lo").alias("p05"), F.col("hi").alias("p95"),
    )


# ---------------------------------------------------------------------------
# Corpus diversity indices (log-free: Gini impurity / inverse Simpson)
# ---------------------------------------------------------------------------


@register(
    "agg_diversity_index",
    "relational",
    oracle="""
    WITH cls AS (
      SELECT source, lang, count(*) AS n FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total,
                   CAST(sum(n * n) AS BIGINT) AS sum_sq,
                   count(*) AS n_classes
            FROM cls GROUP BY source)
    SELECT source, total AS n_docs, n_classes,
           round(1.0 - (sum_sq * 1.0) / (total * 1.0 * total), 6)
             AS gini_impurity,
           round((total * 1.0 * total) / (sum_sq * 1.0), 6)
             AS effective_classes
    FROM tot
    """,
)
def agg_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition diversity per source: Gini impurity
    (1 - sum p_i^2 over language shares) and the inverse Simpson index
    (1 / sum p_i^2 — the "effective number of languages").  These are the
    log-free diversity measures: Shannon entropy needs a libm log whose
    last-ulp can differ cross-engine, while Gini/Simpson are pure rational
    arithmetic on exact counts — the same determinism reasoning as
    `text_collocation_lift`'s lift-vs-PMI choice.  A data-mixing pipeline
    watches exactly this number to keep a source from collapsing to one
    dominant language/domain.

    Plan: two keyed aggregations (class counts, then per-source moments) —
    map-side combinable, output one row per source at any scale."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    cls = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    tot = cls.groupBy("source").agg(
        F.sum("n").alias("total"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
        F.count(F.lit(1)).alias("n_classes"),
    )
    total, sum_sq = F.col("total"), F.col("sum_sq")
    return tot.select(
        "source",
        total.alias("n_docs"),
        "n_classes",
        F.round(1.0 - (sum_sq * 1.0) / (total * 1.0 * total), 6).alias(
            "gini_impurity"
        ),
        F.round((total * 1.0 * total) / (sum_sq * 1.0), 6).alias(
            "effective_classes"
        ),
    )
