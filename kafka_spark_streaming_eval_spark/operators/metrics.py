"""Reference-parity batch operators (SURVEY.md §2.a).

The reference (`/root/reference/spark_job/spark_stream_metrics.py:33-76` and
the pandas analysis scripts `results/exp*/analysis/*.py`) decodes JSON events,
derives an end-to-end latency column, excludes a warm-up window, and computes
per-batch / per-run summary statistics (count, mean, p50/p95/p99, max).  Here
the same operators are expressed as declarative batch queries over the
``events`` testdata table so Catalyst plans them (predicate pushdown into the
parquet scan, partial aggregation, AQE partition coalescing).

Determinism: the reference's latency is wall-clock-based
(`spark_stream_metrics.py:49-52`) which is untestable; the oracle-checked
variants use an event-time-derived latency (ms into the event's hour) so
Spark and DuckDB agree bit-for-bit.  The wall-clock formulation lives in
``streaming/metrics_job.py`` where it belongs.

Scale notes (100 TB): every aggregation here is a map-side-combinable
``groupBy`` keyed on (time-bucket, low-cardinality dim) — no skew, no
driver-side collection; the warm-up bound is a 1-row broadcast join, not a
collected scalar, so the whole plan stays on the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.functions.numeric import davg, davg_sql, dsum, dsum_sql
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep

# Deterministic stand-in for the reference's processing-time latency
# (sink wall-clock - created_ts, spark_stream_metrics.py:49-52): the event's
# offset into its hour, in ms.  Pure event-time function -> reproducible.
def _latency():
    return F.unix_millis(F.col("ts")) - F.unix_millis(F.date_trunc("hour", F.col("ts")))


_LATENCY_SQL = "(epoch_ms(ts) - epoch_ms(date_trunc('hour', ts)))"

# DuckDB-side mirror of the catalog's ms-truncation of events.ts (see catalog.table)
_EV = "(SELECT * REPLACE (date_trunc('milliseconds', ts) AS ts) FROM events)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Flagship: the full metrics pipeline as one batch query
# (P2 json decode, P4 derived latency, P7 warm-up window, A1-A4 aggregates)
# ---------------------------------------------------------------------------


@register(
    "ref_flagship_batch_metrics",
    "reference-parity",
    oracle=f"""
    WITH evts AS (SELECT * FROM {_EV} t), bounds AS (SELECT min(ts) AS t_min FROM evts),
    ev AS (
      SELECT time_bucket(INTERVAL '1 day', e.ts) AS day,
             e.event_type,
             {_LATENCY_SQL} AS latency_ms,
             CAST(json_extract_string(e.props, '$.k') AS INTEGER) AS k_val,
             e.user_id, e.value
      FROM evts e, bounds b
      WHERE e.ts >= b.t_min + INTERVAL '1 day'
        AND e.ts <  b.t_min + INTERVAL '15 days'
    )
    SELECT epoch_ms(day) AS window_start_ms,
           event_type,
           count(*) AS n_events,
           (CAST(sum(latency_ms) AS DOUBLE) / count(latency_ms)) AS mean_latency_ms,
           round(quantile_cont(latency_ms, 0.50), 4) AS p50_latency_ms,
           round(quantile_cont(latency_ms, 0.95), 4) AS p95_latency_ms,
           round(quantile_cont(latency_ms, 0.99), 4) AS p99_latency_ms,
           max(latency_ms) AS max_latency_ms,
           {davg_sql('value')} AS avg_value,
           count(DISTINCT user_id) AS n_users,
           (CAST(sum(k_val) AS DOUBLE) / count(k_val)) AS avg_k
    FROM ev
    GROUP BY day, event_type
    """,
)
def flagship_batch_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference metrics job (spark_stream_metrics.py:43-74) re-expressed as a
    single fused batch aggregation: JSON decode -> latency derivation ->
    warm-up exclusion -> per-(day, event_type) count/mean/p50/p95/p99/max.

    The reference computed these stats with 4 separate jobs per micro-batch
    (isEmpty, count, approxQuantile, avg - SURVEY §3.1); here it is ONE
    shuffle with partial aggregation on the map side.
    """
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.min("ts").alias("t_min"))  # 1-row broadcast, no collect
    k_val = F.get_json_object("props", "$.k").cast("int").alias("k_val")
    filtered = (
        ev.join(F.broadcast(bounds))
        .where(
            (F.col("ts") >= F.col("t_min") + F.expr("INTERVAL 1 DAY"))
            & (F.col("ts") < F.col("t_min") + F.expr("INTERVAL 15 DAYS"))
        )
        .select(
            F.window("ts", "1 day").start.alias("day"),
            "event_type",
            _latency().alias("latency_ms"),
            k_val,
            "user_id",
            "value",
        )
    )
    return filtered.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("latency_ms").cast("double") / F.count("latency_ms")).alias("mean_latency_ms"),
        F.round(F.expr("percentile(latency_ms, 0.50)"), 4).alias("p50_latency_ms"),
        F.round(F.expr("percentile(latency_ms, 0.95)"), 4).alias("p95_latency_ms"),
        F.round(F.expr("percentile(latency_ms, 0.99)"), 4).alias("p99_latency_ms"),
        F.max("latency_ms").alias("max_latency_ms"),
        davg("value").alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum("k_val").cast("double") / F.count("k_val")).alias("avg_k"),
    ).select(
        F.unix_millis("day").alias("window_start_ms"),
        "event_type",
        "n_events",
        "mean_latency_ms",
        "p50_latency_ms",
        "p95_latency_ms",
        "p99_latency_ms",
        "max_latency_ms",
        "avg_value",
        "n_users",
        "avg_k",
    )


# ---------------------------------------------------------------------------
# P-series: projections / filters / scalar expressions
# ---------------------------------------------------------------------------


@register(
    "ref_cast_project",
    "reference-parity",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS event_id_str,
           CAST(user_id AS INTEGER) AS user_id_int,
           upper(event_type) AS event_type_uc
    FROM events WHERE event_type <> 'error'
    """,
)
def cast_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (spark_stream_metrics.py:43): projection + cast, filter pushed to scan."""
    return (
        _events(spark, sf_dir)
        .where(F.col("event_type") != "error")
        .select(
            F.col("event_id").cast("string").alias("event_id_str"),
            F.col("user_id").cast("int").alias("user_id_int"),
            F.upper("event_type").alias("event_type_uc"),
        )
    )


@register(
    "ref_json_decode",
    "reference-parity",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
)
def json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3 (spark_stream_metrics.py:45): from_json with explicit schema,
    struct flatten via ``select("e.*")`` — never schema inference."""
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return (
        _events(spark, sf_dir)
        .select("event_id", F.from_json("props", schema).alias("e"), "event_type")
        .select("event_id", "e.*", "event_type")
        .where(F.col("k").isNotNull())
    )


@register(
    "ref_corrupt_record_audit",
    "reference-parity",
    oracle="""
    SELECT event_type, count(*) AS n_rows,
           count(CASE WHEN event_id % 7 = 0 THEN 1 END) AS n_corrupt,
           count(CASE WHEN event_id % 7 <> 0
                      THEN json_extract(props, '$.k') END) AS n_decoded_k
    FROM events GROUP BY event_type
    """,
)
def corrupt_record_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 completion (SURVEY §1.3): malformed JSON must never kill the
    pipeline — the reference relies on ``from_json``'s default PERMISSIVE
    nulls (spark_stream_metrics.py:45); this makes the quarantine explicit
    with ``columnNameOfCorruptRecord``.  A deterministic subset of props is
    mangled into invalid JSON, decode quarantines exactly those rows into
    ``_corrupt_record`` (valid rows keep decoding), and the audit counts
    rows / quarantined / decoded per event type — the per-batch data-quality
    gate a production ingest runs on every trigger."""
    corrupted = _events(spark, sf_dir).select(
        "event_type",
        "event_id",
        F.when(
            F.col("event_id") % 7 == 0, F.concat(F.lit("{corrupt::"), "props")
        )
        .otherwise(F.col("props"))
        .alias("raw"),
    )
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    decoded = corrupted.select(
        "event_type",
        F.from_json(
            "raw",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("e"),
    )
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("e._corrupt_record").alias("n_corrupt"),
        F.count("e.k").alias("n_decoded_k"),
    )


@register(
    "ref_latency_derive",
    "reference-parity",
    oracle=f"SELECT event_id, {_LATENCY_SQL} AS latency_ms FROM {_EV}",
)
def latency_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (spark_stream_metrics.py:49-52): derived arithmetic latency column,
    deterministic event-time variant."""
    return _events(spark, sf_dir).select("event_id", _latency().alias("latency_ms"))


@register(
    "ref_coerce_dropna",
    "reference-parity",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 10 = 0 THEN 'not-a-number'
                  ELSE json_extract_string(props, '$.k') END AS k_raw
      FROM events
    )
    SELECT event_id, TRY_CAST(k_raw AS INTEGER) AS k_num
    FROM raw WHERE TRY_CAST(k_raw AS INTEGER) IS NOT NULL
    """,
)
def coerce_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+P6 (analyze_exp1.py:35-44): defensive numeric coercion
    (``to_numeric(errors="coerce")``) + null-drop, as try_cast + filter."""
    raw = _events(spark, sf_dir).select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.lit("not-a-number"))
        .otherwise(F.get_json_object("props", "$.k"))
        .alias("k_raw"),
    )
    out = raw.select("event_id", F.col("k_raw").try_cast("int").alias("k_num"))
    return out.where(F.col("k_num").isNotNull())


@register(
    "ref_warmup_window",
    "reference-parity",
    oracle=f"""
    WITH evts AS (SELECT * FROM {_EV} t),
    bounds AS (SELECT min(ts) AS t_min FROM evts)
    SELECT count(*) AS n_rows,
           epoch_ms(min(e.ts)) AS first_ms,
           epoch_ms(max(e.ts)) AS last_ms
    FROM evts e, bounds b
    WHERE e.ts >= b.t_min + INTERVAL '1 day'
      AND e.ts <  b.t_min + INTERVAL '15 days'
    """,
)
def warmup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7+A5 (analyze_exp1.py:53-68): warm-up exclusion window anchored at the
    stream's min timestamp; bound computed as a 1-row broadcast join so the
    plan has no driver-side action."""
    ev = _events(spark, sf_dir)
    bounds = ev.agg(F.min("ts").alias("t_min"))
    return (
        ev.join(F.broadcast(bounds))
        .where(
            (F.col("ts") >= F.col("t_min") + F.expr("INTERVAL 1 DAY"))
            & (F.col("ts") < F.col("t_min") + F.expr("INTERVAL 15 DAYS"))
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.unix_millis(F.min("ts")).alias("first_ms"),
            F.unix_millis(F.max("ts")).alias("last_ms"),
        )
    )


@register(
    "ref_throughput_ratio",
    "reference-parity",
    oracle=f"""
    SELECT epoch_ms(time_bucket(INTERVAL '6 hours', ts)) AS bucket_ms,
           count(*) AS n_events,
           (CAST(count(*) AS DOUBLE) / 21600.0) AS throughput_eps
    FROM {_EV} GROUP BY 1
    """,
)
def throughput_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (analyze_exp1.py:50): throughput = events per bucket / bucket
    seconds, the reference's batch_events / TRIGGER_SEC generalized to
    event-time buckets."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "6 hours").start.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis("bucket").alias("bucket_ms"),
            "n_events",
            (F.col("n_events").cast("double") / F.lit(21600.0)).alias("throughput_eps"),
        )
    )


@register(
    "ref_gap_detect",
    "reference-parity",
    oracle=f"""
    SELECT user_id, event_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS gap_ms
    FROM {_EV}
    QUALIFY gap_ms IS NOT NULL
    """,
)
def gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9+O1 (analyze_recovery.py:12-15): consecutive inter-event gap via
    lag() — partitioned by user so the sort is per-key (scales; no global
    single-partition sort)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return (
        _events(spark, sf_dir)
        .select("user_id", "event_id", (ms - F.lag(ms).over(w)).alias("gap_ms"))
        .where(F.col("gap_ms").isNotNull())
    )


# ---------------------------------------------------------------------------
# A/O-series: aggregations, sorts, top-1, unions
# ---------------------------------------------------------------------------


@register(
    "ref_recovery_gap",
    "reference-parity",
    oracle=f"""
    WITH gaps AS (
      SELECT event_id,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (ORDER BY ts, event_id) AS gap_ms
      FROM {_EV}
    )
    SELECT event_id, gap_ms FROM gaps
    WHERE gap_ms IS NOT NULL
    ORDER BY gap_ms DESC, event_id LIMIT 1
    """,
)
def recovery_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (analyze_recovery.py:12-25): the largest inter-batch gap on the
    global timeline (the recovery-time measurement), with a deterministic
    event_id tie-break.

    Scale note: the global lag() needs a total order; Spark range-partitions
    the sort, but lag across a whole 100 TB table would be computed per
    partition boundary.  For the production path, pre-bucket by coarse time
    (day) and take per-day max + boundary pairs; at testdata scale the direct
    window is optimal and AQE coalesces it.
    """
    from pyspark.sql import Window as W

    w = W.orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return (
        _events(spark, sf_dir)
        .select("event_id", (ms - F.lag(ms).over(w)).alias("gap_ms"))
        .where(F.col("gap_ms").isNotNull())
        .orderBy(F.col("gap_ms").desc(), "event_id")
        .limit(1)
    )


@register(
    "ref_run_summary",
    "reference-parity",
    oracle=f"""
    SELECT event_type AS config,
           count(*) AS n_batches,
           {davg_sql('value')} AS mean_value,
           round(quantile_cont(value, 0.95), 4) AS p95_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def run_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+O2+O4 (analyze_exp1.py:70-81, analyze_exp2.py:36-49): the per-run
    summary table — one groupBy replaces the reference's per-folder Python
    loop; event_type stands in for the run config key."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("event_type").alias("config"))
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            davg("value").alias("mean_value"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "ref_minmax_anchor",
    "reference-parity",
    oracle=f"""
    SELECT epoch_ms(min(ts)) AS t_min_ms, epoch_ms(max(ts)) AS t_max_ms,
           count(*) AS n FROM {_EV}
    """,
)
def minmax_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (analyze_exp1.py:59): stream anchor stats — min/max/count in one pass."""
    return _events(spark, sf_dir).agg(
        F.unix_millis(F.min("ts")).alias("t_min_ms"),
        F.unix_millis(F.max("ts")).alias("t_max_ms"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "ref_union_runs",
    "reference-parity",
    oracle="""
    WITH unioned AS (
      SELECT event_type, value FROM events WHERE event_id % 2 = 0
      UNION ALL
      SELECT event_type, value FROM events WHERE event_id % 2 = 1
    )
    SELECT event_type, count(*) AS n FROM unioned GROUP BY event_type
    """,
)
def union_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 (analyze_exp1.py:32 pd.concat): union-all of per-run frames by name;
    in Spark a multi-file scan is already a union — shown explicitly here."""
    ev = _events(spark, sf_dir)
    a = ev.where(F.col("event_id") % 2 == 0).select("event_type", "value")
    b = ev.where(F.col("event_id") % 2 == 1).select("event_type", "value")
    return a.unionByName(b).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
