"""CSV metric-directory sources/sinks (SURVEY §2.a S3/S4/S6).

The reference persists per-batch metric rows as header CSVs under per-run
directories named by their config (``rate_7000``...), then re-discovers them
with a recursive glob and extracts the run parameter from the directory name
(`/root/reference/results/exp1/analysis/analyze_exp1.py:16-27,87-99`).

Spark-first: the recursive glob is ``recursiveFileLookup``, the directory-
name parameter extraction is ``regexp_extract(input_file_name())`` — both
run inside the scan, not in a Python loop, so a million run directories cost
the same plan.
"""

from __future__ import annotations

import hashlib
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.operators.metrics import _EV
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep


def write_run_csvs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the reference's metrics-directory layout from ``events``:
    one ``run_<event_type>/`` directory of header CSVs with per-day counts
    (the S3 CSV-append sink shape, spark_stream_metrics.py:71-74)."""
    base = "/tmp/metrics_runs_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    shutil.rmtree(base, ignore_errors=True)
    ev = table(prep(spark), sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(F.count(F.lit(1)).alias("n"))
    for row in daily.select("event_type").distinct().collect():
        et = row.event_type
        (
            daily.where(F.col("event_type") == et)
            .select("day_ms", "n")
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", "true")
            .csv(f"{base}/run_{et}")
        )
    return base


@register(
    "ref_csv_roundtrip_scan",
    "reference-parity",
    oracle=f"""
    SELECT event_type AS config,
           count(DISTINCT date_trunc('day', ts)) AS n_rows,
           count(*) AS total_events
    FROM {_EV}
    GROUP BY event_type
    """,
)
def csv_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+S4+S6 end-to-end: write per-run CSV directories, re-scan them
    recursively with an explicit schema, regexp-extract the run config from
    the file path, and summarize — the whole exp1 ingestion pipeline
    (analyze_exp1.py:16-27,87-99) as one declarative plan.  The oracle
    recomputes the same summary straight from ``events``, which also proves
    the CSV sink/scan did not lose or duplicate rows."""
    base = write_run_csvs(spark, sf_dir)
    scanned = (
        spark.read.option("header", "true")
        .option("recursiveFileLookup", "true")
        .schema("day_ms LONG, n LONG")
        .csv(base)
        .withColumn(
            "config", F.regexp_extract(F.input_file_name(), r"run_([a-z]+)/", 1)
        )
    )
    return scanned.groupBy("config").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n").alias("total_events")
    )


@register(
    "src_partition_pruned_scan",
    "sources",
    oracle=f"""
    SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM {_EV}
    WHERE event_type = 'click'
    GROUP BY epoch_ms(date_trunc('day', ts))
    """,
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet layout + partition pruning: write ``events``
    partitioned by ``event_type`` (the 100 TB layout — a predicate on the
    partition column prunes whole directories before any I/O), read it back
    filtered to one partition, and summarize per day.

    The physical plan shows the predicate under ``PartitionFilters`` (file
    listing, zero data read for other partitions), not a post-scan Filter —
    asserted in tests.  The oracle recomputes from the raw table, proving
    the partitioned round-trip is lossless."""
    base = "/tmp/events_by_type_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    shutil.rmtree(base, ignore_errors=True)
    ev = table(prep(spark), sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    back = spark.read.parquet(base).where(F.col("event_type") == "click")
    return back.groupBy(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )
