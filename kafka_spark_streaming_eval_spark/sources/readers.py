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
import os
import shutil
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.functions.numeric import dsum, dsum_sql
from kafka_spark_streaming_eval_spark.operators.metrics import _EV

_DSUM_REV = dsum_sql("l_extendedprice * (1 - l_discount)")
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import (
    fresh_scratch_dir,
    prep,
    scratch_dir,
)


def write_run_csvs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the reference's metrics-directory layout from ``events``:
    one ``run_<event_type>/`` directory of header CSVs with per-day counts
    (the S3 CSV-append sink shape, spark_stream_metrics.py:71-74).

    One ``partitionBy(event_type)`` write job fans out every run directory
    — no driver-side distinct/collect loop, so a million run keys cost one
    job, not a million.  The hive-style ``event_type=x`` dirs are renamed
    to the reference's ``run_x`` layout afterwards (driver-side metadata
    only, one rename per partition)."""
    base = fresh_scratch_dir("metrics_runs", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(F.count(F.lit(1)).alias("n"))
    (
        daily.repartition(1)  # tiny metrics table: one file per run dir (O5 coalesce(1) shape)
        .write.mode("overwrite")
        .option("header", "true")
        .partitionBy("event_type")
        .csv(base)
    )
    for entry in os.listdir(base):
        if entry.startswith("event_type="):
            os.rename(
                os.path.join(base, entry),
                os.path.join(base, "run_" + entry.split("=", 1)[1]),
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
    base = fresh_scratch_dir("events_by_type", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    back = spark.read.parquet(base).where(F.col("event_type") == "click")
    return back.groupBy(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


_BUCKETED_LOCK = threading.Lock()


def write_bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Persist orders and lineitem bucketed (8 buckets) + sorted on their
    join key as external tables; returns the two table names.  Idempotent
    per sf_dir; the lock makes concurrent in-process callers (a driver
    running queries in parallel threads) serialize on the one-time build
    instead of racing ``tableExists`` into a duplicate ``saveAsTable``."""
    prep(spark)
    # PID in the tag: catalog entries are per-session, but the backing /tmp
    # paths must not collide across concurrent processes on one host.
    # scratch_dir (not a bare /tmp path) so the dead-PID sweep reclaims the
    # bucketed files once this process exits.
    tag = f"{os.getpid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}"
    names = (f"orders_bkt_{tag}", f"lineitem_bkt_{tag}")
    with _BUCKETED_LOCK:
        for name, tbl, key in zip(
            names, ("orders", "lineitem"), ("o_orderkey", "l_orderkey")
        ):
            if spark.catalog.tableExists(name):
                continue
            path = os.path.join(scratch_dir("bucketed", sf_dir), tbl)
            shutil.rmtree(path, ignore_errors=True)
            (
                table(spark, sf_dir, tbl)
                .write.mode("overwrite")
                .option("path", path)
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
    return names


@register(
    "src_bucketed_colocated_join",
    "sources",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           {_DSUM_REV} AS revenue, count(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    HAVING SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) > 300000
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE 100 TB fact-fact join layout: both tables stored bucketed+sorted
    on the join key, so the orders↔lineitem join needs NO shuffle and NO
    sort — each task merge-joins bucket i of both tables straight off disk.
    The groupBy on the same key then reuses the join's output partitioning,
    so the whole plan (scan → join → agg) runs with ZERO exchanges
    (asserted in tests/test_plans.py).  At 100 TB this is the difference
    between re-shuffling ~30 TB per join and none; the one-time bucketed
    write amortizes over every subsequent join/agg on the key.

    The ``merge`` hint pins sort-merge (broadcast would hide the property
    being demonstrated at test scale); AQE leaves pinned SMJs alone."""
    ob, lb = write_bucketed_tables(spark, sf_dir)
    o = spark.table(ob).hint("merge")
    li = spark.table(lb)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.sum(rev.cast("decimal(38,6)")).alias("_r"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .where(F.col("_r") > 300000)
        .select(
            "o_orderkey",
            "o_totalprice",
            F.col("_r").cast("double").alias("revenue"),
            "n_lines",
        )
    )


@register(
    "src_schema_evolution_scan",
    "sources",
    oracle=f"""
    WITH v1 AS (
      SELECT event_id, user_id, event_type, NULL::DOUBLE AS value
      FROM {_EV} WHERE event_id % 2 = 0
    ),
    v2 AS (
      SELECT event_id, user_id, event_type, value
      FROM {_EV} WHERE event_id % 2 = 1
    ),
    unioned AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT event_type,
           count(*) AS n_rows,
           count(value) AS n_with_value,
           {dsum_sql('value')} AS total_value
    FROM unioned
    GROUP BY event_type
    """,
)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution — the unavoidable reality of a years-long 100 TB
    dataset: old files lack columns added later.  Writes the same events
    split as two parquet generations (v1 without `value`, v2 with it),
    reads the directory back with ``mergeSchema``, and aggregates with
    null-aware counts.  The missing column surfaces as NULL for v1 rows —
    no rewrite of old data, no reader branching: one scan, one schema.
    (Per-file footer merging is driver-side cost at listing time; at scale
    you pin the merged schema explicitly instead of inferring per query —
    here mergeSchema demonstrates the inference path.)"""
    base = fresh_scratch_dir("events_schema_evo", sf_dir)
    ev = table(prep(spark), sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    v1 = ev.where(F.col("event_id") % 2 == 0).drop("value")
    v2 = ev.where(F.col("event_id") % 2 == 1)
    v1.write.mode("overwrite").parquet(f"{base}/gen=1")
    v2.write.mode("overwrite").parquet(f"{base}/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(base)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_with_value"),
        dsum("value").alias("total_value"),
    )


@register(
    "src_python_datasource_events",
    "sources",
    oracle=f"""
    WITH src AS (
      SELECT i % 10000 AS user_id,
             ['click', 'view', 'purchase', 'login'][(i % 4) + 1] AS event_type,
             CAST(i % 1000 AS DOUBLE) / 10.0 AS value
      FROM generate_series(0, 99999) t(i)
    )
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {dsum_sql('value')} AS total_value
    FROM src
    GROUP BY event_type
    """,
)
def python_datasource_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API: a custom ``synthevents`` source that
    deterministically regenerates the reference producer's event stream
    (user_id = i %% 10000, event_type cycling 4 values, value =
    (i %% 1000)/10 — producer.py:38-45) WITHOUT Kafka.  The reader splits
    the sequence into contiguous index ranges (one InputPartition each, so
    generation parallelizes across executors) and yields Arrow
    RecordBatches, not Python tuples — the vectorized boundary.  This is
    the engine's template for wrapping any external system (REST cursors,
    proprietary stores) as a first-class parallel scan.  Classes are
    defined nested so cloudpickle ships them by value to executors."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class RangePart(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.total = int(options.get("total", "100000"))
            self.nparts = int(options.get("numpartitions", "8"))

        def partitions(self):
            step = (self.total + self.nparts - 1) // self.nparts
            return [
                RangePart(i, min(i + step, self.total))
                for i in range(0, self.total, step)
            ]

        def read(self, part):
            import numpy as np
            import pyarrow as pa

            types = np.array(["click", "view", "purchase", "login"])
            for lo in range(part.start, part.end, 16384):
                hi = min(lo + 16384, part.end)
                i = np.arange(lo, hi, dtype=np.int64)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(i % 10000, type=pa.int64()),
                        pa.array(types[i % 4]),
                        pa.array((i % 1000) / 10.0, type=pa.float64()),
                    ],
                    names=["user_id", "event_type", "value"],
                )

    class SynthEvents(DataSource):
        @classmethod
        def name(cls):
            return "synthevents"

        def schema(self):
            return "user_id long, event_type string, value double"

        def reader(self, schema):
            return SynthReader(self.options)

    spark = prep(spark)
    spark.dataSource.register(SynthEvents)
    df = (
        spark.read.format("synthevents")
        .option("total", "100000")
        .option("numPartitions", "8")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
    )


@register(
    "src_range_sorted_scan",
    "sources",
    oracle=f"""
    SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
           count(*) AS n_events,
           {dsum_sql('value')} AS total_value
    FROM {_EV}
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13'
    GROUP BY 1
    """,
)
def range_sorted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered storage layout: events rewritten with
    ``repartitionByRange(ts)`` + ``sortWithinPartitions(ts)`` so each output
    file covers a disjoint time slice and each parquet row-group a narrow
    sub-slice.  A time-range query then (a) pushes the ts predicates to the
    reader (PushedFilters) and (b) skips whole files/row-groups via their
    min/max footer stats — at 100 TB this is the difference between
    scanning ~3/30 days and scanning everything, WITHOUT Hive partition
    directories (range files compose with any partition scheme and avoid
    the small-files explosion of fine-grained partitioning)."""
    base = fresh_scratch_dir("events_range_sorted", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(base)
    )
    back = spark.read.parquet(base).where(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-13")
    )
    return back.groupBy(
        F.unix_millis(F.date_trunc("day", "ts")).alias("day_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register(
    "src_zorder_clustered_scan",
    "sources",
    oracle=f"""
    SELECT user_id, count(*) AS n_events, {dsum_sql('value')} AS total_value
    FROM {_EV}
    WHERE user_id BETWEEN 100 AND 131
      AND ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-16'
    GROUP BY user_id
    """,
)
def zorder_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering for multi-dimensional data
    skipping: the write path interleaves the bits of two filter dimensions
    (user bucket, day-of-month) into a z-value, range-partitions and sorts
    by it, so files are locality-clustered in BOTH dimensions at once — a
    query filtering user AND time skips most files from footer min/max
    stats, where single-column sorting only helps one dimension.  The
    interleave is pure JVM bit arithmetic (shiftleft/bitwise-or loop over
    literal bit positions — no UDF); the same public technique as Delta
    Lake's OPTIMIZE ZORDER BY.  The z-value is layout-only: it never
    appears in query results, so the oracle is the plain two-predicate
    aggregate."""
    base = fresh_scratch_dir("events_zorder", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    u = F.col("user_id") % 1024  # 10 bits
    d = F.dayofmonth("ts").cast("long")  # 5 bits
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for bit in range(10):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(u, bit).bitwiseAND(one), 2 * bit))
        if bit < 5:
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(d, bit).bitwiseAND(one), 2 * bit + 1)
            )
    (
        ev.withColumn("_z", z)
        .repartitionByRange(8, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(base)
    )
    back = spark.read.parquet(base).where(
        F.col("user_id").between(100, 131)
        & (F.col("ts") >= "2024-01-08")
        & (F.col("ts") < "2024-01-16")
    )
    return back.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )


@register(
    "src_orc_roundtrip_scan",
    "sources",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
           {dsum_sql('l_extendedprice')} AS total_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def orc_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format: lineitem rewritten as ORC, re-read with a
    ship-date predicate and aggregated.  Spark's ORC reader has the same
    pushdown machinery as parquet (PushedFilters + min/max stripe-stat
    skipping + column pruning), so a format migration changes storage
    bytes, not query plans — the format-interchangeability guarantee a
    multi-tenant 100 TB lake needs.  The oracle reads the original parquet:
    matching results prove the roundtrip is lossless (types, timestamps,
    doubles) across formats."""
    base = fresh_scratch_dir("lineitem_orc", sf_dir)
    li = table(prep(spark), sf_dir, "lineitem")
    li.write.mode("overwrite").orc(base)
    back = spark.read.orc(base).where(F.col("l_shipdate") >= "1998-01-01")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
    )


@register(
    "src_json_roundtrip_scan",
    "sources",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           {dsum_sql('value')} AS total_value,
           min(epoch_ms(ts)) AS first_ms,
           max(epoch_ms(ts)) AS last_ms
    FROM {_EV}
    GROUP BY event_type
    """,
)
def json_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines roundtrip of the events table — the reference's native
    wire format (one JSON object per Kafka message, producer.py:21) as a
    *file* source: write newline-delimited JSON, re-read with an explicit
    StructType (never schema inference — SURVEY §1.3), aggregate, match
    the parquet oracle bit-for-bit.  Timestamps travel as epoch-ms longs
    exactly like the reference wire schema (created_ts, producer.py:40),
    which sidesteps JSON's timezone-ambiguous timestamp strings; doubles
    survive because Jackson emits shortest-roundtrip literals.  At 100 TB
    JSON is the ingest edge, not the storage format — this query is the
    bridge that proves JSON-in equals parquet-in."""
    base = fresh_scratch_dir("events_json", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    (
        ev.select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .json(base)
    )
    back = spark.read.schema(
        "event_id bigint, ts_ms bigint, user_id bigint, "
        "event_type string, value double, props string"
    ).json(base)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
        F.min("ts_ms").alias("first_ms"),
        F.max("ts_ms").alias("last_ms"),
    )


@register(
    "src_parquet_zstd_roundtrip",
    "sources",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS n_orders,
           {dsum_sql('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def parquet_zstd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec roundtrip: orders rewritten as zstd parquet (the
    de-facto 100 TB lake codec — ~30% smaller than the snappy default at
    comparable scan speed), re-read with an order-date predicate and
    aggregated.  Codec choice must change storage bytes only: pushdown,
    row-group stat skipping, and every value survive identically, which
    the oracle proves by reading the ORIGINAL snappy parquet.  The date
    filter still prunes on row-group min/max — compression wraps pages,
    not the stats metadata."""
    base = fresh_scratch_dir("orders_zstd", sf_dir)
    o = table(prep(spark), sf_dir, "orders")
    o.write.mode("overwrite").option("compression", "zstd").parquet(base)
    back = spark.read.parquet(base).where(F.col("o_orderdate") >= "1997-01-01")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "src_xml_roundtrip_scan",
    "sources",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           {dsum_sql('value')} AS total_value,
           min(epoch_ms(ts)) AS first_ms,
           max(epoch_ms(ts)) AS last_ms
    FROM {_EV}
    GROUP BY event_type
    """,
)
def xml_roundtrip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML roundtrip of the events table via Spark 4's NATIVE xml data
    source (built in since 4.0 — no spark-xml package): write one
    ``<event>`` element per row, re-read with an explicit schema (never
    inference), aggregate, match the parquet oracle bit-for-bit.  The
    format-fidelity contract mirrors ``src_json_roundtrip_scan``:
    timestamps travel as epoch-ms longs (XML has no timestamp type),
    doubles survive because the writer emits shortest-roundtrip literals
    (verified: 0/10k mismatches at sf0.01), and the reader unescapes the
    JSON-in-``props`` strings' special characters exactly.  At 100 TB
    XML is a legacy-feed ingest edge (SOAP exports, sitemap/feed dumps);
    this query proves XML-in equals parquet-in so such feeds can join
    the corpus without a bespoke parser.  The read is parallel per file
    like every splittable source here; ``from_xml`` over a column
    (``scalar_xml_parse``) covers the embedded-XML case."""
    base = fresh_scratch_dir("events_xml", sf_dir)
    ev = table(prep(spark), sf_dir, "events")
    (
        ev.select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "event")
        .save(base)
    )
    back = (
        spark.read.schema(
            "event_id bigint, ts_ms bigint, user_id bigint, "
            "event_type string, value double, props string"
        )
        .format("xml")
        .option("rowTag", "event")
        .load(base)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
        F.min("ts_ms").alias("first_ms"),
        F.max("ts_ms").alias("last_ms"),
    )
