"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md / FIXTURES.md §4): ``region nation customer supplier part
orders lineitem events documents embeddings`` — one parquet file per table
under ``{sf_dir}/``.

Scale note: on a production cluster these would be directories of many
parquet files (optionally partitioned, e.g. ``events`` by day); every reader
here goes through ``spark.read.parquet`` so partition discovery, predicate
pushdown and column pruning apply unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def events_long_ts_divisor(path: str) -> int:
    """Epoch-unit divisor (to ms) for a long-encoded ``ts`` column, detected
    from parquet column statistics — metadata only, no data scan.

    The testdata generator has already changed the ``ts`` encoding once
    between driver rounds; if a future vintage stores epoch ms or us as a
    plain long, a hard-coded nanosecond divide would silently corrupt every
    events query.  Magnitude disambiguates exactly (epoch-s ~1.7e9,
    -ms ~1.7e12, -us ~1.7e15, -ns ~1.7e18 for 2020s dates).

    Returns a positive divisor to ms, or a NEGATIVE value whose magnitude
    is a multiplier to ms (epoch-seconds vintage).
    """
    divisor = 1_000_000  # nanos: the only long vintage observed so far
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        cols = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        stats = meta.row_group(0).column(cols["ts"]).statistics
        mx = stats.max if stats is not None else None
        if isinstance(mx, int):
            if 0 < mx < 100_000_000_000:
                # Below ~year 5138 in epoch-ms means the values can only be
                # epoch-SECONDS (~1.7e9 for 2020s dates).  A divisor of 1
                # here would silently read seconds as ms and collapse every
                # date to 1970 — the exact bug this function exists to stop.
                # Negative return = multiplier to ms (see events_ts_ms).
                divisor = -1000
            else:
                divisor = 1
                while mx // divisor > 4_000_000_000_000:  # > ~2096 in epoch-ms
                    divisor *= 1000
    except Exception:
        pass  # stats unavailable -> keep the observed-vintage default
    return divisor


def events_ts_ms(df: DataFrame, long_divisor: int = 1_000_000) -> DataFrame:
    """Normalize ``events.ts`` to a ms-truncated TIMESTAMP (UTC instant).

    The testdata generator has stored ``ts`` two ways across rounds:
    TIMESTAMP(NANOS), which Spark cannot represent and reads as a
    nanosecond long under ``legacy.parquet.nanosAsLong``, and plain
    timestamp[us], which scans as TIMESTAMP_NTZ.  Both normalize to the
    same ms-truncated TIMESTAMP column, so every downstream query and its
    DuckDB oracle (``date_trunc('milliseconds', ts)``) agree bit-for-bit
    whichever file vintage is on disk.  ``long_divisor`` (from
    ``events_long_ts_divisor``) maps a long-encoded ts to epoch-ms.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):  # epoch-long vintage
        if long_divisor < 0:  # epoch-seconds: negative = multiplier to ms
            ts_ms = F.timestamp_millis(F.expr(f"ts * {-int(long_divisor)}"))
        else:
            ts_ms = F.timestamp_millis(F.expr(f"ts div {int(long_divisor)}"))
    else:  # timestamp[us] vintage -> TIMESTAMP_NTZ scan (session tz is UTC)
        ts_ms = F.timestamp_millis(F.expr("unix_micros(cast(ts as timestamp)) div 1000"))
    return df.withColumn("ts", ts_ms)


# Tables whose consumers do compute-heavy per-row map work (tokenization,
# 12x md5 minhashing, per-dimension vector arithmetic) straight off the
# scan, and the key that spreads them deterministically.  These scans are
# spread to session parallelism when the file layout cannot feed the cores
# (see session.spread_small_scan — a no-op on real multi-split inputs).
# lineitem/orders are deliberately NOT spread: the relational queries'
# scan-side work is light, and an explicit repartition node hides the
# scan-size statistics that let the planner auto-broadcast the dimension
# side — measured r14: join_star_revenue 0.93 s -> 3.79 s, tpch_q1
# 0.28 s -> 0.99 s with lineitem/orders in this map (SMJ replacing BHJ).
_SPREAD_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is truncated to millisecond precision; oracle SQL mirrors
    this with ``date_trunc('milliseconds', ts)`` so both engines compare
    equal bits (see ``events_ts_ms``).

    ``documents`` / ``embeddings`` are spread to session parallelism when
    the scan is under-split (optimization guide §2.5 input skew: the local
    testdata is one single-row-group parquet file per table, so the scan —
    and every tokenizing/hashing map stage above it — would otherwise run
    as ONE task; measured r14: minhash signatures 2.72 s -> 0.64 s on
    local[32], bit-identical output).  On production multi-split inputs
    the spread never fires.

    ``spread=False`` opts a consumer out (VERDICT r14 item 2: queries whose
    scan-side map work is cheap — a bare explode/posexplode straight into
    the first aggregation — pay more for the extra full-payload exchange +
    32-task stage than the single-core map costs; each opt-out call site
    cites its own A/B numbers).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        path = f"{sf_dir}/{name}.parquet"
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return events_ts_ms(
            spark.read.parquet(path), long_divisor=events_long_ts_divisor(path)
        )
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    key = _SPREAD_KEYS.get(name)
    if key is not None and spread:
        from kafka_spark_streaming_eval_spark.session import spread_small_scan

        df = spread_small_scan(df, key, scan_parts=_scan_parts(df, path))
    return df


# (path, mtime_ns, size, split conf) -> planned scan partition count.  The
# probe costs ~45 ms of physical planning per call (df.rdd), and table()
# runs several times per query build; the layout of a given file cannot
# change without its (mtime, size) changing.  The planner's split count
# ALSO depends on session conf (ADVICE r14: maxPartitionBytes and the
# parallelism-derived openCost packing), so those ride the key — a value
# cached under one session's conf can't leak into a session planned
# differently in the same process.
_SCAN_PARTS_CACHE: dict[tuple, int] = {}


def _scan_parts(df: DataFrame, path: str) -> int:
    import os

    st = os.stat(path)
    sess = df.sparkSession
    try:
        conf_key = (
            sess.conf.get("spark.sql.files.maxPartitionBytes", ""),
            sess.conf.get("spark.sql.files.openCostInBytes", ""),
            sess.sparkContext.defaultParallelism,
        )
    except Exception:
        conf_key = ()
    k = (path, st.st_mtime_ns, st.st_size, conf_key)
    n = _SCAN_PARTS_CACHE.get(k)
    if n is None:
        n = _SCAN_PARTS_CACHE[k] = df.rdd.getNumPartitions()
    return n


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
