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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (lazy parquet scan).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark cannot
    represent (micro precision max); it is read as a nanosecond long and
    truncated to millisecond precision.  Oracle SQL mirrors this with
    ``date_trunc('milliseconds', ts)`` so both engines compare equal bits.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_millis(F.expr("ts div 1000000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
