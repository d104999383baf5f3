"""ETL / warehouse-maintenance operators (north-star surface).

The reference repo is an ingest-and-measure pipeline; a usable analytics
engine also needs the table-maintenance shapes every warehouse runs daily:
MERGE-style upsert of a changeset into a snapshot, and SCD Type-2 history
construction.  Neither requires a lakehouse format — both are expressed as
single-shuffle declarative plans over plain parquet, which is exactly what
Delta/Iceberg MERGE compiles down to underneath (full-outer join on the
merge key + per-row CASE).

Scale notes (100 TB):
- The upsert joins snapshot and changeset on the merge key: one hash
  shuffle each side, no row explosion (changeset is pre-aggregated to one
  row per key).  With bucketed snapshot storage the snapshot-side shuffle
  disappears (see src_bucketed_colocated_join).
- SCD2 is one window pass per user partition — state never leaves the
  executor, and the partition key (user) is uniform.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.functions.numeric import dsum, dsum_sql
from kafka_spark_streaming_eval_spark.operators.metrics import _EV
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import fresh_scratch_dir, prep


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return table(spark, sf_dir, name)


# Far above any snapshot key at any scale factor: synthetic insert keys.
_INSERT_KEY_OFFSET = 10_000_000

MAX_TS_MS = 9_223_372_036_854_775_807  # open-ended validity sentinel


@register(
    "etl_merge_upsert",
    "etl",
    oracle=f"""
    WITH chg AS (
      SELECT o_custkey AS k, {dsum_sql('o_totalprice')} AS spent, count(*) AS n
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY o_custkey
    ),
    changeset AS (
      SELECT k, CASE WHEN n >= 4 THEN 'D' ELSE 'U' END AS op, spent FROM chg
      UNION ALL
      SELECT k + {_INSERT_KEY_OFFSET}, 'I', spent FROM chg
    )
    SELECT coalesce(c.c_custkey, g.k) AS custkey,
           CASE WHEN g.op = 'I' THEN 'NEW CUSTOMER' ELSE c.c_name END AS name,
           CASE WHEN g.op = 'U' THEN c.c_acctbal + g.spent
                WHEN g.op = 'I' THEN g.spent
                ELSE c.c_acctbal END AS acctbal,
           CASE WHEN g.op = 'U' THEN 'updated'
                WHEN g.op = 'I' THEN 'inserted'
                ELSE 'kept' END AS status
    FROM customer c FULL OUTER JOIN changeset g ON c.c_custkey = g.k
    WHERE g.op IS NULL OR g.op <> 'D'
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics without a lakehouse: apply a mixed
    update/delete/insert changeset to the customer snapshot in one
    declarative plan — full-outer join on the merge key, then per-row CASE
    (matched+U → update, matched+D → drop, unmatched change → insert,
    untouched snapshot rows pass through).  The changeset is derived
    deterministically from 1997 order activity; updates add exact-decimal
    spend to the account balance (double + double of identical operands →
    bit-equal cross-engine).  This is the plan Delta/Iceberg MERGE executes
    underneath, so its scale behavior — one shuffle per side, no row
    explosion — carries over verbatim."""
    c = _t(spark, sf_dir, "customer")
    chg = (
        _t(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(dsum("o_totalprice").alias("spent"), F.count(F.lit(1)).alias("n"))
    )
    # One chg row fans out to its U/D row AND its synthetic insert row via
    # explode — a UNION of two selects over chg would re-execute the orders
    # aggregation (and re-scan orders) once per branch.
    changeset = chg.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("k"),
                    F.when(F.col("n") >= 4, F.lit("D")).otherwise(F.lit("U")).alias("op"),
                    F.col("spent"),
                ),
                F.struct(
                    (F.col("k") + _INSERT_KEY_OFFSET).alias("k"),
                    F.lit("I").alias("op"),
                    F.col("spent"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    merged = c.join(changeset, c.c_custkey == changeset.k, "full")
    return merged.where(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce("c_custkey", "k").alias("custkey"),
        F.when(F.col("op") == "I", F.lit("NEW CUSTOMER"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("op") == "U", F.col("c_acctbal") + F.col("spent"))
        .when(F.col("op") == "I", F.col("spent"))
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
        F.when(F.col("op") == "U", F.lit("updated"))
        .when(F.col("op") == "I", F.lit("inserted"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


@register(
    "etl_scd2_intervals",
    "etl",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type, event_id, epoch_ms(ts) AS ts_ms,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_ms(ts), event_id) AS prev_type
      FROM {_EV}
    ),
    changes AS (
      SELECT user_id, event_type, event_id, ts_ms FROM seq
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type AS state, ts_ms AS valid_from,
           coalesce(lead(ts_ms) OVER w, {MAX_TS_MS}) AS valid_to,
           (lead(ts_ms) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    """,
)
def etl_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build: collapse each user's event stream into
    validity intervals [valid_from, valid_to) that change whenever the
    observed state (event_type) changes; the last interval is open-ended
    (sentinel max-int64) and flagged current.  Two window passes over the
    same user_id partitioning — Catalyst reuses one shuffle + sort for
    both (lag to find change points, lead to close intervals).  event_id
    is the tie-breaker making the order total, so ms-duplicate timestamps
    can't flip interval boundaries between runs or engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_millis("ts").alias("ts_ms")
    )
    w_seq = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_seq))
        .where(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .drop("prev_type")
    )
    nxt = F.lead("ts_ms").over(w_seq)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_ms").alias("valid_from"),
        F.coalesce(nxt, F.lit(MAX_TS_MS)).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "etl_compaction_binpack",
    "etl",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           {dsum_sql('l_extendedprice')} AS total_price,
           {dsum_sql('l_quantity')} AS total_qty,
           count(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def etl_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance job every streaming sink
    needs: a fragmented table (48 tiny parquet files, the shape a
    per-trigger micro-batch sink leaves behind) is rewritten into a few
    right-sized files via a shuffle-free ``coalesce``.  The audit
    aggregate runs over the COMPACTED copy and must match the oracle over
    the original table — compaction is proven content-lossless, not just
    file-count-smaller (the file-count reduction itself is asserted in
    tests/test_plans.py).  At 100 TB this is the OPTIMIZE/bin-packing
    pass: coalesce plans one task per output file reading whole input
    files, no shuffle, no sort, so it scales with output size."""
    li = _t(spark, sf_dir, "lineitem")
    frag = fresh_scratch_dir("li_frag", sf_dir)
    compact = fresh_scratch_dir("li_compact", sf_dir)
    li.repartition(48).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    back = spark.read.parquet(compact)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
        dsum("l_quantity").alias("total_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "etl_partition_overwrite_dynamic",
    "etl",
    oracle="""
    WITH patched AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'F'
                  THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM patched
    GROUP BY o_orderstatus
    """,
)
def etl_partition_overwrite_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the daily-reprocess primitive: a
    status-partitioned orders table gets ONE partition ('F') rewritten
    (prices uplifted 10%) with ``partitionOverwriteMode=dynamic``, which
    replaces exactly the partitions present in the incoming write and
    leaves the rest untouched on disk.  The readback aggregate must show
    patched 'F' rows and pristine 'O'/'P' rows — proving the overwrite
    touched only its partition (static mode would have truncated the whole
    table).  At 100 TB this is how backfills work: rewrite day=2026-08-12,
    never scan or move the other ~3650 partitions."""
    base = fresh_scratch_dir("orders_dynpart", sf_dir)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
    patched = (
        o.where(F.col("o_orderstatus") == "F")
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    prev_mode = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        patched.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
    finally:
        spark.conf.set(mode_key, prev_mode)
    back = spark.read.parquet(base)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total"),
    )


@register(
    "etl_snapshot_diff",
    "etl",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
    ),
    v2 AS (  -- deterministic synthetic next snapshot:
      --   drop keys % 97 == 0, re-price keys % 11 == 0, append key+5e9 clones
      SELECT o_orderkey,
             o_orderstatus,
             CASE WHEN o_orderkey % 11 = 0
                  THEN round(o_totalprice * 1.05, 2) ELSE o_totalprice END
               AS o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 5000000000, o_orderstatus, o_totalprice,
             o_orderpriority
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    h1 AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus, CAST(o_totalprice AS VARCHAR),
                           o_orderpriority)) AS h
      FROM v1
    ),
    h2 AS (
      SELECT o_orderkey AS k,
             md5(concat_ws('|', o_orderstatus, CAST(o_totalprice AS VARCHAR),
                           o_orderpriority)) AS h
      FROM v2
    ),
    tagged AS (
      SELECT CASE WHEN h1.k IS NULL THEN 'added'
                  WHEN h2.k IS NULL THEN 'deleted'
                  WHEN h1.h <> h2.h THEN 'changed'
                  ELSE 'unchanged' END AS change
      FROM h1 FULL OUTER JOIN h2 ON h1.k = h2.k
    )
    SELECT change, count(*) AS n_rows FROM tagged GROUP BY change
    """,
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the added/deleted/changed/unchanged audit between two
    versions of a table, the check a pipeline runs before promoting a new
    dataset version.  The next snapshot is synthesized deterministically
    (drop every 97th key, re-price every 11th, clone every 13th under a new
    key) so both engines diff identical inputs.

    Scale shape: each side collapses to (key, md5(row-content)) FIRST — the
    full-outer join then moves 16-byte hashes, not rows, and row-content
    comparison is one string equality.  The cast-to-VARCHAR of the price is
    locale-free in both engines (DuckDB and Spark print DECIMAL(15,2)
    identically), and the diff itself is the one unavoidable co-shuffle on
    the key."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    v2 = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 11 == 0,
                F.round(F.col("o_totalprice") * 1.05, 2),
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 13 == 0).select(
                (F.col("o_orderkey") + 5000000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
                "o_orderpriority",
            )
        )
    )

    def hashed(df):
        return df.select(
            F.col("o_orderkey").alias("k"),
            F.md5(
                F.concat_ws(
                    "|",
                    "o_orderstatus",
                    F.col("o_totalprice").cast("string"),
                    "o_orderpriority",
                )
            ).alias("h"),
        )

    h1, h2 = hashed(o).alias("h1"), hashed(v2).alias("h2")
    tagged = h1.join(h2, F.col("h1.k") == F.col("h2.k"), "full_outer").select(
        F.when(F.col("h1.k").isNull(), F.lit("added"))
        .when(F.col("h2.k").isNull(), F.lit("deleted"))
        .when(F.col("h1.h") != F.col("h2.h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change")
    )
    return tagged.groupBy("change").agg(F.count(F.lit(1)).alias("n_rows"))


# ---------------------------------------------------------------------------
# Referential-integrity audit
# ---------------------------------------------------------------------------


@register(
    "etl_referential_audit",
    "etl",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           (SELECT count(*) FROM lineitem) AS n_child_rows,
           (SELECT count(*) FROM lineitem l
            ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
            ANTI JOIN customer c ON o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            ANTI JOIN nation n ON c.c_nationkey = n.n_nationkey)
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            ANTI JOIN nation n ON s.s_nationkey = n.n_nationkey)
    """,
)
def etl_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key conformance audit: orphan counts for every declared
    parent-child relationship, one row per FK — the gate a warehouse runs
    before publishing a partition (an orphaned fact row silently vanishes
    from every inner join downstream, which is far worse than failing
    loudly here).

    Plan shape: each FK is a left-anti join + count.  The dimension-parent
    checks broadcast (nation); the fact-fact check (lineitem->orders)
    shuffles on the key like any equi-join and benefits from the same
    bucketing as the production joins.  At 100 TB you run this
    incrementally per ingested partition, not over history — the plan is
    unchanged, only the scan narrows."""
    prep(spark)
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")

    def audit(label, child, parent, cond):
        orphans = child.join(parent, cond, "left_anti")
        return child.agg(F.count(F.lit(1)).alias("n_child_rows")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(F.lit(label).alias("fk"), "n_child_rows", "n_orphans")

    return (
        audit("lineitem.l_orderkey -> orders", li, o, li.l_orderkey == o.o_orderkey)
        .unionByName(
            audit("orders.o_custkey -> customer", o, c, o.o_custkey == c.c_custkey)
        )
        .unionByName(
            audit(
                "customer.c_nationkey -> nation", c, n,
                c.c_nationkey == n.n_nationkey,
            )
        )
        .unionByName(
            audit(
                "supplier.s_nationkey -> nation", s, n,
                s.s_nationkey == n.n_nationkey,
            )
        )
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten deletion audit
# ---------------------------------------------------------------------------


@register(
    "etl_forget_users_audit",
    "etl",
    oracle="""
    WITH forget AS (
      SELECT DISTINCT user_id FROM events
      WHERE substr(md5(CAST(user_id AS VARCHAR)), 1, 1) = '0'
    )
    SELECT e.event_type,
           count(*) AS n_rows,
           count(*) FILTER (WHERE f.user_id IS NOT NULL) AS n_deleted,
           count(*) FILTER (WHERE f.user_id IS NULL) AS n_retained,
           count(DISTINCT e.user_id) FILTER (WHERE f.user_id IS NOT NULL)
             AS n_forgotten_users
    FROM events e LEFT JOIN forget f ON e.user_id = f.user_id
    GROUP BY e.event_type
    """,
)
def etl_forget_users_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten deletion audit: given a deletion list (here a
    deterministic md5 slice of users standing in for the request queue),
    report per event type how many rows the purge removes vs retains and
    how many distinct users disappear — the compliance accounting every
    data-retention pipeline emits alongside the actual delete.  The delete
    itself is the same broadcast anti-join (`events LEFT ANTI JOIN
    forget`); auditing with a left join + conditional counts costs one
    scan and shows both sides at once.

    Scale: the deletion list is tiny relative to the corpus — broadcast;
    the fact side stays map-only into the final 5-group aggregation.  At
    100 TB the purge runs per-partition with dynamic overwrite
    (`etl_partition_overwrite_dynamic` is the write half)."""
    prep(spark)
    ev = table(spark, sf_dir, "events")
    forget = (
        ev.select("user_id")
        .distinct()
        .where(F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) == "0")
    )
    f = forget.select(F.col("user_id").alias("f_user"))
    joined = ev.join(F.broadcast(f), ev.user_id == f.f_user, "left")
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("f_user").isNotNull()).alias("n_deleted"),
        F.count_if(F.col("f_user").isNull()).alias("n_retained"),
        F.count_distinct(
            F.when(F.col("f_user").isNotNull(), F.col("user_id"))
        ).alias("n_forgotten_users"),
    )
