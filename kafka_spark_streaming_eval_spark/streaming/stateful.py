"""Custom stateful streaming operator: ``applyInPandasWithState``.

The reference's only streaming state is the checkpoint WAL (offset tracking,
spark_stream_metrics.py:81); it has no user-level state.  This module adds
the engine's arbitrary-stateful extension point — a per-key running counter
maintained across micro-batches — the building block for sessionization,
per-user rate limiting, and incremental dedup at 100 TB.

Scale shape: state lives in the executor state store partitioned by group
key (hash shuffle on ``user_id``), checkpointed incrementally; each
micro-batch touches only the keys present in that batch.  The Python kernel
receives one group's batch rows as Arrow-backed pandas frames — vectorized,
no per-row boundary crossing.

Correctness: the query runs a deterministic multi-batch file stream
(``maxFilesPerTrigger=2`` over a fixed 4-file layout), and the final state
per key must equal the batch answer ``count(*) GROUP BY user_id`` — which is
exactly the DuckDB oracle.  Emitted counts are monotone per key, so
``max`` over the update-mode emissions recovers the final state.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import fresh_scratch_dir, prep

_sink_counter = itertools.count()


def running_count_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming per-user running event count over a parquet file stream,
    two files per micro-batch (2 batches over the fixed 4-file layout),
    state carried across batches.

    Batch sizing is a measured micro-batch-overhead decision (guide §2.6 /
    r15): per-batch planning + state commit cost ~1.1 s each at sf0.1
    while the per-batch work is tiny — 4 batches 4.7 s vs 2 batches 2.5 s,
    identical final state.  Two batches keep the cross-batch state
    accumulation this exhibit exists to prove (every user appears in both,
    so state is genuinely read-modify-written across a batch boundary);
    state partitioning stays at ``_state_parts`` (1 partition measured
    WORSE, 8.6 s: the per-group Python kernels then serialize)."""

    def update_count(key, pdfs, state):
        import pandas as pd

        (total,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [total]})

    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        update_count,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_stateful_running_count",
    "streaming",
    oracle="""
    SELECT user_id, count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_running_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandasWithState`` end-to-end: 2 deterministic micro-batches
    (4 staged files, 2 per trigger), per-user counter state carried across
    them; the final state (max of the monotone update emissions) must equal
    the batch ``count(*)`` — proving exactly-once state accumulation across
    batch boundaries."""
    spark = prep(spark)
    # fresh_scratch_dir + a call-unique sink name: the staged source must
    # never be rmtree'd/overwritten under a live lazily-scanned plan, and a
    # second concurrent call must not collide on the memory-sink queryName
    # (the same hardening applied to every stream_*/src_* staging site).
    base = fresh_scratch_dir("stateful_src", sf_dir)
    ev = table(spark, sf_dir, "events").select("user_id", "event_id")
    ev.repartition(4).write.mode("overwrite").parquet(base)
    from kafka_spark_streaming_eval_spark.streaming.queries import _table_rows

    ev_rows = _table_rows(sf_dir, "events")

    name = f"stateful_out_{next(_sink_counter)}"
    # Size state partitioning to the replayed input, not the session default
    # (see streaming.queries.STATE_ROWS_PER_PART: 32 near-empty stores paid
    # a per-batch load/commit/fsync cycle each, x4 batches here).  The
    # sizing lives on an ISOLATED session (ADVICE r14: the set/run/restore
    # on the shared session leaked to concurrently planned queries).
    from kafka_spark_streaming_eval_spark.streaming.queries import _stream_session

    iso = _stream_session(spark, ev_rows)
    q = (
        running_count_stream(iso, base)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    emitted = iso.table(name)
    return emitted.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
