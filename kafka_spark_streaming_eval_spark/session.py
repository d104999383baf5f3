"""SparkSession factory.

Local test profile runs ``local[N]`` (one JVM); the same settings scale to a
real cluster because everything here is declarative: AQE re-plans at runtime
(partition coalescing, skew-join splitting), shuffle partitions are sized to
the parallelism at hand, and Arrow is enabled for any pandas exchange.
"""

from __future__ import annotations

import itertools
import os
import threading

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kafka_spark_streaming_eval_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores.  On a real
    cluster the ``master`` line is dropped and the same configs apply.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Shuffle sizing must be scale-adaptive, not static: AQE coalesces
        # DOWN from the initial partition count but never grows it, so a
        # static count right for sf0.1 starves large shuffles (measured at
        # 100x sf0.1: text_contamination_matrix 166.9 s at 32 initial
        # partitions vs 95.5 s at 256 — the 32-part shuffle task crosses
        # the spill point; SCALE.md round-7).  8x parallelism initial,
        # AQE-coalesced down for small inputs, is the standard rule.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(8 * cpus),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_SCRATCH_SWEPT = False


def _sweep_dead_scratch() -> None:
    """Remove /tmp/sgraft_<pid>_* dirs left by processes that no longer
    exist.  scratch paths embed the creating PID (concurrent-process
    isolation), so without this sweep every driver round leaks its staged
    datasets — repeated rounds would grow /tmp without bound."""
    import glob
    import re
    import shutil

    for d in glob.glob("/tmp/sgraft_*_*"):
        m = re.match(r"sgraft_(\d+)_", os.path.basename(d))
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)  # raises if the pid is gone
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it


def scratch_dir(tag: str, *keys: str) -> str:
    """Deterministic per-process scratch path under /tmp.

    Keyed on the caller's tag + content keys + this PID: re-runs inside one
    process hit (and clean) the same path, while concurrent processes over
    the same dataset never collide on staged writes.  First use sweeps
    dead processes' leftovers so repeated rounds don't leak disk.
    """
    import hashlib

    global _SCRATCH_SWEPT
    if not _SCRATCH_SWEPT:
        _SCRATCH_SWEPT = True
        _sweep_dead_scratch()
    digest = hashlib.md5("|".join(keys).encode()).hexdigest()[:12]
    return f"/tmp/sgraft_{os.getpid()}_{tag}_{digest}"


_FRESH_SCRATCH = itertools.count()
_FRESH_HISTORY: dict[str, list[str]] = {}
_FRESH_RETAIN = 4
_FRESH_LOCK = threading.Lock()
# Diagnostic ledger of recently reclaimed scratch dirs: when a lazy scan
# fails on a missing path, check membership here first (bounded to 64).
_RECLAIMED: list[str] = []


def fresh_scratch_dir(tag: str, *keys: str) -> str:
    """A never-reused scratch path: ``scratch_dir`` plus a process-unique
    call counter.

    Write-then-read queries MUST use this instead of rmtree-ing a shared
    ``scratch_dir`` path: the DataFrame they return scans its staging dir
    LAZILY (the driver collects it after the query function returns), so
    deleting/overwriting a shared path on a later call would yank files out
    from under a not-yet-collected plan — a race under concurrent execution
    and a correctness bug even sequentially whenever two plans over the same
    staging dir are alive at once.  Fresh paths are still PID-prefixed, so
    ``_sweep_dead_scratch`` reclaims them once the process exits.

    In-process retention is BOUNDED: only the newest ``_FRESH_RETAIN``
    paths per (tag, keys) survive — minting one more deletes the oldest,
    so a long-lived process re-running queries (REPL loop, repeated bench)
    does not grow /tmp without bound.  The liveness contract — a returned
    dir stays valid until ``_FRESH_RETAIN`` further same-(tag, keys) calls
    — covers the driver's collect-before-next-query sequencing, bench's
    call-twice timing, and the concurrent-pair hardening tests with slack.
    """
    path = scratch_dir(tag, *keys, f"call{next(_FRESH_SCRATCH)}")
    with _FRESH_LOCK:
        hist = _FRESH_HISTORY.setdefault(f"{tag}|{'|'.join(keys)}", [])
        hist.append(path)
        stale = hist[:-_FRESH_RETAIN]
        del hist[:-_FRESH_RETAIN]
    for d in stale:
        import shutil

        # The retention contract is documented but otherwise unenforceable:
        # a caller still holding a DataFrame over a reclaimed dir would only
        # see a confusing lazy-scan failure later.  Record every reclaim so
        # that failure is diagnosable (``_RECLAIMED`` keeps the most recent
        # paths), and warn only under the explicit debug opt-in — at normal
        # test/bench cadence reclaim is routine bounded-retention behavior,
        # not a suspect event, and an unconditional RuntimeWarning was the
        # suite's only warning noise (VERDICT r7 item 6).
        msg = (
            f"fresh_scratch_dir reclaiming {d} (>{_FRESH_RETAIN} newer "
            f"same-key calls for tag {tag!r}); any DataFrame still scanning "
            "it will fail at collect time"
        )
        _RECLAIMED.append(d)
        del _RECLAIMED[:-64]
        if os.environ.get("SPARK_GRAFT_WARN_RECLAIM") == "1":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        shutil.rmtree(d, ignore_errors=True)
    return path


def spread_small_scan(df, *keys: str, parts: int | None = None, scan_parts: int | None = None):
    """Hash-repartition an unsplittable small scan to session parallelism
    before compute-heavy per-row work (optimization guide §2.5, input skew:
    "one huge unsplittable file ... repartition immediately after the
    read").  The testdata tables are single-row-group parquet files, so
    every scan plans as ONE partition and all map-side work until the first
    exchange — tokenization, 12x md5 minhashing, bigram hashing — runs on a
    single core (r14 A/B at sf0.1: minhash signatures 2.72 s -> 0.64 s,
    LSH pairs 3.06 s -> 0.96 s on local[32], identical output).

    Scale posture: a NO-OP whenever the scan already carries at least
    ``parts`` (default: defaultParallelism) partitions, which is every real
    100 TB table — the repartition only fires for inputs so small or so
    badly laid out that the scan cannot feed the cluster.  The repartition
    is KEYED (deterministic row->partition placement, retry-safe, no
    sort-before-repartition pass) and the count is pinned explicitly so
    AQE's byte-based coalescing cannot fold a tiny-bytes/heavy-CPU stage
    back to one task.
    """
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    if (scan_parts if scan_parts is not None else df.rdd.getNumPartitions()) >= n:
        return df
    return df.repartition(n, *keys) if keys else df.repartition(n)


def prep(spark: SparkSession) -> SparkSession:
    """Normalize a session we did not create (e.g. the driver's).

    Timestamps in the testdata parquet are timezone-naive; DuckDB (the
    correctness oracle) treats them as UTC-naive.  Pinning the session
    timezone to UTC makes ``unix_millis``/``date_trunc`` agree bit-for-bit
    with the oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Scale-adaptive shuffle sizing (see get_spark): AQE can only coalesce
    # down from the initial count, so seed it at 8x the session's
    # parallelism; small inputs coalesce back, large shuffles stop
    # spilling.  Results are partition-invariant (decimal-quantized sums,
    # md5-derived ordering), so this is purely physical.
    try:
        parallelism = spark.sparkContext.defaultParallelism or 8
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(max(8 * parallelism, 64)),
        )
    except Exception:
        pass  # a session we cannot introspect keeps its own sizing
    return spark


def iter_checkpoint(df, eager: bool = True):
    """Lineage-truncation point shared by every iterative operator
    (pagerank, BFS, triangle/link-prediction edge builds, dedup
    connected-components, DSIR's feature table).

    Default: ``DataFrame.localCheckpoint`` — blocks live on the executors
    that computed them, which is the right call on the single-node probe
    topology (no filesystem round-trip) and keeps the plan-audit trunc spy
    working unchanged.

    ``SPARK_GRAFT_CHECKPOINT_DIR=<path>`` switches every call site to
    RELIABLE ``DataFrame.checkpoint`` into that directory (set once per
    SparkContext).  The difference is not stylistic: localCheckpoint
    blocks DIE with their executor, so on a multi-node cluster an executor
    loss mid-iteration turns into job failure instead of the transparent
    stage retry the non-iterative paths get (measured both ways on
    local-cluster[2,8,*]: `results/executor_loss_r11.json` shows exact
    recovery for the shuffle path; `results/executor_loss_ckpt_ab_r11.json`
    the A/B for this helper).  A 1000-executor 100 TB run should point
    this at durable shared storage (HDFS/S3); the env knob keeps the
    default probe ladder byte-identical while making the reliable path a
    one-variable switch.
    """
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
