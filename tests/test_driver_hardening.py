"""Driver-process fragility stress (VERDICT r4 items 2-3): the grading
driver runs registry queries in ITS process — unknown cwd, unknown tempdir
discipline, possibly interleaved or parallel execution over one shared
SparkSession.  These tests reproduce those conditions for the two blocks
that touch the local filesystem:

- ``stream_*`` queries build their own micro-batch scaffolding (staged
  source dirs, checkpoints, availableNow drains) — two of them running
  CONCURRENTLY on one session must not race each other's staging or state.
- ``src_*`` storage-layout queries write-then-read scratch datasets — a
  second invocation must never corrupt the lazily-evaluated plan a prior
  invocation returned (the fresh_scratch_dir contract), sequentially or in
  parallel.
"""

from __future__ import annotations

import concurrent.futures as cf

import pytest

from kafka_spark_streaming_eval_spark.plans.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

SPECS = all_queries()


@pytest.mark.parametrize(
    "pair",
    [
        # both stage the same stream_src events dir -> staging-cache race
        ("stream_tumbling_counts", "stream_sliding_throughput"),
        # stateful join + foreachBatch merge: two live streaming queries
        # with separate checkpoints/state sharing one session
        ("stream_stream_interval_join", "stream_foreachbatch_merge_upsert"),
        # sentinel-staged left-outer alongside a plain windowed agg
        ("stream_stream_left_outer_join", "stream_dedup_within_watermark"),
    ],
    ids=lambda p: f"{p[0]}+{p[1]}",
)
def test_concurrent_stream_queries_share_session(spark, ducks, pair):
    """Two streaming queries run in parallel threads on ONE SparkSession;
    each must still hash-match its oracle.  Flushes staging-dir TOCTOU
    (symlink/_READY), memory-sink name collisions, and shared-conf races
    before the driver can hit them."""
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        futs = {n: pool.submit(SPECS[n].fn, spark, SF_DIR) for n in pair}
        dfs = {n: f.result(timeout=300) for n, f in futs.items()}
    for n, df in dfs.items():
        assert_matches_oracle(df, ducks, SPECS[n].oracle, n)


@pytest.mark.parametrize(
    "name",
    ["src_partition_pruned_scan", "src_bucketed_colocated_join"],
)
def test_concurrent_same_src_query(spark, ducks, name):
    """The same storage-layout query twice in parallel on one session: the
    two calls stage independent fresh dirs (or serialize on the bucketed-
    table build lock) and both results match the oracle."""
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(SPECS[name].fn, spark, SF_DIR)
        f2 = pool.submit(SPECS[name].fn, spark, SF_DIR)
        df1, df2 = f1.result(timeout=300), f2.result(timeout=300)
    assert_matches_oracle(df1, ducks, SPECS[name].oracle, name)
    assert_matches_oracle(df2, ducks, SPECS[name].oracle, name)


def test_lazy_plan_survives_requery(spark, ducks):
    """Regression for the shared-scratch rmtree hazard: obtain a DataFrame
    from a write-then-read query, invoke the SAME query again (which stages
    a new dataset), then collect the FIRST DataFrame.  Under the old
    shared-path staging the second call deleted the files under the first
    plan; with fresh_scratch_dir both must still match the oracle."""
    name = "src_range_sorted_scan"
    df1 = SPECS[name].fn(spark, SF_DIR)
    df2 = SPECS[name].fn(spark, SF_DIR)
    assert_matches_oracle(df1, ducks, SPECS[name].oracle, name + "[first]")
    assert_matches_oracle(df2, ducks, SPECS[name].oracle, name + "[second]")


def test_lazy_plan_survives_requery_etl(spark, ducks):
    """Same contract for the etl write-then-read queries (compaction uses
    two staged copies; dynamic-overwrite rewrites one partition)."""
    for name in ("etl_compaction_binpack", "etl_partition_overwrite_dynamic"):
        df1 = SPECS[name].fn(spark, SF_DIR)
        df2 = SPECS[name].fn(spark, SF_DIR)
        assert_matches_oracle(df1, ducks, SPECS[name].oracle, name + "[first]")
        assert_matches_oracle(df2, ducks, SPECS[name].oracle, name + "[second]")


def test_concurrent_stateful_running_count(spark, ducks):
    """The applyInPandasWithState query twice in parallel on one session:
    under the pre-r5 staging (shared /tmp path rmtree'd per call + a
    non-unique memory-sink queryName) the second call either yanked the
    first's staged parquet mid-stream or failed on the duplicate sink
    name; with fresh_scratch_dir + counter-suffixed sinks both calls must
    hash-match the oracle."""
    name = "stream_stateful_running_count"
    with cf.ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(SPECS[name].fn, spark, SF_DIR)
        f2 = pool.submit(SPECS[name].fn, spark, SF_DIR)
        df1, df2 = f1.result(timeout=300), f2.result(timeout=300)
    assert_matches_oracle(df1, ducks, SPECS[name].oracle, name + "[a]")
    assert_matches_oracle(df2, ducks, SPECS[name].oracle, name + "[b]")


def test_fresh_scratch_dir_bounded_retention(tmp_path):
    """Minting more than _FRESH_RETAIN paths for one (tag, keys) deletes
    the oldest, so long-lived processes don't grow /tmp without bound —
    while the newest _FRESH_RETAIN stay untouched (the liveness contract
    for not-yet-collected lazy plans)."""
    import os

    from kafka_spark_streaming_eval_spark import session as S

    paths = []
    for _ in range(S._FRESH_RETAIN + 2):
        p = S.fresh_scratch_dir("retention_test", str(tmp_path))
        os.makedirs(p, exist_ok=True)
        paths.append(p)
    gone, kept = paths[:2], paths[2:]
    assert all(not os.path.exists(p) for p in gone)
    assert all(os.path.exists(p) for p in kept)
    # cleanup what the retention window kept
    import shutil

    for p in kept:
        shutil.rmtree(p, ignore_errors=True)


def test_fresh_scratch_reclaim_silent_by_default(tmp_path, monkeypatch):
    """Reclaim at normal cadence is routine bounded-retention behavior and
    must NOT emit a RuntimeWarning (VERDICT r7 item 6: the suite's only
    warning noise); the warning is an explicit debug opt-in
    (SPARK_GRAFT_WARN_RECLAIM=1), and every reclaim lands in the
    _RECLAIMED diagnostic ledger either way."""
    import os
    import warnings

    from kafka_spark_streaming_eval_spark import session as S

    def mint(n, tag):
        out = []
        for _ in range(n):
            p = S.fresh_scratch_dir(tag, str(tmp_path))
            os.makedirs(p, exist_ok=True)
            out.append(p)
        return out

    monkeypatch.delenv("SPARK_GRAFT_WARN_RECLAIM", raising=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        paths = mint(S._FRESH_RETAIN + 1, "reclaim_silent")
    assert paths[0] in S._RECLAIMED and not os.path.exists(paths[0])

    monkeypatch.setenv("SPARK_GRAFT_WARN_RECLAIM", "1")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        paths2 = mint(S._FRESH_RETAIN + 1, "reclaim_optin")
    assert any(
        issubclass(w.category, RuntimeWarning) and "reclaiming" in str(w.message)
        for w in caught
    )
    import shutil

    for p in paths + paths2:
        shutil.rmtree(p, ignore_errors=True)
