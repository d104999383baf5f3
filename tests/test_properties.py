"""Property-based tests (hypothesis) for the engine's cross-cutting
invariants — the properties that make results reproducible on a cluster:

- determinism of decimal-backed float aggregation under ANY partitioning /
  row order (the property the oracle hash comparison relies on),
- shingling matches a pure-Python specification,
- deterministic hash sampling is invariant under repartitioning,
- exact duplicate documents always become LSH candidate pairs (recall=1
  for true duplicates — the minimum guarantee a dedup pipeline must keep).
"""

from __future__ import annotations

import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from pyspark.sql import functions as F

SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@SLOW
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=200,
    ),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_dsum_partition_invariant(sp, values, nparts):
    """dsum bits never depend on partitioning or row order."""
    from kafka_spark_streaming_eval_spark.functions.numeric import dsum

    df = sp.createDataFrame([(v,) for v in values], "v double")
    a = df.repartition(nparts).agg(dsum("v").alias("s")).collect()[0].s
    b = df.coalesce(1).agg(dsum("v").alias("s")).collect()[0].s
    rev = sp.createDataFrame([(v,) for v in reversed(values)], "v double")
    c = rev.repartition(max(1, nparts - 1)).agg(dsum("v").alias("s")).collect()[0].s
    assert a == b == c  # exact bit equality, not approx


@SLOW
@given(
    tokens=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=5), min_size=0, max_size=12
    )
)
def test_shingles_match_python_spec(sp, tokens):
    """shingle_rows == the 3-window specification, including <3-token docs."""
    from kafka_spark_streaming_eval_spark.operators.dedup import shingle_rows

    text = " ".join(tokens)
    # the operator lowercases and splits on single spaces
    toks = text.lower().split(" ")
    expected = sorted(
        " ".join(toks[i : i + 3]) for i in range(max(0, len(toks) - 2))
    )
    df = sp.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(r.sh for r in shingle_rows(df).collect())
    assert got == expected


@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300),
    nparts=st.integers(min_value=1, max_value=8),
)
def test_hash_sample_repartition_invariant(sp, ids, nparts):
    """The md5 sample keeps exactly the same ids whatever the layout."""
    df = sp.createDataFrame([(i,) for i in set(ids)], "event_id long")
    pred = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).isin("0", "1")
    a = sorted(r.event_id for r in df.where(pred).collect())
    b = sorted(r.event_id for r in df.repartition(nparts).where(pred).collect())
    assert a == b


def test_exact_duplicates_always_pair(spark):
    """Two byte-identical documents share every minhash band -> always a
    candidate pair (LSH recall is 1.0 for true duplicates)."""
    from kafka_spark_streaming_eval_spark.operators.dedup import lsh_candidate_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(df).collect()}
    assert (1, 2) in pairs
    assert all(a < b for a, b in pairs)


def test_lsh_bucket_cap_bounds_degenerate_fanout(spark):
    """An all-identical corpus collapses into single band buckets — the
    worst-case quadratic fan-out.  The per-bucket membership cap must bound
    the pair count at C(cap, 2) regardless of corpus size."""
    from kafka_spark_streaming_eval_spark.operators.dedup import (
        LSH_BUCKET_CAP,
        lsh_candidate_pairs,
    )

    n = 3 * LSH_BUCKET_CAP  # far past the cap
    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    capped = LSH_BUCKET_CAP * (LSH_BUCKET_CAP - 1) // 2
    assert lsh_candidate_pairs(df).count() == capped  # not C(n,2) = 18336


def test_hll_estimate_within_5pct(spark):
    """The sharded-HLL merge must land near the exact distinct count.  The
    query itself now emits the bound as a hash-checked flag; this asserts
    the same bound on the raw estimate so a regression shows the actual
    error, not just a flipped boolean."""
    from pyspark.sql import functions as SF

    from kafka_spark_streaming_eval_spark.catalog import table
    from kafka_spark_streaming_eval_spark.operators.relational import (
        agg_hll_partitioned_merge,
    )
    from tests.conftest import SF_DIR

    row = agg_hll_partitioned_merge(spark, SF_DIR).collect()[0]
    assert row.exact_users > 0
    assert row.merged_within_5pct
    ev = table(spark, SF_DIR, "events")
    raw = (
        ev.groupBy(SF.pmod(SF.col("user_id"), SF.lit(32)).alias("shard"))
        .agg(SF.hll_sketch_agg("user_id").alias("sk"))
        .agg(SF.hll_sketch_estimate(SF.hll_union_agg("sk")).alias("approx"))
        .collect()[0]
        .approx
    )
    assert abs(raw - row.exact_users) / row.exact_users < 0.05


def test_pagerank_mass_conserved(spark):
    """PageRank invariants: ranks positive, total mass ~1 (up to the
    documented 1e-15-grid quantization loss), and the trajectory is
    run-to-run identical (determinism is the scale feature)."""
    from kafka_spark_streaming_eval_spark.operators.graph import graph_pagerank_trade
    from tests.conftest import SF_DIR

    rows = graph_pagerank_trade(spark, SF_DIR).collect()
    total = sum(r.pagerank for r in rows)
    assert all(r.pagerank > 0 for r in rows)
    assert abs(total - 1.0) < 1e-9
    again = {r.node: r.pagerank for r in graph_pagerank_trade(spark, SF_DIR).collect()}
    assert {r.node: r.pagerank for r in rows} == again


def test_events_long_ts_divisor_detects_epoch_unit(tmp_path):
    """The testdata ts encoding changed once between driver rounds already;
    if a future vintage stores epoch ms/us as a plain long, the divisor
    detection (parquet stats magnitude, no data scan) must map each unit to
    epoch-ms instead of silently dividing by the nanos constant."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_spark_streaming_eval_spark.catalog import events_long_ts_divisor

    cases = {
        1_786_650_000_000_000_000: 1_000_000,  # epoch-ns
        1_786_650_000_000_000: 1_000,  # epoch-us
        1_786_650_000_000: 1,  # epoch-ms
        1_786_650_000: -1000,  # epoch-SECONDS: negative = multiplier to ms
    }
    for v, expect in cases.items():
        p = str(tmp_path / f"ts_{expect}.parquet")
        pq.write_table(pa.table({"ts": pa.array([v, v + 5], type=pa.int64())}), p)
        assert events_long_ts_divisor(p) == expect
    # real timestamp-typed file: stats are datetimes -> observed default
    assert events_long_ts_divisor("/root/testdata/sf0.001/events.parquet") == 1_000_000


def test_null_battery_oracle_duckdb_version_neutral():
    """scalar_null_battery's zero_div_is_null column must not depend on the
    DuckDB version: >=1.1 defaults ieee_floating_point_ops=true, flipping
    plain x/0.0 from NULL to inf.  The oracle divides by nullif(denom, 0.0)
    so the division is x/NULL = NULL under BOTH settings — assert that under
    whichever settings this DuckDB exposes."""
    import duckdb

    expr = "SELECT (1.5 / nullif(1.5 - 1.5, 0.0)) IS NOT DISTINCT FROM NULL"
    con = duckdb.connect()
    assert con.execute(expr).fetchone()[0] is True
    for setting in ("true", "false"):
        try:
            con.execute(f"SET ieee_floating_point_ops={setting}")
        except duckdb.Error:
            continue  # knob absent in this DuckDB version
        assert con.execute(expr).fetchone()[0] is True, setting


def test_epoch_seconds_vintage_reads_real_dates(spark, tmp_path):
    """End-to-end guard for the epoch-seconds vintage: a long ts column of
    ~1.7e9 must surface as 2020s timestamps, not collapse to 1970."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_spark_streaming_eval_spark.catalog import (
        events_long_ts_divisor,
        events_ts_ms,
    )

    p = str(tmp_path / "ev_secs.parquet")
    secs = 1_754_000_000  # 2025-08-01ish
    pq.write_table(pa.table({"ts": pa.array([secs, secs + 60], type=pa.int64())}), p)
    df = events_ts_ms(spark.read.parquet(p), long_divisor=events_long_ts_divisor(p))
    years = [r.y for r in df.selectExpr("year(ts) AS y").collect()]
    assert years == [2025, 2025], years


def test_comparator_rejects_collection_cells(spark, ducks):
    """The local gate must PREDICT the driver: a query returning an array
    column has to fail locally (the driver's canonicalizer raises
    TypeError on collection cells), both at the schema gate and — if a
    bare pandas frame ever reaches it — at cell normalization."""
    import pytest as _pytest

    from tests.conftest import (
        _norm_cell,
        assert_driver_hashable_schema,
        assert_matches_oracle,
    )

    with _pytest.raises(AssertionError, match="collection-typed cell"):
        _norm_cell([1, 2, 3])
    df = spark.range(1).select("id", F.array(F.lit(1), F.lit(2)).alias("arr"))
    with _pytest.raises(AssertionError, match="collection/binary-typed"):
        assert_driver_hashable_schema(df, "gate-probe")
    with _pytest.raises(AssertionError):
        assert_matches_oracle(df, ducks, "SELECT 0 AS id, [1, 2] AS arr", "gate-probe")
