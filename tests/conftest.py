"""Shared fixtures: one SparkSession per test session, DuckDB oracle helper,
and a comparator that mirrors the driver's correctness gate (row count +
schema + order-insensitive values, exact)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from kafka_spark_streaming_eval_spark.catalog import TABLES
from kafka_spark_streaming_eval_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Canonicalize a cell for exact comparison across engines."""
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple, dict, set)):
        # The driver's canonicalizer pandas-sorts columns before hashing and
        # raises TypeError: unhashable type on collection cells (4 ERR rows
        # in CORRECTNESS_r02).  The local gate must predict the driver, so a
        # collection cell is a hard failure here, not something to tuple-ize.
        raise AssertionError(
            f"collection-typed cell {type(v).__name__} would crash the "
            f"driver's canonicalizer — serialize it (array_join/to_json) "
            f"in both engines: {v!r:.120}"
        )
    return v


def canonical_rows(df_pandas):
    """Sort columns by name, normalize cells, return sorted row tuples."""
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _dtype_kinds(df_pandas):
    """Column -> coarse dtype kind ('i' int/uint, 'f' float, 'b' bool, ...).

    The driver's value-hash is dtype-sensitive (round 1: DuckDB HUGEINT ->
    float64 vs Spark int64 hashed differently even with equal values), so the
    local gate must also reject cross-engine kind drift, which the value
    normalization in ``_norm_cell`` would otherwise erase.
    """
    # "u" (unsigned) folds into "i"; "m" (timedelta64) deliberately does NOT
    # fold into "M" (datetime64) — the driver's typed value hash distinguishes
    # them, so timedelta-vs-datetime must count as drift here too.
    kind_map = {"u": "i"}
    return {c: kind_map.get(df_pandas[c].dtype.kind, df_pandas[c].dtype.kind) for c in df_pandas.columns}


def assert_driver_hashable_schema(spark_df, name: str = "?"):
    """Registered queries must emit scalar columns only: the driver's
    canonicalizer cannot sort/hash array, map, struct, or binary cells."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]
    assert not bad, (
        f"{name}: columns {bad} are collection/binary-typed — the driver's "
        f"canonicalizer crashes on them; serialize (array_join/to_json/hex) "
        f"in both the Spark query and the oracle SQL"
    )


def assert_matches_oracle(spark_df, ducks, oracle_sql: str, name: str = "?"):
    """Exact order-insensitive comparison (the driver hashes values, so any
    float drift is a failure — this is deliberately NOT tolerance-based)."""
    assert_driver_hashable_schema(spark_df, name)
    got_pdf = spark_df.toPandas()
    exp_pdf = ducks.execute(oracle_sql).fetchdf()
    got_cols, got_rows = canonical_rows(got_pdf)
    exp_cols, exp_rows = canonical_rows(exp_pdf)
    assert got_cols == exp_cols, f"{name}: column mismatch {got_cols} vs {exp_cols}"
    got_kinds, exp_kinds = _dtype_kinds(got_pdf), _dtype_kinds(exp_pdf)
    kind_drift = {
        c: (got_kinds[c], exp_kinds[c])
        for c in got_cols
        # both-object is fine (strings, lists); object on ONE side against a
        # numeric/datetime kind is drift (e.g. a Decimal column vs float64 —
        # equal values, different string forms under the driver's hash)
        if got_kinds[c] != exp_kinds[c]
    }
    assert not kind_drift, f"{name}: dtype-kind drift spark-vs-oracle {kind_drift}"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} vs {len(exp_rows)}"
    )
    mismatches = [
        (i, g, e) for i, (g, e) in enumerate(zip(got_rows, exp_rows)) if g != e
    ]
    if mismatches:
        i, g, e = mismatches[0]
        raise AssertionError(
            f"{name}: {len(mismatches)}/{len(got_rows)} rows differ; "
            f"first at sorted-index {i}:\n  spark : {g}\n  duckdb: {e}\n  cols: {got_cols}"
        )
