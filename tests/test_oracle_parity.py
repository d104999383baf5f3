"""The local mirror of the driver's t2 gate: run every registered query on
Spark AND its DuckDB oracle at the test scale factor, compare exactly.

Queries registered with ``oracle=None`` get a rows-only sanity check
(runs, returns a stable schema, row count >= 0) — same as the driver.
"""

from __future__ import annotations

import pytest

from kafka_spark_streaming_eval_spark.plans.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

SPECS = all_queries()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(name, spark, ducks):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, ducks, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(name, spark):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
