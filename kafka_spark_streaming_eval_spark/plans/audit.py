"""Plan audit tool: physical-plan health metrics for every registered query.

Usage::

    python -m kafka_spark_streaming_eval_spark.plans.audit [--run] [sf_dir] [name ...]

For each query (default: all), prints one line of plan facts — shuffle
(Exchange) count, join strategies, cartesian products, parquet pushed-filter
count, and WholeStageCodegen span count — the numbers behind SCALE.md's
plan-audit table.  This is how "explain and iterate" stays cheap: run the
audit after touching an operator and diff the line.

Streaming-execution queries (those that must *run* a stream to return a
DataFrame) are skipped by default because building their plan executes them.
"""

from __future__ import annotations

import re
import sys

# Queries whose fn() runs a streaming query to completion — planning them
# means executing them, so the audit skips unless explicitly named.
_EXEC_ON_BUILD = {
    "stream_stateful_running_count",
    "stream_python_datasource_source",
    "stream_stream_left_outer_join",
    "stream_foreachbatch_merge_upsert",
}


def audit_one(spark, spec, sf_dir: str, run: bool = False, no_trunc: bool = False) -> dict:
    """Plan facts for one query.

    ``localCheckpoint`` truncates lineage, so for iterative queries the
    audited plan covers ONLY the post-checkpoint stage (VERDICT r6 item 7:
    pagerank's row read "0 exchanges" while 15 join+agg iterations ran
    behind the checkpoints).  A spy on ``DataFrame.localCheckpoint`` counts
    truncation events while the query builds; rows with ``trunc > 0`` carry
    the count so the "0 cartesians" claim is explicit about what each row
    does and does not cover.  ``no_trunc=True`` makes the spy a pass-through
    (no checkpointing), so the FULL multi-iteration lineage is audited —
    viable at audit scale (sf0.001), exactly what the per-query annotation
    in PLAN_AUDIT's header is measured from.
    """
    # Spark 4 splits DataFrame into an abstract base + a classic runtime
    # subclass that OVERRIDES localCheckpoint — the spy must patch the class
    # that actually owns the method or it never fires.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover — pre-4.0 layout
        from pyspark.sql import DataFrame as _DF

    orig = _DF.localCheckpoint
    ckpt_calls = []

    def _spy(self, eager=True):
        ckpt_calls.append(1)
        return self if no_trunc else orig(self, eager=eager)

    _DF.localCheckpoint = _spy
    try:
        df = spec.fn(spark, sf_dir)
    finally:
        _DF.localCheckpoint = orig
    if run:  # finalize THIS plan's AQE (count() would execute a derived plan)
        df.collect()
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # After execution AdaptiveSparkPlan prints "Final Plan" AND "Initial
    # Plan" sections; count only the final one.
    plan = plan.split("== Initial Plan ==")[0]
    formatted = qe.explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pushed = [
        p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", formatted) if p.strip()
    ]
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcasts": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "pushed_filters": len(pushed),
        # codegen stages appear as "*(n) Op" in the executed-plan string
        "wscg_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        # localCheckpoint calls during plan build: >0 means this row's
        # numbers cover only the post-checkpoint stage (lineage truncated)
        "trunc": len(ckpt_calls),
    }


def main(argv: list[str]) -> int:
    from kafka_spark_streaming_eval_spark.plans.registry import all_queries
    from kafka_spark_streaming_eval_spark.session import get_spark

    run = "--run" in argv
    no_trunc = "--no-trunc" in argv
    argv = [a for a in argv if a not in ("--run", "--no-trunc")]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    specs = all_queries()
    names = argv[1:] or [n for n in sorted(specs) if n not in _EXEC_ON_BUILD]
    spark = get_spark("plan-audit", cpus=4, shuffle_partitions=4)
    hdr = f"{'query':42s} exch  bhj  smj  cart  pushed  wscg"
    print(hdr)
    print("-" * len(hdr))
    worst = []
    for name in names:
        try:
            a = audit_one(spark, specs[name], sf_dir, run=run, no_trunc=no_trunc)
        except Exception as e:  # noqa: BLE001 — audit keeps going, reports at end
            print(f"{name:42s} ERROR {str(e)[:80]}")
            worst.append(name)
            continue
        flag = " <-- CARTESIAN" if a["cartesian"] else ""
        # trunc:N marks a lineage-truncated row (numbers cover only the
        # post-checkpoint stage); in --no-trunc mode the checkpoints were
        # bypassed, so the row IS the full lineage and gets untrunc:N.
        if a["trunc"]:
            flag += f" {'untrunc' if no_trunc else 'trunc'}:{a['trunc']}"
        print(
            f"{name:42s} {a['exchanges']:4d} {a['broadcasts']:4d} {a['smj']:4d}"
            f" {a['cartesian']:5d} {a['pushed_filters']:7d} {a['wscg_spans']:5d}{flag}"
        )
        if a["cartesian"]:
            worst.append(name)
    return 1 if worst else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
