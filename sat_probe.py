#!/usr/bin/env python
"""Streaming saturation probe with a POST-SETTLING measurement window
(VERDICT r9 item 5 / r10 item 5).

`bench.streaming_live`'s gate opens the window on the FIRST caught-up batch
(batch_events <= 1.5x rate) — conservative and right for the headline
number, but at 200k eps the r9 slip diagnostic (`results/
slip_diag_200k_run2.json`) shows the engine takes a few more triggers to
settle, after which it runs 24-29 CONSECUTIVE exact-rate batches.  A window
that opens one batch after catch-up still contains the settling wobble, so
the r9 200k row reads 94.4% of input.  This probe opens the window only
after ``--settle`` consecutive EXACT-rate batches (default 5) and measures
from the first batch of that settled run, producing the post-settling
figure SCALE.md commits alongside the conservative one (both are honest:
one includes settling, one measures steady state).

The estimator is bench.streaming_live's, verbatim: non-empty batches,
batch-id interval span, N/(N-1) correction (bench.py's data-less-interval
cross-check does not apply differently here — the rate source never skips
a trigger).

Usage::

    python sat_probe.py [--rate 200000] [--settle 5] [--run-s 25] [--deadline 150]

``--deadline`` bounds the settling wait (seconds).  The 150 s default is
calibrated for <=200k eps (settle lands at +13-117 s there); at higher
rates the catch-up phase alone can exceed it — the round-11 ceiling
probes first read 275k/300k as "divergent" under the default deadline,
but their own timelines show the final catch-up batches processing at
354k-1.45M eps (i.e. CONVERGING, cut off mid-catch-up).  A "never
settled" verdict is only meaningful if the timeline's tail throughput is
also below the input rate; otherwise raise the deadline and re-measure.

Prints ONE JSON line; run it on an idle host in a fresh process (same
methodology as bench's --stream-only subprocess).
"""

from __future__ import annotations

import json
import os
import sys
import time


def settle_index(events: list[int], rate: int, k: int) -> int | None:
    """Index of the FIRST batch of the earliest run of ``k`` consecutive
    exact-rate batches (1 s triggers), or None if no such run exists.
    Empty batches (0 events) break a run — a settled engine at a rate the
    source sustains emits every trigger."""
    streak = 0
    for i, ev in enumerate(events):
        streak = streak + 1 if ev == rate else 0
        if streak == k:
            return i - k + 1
    return None


def tail_eps(timeline: list[list]) -> float | None:
    """Processing throughput of the LAST completed batch: events of the
    final timeline entry divided by the wall between the last two batch
    completions.  This is the convergence discriminator for a "never
    settled" verdict: tail_eps > rate means the backlog was still being
    drained FASTER than it grew (cut off mid-catch-up, raise --deadline);
    tail_eps < rate means genuine divergence."""
    if len(timeline) < 2:
        return None
    t0, t1, ev1 = timeline[-2][0], timeline[-1][0], timeline[-1][1]
    span = t1 - t0
    return round(ev1 / span, 1) if span > 0 else None


def main() -> None:
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell")

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kafka_spark_streaming_eval_spark.session import get_spark
    from kafka_spark_streaming_eval_spark.streaming.generator import (
        WIRE_FIELD_ORDER,
        synth_events_stream,
        to_wire,
    )
    from kafka_spark_streaming_eval_spark.streaming.metrics_job import (
        MetricsCollector,
        parse_events,
        run_metrics_stream,
    )

    args = sys.argv[1:]
    rate = int(args[args.index("--rate") + 1]) if "--rate" in args else 200_000
    settle = int(args[args.index("--settle") + 1]) if "--settle" in args else 5
    run_s = float(args[args.index("--run-s") + 1]) if "--run-s" in args else 25.0
    deadline_s = (
        float(args[args.index("--deadline") + 1]) if "--deadline" in args else 150.0
    )
    # VERDICT r11 item 6: the capacity-planning claim that the knee moves
    # with spark.sql.shuffle.partitions needs a measured knob-shift point.
    shuffle_parts = (
        int(args[args.index("--shuffle-partitions") + 1])
        if "--shuffle-partitions" in args
        else None
    )
    # VERDICT r12 item 6: the 250k knee is parse-bound — probe whether a
    # cheaper wire decode moves it.  Variants:
    #   full   — parse_events, full wire schema (baseline; Catalyst's
    #            OptimizeJsonExprs already prunes it to created_ts in the
    #            optimized plan, verified r13)
    #   pruned — parse_events(fields=["created_ts"]): the explicit version
    #            of the pruning the optimizer does; expected = full, and a
    #            gap would mean the rule is NOT firing in the streaming plan
    #   regex  — regexp_extract of created_ts straight off the wire string:
    #            skips JSON tokenization entirely (Jackson still scans the
    #            whole string under a pruned schema), the only variant that
    #            can beat the optimizer
    #   csv    — the positional delimited wire (generator.to_wire(fmt="csv")
    #            encode, parse_events(wire="csv") full decode): the r14
    #            first-class structured alternative the r13 regex result
    #            motivates — unlike regex it is a REAL general decoder
    #            (types, quoting), so its knee is the number a production
    #            wire-format switch actually buys
    parse_variant = args[args.index("--parse") + 1] if "--parse" in args else "full"
    if parse_variant not in ("full", "pruned", "regex", "csv"):
        raise SystemExit(f"unknown --parse variant {parse_variant!r}")

    # Per-batch steal attribution (r11 item 6: one anomalous 53 s batch in
    # sat_probe_r11_ceiling_250k_run4 had no weather evidence): each
    # timeline entry carries the host steal-tick delta since the previous
    # entry, so a slow batch is attributable in the artifact itself.
    from bench import StealMeter, read_steal_ticks

    run_meter = StealMeter()
    last_steal = read_steal_ticks()

    def steal_delta() -> int | None:
        nonlocal last_steal
        now = read_steal_ticks()
        if now is None or last_steal is None:
            last_steal = now
            return None
        d = now[0] - last_steal[0]
        last_steal = now
        return d

    spark = get_spark("sat-probe", shuffle_partitions=shuffle_parts)
    ev = synth_events_stream(spark, rows_per_second=rate)
    # The csv variant swaps the WIRE (encode + decode) — everything else in
    # the pipeline is identical, so a knee delta is attributable to the
    # format alone.  created_ts is real emission time for all variants.
    wire = to_wire(
        ev,
        fmt="csv" if parse_variant == "csv" else "json",
        created_ts=F.unix_millis("ts"),
    )
    ckpt = tempfile.mkdtemp(prefix="sat_ckpt_")
    collector = MetricsCollector()
    if parse_variant == "full":
        parsed = parse_events(wire)
    elif parse_variant == "pruned":
        parsed = parse_events(wire, fields=["created_ts"])
    elif parse_variant == "csv":
        parsed = parse_events(wire, wire="csv")
    else:  # regex: created_ts is always a bare integer on this wire
        # The regex keeps the FIRST '"created_ts":<int>' match, which is the
        # real field only while no free-form string field precedes
        # created_ts in the wire struct (event_id is allowed before it
        # because md5 hex can never embed '"created_ts":'); a field-order
        # change would silently corrupt the probe's timestamps (ADVICE r13).
        assert WIRE_FIELD_ORDER.index("created_ts") < WIRE_FIELD_ORDER.index(
            "payload"
        ), "regex decode requires created_ts before the free-form payload field"
        parsed = wire.select(
            F.regexp_extract(
                F.col("value").cast("string"), '"created_ts":(-?\\d+)', 1
            )
            .cast("long")
            .alias("created_ts")
        )
    query, sink = run_metrics_stream(
        parsed, ckpt, trigger_sec=1, collector=collector
    )

    t_start = time.time()
    timeline: list[list] = []
    settled_at = None
    # settling can take the full catch-up phase plus the settle run itself
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        rows_now = list(sink.rows)
        while len(timeline) < len(rows_now):
            r = rows_now[len(timeline)]
            # entry: [offset_s, batch_events, steal_ticks_since_prev_entry]
            timeline.append(
                [round(time.time() - t_start, 1), int(r.batch_events),
                 steal_delta()]
            )
        idx = settle_index([int(r.batch_events) for r in rows_now], rate, settle)
        if idx is not None:
            settled_at = idx
            break
        time.sleep(0.25)
    if settled_at is None:
        # Artifact carries the HEAD (catch-up shape) and the TAIL (the
        # convergence discriminator — r14: a 650k "never settled" whose
        # first-60 truncation hid a tail processing ABOVE input rate read
        # as a knee when it was a settle-criterion edge) of the timeline,
        # plus the full batch count, so the verdict self-diagnoses.
        print(json.dumps({"rate_eps": rate, "parse": parse_variant,
                          "error": "never settled",
                          "deadline_s": deadline_s,
                          "shuffle_partitions": shuffle_parts,
                          "tail_eps": tail_eps(timeline),
                          "steal": run_meter.finish(),
                          "timeline_n": len(timeline),
                          "timeline": timeline[:40],
                          "timeline_tail": timeline[-20:]}))
        query.stop()
        query.awaitTermination()
        shutil.rmtree(ckpt, ignore_errors=True)
        sys.exit(1)
    settle_offset_s = round(time.time() - t_start, 1)
    window_end = time.time() + run_s
    while time.time() < window_end:  # keep per-batch steal attribution live
        rows_now = list(sink.rows)
        while len(timeline) < len(rows_now):
            r = rows_now[len(timeline)]
            timeline.append(
                [round(time.time() - t_start, 1), int(r.batch_events),
                 steal_delta()]
            )
        time.sleep(0.25)
    query.stop()
    query.awaitTermination()

    pool = [r for r in list(sink.rows)[settled_at:] if r.batch_events > 0]
    n = len(pool)
    if n >= 2:
        span_s = max(pool[-1].epoch_sec - pool[0].epoch_sec, 1)
        intervals = int(pool[-1].batch_id - pool[0].batch_id) + 1
        sustained = sum(r.batch_events for r in pool) * (intervals - 1) / (
            span_s * intervals
        )
    else:
        sustained = 0.0
    p95 = sum(r.p95_latency_ms for r in pool) / n if n else -1.0
    shutil.rmtree(ckpt, ignore_errors=True)
    print(
        json.dumps(
            {
                "rate_eps": rate,
                "parse": parse_variant,
                "mode": "post-settling",
                "deadline_s": deadline_s,
                "shuffle_partitions": shuffle_parts,
                "settle_exact_batches": settle,
                "settle_offset_s": settle_offset_s,
                "sustained_eps": round(sustained, 1),
                "p95_ms": round(p95, 1),
                "batches": n,
                "steal": run_meter.finish(),
                "timeline": timeline[:60],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
