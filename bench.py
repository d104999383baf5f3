#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Methodology mirrors BASELINE.md: a warm-up pass is excluded from
measurement (the reference excluded a 120 s warm-up window,
analyze_exp1.py:10-12), each query is timed over full materialization
(count of the result), best of 2 runs.  ``throughput_eps`` pushes synthetic
wire-format JSON events through the full reference pipeline (parse ->
latency -> fused per-batch metrics agg) and reports events/second — the
number comparable to the reference's sustained ~6,915 eps at saturation
(BASELINE.md exp1).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_HEAP_PINNED = False


def _pin_heap() -> None:
    """Pin the local JVM heap to an executor-realistic size (a 32-core
    executor gets tens of GB, not PySpark's ~1 GB local default).

    Measured on idle same-day A/B pairs (SCALE.md round-6 heap experiment):
    the 1M-event parse pass is GC-dominated on the default heap (1.04/1.18 M
    eps default vs 1.30/1.49 M eps at 16g, +25%), and headline/p95 tighten
    ~2-4%.  setdefault: an explicit PYSPARK_SUBMIT_ARGS from the caller
    wins.  Must run before the first SparkSession (JVM launch) — called from
    main(), NOT at import time, so `import bench` (e.g. from the bench
    contract tests) leaves process env untouched.
    """
    global _HEAP_PINNED
    _HEAP_PINNED = "PYSPARK_SUBMIT_ARGS" not in os.environ
    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell"
    )

from pyspark.sql import functions as F  # noqa: E402

from kafka_spark_streaming_eval_spark.plans.registry import all_queries  # noqa: E402
from kafka_spark_streaming_eval_spark.session import get_spark  # noqa: E402
from kafka_spark_streaming_eval_spark.streaming.generator import (  # noqa: E402
    synth_events_batch,
)
from kafka_spark_streaming_eval_spark.streaming.metrics_job import (  # noqa: E402
    batch_metrics,
    parse_events,
)

def read_steal_ticks(path: str = "/proc/stat") -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from the aggregate ``cpu`` line of
    ``/proc/stat``.  Field 9 of that line (index 7 after the "cpu" label) is
    time stolen by the hypervisor — the quantity SCALE.md's round-11 steal
    calibration showed explains 22x swings in committed bench numbers
    (three byte-identical runs measured 56.0/64.7/89.0 s at 1.0-4.3% steal
    vs a twice-measured 42.72 s steal-free floor).  Returns None when the
    file is absent/odd (non-Linux, restricted sandbox) so callers can record
    "weather unknown" instead of a fake zero."""
    try:
        with open(path) as f:
            parts = f.readline().split()
        if parts[0] != "cpu":
            return None
        vals = [int(x) for x in parts[1:]]
        if len(vals) < 8:
            return None
        # Denominator: first 8 fields only (user..steal).  Kernels that
        # report guest/guest_nice (fields 9-10) already fold those ticks
        # into user/nice, so summing the full line double-counts guest
        # time and understates steal_pct on guest-running hosts
        # (ADVICE r12).
        return vals[7], sum(vals[:8])
    except (OSError, ValueError):
        return None


def read_pressure_totals() -> dict[str, int] | None:
    """Cumulative stall totals (microseconds) from the PSI files:
    ``cpu_some``, ``io_some``, ``io_full``.  VERDICT r13 item 3: the
    throughput gate saw a QUIET attempt run 7x slower than a noisy one
    (210k eps at 0.048% steal vs 1.47M at 0.538%), so steal alone is
    blind to whatever governed it — page-cache eviction by the previous
    1M-event pass shows up as io stall, runqueue contention as cpu
    stall.  Returns None when /proc/pressure is absent (PSI off,
    non-Linux) so callers record "pressure unknown" instead of zeros."""
    out: dict[str, int] = {}
    try:
        for res, kinds in (("cpu", ("some",)), ("io", ("some", "full"))):
            with open(f"/proc/pressure/{res}") as f:
                for line in f:
                    kind = line.split(None, 1)[0]
                    if kind in kinds:
                        out[f"{res}_{kind}"] = int(line.rsplit("total=", 1)[1])
    except (OSError, ValueError, IndexError):
        return None
    return out or None


class StealMeter:
    """Delta-based hypervisor-steal measurement over one bench phase.

    VERDICT r11 item 1: every committed bench sidecar must be
    weather-self-describing — BENCH_r11.json carried a 22x throughput_eps
    artifact that only SCALE.md archaeology could explain because the
    payload had no steal field.  Construct at phase start, ``finish()`` at
    phase end; the dict is embedded in the payload per phase.

    The dict also carries (r14):
    - ``denominator: "first8"`` — r13 changed read_steal_ticks to divide by
      the first 8 /proc/stat fields instead of the full line, which reads
      HIGHER than every pre-r13 sidecar on guest-running hosts; the stamp
      keeps cross-round band comparisons interpretable (ADVICE r13).
    - ``pressure_stall_ms`` — PSI cpu/io stall-time deltas over the span,
      the non-steal diagnostic for quiet-but-slow attempts (VERDICT r13
      item 3).  Omitted when /proc/pressure is unavailable at either end.
    """

    def __init__(self) -> None:
        self._start = read_steal_ticks()
        self._p0 = read_pressure_totals()
        self._t0 = time.time()

    def finish(self) -> dict:
        end = read_steal_ticks()
        p1 = read_pressure_totals()
        wall = round(time.time() - self._t0, 2)
        if self._start is None or end is None:
            return {"available": False, "wall_s": wall}
        dsteal = end[0] - self._start[0]
        dtotal = end[1] - self._start[1]
        out = {
            "available": True,
            "wall_s": wall,
            "steal_ticks": dsteal,
            "steal_pct": round(100.0 * dsteal / dtotal, 3) if dtotal > 0 else None,
            "denominator": "first8",
        }
        if self._p0 is not None and p1 is not None:
            out["pressure_stall_ms"] = {
                k: round((p1[k] - self._p0[k]) / 1000.0, 1)
                for k in self._p0
                if k in p1
            }
        return out


# Retry gate for the batch throughput pass (mirrors how stream_payload_ok
# already gates the streaming sentinels): a throughput_eps measured under
# more than this much steal is re-attempted, and the payload records every
# attempt so the recorded number is never silently weather-poisoned.
# 0.25% is well below the 1.0% that produced r10's "+22% on identical
# code" anomaly and above the <=0.01% observed on a quiet host.
THROUGHPUT_STEAL_GATE_PCT = 0.25
THROUGHPUT_STEAL_RETRIES = 2


HEADLINE = [
    "ref_flagship_batch_metrics",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q18_large_volume_customer",
    "tpch_q21_suppliers_kept_waiting",
    "src_bucketed_colocated_join",
    "sessionize_events_batch",
    "join_star_revenue",
    "join_range_ship_window",
    "join_left_order_counts",
    "agg_rollup_orders",
    "window_rank_trio",
    "window_running_frame",
    "topk_parts_per_brand",
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_jaccard_verified",
    "dedup_cluster_components",
    "dedup_simhash",
    "sim_cosine_topk_bruteforce",
    "sim_lsh_ann_topk",
    "sim_ann_recall_audit",
    "text_word_freq",
    "text_quality_score",
    "text_decontaminate_ngrams",
    "stream_tumbling_counts",
    "etl_merge_upsert",
    "graph_pagerank_trade",
    "timeseries_pattern_match",
    "text_tfidf_topterms",
    "timeseries_resample_ohlc",
    "window_streak_islands",
    "etl_quality_audit",
    "dedup_prefix_containment",
    "text_vocab_growth",
    "text_source_vocab_overlap",
    "sim_centroid_confusion",
    "text_chunk_overlap",
    "pipeline_deterministic_shuffle",
    "text_unigram_surprisal",
    "pipeline_tokenizer_fertility",
    "text_contamination_matrix",
    "stream_incremental_contamination",
    "pipeline_dsir_importance",
    "sim_semantic_dedup",
    "dedup_cdc_chunks",
    "join_bloom_prefilter",
    "text_quality_classifier",
    "pipeline_domain_cap",
    "window_ewma_exact",
    "agg_incremental_merge",
    "pipeline_priority_sample",
    "profile_partition_skew",
    "join_asof_attribution",
    "quality_mad_outliers",
]

THROUGHPUT_EVENTS = 1_000_000

# Non-headline coverage rotation (VERDICT r5 item 6): each bench run ALSO
# times TIER2_COUNT non-headline queries once each — never-benched first,
# then stalest-benched (read from the committed BENCH_r*.json history, the
# same stalest-first idea as the correctness rotation) — so every registry
# query earns a committed sf0.1 timing within ~2 rounds instead of the
# headline 56 being the only measured set.  runs=1 (these are coverage
# timings, not the churn-audited headline series).
TIER2_COUNT = 92


def _last_benched_round() -> dict[str, int]:
    """Per query, the latest committed bench round that timed it (headline or
    tier2).  Reads three shapes: the driver's wrapper files (payload nested
    under "parsed"; when "parsed" is null — the >2000-char-line rounds —
    query names are recovered from the 2000-char "tail" by regex), a bare
    bench JSON, and the BENCH_DETAILS.json sidecar (always at least as new
    as the newest committed round)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}

    def absorb(payload: dict, rnd: int) -> None:
        for key in ("queries", "tier2_queries"):
            for name in payload.get(key) or {}:
                last[name] = max(last.get(name, 0), rnd)

    max_rnd = 0
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_rnd = max(max_rnd, rnd)
        try:
            with open(path) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(raw.get("parsed"), dict):
            absorb(raw["parsed"], rnd)
        elif "queries" in raw or "tier2_queries" in raw:
            absorb(raw, rnd)
        elif isinstance(raw.get("tail"), str):
            for nm in re.findall(r'"([a-z0-9_]+)":\s*-?[0-9.]+', raw["tail"]):
                last[nm] = max(last.get(nm, 0), rnd)
    try:
        with open(os.path.join(here, DETAILS_FILE)) as f:
            absorb(json.load(f), max_rnd + 1)
    except (OSError, ValueError):
        pass
    return last


def _last_measured_secs(here: str | None = None) -> dict[str, float]:
    """Per query, the timing from the LATEST round that measured it —
    the vs-own-last-measured base for the sidecar's ``vs_last`` field
    (VERDICT r9/r10 item 4: tier2_total swings 2x round-over-round from
    rotation mix alone, so only a per-query delta against that query's own
    previous measurement separates a real regression from cohort churn).

    Reads the same three payload shapes as ``_last_benched_round``; for
    the tail-window rounds the (name, sec) pairs are recovered by the same
    regex (non-query scalar fields like "value"/"sf" are absorbed but can
    never collide with a registered query name)."""
    import glob
    import re

    here = here or os.path.dirname(os.path.abspath(__file__))
    best: dict[str, tuple[int, float]] = {}  # name -> (round, sec)

    def absorb(payload: dict, rnd: int) -> None:
        for key in ("queries", "tier2_queries"):
            for name, sec in (payload.get(key) or {}).items():
                if isinstance(sec, (int, float)) and (
                    name not in best or rnd >= best[name][0]
                ):
                    best[name] = (rnd, float(sec))

    max_rnd = 0
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_rnd = max(max_rnd, rnd)
        try:
            with open(path) as f:
                raw = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(raw.get("parsed"), dict):
            absorb(raw["parsed"], rnd)
        elif "queries" in raw or "tier2_queries" in raw:
            absorb(raw, rnd)
        elif isinstance(raw.get("tail"), str):
            for nm, val in re.findall(
                r'"([a-z0-9_]+)":\s*(-?[0-9]+\.?[0-9]*)', raw["tail"]
            ):
                try:
                    sec = float(val)
                except ValueError:
                    continue
                if nm not in best or rnd >= best[nm][0]:
                    best[nm] = (rnd, sec)
    try:
        with open(os.path.join(here, DETAILS_FILE)) as f:
            absorb(json.load(f), max_rnd + 1)
    except (OSError, ValueError):
        pass
    return {name: sec for name, (_, sec) in best.items()}


def vs_last_fields(now: dict[str, float], last: dict[str, float]) -> dict:
    """Sidecar ``vs_last``: for every query timed THIS run that has a prior
    measurement, its own last-measured seconds and the percent delta —
    computed from the RAW values, not the 2-dp roundings (ADVICE r10)."""
    out = {}
    for name, sec in now.items():
        prev = last.get(name)
        if prev and prev > 0:
            out[name] = {
                "last_s": round(prev, 4),
                "delta_pct": round(100.0 * (sec - prev) / prev, 1),
            }
    return out


def tier2_rotation(specs) -> list[str]:
    """The TIER2_COUNT non-headline queries to time this run: never-benched
    first (registration order), then stalest committed timing first."""
    last = _last_benched_round()
    pool = [n for n in specs if n not in HEADLINE]
    idx = {n: i for i, n in enumerate(pool)}
    pool.sort(key=lambda n: (last.get(n, -1), idx[n]))
    return pool[:TIER2_COUNT]


# The grading driver captures only the LAST ~2000 chars of bench stdout and
# parses the final JSON line from that window: BENCH_r01..r04 (line lengths
# 1434..1857) parsed fine, r05 (>2000 after 13 new headline queries) came
# back "parsed": null with the tail starting mid-line.  The stdout line is
# therefore BUDGETED.  r14 lesson (VERDICT r14 items 3+2): the old scheme
# kept every scalar and truncated the QUERIES dict slowest-first, so the
# ~26 fastest headline timings fell off the line and PERF flagged them as
# phantom "dropped_from_bench" every round.  Per-query timings are what the
# grading contract diffs, so they now take priority: the line carries the
# core contract fields + a small reserved scalar set (the BASELINE-gate
# stream triple, throughput, headline weather attestation), then EVERY
# per-query timing (compact separators, 2-dp — full 4-dp precision lives in
# the sidecar), and only then as many remaining scalars as still fit.  The
# COMPLETE payload is always written to DETAILS_FILE alongside this script.
# The driver's capture window is EXACTLY 2000 chars and ends with the JSON
# line + "\n" (measured across every committed BENCH_r*.json tail), so the
# hard ceiling for a parseable line is 1999 chars; 1985 leaves a margin for
# stray control chars without giving up the space the 57-query dict needs.
STDOUT_BUDGET = 1985
DETAILS_FILE = "BENCH_DETAILS.json"

# Scalars reserved on the stdout line BEFORE query timings are fitted: the
# three BASELINE.md-gate streaming numbers, the throughput headline, and
# the kept-attempt weather attestation for the headline phase.
STDOUT_RESERVED_SCALARS = (
    "stream_sustained_eps",
    "stream_p95_latency_ms",
    "recovery_s",
    "throughput_eps",
    "headline_steal_gate_ok",
)
# Remaining scalars, filled into leftover budget in this priority order;
# anything cut here still ships in the sidecar at full precision.
STDOUT_OPTIONAL_SCALARS = (
    "headline_steal_pct",
    "headline_attempts",
    "stream_steal_gate_ok",
    "steal_pct_run",
    "tier2_total",
    "tier2_n",
    "tier2_steal_gate_ok",
    "throughput_steal_pct",
    "throughput_steal_gate_ok",
    "stream_attempts",
    "stream_isolation",
    "jvm_heap",
    "stream_input_eps",
    "stream_batches",
    "throughput_events",
    "baseline_throughput_eps",
    "baseline_p95_latency_ms",
    "baseline_recovery_s",
)


def _enc(obj: dict) -> str:
    return json.dumps(obj, separators=(",", ":"))


def budget_stdout_payload(full: dict, limit: int = STDOUT_BUDGET) -> dict:
    """The stdout-line subset of ``full``: contract fields + reserved
    scalars, then per-query timings (slowest first, 2-dp) until ``limit``
    serialized chars, then optional scalars into whatever room is left.
    ``queries_n``/``queries_omitted`` make any truncation explicit and
    ``queries_full`` names the sidecar carrying the rest."""
    slim = {k: full[k] for k in ("metric", "value", "unit", "sf") if k in full}
    for k in STDOUT_RESERVED_SCALARS:
        if k in full:
            slim[k] = full[k]
    all_q = dict(full.get("queries", {}))
    slim["queries"] = {}
    slim["queries_n"] = len(all_q)
    slim["queries_omitted"] = len(all_q)
    # fast path: the complete query set with no truncation pointer — the
    # slowest-prefix loop below can wedge 1-2 queries short of this because
    # its intermediate candidates carry the 36-char queries_full pointer
    whole = dict(slim)
    whole["queries"] = {n: round(s, 2) for n, s in all_q.items()}
    whole["queries_omitted"] = 0
    if len(_enc(whole)) <= limit:
        slim = whole
    # fill slowest-first by RAW value so the kept set is the slowest prefix;
    # emitted values are 2-dp (the sidecar keeps full precision)
    for name, sec in sorted(all_q.items(), key=lambda kv: (-kv[1], kv[0])):
        if not slim["queries_omitted"]:
            break
        candidate = dict(slim)
        candidate["queries"] = {**slim["queries"], name: round(sec, 2)}
        candidate["queries_omitted"] = len(all_q) - len(candidate["queries"])
        if candidate["queries_omitted"]:
            candidate["queries_full"] = DETAILS_FILE
        else:
            candidate.pop("queries_full", None)
        if len(_enc(candidate)) > limit:
            break
        slim = candidate
    if slim["queries_omitted"]:
        slim["queries_full"] = DETAILS_FILE
    for key in STDOUT_OPTIONAL_SCALARS:
        if key not in full or key in slim:
            continue
        candidate = {**slim, key: full[key]}
        if len(_enc(candidate)) <= limit:
            slim = candidate
    return slim


def time_query(fn, spark, sf_dir, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best


def throughput_eps(spark) -> tuple[float, dict]:
    """Events/second through parse -> latency -> fused metrics agg, plus the
    steal-tick weather over the measured span (warm-up pass included in the
    span: a steal burst during warm-up also poisons best-of-2)."""
    wire = synth_events_batch(spark, THROUGHPUT_EVENTS).select(
        F.to_json(
            F.struct("event_id", "created_ts", "user_id", "event_type", "value", "payload")
        ).alias("value")
    )
    wire = wire.cache()
    wire.count()  # materialize the input outside the measurement
    try:
        meter = StealMeter()
        best = 0.0
        for _ in range(2):  # first pass doubles as warm-up (BASELINE methodology)
            t0 = time.perf_counter()
            row = batch_metrics(parse_events(wire), batch_id=0).collect()[0]
            wall = time.perf_counter() - t0
            assert row.batch_events == THROUGHPUT_EVENTS
            best = max(best, THROUGHPUT_EVENTS / wall)
        return best, meter.finish()
    finally:
        wire.unpersist()


def throughput_eps_gated(spark) -> tuple[float, dict]:
    """throughput_eps with the weather gate (VERDICT r11 item 1): when the
    measured span saw more than THROUGHPUT_STEAL_GATE_PCT hypervisor steal,
    re-attempt (up to THROUGHPUT_STEAL_RETRIES extra passes) and keep the
    attempt with the HIGHEST eps.  Max is the right selector for a
    capacity metric: steal can only SLOW the machine, so any achieved rate
    is a valid lower bound on true capacity regardless of the span's
    average steal — and burst PLACEMENT, not average steal, sets the
    damage (measured in the first stormy closing run of r12: 467k eps at
    11.3%-avg-steal span vs 68k eps at 4.0%, because the 4% span's burst
    landed inside the timed pass while the 11% span's bursts missed it;
    a least-steal selector kept the 68k artifact).  gate_cleared records
    whether the KEPT attempt's own span was quiet — a false value flags
    that even the max may understate capacity.  Returns (eps, provenance)
    with every attempt's eps + steal recorded.  With /proc/stat
    unavailable the first attempt is kept and marked weather-unknown
    rather than retried forever."""
    attempts: list[dict] = []
    for i in range(1 + THROUGHPUT_STEAL_RETRIES):
        eps, steal = throughput_eps(spark)
        attempts.append({"eps": round(eps, 1), "steal": steal})
        if not steal.get("available"):
            break
        if steal.get("steal_pct") is None:
            # zero total-tick delta over a very short span: weather-UNKNOWN,
            # not stormy — keep the attempt rather than burning every retry
            # on a span /proc/stat cannot resolve (ADVICE r13).
            break
        if steal["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT:
            break
        if i < THROUGHPUT_STEAL_RETRIES:
            print(
                f"bench: throughput attempt {i + 1} saw "
                f"{steal.get('steal_pct')}% steal (> gate "
                f"{THROUGHPUT_STEAL_GATE_PCT}%); retrying",
                file=sys.stderr,
            )

    def _quiet(a: dict) -> bool:
        s = a["steal"]
        return bool(
            s.get("available")
            and s.get("steal_pct") is not None
            and s["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT
        )

    # Anomaly retry (VERDICT r13 item 3): r13's attempt 2 measured 210k eps
    # at 0.048% steal against attempt 1's 1.47M at 0.538% — a QUIET span 7x
    # slower than a noisy one means something besides steal governed it
    # (page-cache state after the previous 1M-event pass, JIT, cpufreq; the
    # pressure_stall_ms deltas now in every attempt's steal dict are the
    # diagnostic).  One extra attempt is allowed in that shape so
    # gate_cleared can be EARNED by a quiet-and-fast span rather than
    # waived; without it the gate breaks on the first quiet attempt no
    # matter how implausibly slow it is.
    anomaly_retry = False
    quiet_eps = [a["eps"] for a in attempts if _quiet(a)]
    if quiet_eps and max(a["eps"] for a in attempts) > 2 * max(quiet_eps):
        anomaly_retry = True
        eps, steal = throughput_eps(spark)
        attempts.append({"eps": round(eps, 1), "steal": steal})

    kept = max(range(len(attempts)), key=lambda i: attempts[i]["eps"])
    provenance = {
        "attempts": attempts,
        "kept_attempt": kept + 1,
        "gate_pct": THROUGHPUT_STEAL_GATE_PCT,
        "anomaly_retry": anomaly_retry,
        "gate_cleared": _quiet(attempts[kept]),
    }
    return attempts[kept]["eps"], provenance


# Wall-time phases get the same weather discipline (VERDICT r12 item 1):
# r12's 79.64 s headline at 1.713% steal was only interpretable by
# reconstructing r11's 56.0-88.9 s steal-calibration band.  MIN is the
# right selector for a wall-time metric (steal can only SLOW a pass, so
# the fastest attempt is the least-poisoned sample), exactly as MAX is for
# the capacity metric above.  Known bias, accepted and recorded: retry
# attempts run warmer (JIT/page cache) than attempt 1, so a gated round's
# min can sit slightly below a quiet round's single attempt — kept_attempt
# in the provenance makes that visible.
HEADLINE_STEAL_RETRIES = 2
TIER2_STEAL_RETRIES = 1
STREAM_STEAL_RETRIES = 2


def walltime_phase_gated(
    run_phase, retries: int, label: str
) -> tuple[dict[str, float], dict]:
    """Run a timing phase with the steal gate: ``run_phase(attempt_idx)``
    returns a ``{query: seconds}`` dict; when the phase's span saw more
    than THROUGHPUT_STEAL_GATE_PCT hypervisor steal it is re-run (up to
    ``retries`` extra passes) and the attempt with the LOWEST total is
    kept.  Returns (kept timings, provenance) with every attempt's total +
    steal recorded; gate_cleared says whether the KEPT attempt's own span
    was quiet.  /proc/stat unavailable => first attempt kept,
    weather-unknown, never an infinite retry."""
    attempts: list[dict] = []
    results: list[dict[str, float]] = []
    for i in range(1 + retries):
        meter = StealMeter()
        timings = run_phase(i)
        steal = meter.finish()
        attempts.append({"total_s": round(sum(timings.values()), 4), "steal": steal})
        results.append(timings)
        if not steal.get("available"):
            break
        if steal.get("steal_pct") is None:
            # zero total-tick delta over a very short span: weather-UNKNOWN,
            # not stormy — keep, gate_cleared False, don't burn the retries
            # (ADVICE r13; matches the available=False path).
            break
        if steal["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT:
            break
        if i < retries:
            print(
                f"bench: {label} attempt {i + 1} saw "
                f"{steal.get('steal_pct')}% steal "
                f"(> gate {THROUGHPUT_STEAL_GATE_PCT}%); retrying",
                file=sys.stderr,
            )
    kept = min(range(len(attempts)), key=lambda i: attempts[i]["total_s"])
    kept_steal = attempts[kept]["steal"]
    provenance = {
        "attempts": attempts,
        "kept_attempt": kept + 1,
        "gate_pct": THROUGHPUT_STEAL_GATE_PCT,
        "selector": "min-total",
        "gate_cleared": bool(
            kept_steal.get("available")
            and kept_steal.get("steal_pct") is not None
            and kept_steal["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT
        ),
    }
    return results[kept], provenance


def _run_stream_subprocess(timeout: float = 300.0) -> dict:
    """One ``--stream-only`` run in a fresh JVM; returns the parsed payload.

    Raises on subprocess failure, unparseable stdout, or an implausible
    payload (``stream_payload_ok`` — sentinel / catch-up / short-window
    shapes).  Split out of main() so the stream gate can be contract-tested
    without launching JVMs."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stream-only"],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=dict(os.environ),
    )
    payload = json.loads(proc.stdout.strip().splitlines()[-1])
    if not stream_payload_ok(payload, rate_eps=50_000):
        raise ValueError(f"implausible streaming payload {payload}")
    return payload


def _steal_quiet(steal: dict) -> bool:
    """True iff a StealMeter dict attests a quiet span (measured, below the
    gate).  available=False and steal_pct=None are both NOT quiet — they
    are weather-unknown, which can never clear a gate."""
    return bool(
        steal.get("available")
        and steal.get("steal_pct") is not None
        and steal["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT
    )


def stream_phase_gated() -> tuple[dict | None, dict]:
    """The streaming phase under the steal gate (VERDICT r13 item 2 — this
    was the last ungated bench phase; r13's three streaming numbers ran at
    1.39% steal with no retry).  Runs the ``--stream-only`` subprocess and,
    when the attempt's own steal span (measured inside the subprocess
    around the whole stream run) exceeds THROUGHPUT_STEAL_GATE_PCT, re-runs
    up to STREAM_STEAL_RETRIES extra times.  An invalid payload also
    consumes an attempt and retries (subsuming the old two-try validity
    loop).

    Selection is PER-METRIC, each with the selector under which steal is
    one-sided noise: sustained eps = MAX across valid attempts (capacity —
    steal can only depress it), p95 = MIN and recovery = MIN (wall-times —
    steal can only stretch them).  stream_batches / stream_gate ride with
    the max-sustained attempt.  ``gate_cleared`` is True only when EVERY
    attempt contributing a kept metric had a quiet span.

    Returns ``(metrics, provenance)``; metrics is None when no attempt
    produced a valid payload (caller falls back to the in-process path,
    recording its own steal under ``fallback_steal``)."""
    attempts: list[dict] = []
    for i in range(1 + STREAM_STEAL_RETRIES):
        try:
            payload = _run_stream_subprocess()
        except Exception as exc:
            print(
                f"bench: --stream-only attempt {i + 1} failed ({exc!r})",
                file=sys.stderr,
            )
            attempts.append({"valid": False, "err": repr(exc)[:300]})
            continue
        steal = payload.get("stream_steal") or {"available": False}
        attempts.append(
            {
                "valid": True,
                "sustained_eps": payload["stream_sustained_eps"],
                "p95_ms": payload["stream_p95_latency_ms"],
                "recovery_s": payload["recovery_s"],
                "batches": payload.get("stream_batches"),
                "gate": payload.get("stream_gate"),
                "steal": steal,
            }
        )
        if not steal.get("available") or steal.get("steal_pct") is None:
            break  # weather-unknown: keep, never retry forever (ADVICE r13)
        if steal["steal_pct"] <= THROUGHPUT_STEAL_GATE_PCT:
            break
        if i < STREAM_STEAL_RETRIES:
            print(
                f"bench: stream attempt {i + 1} saw {steal['steal_pct']}% "
                f"steal (> gate {THROUGHPUT_STEAL_GATE_PCT}%); retrying",
                file=sys.stderr,
            )

    provenance: dict = {
        # per-attempt records minus the bulky stream_gate timeline (the kept
        # attempt's gate ships as the payload's top-level stream_gate)
        "attempts": [
            {k: v for k, v in a.items() if k != "gate"} for a in attempts
        ],
        "gate_pct": THROUGHPUT_STEAL_GATE_PCT,
        "selector": "max-sustained/min-p95/min-recovery",
    }
    idx_valid = [i for i, a in enumerate(attempts) if a.get("valid")]
    if not idx_valid:
        provenance.update(kept=None, gate_cleared=None)
        return None, provenance
    i_sus = max(idx_valid, key=lambda i: attempts[i]["sustained_eps"])
    i_p95 = min(idx_valid, key=lambda i: attempts[i]["p95_ms"])
    i_rec = min(idx_valid, key=lambda i: attempts[i]["recovery_s"])
    provenance.update(
        kept={
            "sustained_attempt": i_sus + 1,
            "p95_attempt": i_p95 + 1,
            "recovery_attempt": i_rec + 1,
        },
        gate_cleared=all(
            _steal_quiet(attempts[i]["steal"]) for i in {i_sus, i_p95, i_rec}
        ),
    )
    metrics = {
        "stream_sustained_eps": attempts[i_sus]["sustained_eps"],
        "stream_p95_latency_ms": attempts[i_p95]["p95_ms"],
        "recovery_s": attempts[i_rec]["recovery_s"],
        "stream_batches": attempts[i_sus]["batches"],
        "stream_gate": attempts[i_sus]["gate"],
    }
    return metrics, provenance


def stream_payload_ok(payload: dict, rate_eps: float | None = None) -> bool:
    """True iff a --stream-only subprocess payload carries REAL measurements.

    Two observed failure shapes (both r7):
    - sentinels (0.0 eps / -1.0 ms / -1.0 s) when the stream produced no
      measurable batches — startup starvation under heavy host load
      (closing run 3); and
    - catch-up readings: a slow start lets the rate source build a
      backlog, and the window then measures backlog replay at max batch
      throughput (150k "sustained" eps at 50k input) — a throughput number
      that is real work but NOT sustained steady-state ingest, so with
      ``rate_eps`` given, sustained must be <= 1.5x the input rate.
    Either shape parses as valid JSON, so without this check it would be
    recorded as the round's headline streaming numbers.  A third shape
    (r8): a degraded window with <5 measured batches — too short for a
    stable mean p95 and rate estimate (the methodology documents a ~17
    batch window).  Bad payloads trigger a retry, then the in-process
    fallback."""
    try:
        sustained = float(payload["stream_sustained_eps"])
        if "stream_batches" in payload and int(payload["stream_batches"]) < 5:
            return False
        return (
            sustained > 0
            and (rate_eps is None or sustained <= 1.5 * rate_eps)
            and float(payload["stream_p95_latency_ms"]) > 0
            and float(payload["recovery_s"]) > 0
        )
    except (KeyError, TypeError, ValueError):
        return False


def streaming_live(spark, rate_eps: int = 50_000, run_s: float = 20.0):
    """exp1 methodology, live: rate source at ``rate_eps`` (≈7x the
    reference's saturation point) -> wire JSON -> parse -> fused per-batch
    metrics, 1 s triggers.  First batches are warm-up (BASELINE excluded
    120 s of a 360 s run; we exclude the first 3 of ~17).  A ~20 s window
    keeps the mean per-batch p95 stable against ambient load — at 12 s a
    single slow batch moved the mean by hundreds of ms run-to-run.
    Returns sustained events/s and the mean per-batch p95 end-to-end
    latency — the two headline numbers of BASELINE exp1."""
    import shutil
    import tempfile

    from kafka_spark_streaming_eval_spark.streaming.generator import synth_events_stream
    from kafka_spark_streaming_eval_spark.streaming.metrics_job import (
        MetricsCollector,
        run_metrics_stream,
    )

    ev = synth_events_stream(spark, rows_per_second=rate_eps)
    wire = ev.select(
        F.to_json(
            F.struct(
                "event_id",
                F.unix_millis("ts").alias("created_ts"),  # real emission time
                "user_id",
                "event_type",
                "value",
                "payload",
            )
        ).alias("value")
    )
    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    collector = MetricsCollector()
    query, sink = run_metrics_stream(
        parse_events(wire), ckpt, trigger_sec=1, collector=collector
    )
    # Open the measurement window only once the stream is CAUGHT UP.
    # Startup (JVM boot + source init + first micro-batch plan) is
    # load-dependent, and the rate source back-fills from t=0, so the first
    # non-empty batches process the startup backlog at max batch throughput
    # with inflated event-time latency: r7 saw BOTH failure shapes — a 20 s
    # window with zero non-empty batches (sentinel 0.0 eps, closing run 3)
    # and a window full of catch-up batches (150k "sustained" eps at 50k
    # input with 3.7 s p95).  Steady state = a non-empty batch carrying
    # ~rate_eps x trigger_sec events (1.5x margin; catch-up batches are
    # several x larger).  Startup/backlog transients are not part of
    # BASELINE exp1's sustained-throughput definition (it excluded 120 s
    # of a 360 s run as warm-up), so gating here is methodology-faithful.
    # SPARK_GRAFT_STREAM_DEBUG=1: narrate the gate timeline to stderr — the
    # cold-start/adverse-load rehearsal evidence (VERDICT r7 item 4) needs to
    # show WHEN the gate engaged and what batch sizes it rejected as backlog.
    debug = os.environ.get("SPARK_GRAFT_STREAM_DEBUG") == "1"
    t_start = time.time()
    steady_from = None
    seen = 0
    # Compact gate provenance, recorded UNCONDITIONALLY (VERDICT r8 item 7):
    # every committed streaming number carries the evidence of when its
    # measurement window opened and what batch sizes were rejected as
    # startup backlog.  Shipped in BENCH_DETAILS.json as "stream_gate".
    gate_timeline: list[list] = []  # [offset_s, batch_events] per observed batch
    gate: dict = {
        "engaged": False,
        "engage_offset_s": None,
        "gated_batches": None,
        # flips to True if more batches were observed than the 40-entry
        # timeline bound can record (ADVICE r9: silent truncation read as
        # "this is every batch" when it wasn't)
        "timeline_truncated": False,
    }
    start_deadline = time.time() + 90
    while time.time() < start_deadline:
        rows_now = list(sink.rows)
        if len(rows_now) > seen:
            for r in rows_now[seen:]:
                if len(gate_timeline) < 40:  # bound the artifact
                    gate_timeline.append(
                        [round(time.time() - t_start, 1), int(r.batch_events)]
                    )
                else:
                    gate["timeline_truncated"] = True
                if debug:
                    print(
                        f"stream-gate: +{time.time() - t_start:5.1f}s batch "
                        f"events={r.batch_events}"
                        + (
                            " [backlog/startup, gated out]"
                            if not 0 < r.batch_events <= 1.5 * rate_eps
                            else " [steady]"
                        ),
                        file=sys.stderr,
                        flush=True,
                    )
            seen = len(rows_now)
        if rows_now and 0 < rows_now[-1].batch_events <= 1.5 * rate_eps:
            # -1: the batch that satisfied the gate IS the first steady batch
            # and must stay in the pool (the rows[3:] warm-up trim below
            # already shortens a ~20-batch window; don't lose another one).
            steady_from = len(rows_now) - 1
            gate.update(
                engaged=True,
                engage_offset_s=round(time.time() - t_start, 1),
                gated_batches=steady_from,
            )
            if debug:
                print(
                    f"stream-gate: ENGAGED at +{time.time() - t_start:.1f}s "
                    f"after {steady_from} gated batches; measurement window "
                    f"opens on batch {steady_from + 1} "
                    f"(events={rows_now[-1].batch_events})",
                    file=sys.stderr,
                    flush=True,
                )
            break
        time.sleep(0.25)
    if debug and steady_from is None:
        print(
            "stream-gate: NOT engaged within 90s — payload will be "
            "sentinel-shaped and must be rejected by stream_payload_ok",
            file=sys.stderr,
            flush=True,
        )
    time.sleep(run_s)
    query.stop()
    query.awaitTermination()
    t_kill = time.time()

    pool = list(sink.rows)
    if steady_from is not None:
        pool = pool[steady_from:]
    rows = [r for r in pool if r.batch_events > 0]
    measured = rows[3:] if len(rows) > 4 else rows
    n_batches = len(measured)
    # N batches carry N trigger intervals of events, but first-to-last
    # timestamps span only N-1 intervals — divide by span alone and a short
    # window inflates eps by N/(N-1).  r8 run-1 recorded EXACTLY 75,000 eps
    # at 50k input from a 3-batch window (the 1.5x gate boundary, = 3/2 x
    # 50k): real span bias, not real throughput.  Scale the denominator to
    # N/(N-1); a 1-batch window has no measurable rate at all.
    # The correction is per ELAPSED trigger interval, not per non-empty
    # batch: a mid-window empty batch keeps its gap inside span_s while
    # shrinking the non-empty count, so scaling by N/(N-1) over non-empty
    # batches would no longer match the stated model.  batch ids count the
    # actual intervals covered (= last_id - first_id + 1); with no empty
    # batches this equals n_batches and the two forms agree exactly.
    # ASSUMPTION (cross-checked below, ADVICE r9): every batch-id step is
    # one elapsed trigger interval — true for the rate source, which emits
    # rows every second, so the engine never skips a data-less trigger and
    # ids stay dense.  If a source COULD go data-less, skipped triggers
    # would leave ids dense while span_s grows, id_intervals would
    # undercount the elapsed intervals, and (intervals-1)/intervals would
    # over-deflate.  The cross-check compares id-derived intervals against
    # wall-clock-derived intervals (1 s trigger) and records the mismatch
    # in the gate provenance instead of silently trusting the model.
    if n_batches >= 2:
        span_s = max(measured[-1].epoch_sec - measured[0].epoch_sec, 1)
        intervals = int(measured[-1].batch_id - measured[0].batch_id) + 1
        elapsed_intervals = int(round(span_s)) + 1  # trigger_sec = 1
        gate["span_check"] = {
            "id_intervals": intervals,
            "elapsed_intervals": elapsed_intervals,
            # mismatch beyond rounding slack means the data-less-interval
            # assumption did not hold for this run's source
            "model_ok": abs(intervals - elapsed_intervals) <= max(
                2, elapsed_intervals // 4
            ),
        }
        sustained = sum(r.batch_events for r in measured) * (intervals - 1) / (
            span_s * intervals
        )
    else:
        sustained = 0.0
    p95 = (
        sum(r.p95_latency_ms for r in measured) / len(measured) if measured else -1.0
    )

    # exp3: restart from the checkpoint, recovery gap = kill -> first
    # recovered batch (the reference measured 47 s with manual restart).
    collector2 = MetricsCollector()
    query2, sink2 = run_metrics_stream(
        parse_events(wire), ckpt, trigger_sec=1, collector=collector2
    )
    recovery_s = -1.0
    deadline = time.time() + 60
    while time.time() < deadline:
        if sink2.rows:
            recovery_s = time.time() - t_kill
            break
        time.sleep(0.1)
    query2.stop()
    query2.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    gate["timeline"] = gate_timeline
    gate["kept_batches"] = n_batches
    return sustained, p95, recovery_s, n_batches, gate


def main() -> None:
    _pin_heap()
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    run_meter = StealMeter()
    spark = get_spark("bench")
    specs = all_queries()

    # Warm-up: boots the JVM, JIT, filesystem caches — excluded from timing.
    specs["ref_minmax_anchor"].fn(spark, sf_dir).count()

    # SPARK_GRAFT_BENCH_SHUFFLE=<seed>: time the same queries in a
    # deterministically shuffled order — the churn-audit knob that separates
    # "this query got slower" from "this JVM position got slower".
    order = list(HEADLINE)
    shuffle_seed = os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE")
    if shuffle_seed:
        import random

        random.Random(int(shuffle_seed)).shuffle(order)

    def run_headline(_attempt: int) -> dict[str, float]:
        t: dict[str, float] = {}
        for name in order:
            t[name] = round(time_query(specs[name].fn, spark, sf_dir), 4)
        return t

    timings, headline_weather = walltime_phase_gated(
        run_headline, HEADLINE_STEAL_RETRIES, "headline"
    )

    # tier2 coverage rotation (disable with SPARK_GRAFT_BENCH_TIER2=0).
    # Wall-clock budgeted (SPARK_GRAFT_BENCH_TIER2_BUDGET_S, default 200 s —
    # the slowest observed full-92 pass took 125 s under ambient host load,
    # r7 closing run 3, and a budget cut would delay full-registry timing
    # coverage by a round) so bench runtime stays bounded as the registry
    # grows: queries cut by the budget stay never/stalest-benched and lead
    # the next round's rotation.  The steal gate retries re-run EXACTLY the
    # set attempt 1 completed, so attempt totals compare the same queries —
    # i.e. the env var is a PER-ATTEMPT budget (ADVICE r13): a stormy first
    # attempt triggers one full re-run of the completed set, so worst-case
    # tier2 wall time is ~(1 + TIER2_STEAL_RETRIES) x the budget.
    tier2: dict[str, float] = {}
    tier2_weather: dict = {"attempts": [], "kept_attempt": None,
                           "gate_pct": THROUGHPUT_STEAL_GATE_PCT,
                           "selector": "min-total", "gate_cleared": None}
    if os.environ.get("SPARK_GRAFT_BENCH_TIER2", "1") != "0":
        tier2_budget = float(os.environ.get("SPARK_GRAFT_BENCH_TIER2_BUDGET_S", "200"))
        tier2_names = tier2_rotation(specs)
        completed: list[str] = []

        def run_tier2(attempt: int) -> dict[str, float]:
            t: dict[str, float] = {}
            if attempt == 0:
                t2_start = time.perf_counter()
                for name in tier2_names:
                    if time.perf_counter() - t2_start > tier2_budget:
                        print(
                            f"bench: tier2 budget {tier2_budget:.0f}s hit after "
                            f"{len(t)} queries; rest stay stalest for next round",
                            file=sys.stderr,
                        )
                        break
                    t[name] = round(
                        time_query(specs[name].fn, spark, sf_dir, runs=1), 4
                    )
                completed[:] = list(t)
            else:
                for name in completed:
                    t[name] = round(
                        time_query(specs[name].fn, spark, sf_dir, runs=1), 4
                    )
            return t

        tier2, tier2_weather = walltime_phase_gated(
            run_tier2, TIER2_STEAL_RETRIES, "tier2"
        )

    eps, throughput_weather = throughput_eps_gated(spark)

    # The latency-sensitive streaming measurement runs in a FRESH
    # subprocess (own JVM) — matching BASELINE exp1's methodology, which
    # measured the reference's stream standalone.  In-process it follows
    # 57 batch queries + two 1M-event throughput passes whose heap/code-
    # cache churn inflates p95 by ~30% even after a clearCache+GC settle
    # (round-5 isolation check: 1.45 s standalone vs 1.9 s in-process on
    # the same machine).  Falls back to the settled in-process path if the
    # subprocess fails for any environmental reason.
    # stream_isolation records WHICH methodology produced the streaming
    # numbers — "subprocess" (clean, matches BASELINE's standalone run) or
    # "in-process" (the ~30%-worse fallback) — so a silently failed
    # subprocess can never masquerade as the documented methodology.
    stream_eps = stream_p95 = recovery_s = None
    stream_batches = None
    stream_gate = None
    stream_isolation = "subprocess"

    stream_metrics, stream_weather = stream_phase_gated()
    if stream_metrics is not None:
        stream_eps = stream_metrics["stream_sustained_eps"]
        stream_p95 = stream_metrics["stream_p95_latency_ms"]
        recovery_s = stream_metrics["recovery_s"]
        stream_batches = stream_metrics["stream_batches"]
        stream_gate = stream_metrics["stream_gate"]
    if stream_eps is None:
        # settled in-process fallback (pre-r5 methodology)
        print(
            "bench: all --stream-only attempts failed; "
            "falling back to in-process streaming measurement",
            file=sys.stderr,
        )
        stream_isolation = "in-process"
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2.0)
        fallback_meter = StealMeter()
        stream_eps, stream_p95, recovery_s, stream_batches, stream_gate = (
            streaming_live(spark)
        )
        fallback_steal = fallback_meter.finish()
        stream_weather["fallback_steal"] = fallback_steal
        # An in-process fallback still earns gate_cleared only if ITS span
        # was quiet — methodology is degraded but weather attestation is not.
        stream_weather["gate_cleared"] = _steal_quiet(fallback_steal)
        # The fallback triple gets the SAME plausibility gate as the
        # subprocess path: a starved/backlogged in-process run can produce
        # the identical sentinel / catch-up shapes (the r7 incident), and
        # without this check they'd be recorded as headline numbers.
        fallback_payload = {
            "stream_sustained_eps": stream_eps,
            "stream_p95_latency_ms": stream_p95,
            "recovery_s": recovery_s,
            "stream_batches": stream_batches,
        }
        if not stream_payload_ok(fallback_payload, rate_eps=50_000):
            print(
                f"bench: in-process fallback payload implausible "
                f"{fallback_payload}; recording nulls",
                file=sys.stderr,
            )
            stream_eps = stream_p95 = recovery_s = None
            stream_isolation = "in-process-invalid"
    total = round(sum(timings.values()), 4)
    # vs-own-last-measured deltas (read BEFORE this run's sidecar overwrite
    # destroys the previous measurement): the round-over-round comparability
    # field — tier2_total is a rotation-mix artifact; these are not.
    last_measured = _last_measured_secs()
    run_steal = run_meter.finish()
    kept_attempt = throughput_weather["attempts"][
        throughput_weather["kept_attempt"] - 1
    ]["steal"]
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "tier2_queries": tier2,
        "tier2_total": round(sum(tier2.values()), 4),
        "tier2_n": len(tier2),
        "tier2_policy": "stalest-first rotation over non-headline, runs=1",
        "vs_last": vs_last_fields({**timings, **tier2}, last_measured),
        "sf": sf,
        "throughput_eps": round(eps, 1),
        "throughput_events": THROUGHPUT_EVENTS,
        # Weather self-description (VERDICT r11 item 1): hypervisor steal
        # measured from /proc/stat across each phase, so this payload is
        # interpretable without SCALE.md archaeology.  Scalars on the stdout
        # line; the full per-phase/per-attempt breakdown rides the sidecar.
        "steal_pct_run": run_steal.get("steal_pct"),
        "throughput_steal_pct": kept_attempt.get("steal_pct"),
        "throughput_steal_gate_ok": throughput_weather["gate_cleared"],
        "headline_steal_pct": headline_weather["attempts"][
            headline_weather["kept_attempt"] - 1
        ]["steal"].get("steal_pct"),
        "headline_steal_gate_ok": headline_weather["gate_cleared"],
        "headline_attempts": len(headline_weather["attempts"]),
        "tier2_steal_gate_ok": tier2_weather["gate_cleared"],
        "stream_steal_gate_ok": stream_weather.get("gate_cleared"),
        "stream_attempts": len(stream_weather["attempts"]),
        "steal": {
            "run": run_steal,
            "headline": headline_weather,
            "tier2": tier2_weather,
            "throughput": throughput_weather,
            "stream": stream_weather,
        },
        "stream_input_eps": 50000,
        "stream_isolation": stream_isolation,
        "jvm_heap": "16g-pinned" if _HEAP_PINNED else "inherited",
        "stream_sustained_eps": round(stream_eps, 1) if stream_eps is not None else None,
        "stream_p95_latency_ms": round(stream_p95, 1) if stream_p95 is not None else None,
        "recovery_s": round(recovery_s, 2) if recovery_s is not None else None,
        "stream_batches": stream_batches,
        "stream_gate": stream_gate,
        "baseline_throughput_eps": 6914.7,
        "baseline_p95_latency_ms": 4704.0,
        "baseline_recovery_s": 47.0,
    }
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), DETAILS_FILE
    )
    try:
        with open(details_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # read-only checkout must not kill the bench
        print(f"bench: could not write {details_path}: {exc!r}", file=sys.stderr)
    # compact separators: the budget check in budget_stdout_payload is
    # computed with the same encoder, so the printed line length matches
    print(_enc(budget_stdout_payload(full)))
    spark.stop()


def stream_only() -> None:
    """Standalone streaming measurement (fresh JVM): prints one JSON line
    with the three exp1/exp3 numbers for the parent bench to absorb."""
    _pin_heap()
    meter = StealMeter()
    spark = get_spark("bench-stream")
    sustained, p95, recovery, n_batches, gate = streaming_live(spark)
    print(
        json.dumps(
            {
                "stream_sustained_eps": round(sustained, 1),
                "stream_p95_latency_ms": round(p95, 1),
                "recovery_s": round(recovery, 2),
                "stream_batches": n_batches,
                "stream_gate": gate,
                "stream_steal": meter.finish(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(stream_only() if "--stream-only" in sys.argv[1:] else main())
