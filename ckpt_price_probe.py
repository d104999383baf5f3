#!/usr/bin/env python
"""Price the reliable-checkpoint mode of ``session.iter_checkpoint``
(VERDICT r11 item 2).

Round 11 closed the localCheckpoint loss-window with a one-variable
switch: ``SPARK_GRAFT_CHECKPOINT_DIR=<durable path>`` flips every
iterative call site (pagerank, BFS, link-prediction, dedup
connected-components, DSIR) from executor-local ``localCheckpoint`` to
reliable ``DataFrame.checkpoint`` — and verified BOTH modes hash-match
the oracle (`results/executor_loss_ckpt_ab_r11.json`).  What shipped
without a price tag is the wall-time premium: reliable checkpoint writes
every truncation's blocks through the checkpoint filesystem instead of
keeping them in executor block managers, and the 100 TB recommendation
("point it at HDFS/S3") should say what that costs.

This probe measures it on the executor-loss topology
(``local-cluster[2,8,8192]`` — two separate executor JVMs, so checkpoint
I/O crosses process boundaries like a real fleet, though the
"filesystem" is the local /tmp disk; an HDFS/S3 round-trip adds network
on top — the measured number is therefore a LOWER bound on the premium
and the honest sandbox framing).

Per (factor, query): one fresh driver process runs warm-up, then
interleaved local/reliable measured passes (A/B in the SAME session —
the scale_probe session_id discipline: a premium must never divide
walls from different JVMs).  ``iter_checkpoint`` reads the env var at
call time, and reliable mode additionally needs ``setCheckpointDir``
once; the worker flips the env var between passes, which exercises the
exact switch users get.

The ``--kill`` mode completes the r11 executor-loss matrix: SIGKILL one
executor mid-run (injected when the job is ~50% through its own
baseline wall) WITH reliable mode on — r11 measured kill-survival for
the default mode and correctness for reliable mode, but never
kill-during-reliable: the configuration the switch exists for.

Usage::

    python ckpt_price_probe.py                 # f30 runs=2 + f100 runs=1 + kill run
    python ckpt_price_probe.py --factors 30 --runs 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(REPO, "results")

ITER_QUERIES = [
    "graph_pagerank_trade",
    "graph_bfs_shortest_path",
    "graph_link_prediction",
    "dedup_cluster_components",
    "pipeline_dsir_importance",
]
# fact tables the five queries scan (dims carry over in build_synth)
PROBE_TABLES = {"documents", "lineitem", "orders"}
MASTER = "local-cluster[2,8,8192]"


def run_worker(args: argparse.Namespace) -> None:
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 6g pyspark-shell")
    sys.path.insert(0, REPO)
    from bench import StealMeter  # weather self-description (r11 item 1)
    from pyspark.sql import SparkSession

    from kafka_spark_streaming_eval_spark.plans.registry import all_queries

    meter = StealMeter()

    os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)  # start in local mode
    # Same engine configs as session.get_spark, on the executor-loss
    # topology (get_spark pins local[n]; two separate executor JVMs here).
    spark = (
        SparkSession.builder.master(MASTER)
        .appName(f"ckpt-price-{args.query}")
        # local-cluster's third arg (8192) is the WORKER's memory allowance;
        # executor heap still defaults to 1g without this and the f30
        # pagerank build OOMs (measured: "Command exited with code 52").
        .config("spark.executor.memory", "7g")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "128"
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    app_id = sc.applicationId
    fn = all_queries()[args.query].fn
    ckpt_dir = tempfile.mkdtemp(prefix="sgraft_ckpt_reliable_")

    def timed() -> tuple[float, int]:
        t0 = time.perf_counter()
        n = fn(spark, args.sf_dir).count()
        return time.perf_counter() - t0, n

    # Warm-up (JVM/JIT/page cache + executor registration), local mode.
    warm_s, golden_rows = timed()

    walls: dict[str, list[float]] = {"local": [], "reliable": []}
    rows_seen: dict[str, set[int]] = {"local": set(), "reliable": set()}
    # Interleave modes so ambient drift hits both equally (local first:
    # its first pass then absorbs any residual post-warm-up settling,
    # biasing AGAINST overstating the reliable premium).
    for _ in range(args.runs):
        for mode in ("local", "reliable"):
            if mode == "reliable":
                os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = ckpt_dir
            else:
                os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
            wall, n = timed()
            walls[mode].append(round(wall, 2))
            rows_seen[mode].add(n)

    kill_info: dict = {}
    if args.kill:
        # Kill one executor mid-run in RELIABLE mode.  Injection point:
        # half the reliable-mode wall measured above.
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = ckpt_dir
        delay = min(walls["reliable"]) * args.kill_frac

        def killer() -> None:
            time.sleep(delay)
            out = subprocess.run(
                ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
                capture_output=True, text=True,
            ).stdout.split()
            pids = sorted(int(p) for p in out)
            if pids:
                os.kill(pids[0], signal.SIGKILL)
                kill_info.update(victim_pid=pids[0], killed_at_s=round(delay, 2))

        th = threading.Thread(target=killer)
        th.start()
        t0 = time.perf_counter()
        try:
            wall, n = timed()
            kill_info.update(
                completed=True,
                wall_s=round(wall, 2),
                rows=n,
                rows_match_golden=n == golden_rows,
            )
        except Exception as exc:  # job failure IS a result here
            kill_info.update(
                completed=False,
                wall_s=round(time.perf_counter() - t0, 2),
                error=repr(exc)[:400],
            )
        th.join(timeout=5)
        kill_info["injected"] = "victim_pid" in kill_info

    spark.stop()
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    local_best = min(walls["local"])
    reliable_best = min(walls["reliable"])
    out = {
        "query": args.query,
        "sf_dir": args.sf_dir,
        "master": MASTER,
        "runs": args.runs,
        "warm_s": round(warm_s, 2),
        "golden_rows": golden_rows,
        "rows_agree_across_modes": rows_seen["local"] == rows_seen["reliable"]
        == {golden_rows},
        "local_walls_s": walls["local"],
        "reliable_walls_s": walls["reliable"],
        "local_best_s": local_best,
        "reliable_best_s": reliable_best,
        "reliable_premium": round(reliable_best / local_best, 3)
        if local_best
        else None,
        "steal": meter.finish(),
    }
    if args.kill:
        out["kill_during_reliable"] = kill_info
    print(json.dumps(out), flush=True)


def orchestrate(args: argparse.Namespace) -> None:
    # Fail-loud missed-injection guard (ADVICE r12): the kill cell is pinned
    # to (factors[0], dedup_cluster_components).  If --kill is requested but
    # --queries excludes that query (or no factors are given), no kill run
    # would ever be scheduled and the probe would silently report a no-kill
    # matrix as if the fault cell had been measured.  Same policy
    # decommission_probe enforces.  Checked BEFORE the synth build so a
    # misconfigured invocation fails in milliseconds, not minutes.
    if args.kill and (
        "dedup_cluster_components" not in args.queries or not args.factors
    ):
        raise SystemExit(
            "--kill requested but the kill cell (factors[0] x "
            "dedup_cluster_components) is not in the plan; add the query / "
            "a factor or drop --kill."
        )

    sys.path.insert(0, REPO)
    from scale_probe import build_synth

    plan = []  # (factor, sf_dir, runs)
    for factor in args.factors:
        synth = f"/tmp/sgraft_scaleprobe_f{factor}"
        build_synth(synth, factor, tables=PROBE_TABLES)
        plan.append((factor, synth, args.runs if factor <= 30 else 1))

    runs = []
    kill_scheduled = False
    for factor, sf_dir, nruns in plan:
        for query in args.queries:
            kill = (
                args.kill
                and factor == args.factors[0]
                and query == "dedup_cluster_components"
            )
            kill_scheduled = kill_scheduled or kill
            cmd = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--query", query, "--sf-dir", sf_dir, "--runs", str(nruns),
            ] + (["--kill"] if kill else [])
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode != 0 or not line:
                raise SystemExit(
                    f"worker ({factor}x {query}) failed rc={proc.returncode}:\n"
                    f"{proc.stderr[-3000:]}"
                )
            rec = json.loads(line[-1])
            rec["factor"] = factor
            if kill and not rec.get("kill_during_reliable", {}).get("injected"):
                raise SystemExit(
                    f"kill run did not inject (stage raced the timer or "
                    f"pgrep matched nothing): {rec}"
                )
            runs.append(rec)
            print(
                f"ckpt-price f{factor} {query}: local {rec['local_best_s']}s "
                f"reliable {rec['reliable_best_s']}s "
                f"premium {rec['reliable_premium']}x",
                file=sys.stderr, flush=True,
            )

    if args.kill and not kill_scheduled:
        # Covers orderings the pre-loop guard can't see (e.g. an empty
        # factor plan): never let a requested fault injection vanish.
        raise SystemExit(
            "--kill requested but no kill run was scheduled by the plan "
            "loop; refusing to emit a matrix that looks fault-measured."
        )

    result = {
        "probe": "reliable_checkpoint_price",
        "master": MASTER,
        "note": (
            "checkpoint FS is local /tmp disk shared by both executor JVMs; "
            "an HDFS/S3 target adds network on top, so premiums here are a "
            "lower bound for a real fleet"
        ),
        "runs": runs,
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, args.out), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--query", default="dedup_cluster_components")
    p.add_argument("--sf-dir", default="/tmp/sgraft_scaleprobe_f30")
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--kill", action="store_true", default=None)
    p.add_argument("--no-kill", action="store_true")
    p.add_argument("--kill-frac", type=float, default=0.5)
    p.add_argument("--factors", type=int, nargs="+", default=[30, 100])
    p.add_argument("--queries", nargs="+", default=ITER_QUERIES)
    p.add_argument("--out", default="ckpt_price_r12.json")
    args = p.parse_args()
    if args.worker:
        run_worker(args)
    else:
        if args.kill is None:
            args.kill = not args.no_kill
        orchestrate(args)


if __name__ == "__main__":
    main()
