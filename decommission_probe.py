#!/usr/bin/env python
"""Graceful executor-decommission probe: planned node loss vs crash loss,
measured on the two-host standalone topology.

`results/executor_loss_r11.json` measured CRASH loss (SIGKILL): exact
results, +35% wall when map outputs die with the victim and the stage
re-runs them.  Production fleets lose nodes the OTHER way far more often
— spot/preemptible reclamation arrives with notice — and Spark's answer
is decommissioning (`spark.decommission.enabled`): SIGPWR tells the
executor to drain, and with `spark.storage.decommission.*` enabled its
shuffle/RDD blocks MIGRATE to peer block managers so reducers never hit
FetchFailed and nothing is recomputed.  This probe measures that path
against both the baseline and the crash path, on the same cluster, same
job, same injection point.

Topology: the `straggler_probe.start_cluster` standalone master + two
workers on distinct loopback hosts (127.0.0.2/127.0.0.3).  Job: 60M-row
groupBy into 4M keys (≈10² MB of real map output) folded to an exact
integer checksum.  Injection: a watcher thread polls
`statusTracker().getActiveStageIds()` and signals the victim executor
the moment the REDUCE stage becomes active — the point where the
victim's completed map outputs are still needed by every reducer.

Modes (fresh driver process each; each process first runs the job twice
uninjected and takes the warm second run as its own baseline):

- ``baseline``      — no signal.
- ``decommission``  — SIGPWR; expect ~0 overhead, victim log shows
  `Decommission executor` + `Migrated migrate_shuffle_*` lines (the
  evidence is parsed from the victim's work-dir stderr, not inferred).
- ``sigkill``       — SIGKILL; expect the executor-loss behavior: exact
  result after stage retry, wall overhead ≈ the recomputed map work.

Usage::

    python decommission_probe.py            # cluster + all 3 modes
"""

from __future__ import annotations

import argparse
import glob
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
MASTER_URL = "spark://127.0.0.1:7177"


def parse_decommission_log(text: str) -> dict:
    """Extract decommission evidence from an executor stderr log.

    Returns whether the SIGPWR handler fired, how many shuffle blocks
    the BlockManagerDecommissioner reports migrating, and whether the
    migration loop shut down cleanly.
    """
    migrated = sum(
        1
        for line in text.splitlines()
        if "BlockManagerDecommissioner" in line
        and "Migrated migrate_shuffle_" in line
    )
    return {
        "decommission_triggered": "Decommission executor" in text,
        "migration_started": "Starting block migration" in text,
        "shuffle_blocks_migrated": migrated,
        "migration_stopped": "Stopped block migration" in text,
    }


def run_worker(args: argparse.Namespace) -> None:
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 6g pyspark-shell")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    mode = args.mode
    spark = (
        SparkSession.builder.master(MASTER_URL)
        .appName(f"decommission-probe-{mode}")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.executor.cores", "4")
        .config("spark.executor.memory", "3g")
        .config("spark.cores.max", "8")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.decommission.enabled", "true")
        .config("spark.storage.decommission.enabled", "true")
        .config("spark.storage.decommission.shuffleBlocks.enabled", "true")
        .config("spark.storage.decommission.rddBlocks.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    sc = spark.sparkContext
    app_id = sc.applicationId

    def build():
        base = spark.range(args.rows).withColumn(
            "k", F.pmod(F.col("id") * F.lit(2654435761), F.lit(args.nkeys))
        )
        return (
            base.groupBy("k")
            .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.col("s") * F.col("c")).alias("checksum"),
                F.count(F.lit(1)).alias("groups"),
            )
        )

    # Two uninjected executions: cold (codegen/JIT) then warm baseline.
    build().collect()
    t0 = time.time()
    golden = build().collect()[0]
    base_wall = time.time() - t0

    victim_info: dict = {}
    stop = threading.Event()

    def injector():
        st = sc.statusTracker()
        first = None
        while not stop.is_set():
            ids = st.getActiveStageIds()
            if ids:
                if first is None:
                    first = min(ids)
                later = [i for i in ids if i > first]
                if later:
                    # ADVICE r11: scope pgrep to THIS app — a bare
                    # CoarseGrainedExecutorBackend match could select a
                    # stale executor from a previous app if one lingered.
                    # The executor cmdline carries `--app-id <appId>`.
                    out = subprocess.run(
                        ["pgrep", "-f",
                         f"CoarseGrainedExecutorBackend.*{app_id}"],
                        capture_output=True, text=True,
                    ).stdout.split()
                    pids = sorted(int(p) for p in out)
                    if pids:
                        pid = pids[0]
                        # Pin WHICH executor (and host) the victim is,
                        # from its own cmdline, BEFORE signalling — the
                        # evidence parse then reads only that executor's
                        # work-dir stderr instead of merging both workers.
                        exec_id = victim_host = None
                        try:
                            with open(f"/proc/{pid}/cmdline", "rb") as f:
                                argv = f.read().split(b"\0")

                            def argval(flag: bytes):
                                try:
                                    return argv[argv.index(flag) + 1].decode()
                                except (ValueError, IndexError):
                                    return None

                            exec_id = argval(b"--executor-id")
                            victim_host = argval(b"--hostname")
                        except OSError:
                            pass
                        sig = (
                            signal.SIGPWR if mode == "decommission"
                            else signal.SIGKILL
                        )
                        os.kill(pid, sig)
                        victim_info.update(
                            victim_pid=pid,
                            victim_exec_id=exec_id,
                            victim_host=victim_host,
                            signal=signal.Signals(sig).name,
                            injected_at_s=round(time.time() - t1, 2),
                        )
                    return
            time.sleep(0.05)

    t1 = time.time()
    th = None
    if mode != "baseline":
        th = threading.Thread(target=injector)
        th.start()
    row = build().collect()[0]
    wall = time.time() - t1
    stop.set()
    if th:
        th.join(timeout=5)
    spark.stop()

    out = {
        "mode": mode,
        "wall_s": round(wall, 2),
        "base_wall_s": round(base_wall, 2),
        "overhead_vs_own_baseline": round(wall / base_wall, 2) if base_wall else None,
        "checksum": int(row["checksum"]),
        "groups": int(row["groups"]),
        "matches_own_baseline": int(row["checksum"]) == int(golden["checksum"])
        and int(row["groups"]) == int(golden["groups"]),
        # ADVICE r11: a missed injection (map stage finished between polls,
        # pgrep came back empty) must be machine-visible, not inferred from
        # absent victim_pid keys — the orchestrator fails the run on this.
        "injected": bool(victim_info) if mode != "baseline" else None,
        **victim_info,
    }
    # Victim-log evidence: the executor work dirs live under the cluster
    # scratch passed by the orchestrator.  ADVICE r11: parse ONLY the
    # victim executor's own stderr (work*/<app>/<exec_id>/) — merging both
    # workers' logs attributed migration lines to the victim by filter
    # wording alone.  Falls back to the merged read (and says so) only if
    # the exec id could not be pinned from /proc before the signal.
    if mode == "decommission" and args.scratch:
        exec_id = victim_info.get("victim_exec_id")
        pattern = os.path.join(
            args.scratch, "work*", app_id, exec_id if exec_id else "*", "stderr"
        )
        files = glob.glob(pattern)
        # ADVICE r12: a pinned exec_id whose glob matches ZERO files (work
        # dir layout drift, early cleanup) must not report absent migration
        # evidence as "measured on the victim's log" — fall back to the
        # merged read and label the scope honestly, recording the matched
        # file count either way.
        if exec_id and not files:
            pattern = os.path.join(args.scratch, "work*", app_id, "*", "stderr")
            files = glob.glob(pattern)
            exec_id = None
        texts = []
        for p in files:
            with open(p, errors="replace") as f:
                texts.append(f.read())
        out["evidence_scope"] = (
            "victim-executor" if exec_id else "merged-fallback"
        )
        out["evidence_files"] = len(files)
        out.update(parse_decommission_log("\n".join(texts)))
    print(json.dumps(out), flush=True)


def orchestrate(args: argparse.Namespace) -> None:
    sys.path.insert(0, REPO)
    from straggler_probe import start_cluster, stop_cluster

    scratch = tempfile.mkdtemp(prefix="sgraft_decomm_")
    procs = start_cluster(scratch)
    runs = []
    try:
        for mode in ("baseline", "decommission", "sigkill"):
            cmd = [
                sys.executable, os.path.abspath(__file__), "--worker",
                "--mode", mode,
                "--rows", str(args.rows),
                "--nkeys", str(args.nkeys),
                "--scratch", scratch,
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1200)
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if proc.returncode != 0 or not line:
                raise SystemExit(
                    f"worker ({mode}) failed rc={proc.returncode}:\n"
                    f"{proc.stderr[-3000:]}"
                )
            run = json.loads(line[-1])
            if mode != "baseline" and not run.get("injected"):
                # ADVICE r11: an uninjected non-baseline run is a silent
                # baseline measurement wearing the mode's label — fail loud
                # instead of committing a fake overhead figure.
                raise SystemExit(
                    f"worker ({mode}) completed WITHOUT injecting the "
                    f"signal (stage raced the 50ms poll or pgrep matched "
                    f"nothing): {run}"
                )
            runs.append(run)
    finally:
        stop_cluster(procs)
        shutil.rmtree(scratch, ignore_errors=True)

    by_mode = {r["mode"]: r for r in runs}
    result = {
        "probe": "executor_decommission_vs_crash",
        "cluster": "standalone, workers on 127.0.0.2/127.0.0.3 (straggler_probe topology)",
        "rows": args.rows,
        "nkeys": args.nkeys,
        "runs": runs,
        "checksums_match": len({r["checksum"] for r in runs}) == 1
        and all(r["matches_own_baseline"] for r in runs),
        "decommission_overhead": by_mode["decommission"]["overhead_vs_own_baseline"],
        "sigkill_overhead": by_mode["sigkill"]["overhead_vs_own_baseline"],
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, args.out), "w") as f:
        json.dump(result, f)
    print(json.dumps(result), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--mode", choices=["baseline", "decommission", "sigkill"],
                   default="baseline")
    p.add_argument("--rows", type=int, default=60_000_000)
    p.add_argument("--nkeys", type=int, default=4_000_000)
    p.add_argument("--scratch", default=None)
    p.add_argument("--out", default="decommission_probe_r11.json")
    args = p.parse_args()
    if args.worker:
        run_worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
