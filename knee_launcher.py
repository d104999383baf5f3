#!/usr/bin/env python
"""Quiet-gated launcher for the sat_probe parse-knee battery (r13/r14
weather discipline, mechanized).

Launch rule (same as the hand-run r13 battery, results/
parse_knee_weather_r13.log): sample host steal over 45 s windows and only
launch a probe run after one quiet window (<LAUNCH_GATE_PCT).  Accept rule:
a SETTLED verdict is kept at any steal (steal can only slow settling, so a
settle under fire is a valid capacity lower bound); a NEVER-SETTLED verdict
is kept only from a run whose own span stayed under ACCEPT_STORM_PCT —
otherwise retry (up to --tries).

Usage::

    python knee_launcher.py --parse csv --rates 400000,450000,500000 \
        [--settle 5] [--run-s 25] [--deadline 300] [--tries 3] \
        [--out-prefix results/parse_knee_r14]

Writes one JSON artifact per (rate, parse) to
``<out-prefix>_<rate>_<parse>.json`` and a launch/accept log to
``<out-prefix>_weather_<parse>.log``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import read_steal_ticks  # noqa: E402

LAUNCH_GATE_PCT = 0.5
ACCEPT_STORM_PCT = 1.0
WINDOW_S = 45.0


def steal_window(window_s: float = WINDOW_S) -> float | None:
    a = read_steal_ticks()
    time.sleep(window_s)
    b = read_steal_ticks()
    if a is None or b is None or b[1] == a[1]:
        return None
    return 100.0 * (b[0] - a[0]) / (b[1] - a[1])


def accept_verdict(payload: dict) -> bool:
    """The r13 accept rule: a SETTLED verdict is valid at any steal (steal
    can only slow settling, so a settle under fire lower-bounds capacity);
    a NEVER-SETTLED verdict counts only from a span quieter than
    ACCEPT_STORM_PCT — a storm-buried non-settle says nothing about the
    knee.  Weather-unknown spans cannot attest a non-settle."""
    run_steal = (payload.get("steal") or {}).get("steal_pct")
    settled = "error" not in payload
    return settled or (run_steal is not None and run_steal < ACCEPT_STORM_PCT)


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default):
        return args[args.index(name) + 1] if name in args else default

    parse = opt("--parse", "csv")
    rates = [int(r) for r in opt("--rates", "400000").split(",")]
    settle = opt("--settle", "5")
    run_s = opt("--run-s", "25")
    deadline = opt("--deadline", "300")
    tries = int(opt("--tries", "3"))
    prefix = opt("--out-prefix", "results/parse_knee_r14")
    here = os.path.dirname(os.path.abspath(__file__))
    logpath = os.path.join(here, f"{prefix}_weather_{parse}.log")

    def log(msg: str) -> None:
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(logpath, "a") as f:
            f.write(line + "\n")

    for rate in rates:
        outpath = os.path.join(here, f"{prefix}_{rate}_{parse}.json")
        for attempt in range(1, tries + 1):
            # launch gate: wait for one quiet 45 s window
            while True:
                s = steal_window()
                log(f"steal_45s={'n/a' if s is None else round(s, 3)}")
                if s is None or s < LAUNCH_GATE_PCT:
                    break
            log(f"launching rate={rate} parse={parse} try={attempt}")
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(here, "sat_probe.py"),
                    "--rate", str(rate), "--parse", parse,
                    "--settle", settle, "--run-s", run_s,
                    "--deadline", deadline,
                ],
                capture_output=True,
                text=True,
                timeout=float(deadline) + 300,
            )
            try:
                payload = json.loads(proc.stdout.strip().splitlines()[-1])
            except (ValueError, IndexError):
                log(f"UNPARSEABLE output rate={rate} try={attempt}; retrying")
                continue
            run_steal = (payload.get("steal") or {}).get("steal_pct")
            log(
                f"done rate={rate} parse={parse} try={attempt} "
                f"settled={'error' not in payload} run_steal={run_steal}"
            )
            if accept_verdict(payload):
                with open(outpath, "w") as f:
                    json.dump(payload, f)
                    f.write("\n")
                log(f"ACCEPTED -> {outpath}")
                break
            log(f"rejected (never-settled at {run_steal}% steal); retrying")
        else:
            # tries exhausted: keep the LAST payload, marked unaccepted
            payload["accepted"] = False
            with open(outpath, "w") as f:
                json.dump(payload, f)
                f.write("\n")
            log(f"TRIES EXHAUSTED -> {outpath} (kept last, accepted=false)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
