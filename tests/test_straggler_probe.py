"""straggler_probe contract: the attempt-log evidence parser (pure logic —
the timed A/B run needs an idle multi-JVM host and runs out-of-suite)."""

from straggler_probe import parse_attempt_log


def test_speculation_rescue_signature():
    # The on-mode shape: attempt 0 of the straggler starts and never
    # completes (killed mid-sleep once the copy commits); attempt 1
    # starts later and completes.  Other partitions are ignored.
    log = "\n".join(
        [
            "0,0,start,100.0",
            "0,0,done,101.2",
            "7,0,start,100.1",
            "7,1,start,103.4",
            "7,1,done,104.9",
            "15,0,start,100.2",
            "15,0,done,101.5",
        ]
    )
    ev = parse_attempt_log(log, straggler_pid=7)
    assert ev["speculative_copy_ran"] is True
    assert ev["speculative_copy_completed"] is True
    assert ev["first_attempt_completed"] is False
    assert ev["straggler_attempts_started"] == [0, 1]
    assert ev["straggler_attempts_completed"] == [1]


def test_no_speculation_signature_and_malformed_lines_skipped():
    log = "7,0,start,100.0\n7,0,done,140.3\nnot,a,line\n\n8,0,start,100.0"
    ev = parse_attempt_log(log, straggler_pid=7)
    assert ev["speculative_copy_ran"] is False
    assert ev["first_attempt_completed"] is True
    assert ev["straggler_attempts_started"] == [0]
    assert parse_attempt_log("", 7)["straggler_attempts_started"] == []


def test_torn_interleaved_lines_skipped_not_crash():
    """ADVICE r11: two executor JVMs append concurrently; a torn line with
    exactly 3 commas but non-integer fields must be skipped, and the rest
    of the log still parsed."""
    log = (
        "7,0,start,100.0\n"
        "7,0,st7,1,start,art,100.5\n"      # interleaved, 6 fields -> len skip
        "7,1,sta7,0,done,101.0\n"          # torn, 5 fields -> len skip
        "7,a,start,101.5\n"                # 4 fields, non-int attempt -> skip
        "x7,1,start,102.0\n"               # 4 fields, non-int pid -> skip
        "7,1,start,102.5\n"
        "7,1,done,103.0\n"
    )
    ev = parse_attempt_log(log, straggler_pid=7)
    assert ev["straggler_attempts_started"] == [0, 1]
    assert ev["speculative_copy_completed"] is True
    assert ev["first_attempt_completed"] is False
