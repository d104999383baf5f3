"""decommission_probe contract: the victim-log evidence parser (pure
logic — the timed 3-mode run needs an idle multi-JVM host and runs
out-of-suite)."""

from decommission_probe import parse_decommission_log


def test_full_decommission_signature():
    log = "\n".join(
        [
            "INFO CoarseGrainedExecutorBackend: Registering SIGPWR handler to trigger decommissioning.",
            "INFO CoarseGrainedExecutorBackend: Decommission executor 0.",
            "INFO BlockManager: Starting block manager decommissioning process...",
            "INFO BlockManagerDecommissioner: Starting block migration",
            "INFO BlockManagerDecommissioner: Migrated migrate_shuffle_3_30 (size: 84.0 B) to BlockManagerId(1, 127.0.0.2, 44751, None) in 10 ms",
            "INFO BlockManagerDecommissioner: Migrated migrate_shuffle_4_34 (size: 39.6 MiB) to BlockManagerId(1, 127.0.0.2, 44751, None) in 120 ms",
            "INFO BlockManagerDecommissioner: Stopped block migration",
        ]
    )
    ev = parse_decommission_log(log)
    assert ev["decommission_triggered"] is True
    assert ev["migration_started"] is True
    assert ev["shuffle_blocks_migrated"] == 2
    assert ev["migration_stopped"] is True


def test_untriggered_log_reads_negative():
    ev = parse_decommission_log("INFO Executor: Running task 3.0 in stage 8.0")
    assert ev["decommission_triggered"] is False
    assert ev["migration_started"] is False
    assert ev["shuffle_blocks_migrated"] == 0
    assert ev["migration_stopped"] is False
    # a peer executor mentioning migrated blocks it RECEIVED must not
    # count as the victim's migration loop
    ev2 = parse_decommission_log("INFO BlockManager: Migrated migrate_shuffle_1_1")
    assert ev2["shuffle_blocks_migrated"] == 0
