"""skew_probe contract: the final-plan skew-marker extractor (pure logic —
the timed 3-way A/B needs an idle host and runs out-of-suite)."""

from skew_probe import skew_evidence


def test_detects_aqe_skew_markers_case_insensitively():
    plan = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "+- SortMergeJoin(skew=true) [k], [k], Inner\n"
        "   :- AQEShuffleRead skewed=13\n"
    )
    ev = skew_evidence(plan)
    assert ev["skew_split_fired"] is True
    assert set(ev["skew_markers"]) == {"skew=true", "skewed=N"}
    assert skew_evidence("SortMergeJoin(SKEW=true)")["skew_split_fired"] is True


def test_anchored_markers_ignore_conf_echoes_and_node_names():
    """ADVICE r11: plan text that merely CONTAINS the word "skewed" (a conf
    echo, a node-name fragment) must not count as the rewrite firing."""
    noise = (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor=5\n"
        "+- SomeNode skewedPartitionThresholdInBytes: 256m\n"
        "+- Filter (skew_flag = true)\n"
    )
    ev = skew_evidence(noise)
    assert ev["skew_split_fired"] is False
    assert ev["skew_markers"] == []


def test_no_markers_means_rewrite_did_not_fire():
    ev = skew_evidence("AdaptiveSparkPlan\n+- SortMergeJoin [k], [k], Inner")
    assert ev["skew_split_fired"] is False
    assert ev["skew_markers"] == []
