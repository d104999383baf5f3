"""ckpt_price_probe contract: the five iter_checkpoint heavies it prices
must exist in the registry (a rename there would silently hollow out the
probe), and the fact tables it asks build_synth to replicate must cover
every table those queries scan at scale (a missing fact table would price
the queries against base-size facts and understate the premium)."""

from ckpt_price_probe import ITER_QUERIES, PROBE_TABLES
from kafka_spark_streaming_eval_spark.plans.registry import all_queries


def test_iter_queries_registered():
    registered = set(all_queries())
    missing = [q for q in ITER_QUERIES if q not in registered]
    assert not missing, f"probe prices unregistered queries: {missing}"


def test_probe_tables_cover_known_scans():
    # graph_* scan lineitem+orders (dims carry over unchanged in
    # build_synth); components + DSIR scan documents.
    assert {"documents", "lineitem", "orders"} <= PROBE_TABLES


def test_kill_without_kill_cell_fails_loud():
    """ADVICE r12: --kill with --queries excluding dedup_cluster_components
    (or an empty factor plan) must refuse before any work — a silently
    unscheduled kill cell would report a no-kill matrix as fault-measured."""
    import argparse

    import pytest

    from ckpt_price_probe import orchestrate

    base = dict(runs=1, kill=True, kill_frac=0.5, out="/tmp/x.json")
    with pytest.raises(SystemExit, match="kill cell"):
        orchestrate(argparse.Namespace(
            factors=[30], queries=["graph_pagerank_trade"], **base))
    with pytest.raises(SystemExit, match="kill cell"):
        orchestrate(argparse.Namespace(
            factors=[], queries=["dedup_cluster_components"], **base))
