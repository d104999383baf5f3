"""scale_probe contract tests (VERDICT r7 item 7 + ADVICE r7).

No Spark session needed: these exercise the synth-corpus builder's marker
protocol, the per-op replication table sets, and the probe JSON schema —
the pieces whose defects produced bogus growth ratios (dangling orderkeys,
corpus thrash, cross-session bases) rather than the measured timings.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

import scale_probe

SMALL_BASE = "/root/testdata/sf0.001"


@pytest.fixture
def small_base(monkeypatch):
    monkeypatch.setattr(scale_probe, "BASE", SMALL_BASE)
    return SMALL_BASE


def test_op_table_lists_every_joined_fact():
    """graph_pagerank_trade inner-joins lineitem with orders on
    l_orderkey = o_orderkey; replicating lineitem without orders leaves
    every k>0 replica's shifted keys dangling and the Nx rung measures a
    join over dead rows (ADVICE r7 high)."""
    assert set(scale_probe.OP_TABLE) == set(scale_probe.HEAVY_OPS)
    for op, tabs in scale_probe.OP_TABLE.items():
        assert isinstance(tabs, tuple) and tabs, op
        assert set(tabs) <= scale_probe._ALL_FACTS, op
    pagerank = set(scale_probe.OP_TABLE["graph_pagerank_trade"])
    assert {"lineitem", "orders"} <= pagerank


def test_synth_replicated_lineitem_keys_resolve_in_orders(small_base, tmp_path):
    """Every replica's shifted orderkeys must exist in the replicated orders
    table — the invariant the r7 OP_TABLE shape broke on fresh builds."""
    out = str(tmp_path / "synth")
    tables = {
        t for t in scale_probe.OP_TABLE["graph_pagerank_trade"]
    }
    scale_probe.build_synth(out, factor=3, tables=tables)
    li_keys = set(
        pq.read_table(
            os.path.join(out, "lineitem.parquet"), columns=["l_orderkey"]
        )
        .column("l_orderkey")
        .to_pylist()
    )
    o_keys = set(
        pq.read_table(os.path.join(out, "orders.parquet"), columns=["o_orderkey"])
        .column("o_orderkey")
        .to_pylist()
    )
    assert li_keys <= o_keys, (
        f"{len(li_keys - o_keys)} replicated lineitem orderkeys dangle"
    )
    # and the replicas are real growth, not carry-over
    base_keys = set(
        pq.read_table(
            os.path.join(SMALL_BASE, "orders.parquet"), columns=["o_orderkey"]
        )
        .column("o_orderkey")
        .to_pylist()
    )
    assert len(o_keys) == 3 * len(base_keys)


def test_marker_full_build_satisfies_subset_and_subsets_grow_incrementally(
    small_base, tmp_path
):
    """ADVICE r7 medium: a full build's marker must satisfy any later
    subset request, and a superset request must extend the corpus without
    rmtree'ing already-replicated tables."""
    out = str(tmp_path / "synth")
    scale_probe.build_synth(out, factor=2, tables={"documents"})
    docs_path = os.path.join(out, "documents.parquet")
    docs_mtime = os.path.getmtime(docs_path)
    assert scale_probe._marker_tables(out, 2) == {"documents"}
    # subset satisfied -> no rebuild
    scale_probe.build_synth(out, factor=2, tables={"documents"})
    assert os.path.getmtime(docs_path) == docs_mtime
    # superset request: documents replicas survive, orders gets replicated,
    # marker records the union
    scale_probe.build_synth(out, factor=2, tables={"documents", "orders"})
    assert os.path.getmtime(docs_path) == docs_mtime, "incremental build rebuilt documents"
    assert scale_probe._marker_tables(out, 2) == {"documents", "orders"}
    base_orders = pq.ParquetFile(
        os.path.join(SMALL_BASE, "orders.parquet")
    ).metadata.num_rows
    assert (
        pq.ParquetFile(os.path.join(out, "orders.parquet")).metadata.num_rows
        == 2 * base_orders
    )
    # and now the earlier subset is still satisfied
    scale_probe.build_synth(out, factor=2, tables={"orders"})
    assert scale_probe._marker_tables(out, 2) == {"documents", "orders"}


def test_marker_vintages_and_wrong_base_rejected(small_base, tmp_path):
    out = str(tmp_path / "synth")
    os.makedirs(out)
    base_rows = pq.ParquetFile(
        os.path.join(SMALL_BASE, "documents.parquet")
    ).metadata.num_rows
    prefix = f"{os.path.abspath(SMALL_BASE)}:{base_rows}"

    def fp(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()[:8]

    # legacy pre---ops marker: content "ok" -> attests a FULL build
    legacy = os.path.join(out, f".complete_f7_{fp(prefix)}")
    with open(legacy, "w") as f:
        f.write("ok")
    assert scale_probe._marker_tables(out, 7) == scale_probe._ALL_FACTS
    os.remove(legacy)
    # r7 table-set-fingerprinted marker: attests exactly that set
    combo = "documents,embeddings"
    r7 = os.path.join(out, f".complete_f7_{fp(prefix + ':' + combo)}")
    with open(r7, "w") as f:
        f.write("ok")
    assert scale_probe._marker_tables(out, 7) == {"documents", "embeddings"}
    os.remove(r7)
    # a marker fingerprinted against a DIFFERENT base must be rejected
    wrong = os.path.join(out, f".complete_f7_{fp('/elsewhere/sf9:123')}")
    with open(wrong, "w") as f:
        f.write("ok")
    assert scale_probe._marker_tables(out, 7) is None


def test_bare_legacy_marker_attested_by_row_counts(small_base, tmp_path):
    """The oldest marker vintage (bare .complete_f{N}, no fingerprint) can't
    name its base corpus, so attestation falls back to ground truth: a fact
    table counts as replicated iff its rows == N x the current base's."""
    out = str(tmp_path / "synth")
    scale_probe.build_synth(out, factor=2, tables={"documents"})
    # swap the JSON marker for a bare legacy one
    for m in os.listdir(out):
        if m.startswith(".complete"):
            os.remove(os.path.join(out, m))
    with open(os.path.join(out, ".complete_f2"), "w") as f:
        f.write("ok")
    assert scale_probe._marker_tables(out, 2) == {"documents"}
    # a satisfied subset run must not rebuild
    mtime = os.path.getmtime(os.path.join(out, "documents.parquet"))
    scale_probe.build_synth(out, factor=2, tables={"documents"})
    assert os.path.getmtime(os.path.join(out, "documents.parquet")) == mtime


def test_probe_payload_carries_session_id():
    """VERDICT r7 item 7: the probe JSON schema must tag which session
    measured the rungs so SCALE.md ratios can be attested same-session."""
    payload = scale_probe.probe_payload(10, 1.0, {"op": {"sec_base": 1}})
    assert payload["session_id"] == scale_probe._SESSION_ID
    assert payload["session_id"].startswith("probe-")
    assert payload["ops"] == {"op": {"sec_base": 1}}


def test_fixed_benchmark_constant_matches_operators():
    """scale_probe hardcodes the benchmark source to avoid importing the
    operator package at probe-import time; the two constants must agree."""
    from kafka_spark_streaming_eval_spark.operators.curation import BENCH_SOURCE

    assert scale_probe.BENCH_SOURCE == BENCH_SOURCE
    assert set(scale_probe.FIXED_BENCH_OPS) <= set(scale_probe.HEAVY_OPS)
    for op in scale_probe.FIXED_BENCH_OPS:
        assert scale_probe.OP_TABLE[op] == ("documents",)


def test_fixed_benchmark_scales_training_only(small_base, tmp_path):
    """VERDICT r9/r10 item 3: --fixed-benchmark holds the src1 benchmark
    slice at base size while training docs replicate, and plants a
    deterministic doc_id%50 verbatim stream so contamination hits grow at a
    constant per-replica rate instead of dropping to zero."""
    import collections

    out = str(tmp_path / "synth_fb")
    scale_probe.build_synth(out, factor=3, tables={"documents"}, fixed_benchmark=True)
    t = pq.read_table(os.path.join(out, "documents.parquet"))
    base = pq.read_table(os.path.join(SMALL_BASE, "documents.parquet"))
    by_src = collections.Counter(t.column("source").to_pylist())
    base_by_src = collections.Counter(base.column("source").to_pylist())
    bench = scale_probe.BENCH_SOURCE
    assert by_src[bench] == base_by_src[bench], "benchmark slice must not scale"
    for src, n in base_by_src.items():
        if src != bench:
            assert by_src[src] == 3 * n, f"training slice {src} must scale 3x"
    # planted verbatim replicas: every replica-k doc with base doc_id%50==0
    # carries the base text unchanged (same shingles -> base-rate hits)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    base_text = dict(
        zip(base.column("doc_id").to_pylist(), base.column("text").to_pylist())
    )
    planted = suffixed = 0
    for i, did in enumerate(ids):
        k, bid = divmod(did, scale_probe.ID_SHIFT)
        if k == 0:
            continue
        if bid % scale_probe.CONTAM_RESIDUE == 0:
            assert texts[i] == base_text[bid]
            planted += 1
        else:
            assert texts[i] != base_text[bid]
            suffixed += 1
    assert planted > 0 and suffixed > 0


def test_fixed_benchmark_marker_never_cross_attests(small_base, tmp_path):
    """A corpus built in one mode must never satisfy the other mode's
    request — the two modes write differently-shaped documents tables."""
    out = str(tmp_path / "synth")
    scale_probe.build_synth(out, factor=2, tables={"documents"})
    assert scale_probe._marker_tables(out, 2) == {"documents"}
    assert scale_probe._marker_tables(out, 2, fixed_benchmark=True) is None
    out_fb = str(tmp_path / "synth_fb")
    scale_probe.build_synth(
        out_fb, factor=2, tables={"documents"}, fixed_benchmark=True
    )
    assert scale_probe._marker_tables(out_fb, 2, fixed_benchmark=True) == {
        "documents"
    }
    assert scale_probe._marker_tables(out_fb, 2) is None
    # legacy "ok" markers predate the mode and can only attest default mode
    for m in os.listdir(out):
        if m.startswith(".complete"):
            with open(os.path.join(out, m), "w") as f:
                f.write("ok")
    assert scale_probe._marker_tables(out, 2) == scale_probe._ALL_FACTS
    assert scale_probe._marker_tables(out, 2, fixed_benchmark=True) is None


def test_probe_payload_carries_fixed_benchmark_flag():
    assert scale_probe.probe_payload(10, 1.0, {})["fixed_benchmark"] is False
    assert (
        scale_probe.probe_payload(10, 1.0, {}, fixed_benchmark=True)[
            "fixed_benchmark"
        ]
        is True
    )
