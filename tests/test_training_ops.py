"""Invariant tests for the training-data operators on PLANTED corpora:
the oracle-parity sweep proves cross-engine equality on real testdata;
these prove the *semantics* (conservation, quota edges, determinism) on
inputs constructed to hit them."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.plans.registry import all_queries

SPECS = all_queries()


def _write_docs(path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
            }
        ),
        str(path),
    )


@pytest.fixture()
def planted_dir(tmp_path):
    # 30 docs, 10 tokens each, one lang, sources spanning all 4 weights
    rows = []
    for i in range(30):
        src = f"src{i % 4}"  # weights 1..4 -> keep 25/50/75/100%
        rows.append((i, " ".join(f"w{i}t{j}" for j in range(10)), "en", src))
    _write_docs(tmp_path / "documents.parquet", rows)
    return str(tmp_path)


def test_pack_sequences_conserves_tokens(spark, planted_dir):
    """Every token lands in exactly one bin: sum(bin_tokens) == corpus
    total, and each (lang, shard) stream's bins start at 0 and are
    contiguous."""
    out = SPECS["pipeline_pack_sequences"].fn(spark, planted_dir).collect()
    assert sum(r.bin_tokens for r in out) == 30 * 10
    streams = {}
    for r in out:
        streams.setdefault((r.lang, r.shard), []).append(r.bin_id)
    for key, bins in streams.items():
        bins = sorted(bins)
        assert bins == list(range(len(bins))), (key, bins)


def test_pack_sequences_bin_boundaries(spark, tmp_path):
    """Docs of 1000 tokens against a 2048 budget: the third doc STARTS at
    2000 (inside bin 0) and straddles into bin 1 whole — the documented
    greedy concat-and-chunk rule."""
    rows = [(i, " ".join("x" for _ in range(1000)), "en", "src0") for i in range(4)]
    _write_docs(tmp_path / "documents.parquet", rows)
    # pin every doc into ONE stream: same lang and force one shard by using
    # doc_ids that share an md5 first hex digit is fragile — instead check
    # totals per stream add up and no stream has a gap
    out = SPECS["pipeline_pack_sequences"].fn(spark, str(tmp_path)).collect()
    assert sum(r.bin_tokens for r in out) == 4000
    for r in out:
        # a bin never holds more than budget + one straddling doc's tokens
        assert r.bin_tokens <= 2048 + 1000


def test_mix_quota_weight_semantics(spark, planted_dir):
    """Weight-4 sources keep every token; every source keeps at least its
    per-shard floor and the kept set is deterministic across runs."""
    out1 = {r.source: r for r in SPECS["pipeline_mix_quota_sample"].fn(spark, planted_dir).collect()}
    out2 = {r.source: r for r in SPECS["pipeline_mix_quota_sample"].fn(spark, planted_dir).collect()}
    # deterministic: identical counts run-to-run
    assert {k: (v.n_docs_kept, v.tokens_kept) for k, v in out1.items()} == {
        k: (v.n_docs_kept, v.tokens_kept) for k, v in out2.items()
    }
    full = out1["src3"]  # weight 4 -> keep 100%
    assert full.tokens_kept == full.tokens_total
    assert full.n_docs_kept == full.n_docs_total
    quarter = out1["src0"]  # weight 1 -> target 25%
    assert quarter.target_tokens == quarter.tokens_total // 4
    assert 0 < quarter.tokens_kept < quarter.tokens_total


def test_decontaminate_planted_overlap(spark, tmp_path):
    """A corpus doc sharing a 3-gram with an eval doc (doc_id % 50 == 0)
    must be flagged; a disjoint doc must not."""
    eval_text = "alpha beta gamma delta epsilon"
    rows = [
        (0, eval_text, "en", "src0"),  # eval slice (0 % 50 == 0)
        (1, "prefix words then alpha beta gamma appears here", "en", "src0"),
        (2, "completely disjoint vocabulary nothing shared at all", "en", "src0"),
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    out = {r.doc_id: r for r in SPECS["text_decontaminate_ngrams"].fn(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}  # eval doc excluded from the corpus report
    assert out[1].contaminated and out[1].n_overlap >= 1
    assert not out[2].contaminated and out[2].n_overlap == 0


def test_repetition_ratio_planted(spark, tmp_path):
    """A doc that repeats one 3-gram must score a positive dup_fraction and
    the right max_repeat; an all-distinct doc scores 0."""
    rows = [
        (1, "a b c a b c a b c", "en", "src0"),  # 'a b c' x3 among 7 shingles
        (2, "one two three four five six", "en", "src0"),  # all distinct
        (3, "xx yy", "en", "src0"),  # < 3 tokens: no shingles
    ]
    _write_docs(tmp_path / "documents.parquet", rows)
    out = {r.doc_id: r for r in SPECS["text_repetition_ratio"].fn(spark, str(tmp_path)).collect()}
    assert out[1].max_repeat == 3 and out[1].dup_fraction > 0
    assert out[2].max_repeat == 1 and out[2].dup_fraction == 0.0
    assert out[3].n_shingles == 0 and out[3].dup_fraction == 0.0
