"""Composite training-data curation pipeline — the operators composed.

Individual stages (quality scoring, dedup, sampling, embedding features)
each have their own registry entries; this module chains them into the
end-to-end shape a 100 TB pretraining-data pipeline actually runs:

    filter (quality) -> dedup (exact, min-id wins) -> sample (hash)
        -> enrich (embedding features)

The whole pipeline is ONE declarative plan: Catalyst fuses the quality
filter and tokenization into the document scan, the dedup is the only
wide dependency (one shuffle on the 16-byte content hash), the sample is
a map-only filter, and the embedding join is an equi-join on the id.
Nothing materializes between stages — at 100 TB there are no intermediate
datasets to store, and predicate pushdown means disqualified documents
never leave the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep


@register(
    "pipeline_curate_training_set",
    "pipeline",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             md5(text) AS content_hash
      FROM documents
      WHERE n_chars >= 100
    ),
    quality AS (
      SELECT * FROM scored WHERE n_tokens >= 20
    ),
    deduped AS (
      SELECT * FROM quality
      QUALIFY row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 < 12
    )
    SELECT s.doc_id, s.lang, s.n_chars, s.n_tokens, s.content_hash,
           round(sqrt(list_reduce(list_transform(e.embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (a, b) -> a + b)), 6) AS emb_norm
    FROM sampled s JOIN embeddings e ON s.doc_id = e.vec_id
    """,
)
def pipeline_curate_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality-gate (length + token count), exact
    dedup (first doc_id per content hash wins), 75% deterministic hash
    sample, then enrich survivors with their embedding's L2 norm (the
    pattern for attaching any vector-derived feature).  Stage order is
    deliberate: cheap map-only gates run BEFORE the dedup shuffle, and the
    embedding join happens last so only curated rows touch the (wide)
    vector table.  One shuffle total + the id equi-join."""
    prep(spark)
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") >= 100)
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    ).where(F.col("n_tokens") >= 20)
    w = W.partitionBy("content_hash").orderBy("doc_id")
    deduped = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    sampled = deduped.where(
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
        < 12
    )
    emb = table(spark, sf_dir, "embeddings")
    emb_norm = F.round(
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda a, b: a + b,
            )
        ),
        6,
    )
    return sampled.join(emb, sampled.doc_id == emb.vec_id).select(
        "doc_id", "lang", "n_chars", "n_tokens", "content_hash", emb_norm.alias("emb_norm")
    )


def _neardup_oracle() -> str:
    from kafka_spark_streaming_eval_spark.operators.dedup import _LSH_PAIRS_SQL

    return f"""
    WITH RECURSIVE pairs AS ({_LSH_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u
    ),
    comp AS (SELECT u AS doc_id, min(v) AS component_id FROM reach GROUP BY u),
    losers AS (SELECT doc_id FROM comp WHERE doc_id <> component_id),
    quality AS (
      SELECT doc_id, lang, n_chars FROM documents WHERE n_chars >= 100
    ),
    flagged AS (
      SELECT q.lang, q.n_chars, (l.doc_id IS NOT NULL) AS is_loser
      FROM quality q LEFT JOIN losers l ON q.doc_id = l.doc_id
    )
    SELECT lang,
           count(CASE WHEN NOT is_loser THEN 1 END) AS n_docs_kept,
           CAST(SUM(CASE WHEN NOT is_loser THEN n_chars END) AS BIGINT)
             AS n_chars_kept,
           count(CASE WHEN is_loser THEN 1 END) AS n_neardup_removed
    FROM flagged GROUP BY lang
    """


@register("pipeline_curate_neardup", "pipeline", oracle=_neardup_oracle())
def pipeline_curate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with NEAR-duplicate cluster removal — the stage exact
    hashing cannot do: LSH candidate pairs -> connected components -> keep
    the min-doc_id survivor per near-dup cluster, drop the rest, then
    report kept/removed volume per language.  This is the canonical
    pretraining-data dedup shape (MinHash clusters, one survivor per
    cluster) composed from `dedup_minhash_lsh_pairs` and
    `dedup_cluster_components`.

    Scale shape: the loser set is O(near-duplicate docs), tiny relative to
    the corpus, and joins the quality-gated scan on doc_id (an anti-join
    at heart — expressed as left join + flag so removed volume is also
    reported).  The component computation is the bounded label-propagation
    loop; nothing here ever materializes all-pairs."""
    from kafka_spark_streaming_eval_spark.operators.dedup import (
        dedup_cluster_components,
    )

    prep(spark)
    quality = (
        table(spark, sf_dir, "documents")
        .where(F.col("n_chars") >= 100)
        .select("doc_id", "lang", "n_chars")
    )
    comps = dedup_cluster_components(spark, sf_dir)
    losers = comps.where(F.col("doc_id") != F.col("component_id")).select(
        "doc_id", F.lit(True).alias("is_loser")
    )
    flagged = quality.join(losers, "doc_id", "left").withColumn(
        "is_loser", F.coalesce("is_loser", F.lit(False))
    )
    return flagged.groupBy("lang").agg(
        F.count(F.when(~F.col("is_loser"), 1)).alias("n_docs_kept"),
        F.sum(F.when(~F.col("is_loser"), F.col("n_chars"))).alias("n_chars_kept"),
        F.count(F.when(F.col("is_loser"), 1)).alias("n_neardup_removed"),
    )


PACK_BUDGET = 2048  # tokens per packed training sequence
PACK_SHARDS = 16  # independent pack streams per language


@register(
    "pipeline_pack_sequences",
    "pipeline",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang,
             strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    placed AS (
      SELECT doc_id, lang, shard, n_tok,
             coalesce(sum(n_tok) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM docs
    )
    SELECT lang, shard,
           CAST(start_tok // {PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM placed
    GROUP BY lang, shard, bin_id
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concatenate documents into fixed token-budget
    training windows (the accounting behind every pretraining batch
    builder): docs stream in deterministic doc_id order, a running token
    total places each doc, and the bin is the budget-window its start
    falls in (docs straddling a boundary stay whole, the standard greedy
    concat-and-chunk).  Scale shape: packing is per (lang, md5-shard) — 16
    independent streams per language — so the running-sum window
    parallelizes instead of serializing each language through one
    reducer; one shuffle on the stream key, then one keyed agg.  The
    whole contract is integer arithmetic: zero float drift by
    construction."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    shard = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    ).alias("shard")
    docs = d.select(
        "doc_id", "lang", shard, F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = docs.withColumn(
        "start_tok", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    )
    return placed.groupBy(
        "lang",
        "shard",
        # integer DIV, not float division: exact at any corpus size
        F.expr(f"CAST(start_tok DIV {PACK_BUDGET} AS BIGINT)").alias("bin_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


MIX_SHARDS = 4  # parallel fill streams per source, each keeps w/4 of itself


@register(
    "pipeline_mix_quota_sample",
    "pipeline",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS pri,
             (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
               % {MIX_SHARDS} AS shard,
             CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 4 + 1 AS w
      FROM documents
    ),
    placed AS (
      SELECT source, n_tok, w,
             sum(n_tok) OVER (PARTITION BY source, shard) * w // 4
               AS shard_target,
             coalesce(sum(n_tok) OVER (
               PARTITION BY source, shard ORDER BY pri, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM docs
    )
    SELECT source,
           count(*) AS n_docs_total,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(n_tok) AS BIGINT) * any_value(w) // 4 AS target_tokens,
           count(*) FILTER (WHERE start_tok < shard_target) AS n_docs_kept,
           CAST(coalesce(sum(n_tok) FILTER (WHERE start_tok < shard_target), 0)
                AS BIGINT) AS tokens_kept
    FROM placed
    GROUP BY source
    """,
)
def pipeline_mix_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing by per-source token quota — the sampler behind
    pretraining mixture weights ("keep 25/50/75/100% of each source's
    tokens"): documents fill their quota greedily in md5-priority order,
    and a doc is kept iff it STARTS inside the quota (same straddle rule
    as ``pipeline_pack_sequences``).  The fill is stratified over
    MIX_SHARDS md5-shards — each shard keeps w/4 of ITS OWN tokens — so a
    100 TB source never serializes through one reducer and a weight-1.0
    source keeps exactly everything; per-shard kept volume concentrates to
    the source target as shards grow (same variance argument as hash
    sampling).  Both window functions (shard total + running start) share
    one (source, shard) exchange; everything is integer arithmetic, so the
    kept set and all counts are exact and partitioning-invariant.
    Output: per-source totals vs kept volume."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    pri = F.md5(F.col("doc_id").cast("string"))
    docs = d.select(
        "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        pri.alias("pri"),
        F.col("doc_id"),
        (
            (F.instr(F.lit("0123456789abcdef"), F.substring(pri, 1, 1)) - 1)
            % MIX_SHARDS
        ).alias("shard"),
        (F.regexp_extract("source", "[0-9]+", 0).cast("long") % 4 + 1).alias("w"),
    )
    run = (
        W.partitionBy("source", "shard")
        .orderBy("pri", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = docs.withColumn(
        "shard_target",
        F.expr("sum(n_tok) OVER (PARTITION BY source, shard) * w DIV 4"),
    ).withColumn("start_tok", F.coalesce(F.sum("n_tok").over(run), F.lit(0)))
    kept_pred = F.col("start_tok") < F.col("shard_target")
    return placed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.sum("n_tok").alias("tokens_total"),
        F.expr("CAST(sum(n_tok) * any_value(w) DIV 4 AS BIGINT)").alias(
            "target_tokens"
        ),
        F.count(F.when(kept_pred, 1)).alias("n_docs_kept"),
        F.coalesce(
            F.sum(F.when(kept_pred, F.col("n_tok"))), F.lit(0)
        ).alias("tokens_kept"),
    )


# train/val/test shares in percent; md5 bucket 0-255 mod 100 drives placement
SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5


@register(
    "pipeline_stratified_split",
    "pipeline",
    oracle=f"""
    WITH placed AS (
      SELECT source, lang,
             len(string_split(text, ' ')) AS n_tok,
             ((strpos('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + (strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
             ) % 100 AS b
      FROM documents
    )
    SELECT source, lang,
           CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
                WHEN b < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens
    FROM placed
    GROUP BY 1, 2, 3
    """,
)
def pipeline_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {SPLIT_TRAIN_PCT}/{SPLIT_VAL_PCT}/rest train/val/test
    split, reported per (source, lang) stratum.  Placement is a pure
    function of md5(doc_id) — each document lands in exactly ONE split on
    every engine, every run, every cluster layout, so splits can never leak
    into each other (the property ``df.randomSplit`` does NOT give you: its
    per-partition RNG reassigns rows whenever the layout changes).

    Plan shape: map-only hash + one (source, lang, split) aggregation;
    nothing about the split requires a global shuffle of the corpus, so at
    100 TB the split IS the projection — downstream jobs filter on the same
    deterministic expression instead of materializing three copies."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    hexes = F.lit("0123456789abcdef")
    b = (
        (F.instr(hexes, F.substring(h, 1, 1)) - 1) * 16
        + (F.instr(hexes, F.substring(h, 2, 1)) - 1)
    ) % 100
    split = (
        F.when(b < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(
            "source",
            "lang",
            F.size(F.split("text", " ")).alias("n_tok"),
            split.alias("split"),
        )
        .groupBy("source", "lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Batch-shape planning: length-bucketed batching
# ---------------------------------------------------------------------------

# Power-of-two context buckets a batching system pads documents into.
LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _bucket_case_sql(col: str) -> str:
    whens = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in LENGTH_BUCKETS
    )
    return f"CASE {whens} ELSE 8192 END"


@register(
    "pipeline_length_buckets",
    "pipeline",
    oracle=f"""
    WITH lens AS (
      SELECT len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
      FROM documents
    )
    SELECT bucket_tokens, n_docs, sum_tokens,
           CAST(n_docs * greatest(bucket_tokens, max_tok) AS BIGINT)
             AS padded_tokens,
           round((n_docs * greatest(bucket_tokens, max_tok) - sum_tokens)
                 * 1.0 / (n_docs * greatest(bucket_tokens, max_tok)), 6)
             AS pad_waste_frac
    FROM (
      SELECT {_bucket_case_sql('n_tok')} AS bucket_tokens,
             count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
             CAST(max(n_tok) AS BIGINT) AS max_tok
      FROM lens
      GROUP BY 1
    )
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: assign each document to the smallest
    power-of-two token bucket that holds it and measure the padding a
    fixed-shape batcher would waste per bucket — the number that decides
    between naive padding and sequence packing (`pipeline_pack_sequences`).
    The bucket ladder is an explicit CASE (not float log2, whose edge
    rounding differs across engines at exact powers of two).

    Plan shape: tokenize + bucket are map-side expressions; one aggregation
    over ~10 bucket keys.  At 100 TB this is a single scan with map-side
    partial aggregation into 10 groups — no skew possible."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bucket = F.lit(8192)
    for b in reversed(LENGTH_BUCKETS):
        bucket = F.when(n_tok <= b, F.lit(b)).otherwise(bucket)
    g = d.select(n_tok.alias("n_tok"), bucket.alias("bucket_tokens"))
    # The overflow bucket (ELSE 8192) is a FLOOR, not a pad size: a doc
    # longer than 8192 tokens would otherwise yield padded < sum and a
    # negative waste fraction.  Padding to greatest(bucket, max-length in
    # bucket) is exact for every regular bucket (max <= bucket by
    # construction) and pad-to-longest for the overflow bucket — the
    # accounting a dynamic batcher actually pays, and never negative.
    pad_to = F.greatest(F.col("bucket_tokens"), F.col("max_tok"))
    return (
        g.groupBy("bucket_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("sum_tokens"),
            F.max("n_tok").cast("long").alias("max_tok"),
        )
        .select(
            "bucket_tokens",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * pad_to).alias("padded_tokens"),
            F.round(
                (F.col("n_docs") * pad_to - F.col("sum_tokens"))
                * 1.0
                / (F.col("n_docs") * pad_to),
                6,
            ).alias("pad_waste_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle / shard assignment
# ---------------------------------------------------------------------------

N_TRAIN_SHARDS = 16  # one hex digit of md5 -> 16 shards


@register(
    "pipeline_deterministic_shuffle",
    "pipeline",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             substr(md5(CAST(doc_id AS VARCHAR)), 2, 16) AS ord_key
      FROM documents
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min_by(doc_id, ord_key) AS first_doc_id,
           max_by(doc_id, ord_key) AS last_doc_id,
           min(ord_key) AS first_ord_key
    FROM keyed
    GROUP BY shard
    """,
)
def pipeline_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: shard every document by the
    first md5 hex digit of its id and order within a shard by the next 16
    hex digits — a reproducible global permutation that is identical on any
    engine, any cluster layout, any run (unlike ``df.sample``/``shuffle``
    seeds, which are partition-layout-dependent).  Emits per-shard counts
    and the first/last document under that ordering (``min_by``/``max_by``
    against the unique ord_key, so the argmin is well-defined).

    Plan shape for 100 TB: shard + sort keys are map-side md5 expressions;
    the per-shard stats are one 16-group aggregation.  A real writer would
    ``repartitionByRange(shard, ord_key)`` and write sorted shards with the
    exact same keys — the permutation itself never needs a driver-side
    sort."""
    prep(spark)
    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.substring(h, 1, 1).alias("shard"),
        F.substring(h, 2, 16).alias("ord_key"),
    )
    return keyed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min_by("doc_id", "ord_key").alias("first_doc_id"),
        F.max_by("doc_id", "ord_key").alias("last_doc_id"),
        F.min("ord_key").alias("first_ord_key"),
    )
