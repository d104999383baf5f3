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
