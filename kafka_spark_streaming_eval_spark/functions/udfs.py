"""UDF extension surface (SURVEY.md §2.b, last row): one row-at-a-time
Python UDF, one Arrow-vectorized pandas UDF, one grouped ``applyInPandas``,
and one Python UDTF — each as an oracle-checked registry query.

These exist to prove the engine's user-extension points, NOT as the way to
compute these results: every example here is deliberately also expressible
in pure SQL (that is what makes the DuckDB oracle possible).  Production
guidance stays "built-ins first" — a Python UDF serializes every row through
the Py4J/worker boundary (~10-100x slower than codegen), a pandas UDF moves
Arrow record batches (vectorized, the acceptable Python path), and
``applyInPandas`` shuffles each group to one Python worker (watch group
cardinality/skew at 100 TB: one giant group = one stuck worker).

Every Python kernel is defined INSIDE its query function: cloudpickle then
serializes it by value, so executors never need this package importable on
their own PYTHONPATH — the deployment-safe shape for a library whose driver
may run from anywhere (the grading driver imports us by file path).  The
UDF objects are likewise built lazily because DDL return-type strings parse
against the active session.

Determinism notes: the Python/pandas examples use exact integer math
(Knuth multiplicative hash) or IEEE-double ops with no reduction reordering
(min/max are order-independent selections), so results hash-match the oracle
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep


# ---------------------------------------------------------------------------
# 1. Row-at-a-time Python UDF (the slow path, shown once)
# ---------------------------------------------------------------------------


@register(
    "udf_python_vowels",
    "udf-surface",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[aeiou]')) AS n_vowels,
           length(text) AS n_chars_check
    FROM documents
    """,
)
def udf_python_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: per-document vowel count.  Each row crosses
    the JVM->Python worker boundary individually — the example documents WHY
    built-ins win (the oracle's regexp does the same work codegen'd)."""

    def vowel_count_py(s):
        if s is None:
            return None
        return sum(1 for ch in s if ch in "aeiou")

    d = table(prep(spark), sf_dir, "documents")
    vowel_count = udf(vowel_count_py, "long")
    return d.select(
        "doc_id",
        vowel_count("text").alias("n_vowels"),
        F.length("text").alias("n_chars_check"),
    )


# ---------------------------------------------------------------------------
# 2. Arrow-vectorized pandas UDF (the acceptable Python path)
# ---------------------------------------------------------------------------


@register(
    "udf_pandas_knuth_hash",
    "udf-surface",
    oracle="""
    SELECT user_id,
           (user_id * 2654435761) % 4294967296 AS bucket_hash,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def udf_pandas_knuth_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: Knuth multiplicative bucket hash per user.
    Arrow moves whole column batches to one Python call; exact uint64
    integer math makes the oracle comparison bit-exact."""

    def knuth_hash_pd(uid):
        return ((uid.astype("uint64") * 2654435761) % 4294967296).astype("int64")

    ev = table(prep(spark), sf_dir, "events")
    knuth_hash = pandas_udf(knuth_hash_pd, "long")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_user.select(
        "user_id", knuth_hash("user_id").alias("bucket_hash"), "n_events"
    )


# ---------------------------------------------------------------------------
# 3. Grouped applyInPandas (split-apply-combine with a Python kernel)
# ---------------------------------------------------------------------------


@register(
    "udf_applyinpandas_minmax",
    "udf-surface",
    oracle="""
    SELECT event_id, event_type, value,
           (value - min(value) OVER (PARTITION BY event_type))
           / (max(value) OVER (PARTITION BY event_type)
              - min(value) OVER (PARTITION BY event_type)) AS value_scaled
    FROM events
    """,
)
def udf_applyinpandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas``: per-event-type min-max scaling with a pandas kernel.
    min/max are order-independent selections and the subtraction/division are
    elementwise IEEE ops on identical inputs — bit-identical to the oracle's
    window expression.  Each group is shuffled to one Python worker — fine
    for bounded group counts like event_type (4 groups); at 100 TB the same
    result should come from the oracle's window-function form (no Python, no
    whole-group materialization), which is exactly what the oracle shows."""

    def minmax_scale(pdf):
        lo, hi = pdf["value"].min(), pdf["value"].max()
        out = pdf[["event_id", "event_type", "value"]].copy()
        out["value_scaled"] = (pdf["value"] - lo) / (hi - lo) if hi > lo else 0.0
        return out

    ev = table(prep(spark), sf_dir, "events")
    return ev.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        minmax_scale,
        schema="event_id long, event_type string, value double, value_scaled double",
    )


# ---------------------------------------------------------------------------
# 4. Python UDTF (one row in, many rows out, lateral-joined)
# ---------------------------------------------------------------------------


@register(
    "udtf_split_sentences",
    "udf-surface",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, '. ')) AS sentence,
           generate_subscripts(string_split(text, '. '), 1) - 1 AS sentence_idx
    FROM documents
    """,
)
def udtf_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lateral-joined against ``documents``: one row per sentence
    with its index — the table-function extension point (SQL `, LATERAL
    split_sentences(text)`).  The oracle's unnest shows the built-in
    equivalent; a UDTF earns its cost only when the expansion logic is
    genuinely procedural."""

    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield s, i

    spark = prep(spark)
    split_sentences = udtf(SplitSentences, returnType="sentence: string, sentence_idx: int")
    spark.udtf.register("split_sentences", split_sentences)
    table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.sentence_idx
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )
