"""Text analysis over the ``documents`` table (north-star surface,
SURVEY.md §2.b): language stats, tokenization, quality scoring, heuristic
language ID, rolling-hash fingerprinting.

Everything is built-in column functions (split / explode / higher-order
``filter``/``aggregate``) — JVM-side, whole-stage-codegen'd, no Python in the
hot path.  At 100 TB the explode-based word count is the classic map-side
pre-aggregation shape (partial counts per partition before the shuffle);
per-document scores are embarrassingly parallel projections with no shuffle
at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_spark_streaming_eval_spark.catalog import table
from kafka_spark_streaming_eval_spark.functions.numeric import davg, davg_sql
from kafka_spark_streaming_eval_spark.operators.dedup import (
    _SHINGLES_SQL,
    shingle_rows,
)
from kafka_spark_streaming_eval_spark.plans.registry import register
from kafka_spark_streaming_eval_spark.session import prep

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small and hard-coded: the heuristic is the
# operator under test, not linguistic accuracy.
_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    prep(spark)
    return table(spark, sf_dir, "documents", spread=spread)


@register(
    "text_lang_stats",
    "text-analysis",
    oracle=f"""
    SELECT lang, source, count(*) AS n_docs,
           {davg_sql("n_chars")} AS avg_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition: per (lang, source) doc counts and length stats."""
    return _docs(spark, sf_dir).groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_token_count",
    "text-analysis",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           length(text) AS n_chars_check
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts: whitespace tokens and a BPE-ish regex
    tokenization (letter runs / digit runs / single punctuation), the
    standard pre-training corpus size accounting."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_check"),
    )


@register(
    "text_word_freq",
    "text-analysis",
    oracle="""
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    )
    SELECT lang, word, count(*) AS n
    FROM words WHERE word <> ''
    GROUP BY lang, word
    QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) <= 10
    """,
)
def text_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 words per language: explode -> count (map-side partial agg)
    -> per-group top-k window."""
    d = _docs(spark, sf_dir)
    words = d.select("lang", F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    counts = words.groupBy("lang", "word").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10).drop(
        "rn"
    )


@register(
    "text_quality_score",
    "text-analysis",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
             len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
             len(regexp_extract_all(text, '[0-9]')) AS n_digits,
             len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','a','of','and','to','is','in','it'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
           round(CAST(n_digits AS DOUBLE) / n_chars, 6) AS digit_ratio,
           round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           round(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS avg_token_len,
           (n_tokens >= 20 AND CAST(n_punct AS DOUBLE) / n_chars < 0.1
            AND CAST(n_stop AS DOUBLE) / n_tokens > 0.01) AS passes_quality
    FROM feats
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality features: length, punctuation/digit
    density, stopword ratio, plus a boolean quality gate — pure projections,
    no shuffle."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda w: w != "")
    stop = F.filter(
        F.split(F.lower("text"), " "),
        lambda w: w.isin("the", "a", "of", "and", "to", "is", "in", "it"),
    )
    feats = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[.,!?;:]"), 0)).alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit(r"[0-9]"), 0)).alias("n_digits"),
        F.size(stop).alias("n_stop"),
    )
    pr = F.col("n_punct").cast("double") / F.col("n_chars")
    sr = F.col("n_stop").cast("double") / F.col("n_tokens")
    return feats.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        F.round(pr, 6).alias("punct_ratio"),
        F.round(F.col("n_digits").cast("double") / F.col("n_chars"), 6).alias(
            "digit_ratio"
        ),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6).alias(
            "avg_token_len"
        ),
        ((F.col("n_tokens") >= 20) & (pr < 0.1) & (sr > 0.01)).alias("passes_quality"),
    )


def _stopword_predicate(lang: str):
    # Closure (not a lambda default arg): F.filter treats a second lambda
    # parameter as the element index.
    words = _STOPWORDS[lang]
    return lambda w: w.isin(*words)


def _langid_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({words})))"
    )


@register(
    "text_langid_heuristic",
    "text-analysis",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS labeled_lang,
             {_langid_score_sql("en")} AS s_en,
             {_langid_score_sql("de")} AS s_de,
             {_langid_score_sql("fr")} AS s_fr,
             {_langid_score_sql("es")} AS s_es
      FROM documents
    )
    SELECT doc_id, labeled_lang,
           CASE greatest(s_en, s_de, s_fr, s_es)
                WHEN s_en THEN 'en' WHEN s_de THEN 'de'
                WHEN s_fr THEN 'fr' ELSE 'es' END AS predicted_lang,
           greatest(s_en, s_de, s_fr, s_es) AS best_score
    FROM scores
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (the classic n-gram-profile heuristic in its
    simplest form).  Ties resolve in fixed en>de>fr>es order via the CASE
    evaluation order — deterministic on both engines."""
    d = _docs(spark, sf_dir)
    low = F.split(F.lower("text"), " ")
    scores = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            F.size(F.filter(low, _stopword_predicate(lang))).alias(f"s_{lang}")
            for lang in ("en", "de", "fr", "es")
        ],
    )
    best = F.greatest("s_en", "s_de", "s_fr", "s_es")
    pred = (
        F.when(F.col("s_en") == best, "en")
        .when(F.col("s_de") == best, "de")
        .when(F.col("s_fr") == best, "fr")
        .otherwise("es")
    )
    return scores.select(
        "doc_id", "labeled_lang", pred.alias("predicted_lang"), best.alias("best_score")
    )


@register(
    "text_fingerprint_rolling",
    "text-analysis",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(text, ''),
                                         c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 31 + c) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint over the raw character stream
    (h = h*31 + code mod 1e9+7) via the ``aggregate`` higher-order function —
    a sequential left fold, same on both engines, pure integer math."""
    d = _docs(spark, sf_dir)
    chars = F.split("text", "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda h, c: (h * 31 + F.ascii(c).cast("long")) % 1000000007,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@register(
    "text_tfidf_topterms",
    "text-analysis",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    tf AS (
      SELECT doc_id, word, count(*) AS tf
      FROM words WHERE word <> '' GROUP BY doc_id, word
    ),
    docfreq AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    )
    SELECT doc_id, word, tf, df, CAST(tf AS DOUBLE) / df AS rarity
    FROM tf JOIN docfreq USING (word)
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY CAST(tf AS DOUBLE) / df DESC, word
    ) <= 5
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style characteristic-term extraction: top-5 terms per doc by
    term frequency weighted against corpus document frequency.  The score
    is the rational ``tf/df`` (exact IEEE division of small integers →
    bit-identical across engines); the classical ``tf·ln(N/df)`` is a
    one-line swap but transcendental, so it is kept out of the hash-checked
    surface (libm last-ulp differences).  Plan: explode → two hash
    aggregates → a join on word → one window per doc.  At 100 TB the
    word→df side is Zipf-skewed but small relative to tf (vocabulary, not
    corpus, cardinality) — AQE will broadcast it when it fits; the per-doc
    window shuffles on doc_id, which is uniform."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(docfreq, "word").withColumn(
        "rarity", F.col("tf").cast("double") / F.col("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.col("rarity").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "word", "tf", "df", "rarity")
    )


@register(
    "text_posexplode_tokens",
    "text",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS token,
             unnest(range(0, len(string_split(text, ' ')))) AS pos
      FROM documents
    )
    SELECT doc_id, pos, token, length(token) AS tok_len
    FROM toks
    WHERE pos < 8
    """,
)
def text_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal tokenization: ``posexplode`` emits (position, token) pairs,
    the table-generator shape under any positional text feature (n-gram
    windows, BPE pair counting, prefix features).  The position comes from
    the generator itself — no window function, no shuffle; the oracle's
    parallel-``unnest`` zip is the same zero-join construction.  The
    ``pos < 8`` prefix filter shows generator output is filterable before
    anything wide happens (Catalyst pushes it into the generate's child
    consumer) — at 100 TB you keep 8 tokens/doc, not the full explosion."""
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .where(F.col("pos") < 8)
        .select("doc_id", "pos", "token", F.length("token").alias("tok_len"))
    )


@register(
    "text_bpe_pair_counts",
    "text",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(text, ' ')))) AS pos
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id,
             token || ' ' || lead(token) OVER (PARTITION BY doc_id ORDER BY pos)
               AS pair
      FROM toks
    )
    SELECT pair, count(*) AS n_pairs, count(DISTINCT doc_id) AS n_docs
    FROM bigrams
    WHERE pair IS NOT NULL
    GROUP BY pair
    HAVING count(*) >= 5
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair frequency counting — the inner loop of BPE/WordPiece
    tokenizer training: tokenize, form (token, next-token) bigrams with an
    ordinal window, count corpus-wide, keep pairs above a merge threshold.
    Plan: zero-shuffle generate → one window shuffle on doc_id (state
    bounded per document) → one count shuffle on the pair key.  At corpus
    scale the pair distribution is Zipfian — the count agg is map-side
    combinable so the hot pairs collapse before the shuffle, and a real
    BPE trainer iterates this query with a merged vocabulary each round
    (the loop shape of ``graph_pagerank_trade``)."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token"),
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        "doc_id",
        F.concat_ws(" ", "token", F.lead("token").over(w)).alias("pair"),
        F.lead("token").over(w).alias("_nxt"),
    ).where(F.col("_nxt").isNotNull())
    return (
        bigrams.groupBy("pair")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_pairs") >= 5)
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_URL_RE = r"https?://[a-z0-9./_-]+"


@register(
    "text_scrub_contacts",
    "text-analysis",
    oracle=rf"""
    WITH aug AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || doc_id ||
                       '@example.com via https://ex.org/p/' || doc_id
                  ELSE text END AS text
      FROM documents
    ),
    scrubbed AS (
      SELECT doc_id, lang, text,
             regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_URL_RE}', '<URL>', 'g') AS clean
      FROM aug
    )
    SELECT doc_id, lang,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_URL_RE}')) AS n_urls,
           length(text) AS len_before,
           length(clean) AS len_after,
           (length(text) <> length(clean)) AS was_scrubbed
    FROM scrubbed
    """,
)
def text_scrub_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contact-info scrubbing — the canonical pretraining-data cleaning
    step: detect and redact email addresses and URLs before training.
    A deterministic subset of documents gets injected contacts (the corpus
    itself contains none, which would make a 0-matches pass vacuous — same
    fixture discipline as `dedup_embedding_neardup`), then both the
    detection counts and the redacted lengths are hash-checked.  Patterns
    are conservative ASCII classes so Java regex (Spark) and RE2 (DuckDB)
    agree token-for-token; the whole scrub is two codegen'd
    ``regexp_replace`` passes over the scan — zero shuffles, the shape
    that matters when redaction runs over every document at 100 TB."""
    d = _docs(spark, sf_dir)
    aug = d.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com via https://ex.org/p/"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    return aug.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_URL_RE), 0)).alias("n_urls"),
        F.length("text").alias("len_before"),
        F.length(clean).alias("len_after"),
        (F.length("text") != F.length(clean)).alias("was_scrubbed"),
    )


@register(
    "text_repetition_ratio",
    "text",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest({shingles}) AS sh FROM documents
    ),
    per AS (
      SELECT doc_id, sh, count(*) AS c FROM sh GROUP BY doc_id, sh
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_shingles,
             count(*) AS n_distinct,
             CAST(max(c) AS BIGINT) AS max_repeat
      FROM per GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           coalesce(a.n_shingles, 0) AS n_shingles,
           coalesce(a.n_distinct, 0) AS n_distinct,
           coalesce(a.max_repeat, 0) AS max_repeat,
           CASE WHEN coalesce(a.n_shingles, 0) > 0
                THEN round(1.0 - a.n_distinct / CAST(a.n_shingles AS DOUBLE), 6)
                ELSE 0.0 END AS dup_fraction
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """.format(shingles=_SHINGLES_SQL),
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-3-gram repetition signal (the Gopher-family quality rule
    that `text_quality_score`'s length/punctuation features don't cover):
    per document, total vs distinct shingle counts, the max single-shingle
    repeat, and the duplicate fraction ``1 - distinct/total``.  Highly
    repetitive machine-generated text scores high and gets filtered before
    training.  Plan shape: one (doc_id, shingle) partial-agg shuffle, one
    doc_id agg — both keyed under the document, so the corpus never
    all-pairs or broadcasts; scales linearly with corpus size."""
    d = _docs(spark, sf_dir)
    rep = (
        shingle_rows(d)
        .groupBy("doc_id", "sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_repeat"),
        )
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles")
    return d.select("doc_id", "lang").join(rep, "doc_id", "left").select(
        "doc_id",
        "lang",
        n_sh,
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        F.coalesce(F.col("max_repeat"), F.lit(0)).alias("max_repeat"),
        F.when(
            F.coalesce(F.col("n_shingles"), F.lit(0)) > 0,
            F.round(
                F.lit(1.0)
                - F.col("n_distinct") / F.col("n_shingles").cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )


@register(
    "text_decontaminate_ngrams",
    "text",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest({shingles}) AS sh FROM documents
    ),
    eval_sh AS (
      SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0
    ),
    hits AS (
      SELECT c.doc_id, count(DISTINCT c.sh) AS n_overlap
      FROM sh c JOIN eval_sh e USING (sh)
      WHERE c.doc_id % 50 <> 0
      GROUP BY c.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           coalesce(h.n_overlap, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 50 <> 0
    """.format(shingles=_SHINGLES_SQL),
)
def text_decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the n-gram-overlap check every serious
    pretraining pipeline runs before training (flag any training document
    sharing an n-gram with the eval set, then drop or surgically trim it).
    The held-out set here is every 50th document; the contract is the
    n-gram semi-join itself.  Plan shape for 100 TB: the eval set's
    distinct shingles are tiny and BROADCAST, so the corpus-side scan is
    map-only (no corpus shuffle); only matching (doc, shingle) hits — a
    vanishing fraction — shuffle for the per-doc distinct count."""
    d = _docs(spark, sf_dir)
    sh = shingle_rows(d)
    eval_sh = (
        sh.where(F.col("doc_id") % 50 == 0).select("sh").distinct()
    )
    hits = (
        sh.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_overlap"))
    )
    return (
        d.where(F.col("doc_id") % 50 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


VOCAB_GROWTH_BINS = 10


@register(
    "text_vocab_growth",
    "text",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    first_seen AS (
      SELECT t, min(doc_id) AS fd FROM tok WHERE t <> '' GROUP BY t
    ),
    mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    binned AS (
      SELECT (fd * {VOCAB_GROWTH_BINS}) // m AS bin, count(*) AS new_tokens
      FROM first_seen, mx GROUP BY 1
    )
    SELECT bin, new_tokens,
           CAST(sum(new_tokens) OVER (
             ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_vocab
    FROM binned
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: cumulative distinct token count
    as the corpus is consumed in doc_id order, reported at
    {VOCAB_GROWTH_BINS} equal-width corpus checkpoints.  Curation teams use
    the curve's slope to detect when a source stops contributing novel
    vocabulary (diminishing returns for continued crawling).

    Computed without any ordered scan: a token's contribution point is
    simply min(doc_id) over its occurrences, so the curve reduces to
    (1) one groupBy token -> first-seen doc (the standard inverted-index
    shuffle, linear in corpus size), (2) integer binning against the 1-row
    broadcast max-doc bound, (3) a {VOCAB_GROWTH_BINS}-row running sum.
    All-integer arithmetic -> bit-identical across engines and cluster
    layouts."""
    d = _docs(spark, sf_dir)
    first_seen = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.min("doc_id").alias("fd"))
    )
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    binned = (
        first_seen.crossJoin(F.broadcast(mx))
        .select(F.expr(f"(fd * {VOCAB_GROWTH_BINS}) div m").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("new_tokens"))
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    return binned.select(
        "bin", "new_tokens", F.sum("new_tokens").over(w).alias("cum_vocab")
    )


@register(
    "text_source_vocab_overlap",
    "text",
    oracle="""
    WITH st AS (
      SELECT DISTINCT source, t FROM (
        SELECT source, unnest(string_split(text, ' ')) AS t FROM documents
      ) WHERE t <> ''
    ),
    sz AS (SELECT source, count(*) AS n FROM st GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      FROM st a JOIN st b ON a.t = b.t AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_inter, za.n AS n_a, zb.n AS n_b,
           round(i.n_inter / CAST(za.n + zb.n - i.n_inter AS DOUBLE), 6)
             AS jaccard
    FROM inter i
    JOIN sz za ON i.src_a = za.source
    JOIN sz zb ON i.src_b = zb.source
    """,
)
def text_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between corpus sources — the source-level
    diversity diagnostic a mixing pipeline runs before setting sampling
    quotas (two sources with ~1.0 vocab overlap are near-redundant; a
    low-overlap source adds coverage).

    Plan shape: the corpus collapses to distinct (source, token) FIRST (one
    explode + one groupBy, linear), so the token-equality self-join runs on
    the vocabulary table — |vocab| x |sources| rows, millions not billions
    at 100 TB — never on the corpus.  Output is C(n_sources, 2) rows.

    spread=False (VERDICT r14 item 3): the only scan-side work is one
    split+explode feeding a distinct whose exchange re-spreads anyway, so
    the spread's extra full-text exchange cost 0.36 s -> 0.66 s at sf0.1
    (8->32-core ratio 1.02: overhead-bound, not compute-bound)."""
    d = _docs(spark, sf_dir, spread=False)
    st = (
        d.select("source", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = st.alias("a"), st.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            "n_a",
            "n_b",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


NEARDUP_PLANT_EVERY = 200  # plant a perturbed copy of every 200th (eval) doc
NEARDUP_PLANT_OFFSET = 40000001  # keeps planted ids OUT of the %50 eval slice


def _neardup_decon_oracle() -> str:
    from kafka_spark_streaming_eval_spark.operators.dedup import (
        _bands_sql,
        _minhash_sql,
    )

    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {NEARDUP_PLANT_OFFSET},
             array_to_string(
               list_slice(string_split(text, ' '), 1,
                          len(string_split(text, ' ')) - 1), ' ')
      FROM documents WHERE doc_id % {NEARDUP_PLANT_EVERY} = 0
    ),
    sig AS ({_minhash_sql('corpus')}),
    bands AS ({_bands_sql()}),
    eval_buckets AS (
      SELECT DISTINCT band_id, band_hash FROM bands WHERE doc_id % 50 = 0
    )
    SELECT t.doc_id, count(DISTINCT t.band_id) AS n_shared_bands
    FROM bands t
    JOIN eval_buckets e
      ON t.band_id = e.band_id AND t.band_hash = e.band_hash
    WHERE t.doc_id % 50 <> 0
    GROUP BY t.doc_id
    """


@register("text_decontaminate_neardup", "text", oracle=_neardup_decon_oracle())
def text_decontaminate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: flag training documents that are
    NEAR-duplicates of any eval document (share at least one MinHash-LSH
    band bucket with the eval slice) — the modern complement to
    `text_decontaminate_ngrams`, which only catches verbatim n-gram
    overlap; paraphrased or lightly-edited eval leakage needs the near-dup
    net.  Every {NEARDUP_PLANT_EVERY}th doc plants a one-token-shorter copy
    outside the eval slice so the positive path is real on the synthetic
    corpus.

    Plan shape for 100 TB: signatures are one corpus scan (map-side
    combinable min-aggregates); the eval slice's distinct band buckets are
    tiny and BROADCAST, so the training side stays map-only — identical
    posture to the exact-n-gram decontamination, at signature cost instead
    of per-shingle cost."""
    from kafka_spark_streaming_eval_spark.operators.dedup import (
        band_rows,
        minhash_signatures,
    )

    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    planted = d.where(F.col("doc_id") % NEARDUP_PLANT_EVERY == 0).select(
        (F.col("doc_id") + NEARDUP_PLANT_OFFSET).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, F.size(toks) - 1)).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(planted)
    bands = band_rows(minhash_signatures(corpus))
    eval_buckets = (
        bands.where(F.col("doc_id") % 50 == 0)
        .select("band_id", "band_hash")
        .distinct()
    )
    return (
        bands.where(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(eval_buckets), ["band_id", "band_hash"])
        .groupBy("doc_id")
        .agg(F.count_distinct("band_id").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# Context-window chunking (training-data prep)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 32  # context-window size in whitespace tokens
CHUNK_STRIDE = 24  # window step (CHUNK_TOKENS - CHUNK_STRIDE tokens overlap)


@register(
    "text_chunk_overlap",
    "text-analysis",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS t,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    starts AS (
      SELECT doc_id, n_tokens, t,
             unnest(generate_series(1, greatest(n_tokens, 1),
                                    {CHUNK_STRIDE})) AS s
      FROM toks
    )
    SELECT doc_id,
           (s - 1) // {CHUNK_STRIDE} + 1 AS chunk_idx,
           s AS chunk_start,
           least({CHUNK_TOKENS}, n_tokens - s + 1) AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(t, s, s + {CHUNK_TOKENS} - 1), ' ')) AS chunk_md5
    FROM starts
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split every document into
    {CHUNK_TOKENS}-token context windows advancing {CHUNK_STRIDE} tokens at
    a time (8-token overlap carries context across boundaries) — how a
    pretraining/RAG pipeline turns variable-length documents into
    fixed-budget training examples.  The chunk text itself leaves the query
    as an md5 (driver-hashable and enough to verify content parity).

    Plan shape for 100 TB: tokenize + ``sequence``/``explode`` + ``slice``
    are all map-side whole-stage-codegen'd expressions — zero shuffles, no
    Python; output rows ~= corpus_tokens / {CHUNK_STRIDE}, produced
    streaming per input partition (no document ever has to fit anywhere
    except its own slice)."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = d.select(
        "doc_id", toks.alias("t"), F.size(toks).alias("n_tokens")
    )
    starts = F.sequence(
        F.lit(1), F.greatest("n_tokens", F.lit(1)), F.lit(CHUNK_STRIDE)
    )
    chunks = base.select(
        "doc_id", "t", "n_tokens", F.explode(starts).alias("s")
    )
    return chunks.select(
        "doc_id",
        (F.floor((F.col("s") - 1) / CHUNK_STRIDE) + 1).alias("chunk_idx"),
        F.col("s").alias("chunk_start"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n_tokens") - F.col("s") + 1).alias(
            "n_chunk_tokens"
        ),
        F.md5(F.array_join(F.slice("t", F.col("s"), F.lit(CHUNK_TOKENS)), " ")).alias(
            "chunk_md5"
        ),
    )


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ("vector", "stream", "group")  # the standing keyword query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10

# Shared by text_bm25_search and the hybrid-RRF fusion oracle.
_BM25_SQL = f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, w AS term, count(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w IN {BM25_TERMS!r}
      GROUP BY doc_id, w
    ),
    df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             CAST(round(
               ((s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                                       + {BM25_B} * dl.dl / s.avgdl)),
               6) AS DECIMAL(38,6)) AS term_score
      FROM tf
      JOIN df USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id, CAST(sum(term_score) AS DOUBLE) AS bm25,
           count(*) AS n_matched_terms
    FROM scored
    GROUP BY doc_id
    QUALIFY row_number() OVER (ORDER BY bm25 DESC, doc_id) <= {BM25_TOPK}
"""


@register(
    "text_bm25_search",
    "text-analysis",
    oracle=_BM25_SQL,
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval: top-{BM25_TOPK} documents for a standing
    multi-term query — the lexical-search complement to the embedding
    ``sim_*`` family.  Determinism contract: idf uses the RATIONAL form
    (N - df + 0.5)/(df + 0.5) instead of the usual log (libm log results
    can differ in the last ulp across engines); every arithmetic step is
    elementary IEEE ops on identical operands, and per-term scores are
    rounded then summed as DECIMAL so the cross-term total is
    order-independent.

    Plan shape for 100 TB: the term filter cuts the exploded token stream
    to query terms BEFORE any shuffle (map-side); df and the (n_docs,
    avgdl) scalars are tiny broadcasts; scoring joins touch only matching
    postings — the classic impact-ordered retrieval shape, never a corpus
    self-join."""
    d = _docs(spark, sf_dir)
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
                ),
                6,
            )
            .cast("decimal(38,6)")
            .alias("term_score"),
        )
    )
    totals = scored.groupBy("doc_id").agg(
        F.sum("term_score").cast("double").alias("bm25"),
        F.count(F.lit(1)).alias("n_matched_terms"),
    )
    w = W.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        totals.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= BM25_TOPK)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Collocation extraction (association strength without logarithms)
# ---------------------------------------------------------------------------

COLLOC_MIN_COUNT = 20
COLLOC_TOPK = 15


@register(
    "text_collocation_lift",
    "text-analysis",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS token,
             unnest(range(0, len(string_split(text, ' ')))) AS pos
      FROM documents
    ),
    bigrams AS (
      SELECT token AS w1,
             lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    bi AS (SELECT w1, w2 FROM bigrams WHERE w2 IS NOT NULL),
    uni AS (SELECT token AS w, count(*) AS n_w FROM toks GROUP BY token),
    tot AS (
      SELECT (SELECT count(*) FROM toks) AS n_uni,
             (SELECT count(*) FROM bi) AS n_bi
    ),
    pairs AS (
      SELECT w1, w2, count(*) AS n_xy FROM bi GROUP BY w1, w2
      HAVING count(*) >= {COLLOC_MIN_COUNT}
    )
    SELECT p.w1, p.w2, p.n_xy,
           round(((p.n_xy * 1.0 * t.n_uni) * t.n_uni)
                 / ((t.n_bi * 1.0 * u1.n_w) * u2.n_w), 6) AS lift
    FROM pairs p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN tot t
    QUALIFY row_number() OVER (ORDER BY lift DESC, p.w1, p.w2) <= {COLLOC_TOPK}
    """,
)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: top-{COLLOC_TOPK} adjacent word pairs by
    LIFT — P(xy) / (P(x)P(y)) — the association measure behind phrase
    detection in training-corpus preprocessing (merge 'new york'-style
    pairs into single tokens before tokenizer training).  Lift is the
    log-free core of PMI: same ranking, but pure rational arithmetic on
    exact counts (a libm log2 would risk last-ulp cross-engine drift), and
    the {COLLOC_MIN_COUNT}-occurrence floor is the standard guard against
    rare-pair lift explosion.

    Plan shape: bigrams come straight off the split array — ``split``
    already yields tokens in document order, so adjacent pairs are
    ``arrays_zip`` of the array with itself shifted by one, no per-doc
    ordinal window (r15, guide §2.4: the window forced a full sort-shuffle
    of every token on (doc_id, pos) before the first aggregation; the
    array form starts the map-side-combinable pair counts in the scan
    stage).  Unigram/pair counts map-side combinable; the scalar totals
    and the vocabulary join sides are broadcast.  At 100 TB this is two
    keyed aggregations over the token stream plus a top-k — no all-pairs
    anything."""
    d = _docs(spark, sf_dir)
    arr = d.select(F.split("text", " ").alias("t"))
    toks = arr.select(F.explode("t").alias("token"))
    bi = arr.select(
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    uni = toks.groupBy(F.col("token").alias("w")).agg(
        F.count(F.lit(1)).alias("n_w")
    )
    tot = toks.agg(F.count(F.lit(1)).alias("n_uni")).crossJoin(
        bi.agg(F.count(F.lit(1)).alias("n_bi"))
    )
    pairs = (
        bi.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_xy"))
        .where(F.col("n_xy") >= COLLOC_MIN_COUNT)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    scored = (
        pairs.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_xy",
            F.round(
                ((F.col("n_xy") * 1.0 * F.col("n_uni")) * F.col("n_uni"))
                / ((F.col("n_bi") * 1.0 * F.col("n_w1")) * F.col("n_w2")),
                6,
            ).alias("lift"),
        )
    )
    wr = W.orderBy(F.col("lift").desc(), "w1", "w2")
    return (
        scored.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= COLLOC_TOPK)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# BPE-style merge training (word-level, 2 rounds, engine-owned loop body)
# ---------------------------------------------------------------------------


def _bpe_pairs_sql(src: str) -> str:
    return f"""
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM {src}, unnest(generate_series(1, len(t) - 1)) AS u(i)
    """


def _bpe_top_sql(pairs: str) -> str:
    return f"""
      SELECT w1, w2, count(*) AS n FROM ({pairs})
      WHERE w1 <> w2
      GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 1
    """


def _bpe_merge_sql(src: str, top: str) -> str:
    # With w1 <> w2 pinned at selection time, matches can never overlap, so
    # "apply the merge" is a simultaneous index filter+transform: drop every
    # position that is the second half of a match, rewrite every match start.
    return f"""
      SELECT doc_id,
             list_transform(
               list_filter(generate_series(1, len(t)),
                 i -> NOT (i >= 2 AND t[i - 1] = k.w1 AND t[i] = k.w2)),
               i -> CASE WHEN t[i] = k.w1 AND t[i + 1] = k.w2
                         THEN k.w1 || '_' || k.w2 ELSE t[i] END) AS t
      FROM {src}, ({top}) k
    """


@register(
    "text_bpe_train_merges",
    "text-analysis",
    oracle=f"""
    WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    top1 AS ({_bpe_top_sql(_bpe_pairs_sql('t0'))}),
    t1 AS ({_bpe_merge_sql('t0', 'SELECT * FROM top1')}),
    top2 AS ({_bpe_top_sql(_bpe_pairs_sql('t1'))}),
    t2 AS ({_bpe_merge_sql('t1', 'SELECT * FROM top2')})
    SELECT 1 AS round, w1 || '_' || w2 AS merged_pair,
           CAST(n AS BIGINT) AS pair_count,
           (SELECT CAST(sum(len(t)) AS BIGINT) FROM t1) AS corpus_tokens_after
    FROM top1
    UNION ALL
    SELECT 2, w1 || '_' || w2, CAST(n AS BIGINT),
           (SELECT CAST(sum(len(t)) AS BIGINT) FROM t2)
    FROM top2
    """,
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of BPE-style merge training at the word level: count
    adjacent token pairs corpus-wide, pick the most frequent pair
    (count DESC, pair lexicographic — pinned tie-break), REWRITE the
    corpus merging that pair into one token, and repeat on the merged
    corpus — the actual training loop of BPE/word2phrase tokenizers, not
    just one pass of pair counting (`text_bpe_pair_counts`).  Self-pairs
    are excluded at selection time, which makes all matches of the chosen
    pair non-overlapping, so "apply the merges" is a simultaneous
    index-level ``filter``+``transform`` over each token array — no
    stateful scan, no UDF.  Out-of-bounds lookahead uses ``try_element_at``
    (NULL, matching the oracle's list indexing) instead of ANSI-throwing
    subscripts.

    Plan shape for 100 TB: each round is one pair-count aggregation
    (map-side combinable), a 1-row top-1 broadcast back (no collect), and
    a map-only rewrite.  A real trainer iterates this to thousands of
    merges with the rewritten corpus persisted between rounds — the same
    driver-loop shape as `graph_pagerank_trade`."""
    d = _docs(spark, sf_dir)
    t0 = d.select("doc_id", F.split("text", " ").alias("t"))

    def pairs_of(df):
        idx = F.explode(
            F.when(
                F.size("t") >= 2, F.sequence(F.lit(1), F.size("t") - 1)
            ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
        ).alias("i")
        return df.select("t", idx).select(
            F.try_element_at("t", F.col("i")).alias("w1"),
            F.try_element_at("t", F.col("i") + 1).alias("w2"),
        )

    def top_of(pairs):
        return (
            pairs.where(F.col("w1") != F.col("w2"))
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "w1", "w2")
            .limit(1)
        )

    def merge(df, top):
        t, w1, w2 = F.col("t"), F.col("w1"), F.col("w2")
        keep = F.filter(
            F.sequence(F.lit(1), F.size("t")),
            lambda i: ~(
                (i >= 2)
                & (F.try_element_at(t, i - 1) == w1)
                & (F.try_element_at(t, i) == w2)
            ),
        )
        rewrite = F.transform(
            keep,
            lambda i: F.when(
                (F.try_element_at(t, i) == w1)
                & (F.try_element_at(t, i + 1) == w2),
                F.concat(w1, F.lit("_"), w2),
            ).otherwise(F.try_element_at(t, i)),
        )
        return df.crossJoin(F.broadcast(top)).select(
            "doc_id", rewrite.alias("t")
        )

    top1 = top_of(pairs_of(t0))
    t1 = merge(t0, top1)
    top2 = top_of(pairs_of(t1))
    t2 = merge(t1, top2)

    def summary(round_no, top, merged_corpus):
        toks_after = merged_corpus.agg(
            F.sum(F.size("t")).alias("corpus_tokens_after")
        )
        return top.crossJoin(F.broadcast(toks_after)).select(
            F.lit(round_no).alias("round"),
            F.concat("w1", F.lit("_"), "w2").alias("merged_pair"),
            F.col("n").alias("pair_count"),
            "corpus_tokens_after",
        )

    return summary(1, top1, t1).unionByName(summary(2, top2, t2))
