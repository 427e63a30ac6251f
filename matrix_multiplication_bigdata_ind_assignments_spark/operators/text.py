"""Scalar functions + text analysis (SURVEY.md §2.3 "Scalar functions",
"LLM-data-pipeline ops": language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is built-in `pyspark.sql.functions` — JVM-side, inside
whole-stage codegen; no Python UDFs in any hot path.  Higher-order array
functions (filter/transform/aggregate) mirror DuckDB's list_* functions
exactly (same fold order), which keeps the oracles bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import register
from ..sources import load


@register(
    "q_text_stats",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_m,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       string_split(text, ' ')[1] AS first_word,
       upper(substr(text, 1, 10)) AS head10,
       CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS has_spark
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: length/split/substring/upper/contains."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size(F.split("text", " ")).cast("long").alias("n_words"),
        F.split("text", " ").getItem(0).alias("first_word"),
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.when(F.col("text").contains("spark"), 1).otherwise(0).alias("has_spark"),
    )


@register(
    "q_date_buckets",
    oracle="""
SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(month(l_shipdate) AS BIGINT) AS ship_month,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem GROUP BY ship_year, ship_month
""",
)
def q_date_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time bucketing: year/month extraction + agg."""
    l = load(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.month("l_shipdate").cast("long").alias("ship_month"),
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))


@register(
    "q_json_extract",
    oracle="""
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY event_type
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.max(k).alias("max_k")
    )


@register(
    "q_vector_ops",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_norm,
       round(embedding[1]::DOUBLE, 6) AS v0,
       round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6) AS vmax,
       round(list_sum(list_transform(embedding, x -> x::DOUBLE)), 6) AS vsum
FROM embeddings
""",
)
def q_vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/vector surface over the multimodal embedding column:
    size / higher-order aggregate (dot with self) / element access / max /
    sum — all JVM-side, no UDF."""
    e = load(spark, sf_dir, "embeddings")
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x)), 6
        ).alias("l2_norm"),
        F.round(F.col("embedding").getItem(0).cast("double"), 6).alias("v0"),
        F.round(F.array_max(as_double), 6).alias("vmax"),
        F.round(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6).alias("vsum"),
    )


@register(
    "q_wordcount",
    oracle="""
SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
WHERE w <> '' GROUP BY w
""",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic split+explode+groupBy wordcount over documents."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_lang_profile",
    oracle="""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(n_chars), 6) AS avg_chars,
       round(avg(len(string_split(text, ' '))), 6) AS avg_words
FROM documents GROUP BY lang
""",
)
def q_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg(F.size(F.split("text", " ")).cast("double")), 6).alias("avg_words"),
    )


@register(
    "q_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens
FROM documents
""",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer
    (letters-run | digits-run | single other symbol)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).cast("long").alias("re_tokens"),
    )


_STOPWORDS = ("the", "a", "of", "and", "to")


@register(
    "q_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
       round(len(list_filter(toks, x -> x IN {_STOPWORDS!r})) / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(0.4 * least(len(toks) / 100.0, 1.0)
           + 0.3 * (1 - n_punct / greatest(n_chars, 1))
           + 0.3 * (len(list_filter(toks, x -> x IN {_STOPWORDS!r})) / greatest(len(toks), 1)), 6) AS quality
FROM t
""",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length / punctuation / stopword ratios
    composed into one score — the standard pre-training corpus filter."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_toks = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    punct_ratio = n_punct / F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    stop_ratio = sw / F.greatest(n_toks, F.lit(1.0))
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality_expr_6dp().alias("quality"),
    )


def quality_expr_6dp():
    """The q_quality_score composite as one 6-dp-rounded Column over a
    (text, n_chars) row — the portable form (identical rounding in the
    DuckDB oracles), shared with q_dedup_keep_best's keeper ranking."""
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_toks = F.size(toks).cast("double")
    n_punct = F.size(F.regexp_extract_all("text", F.lit("[^a-z0-9 ]"), 0)).cast("double")
    sw = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))).cast("double")
    punct_ratio = n_punct / F.greatest(F.col("n_chars").cast("double"), F.lit(1.0))
    stop_ratio = sw / F.greatest(n_toks, F.lit(1.0))
    return F.round(
        0.4 * F.least(n_toks / 100.0, F.lit(1.0)) + 0.3 * (1 - punct_ratio) + 0.3 * stop_ratio,
        6,
    )


@register(
    "q_doc_fingerprint",
    oracle="""
SELECT doc_id,
       CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS md5_fp,
       list_reduce(
         list_prepend(
           CAST(0 AS BIGINT),
           list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                          t -> CAST(length(t) * 256 + ascii(substr(t, 1, 1)) AS BIGINT))),
         (acc, x) -> (acc * 1000003 + x) % 2147483647
       ) AS rolling_fp
FROM documents
""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: a 60-bit md5 prefix plus a polynomial
    rolling hash over the token stream — both computed identically in
    Spark and DuckDB (portable, engine-neutral)."""
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    codes = F.transform(
        toks, lambda t: (F.length(t).cast("long") * 256 + F.ascii(F.substring(t, 1, 1)))
    )
    rolling = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 1000003 + x) % 2147483647
    )
    return d.select(
        "doc_id",
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long").alias("md5_fp"),
        rolling.alias("rolling_fp"),
    )


@register(
    "q_tfidf",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
       round(tf.tf * ln((n.n + 1.0) / (idf.df + 1.0)), 6) AS tfidf
FROM tf JOIN idf ON tf.term = idf.term CROSS JOIN n
""",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF per (doc, term), smoothed idf = ln((N+1)/(df+1)) — expressed
    relationally (two hash aggs + a broadcast join on the term dim), fully
    oracle-checked; the ml.feature HashingTF/IDF pipeline hashes terms into
    buckets and is not value-comparable across engines."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
        )
    )


_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "q_bm25",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
idf AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term),
stats AS (SELECT count(*) AS n, avg(dl.dl) AS avgdl FROM documents JOIN dl USING (doc_id))
SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
       round(
         ln((stats.n - idf.df + 0.5) / (idf.df + 0.5) + 1.0)
         * tf.tf * ({_BM25_K1} + 1.0)
         / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl)),
       6) AS bm25
FROM tf
JOIN dl ON tf.doc_id = dl.doc_id
JOIN idf ON tf.term = idf.term
CROSS JOIN stats
""",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 per (doc, term) — the retrieval scorer a curation
    pipeline ranks with (k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)).

    Same relational shape as q_tfidf plus a doc-length normalization: two
    hash aggs off one tokenize pass; the term-dim (df) BROADCASTS; the
    doc-length join is doc_id-keyed, co-partitioned with tf by the same
    key so Catalyst reuses the exchange; (N, avgdl) is a broadcast
    scalar.  At 100 TB nothing here is heavier than the tokenize shuffle
    itself."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf") + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", "tf", F.round(idf * norm, 6).alias("bm25"))
    )


_LANG_KEYWORDS = {
    "de": ("table", "row", "scan"),
    "en": ("the", "a", "fast", "slow"),
    "es": ("value", "data", "column"),
    "fr": ("query", "join", "merge"),
    "zh": ("hash", "agg", "window"),
}


@register(
    "q_langid",
    oracle="""
WITH scores AS (
"""
    + "\nUNION ALL\n".join(
        f"""  SELECT doc_id, '{lang}' AS cand,
         CAST(len(list_filter(string_split(text, ' '), t -> t IN {words!r})) AS BIGINT) AS score
  FROM documents"""
        for lang, words in sorted(_LANG_KEYWORDS.items())
    )
    + """
)
SELECT doc_id, cand AS pred_lang, score
FROM (SELECT doc_id, cand, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
      FROM scores)
WHERE rn = 1
""",
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-overlap language-ID heuristic: score each candidate language
    by token hits against a tiny keyword list, argmax with deterministic
    tie-break.  (A real n-gram model swaps the keyword lists for n-gram
    profiles; the dataflow — score, stack, argmax-per-doc — is identical.)"""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    cands = F.array(
        *[
            F.struct(
                F.lit(lang).alias("cand"),
                F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long").alias("score"),
            )
            for lang, words in sorted(_LANG_KEYWORDS.items())
        ]
    )
    stacked = d.select("doc_id", F.explode(cands).alias("s")).select(
        "doc_id", F.col("s.cand").alias("cand"), F.col("s.score").alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    return (
        stacked.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"), "score")
    )


@register(
    "q_json_variant",
    oracle="""
SELECT event_type,
       CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT) AS k_bucket,
       CAST(count(*) AS BIGINT) AS n,
       'OBJECT<k: BIGINT>' AS props_schema
FROM events
GROUP BY event_type, k_bucket
""",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT surface (Spark 4): props parsed once with
    parse_json, typed probes via variant_get, shape introspection via
    schema_of_variant.  Unlike per-access get_json_object (q_json_extract),
    the VARIANT is a binary-encoded parse tree — parse cost is paid once
    and every downstream extraction is a cheap typed probe, the right
    economics when one huge JSON column feeds many extractions."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "long")
    return e.groupBy(
        "event_type", F.floor(k / 10).cast("long").alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.schema_of_variant(F.col("v"))).alias("props_schema"),
    )


@register(
    "q_udtf_tokens",
    oracle="""
SELECT doc_id, pos, token, CAST(length(token) AS BIGINT) AS tok_len
FROM (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) - 1 AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM documents
  WHERE doc_id < 100
)
""",
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY.md §2.3 'UDTF ≈ explode-producing
    functions'): a table function registered via spark.udtf.register and
    invoked through SQL LATERAL, each input row fanning out to one row per
    token.  UDTFs are the Python slow path — bulk tokenization stays on
    split/posexplode (q_wordcount); this is the API surface for fan-out
    logic that genuinely needs Python, bounded here to 100 docs."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: long, token: string, tok_len: long")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate((text or "").split(" ")):
                yield i, t, len(t)

    spark.udtf.register("mmbd_tokenize", Tokenize)
    d = load(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    d.createOrReplaceTempView("mmbd_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.tok_len
        FROM mmbd_udtf_docs d, LATERAL mmbd_tokenize(d.text) t
        """
    )


@register(
    "q_repetition_filter",
    oracle="""
WITH grams AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           [array_to_string(string_split(text, ' ')[i:i+2], ' ')
            FOR i IN range(1, len(string_split(text, ' ')) - 1)]
         ELSE [] END AS g
  FROM documents
)
SELECT doc_id,
       CAST(len(g) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct,
       CASE WHEN len(g) > 0 THEN
         floor((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 1000000 + 0.5) / 1000000
       ELSE 0.0 END AS rep_frac,
       (CASE WHEN len(g) > 0 THEN
         floor((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 1000000 + 0.5) / 1000000
       ELSE 0.0 END) <= 0.2 AS keep
FROM grams
""",
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: fraction of duplicated word
    trigrams per document, with a keep/drop verdict.  Boilerplate- and
    spam-heavy documents repeat themselves; this is the standard
    pretraining-corpus quality gate alongside q_quality_score's ratio
    heuristics.

    Spark-first shape: the trigram list is built per-row with
    higher-order array functions (transform over a sequence + slice +
    array_distinct) — a pure projection, NO shuffle, no UDF; per-doc
    state is one small array.  At 100 TB this scans and never exchanges.
    The duplicate fraction rounds through the portable
    floor(x*1e6+0.5)/1e6 form (functions/numeric.py rationale) so the
    double is bit-identical in DuckDB.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    grams = F.when(
        F.size("t") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 3),
            lambda i: F.concat_ws(" ", F.slice("t", i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", grams.alias("g"))
    n = F.size("g").cast("long")
    nd = F.size(F.array_distinct("g")).cast("long")
    rep = F.when(
        n > 0,
        F.floor((F.lit(1.0) - nd.cast("double") / n) * 1e6 + F.lit(0.5)) / 1e6,
    ).otherwise(F.lit(0.0))
    return g.select(
        "doc_id",
        n.alias("n_grams"),
        nd.alias("n_distinct"),
        rep.alias("rep_frac"),
        (rep <= 0.2).alias("keep"),
    )


@register(
    "q_pii_scrub",
    oracle="""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or call 555-' ||
         lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS raw
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
       CAST(length(raw) AS BIGINT) AS len_before,
       CAST(length(
         regexp_replace(
           regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]+', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g')
       ) AS BIGINT) AS len_after
FROM seeded
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: regexp_extract_all to census emails/phones,
    regexp_replace to scrub them — the compliance step every training
    corpus runs before anything else sees the text.  The fixtures are
    synthetic word soup, so deterministic PII is injected per doc_id
    first (both engines seed identically) and the redaction is verified
    by match counts and length deltas.  Pure projection — JVM regex
    inside codegen, no shuffle, no UDF; the patterns stay in the
    RE2-compatible subset so Java and DuckDB agree.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("raw"),
    )
    email = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
    phone = r"555-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace("raw", email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("raw", F.lit(email), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("raw", F.lit(phone), F.lit(0))).cast("long").alias("n_phones"),
        F.length("raw").cast("long").alias("len_before"),
        F.length(scrubbed).cast("long").alias("len_after"),
    )


@register(
    "q_interval_arith",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month,
       CAST(quarter(o_orderdate) AS BIGINT) AS q,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
         AS days_to_eoy
FROM orders
""",
)
def q_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic surface: +90 days, +1 calendar month
    (end-of-month clamping matches across engines), quarter extraction,
    day difference to a fixed anchor.  All pure projections — no shuffle,
    fully codegen'd, and Catalyst constant-folds the anchor literal."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 90), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), 1), "yyyy-MM-dd").alias("next_month"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_eoy"),
    )


@register(
    "q_map_roundtrip",
    oracle="""
SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id, event_type
""",
)
def q_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType as a first-class column: per-user event-type counts packed
    into a map<string,bigint> (map_from_entries over collected structs),
    carried through a projection, then exploded back to rows.  Proves the
    map plumbing end-to-end; the oracle is the plain GROUP BY the
    roundtrip must reproduce exactly.  Groups are bounded by the
    event-type vocabulary, so collect_list cannot blow up."""
    e = load(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    counts = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    maps = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("by_type")
    )
    return maps.select(
        "user_id", F.explode("by_type").alias("event_type", "n")
    )


_CHUNK_W = 64  # tokens per chunk
_CHUNK_S = 48  # stride (16-token overlap)


@register(
    "q_chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks, len(toks) AS n,
         CASE WHEN len(toks) <= {_CHUNK_W} THEN 1
              ELSE (len(toks) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1 END AS nch
  FROM t
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_CHUNK_S} + 1 AS BIGINT) AS start_tok,
       CAST(len(toks[i * {_CHUNK_S} + 1 : least(i * {_CHUNK_S} + {_CHUNK_W}, n)]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks[i * {_CHUNK_S} + 1 : least(i * {_CHUNK_S} + {_CHUNK_W}, n)], ' ')) AS chunk_md5
FROM (SELECT doc_id, toks, n, unnest(range(nch)) AS i FROM c)
""",
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (the RAG / context-window
    ingest shape): each document's token stream becomes ceil((n-W)/S)+1
    chunks of up to W={w} tokens at stride S={s}.  Pure per-row
    projection + posexplode — no shuffle, no UDF; the chunk fingerprint
    (md5 of the joined tokens) is the downstream dedup/citation key and
    keeps the whole op oracle-checkable."""
    d = load(spark, sf_dir, "documents")
    toked = d.select(
        "doc_id", F.filter(F.split("text", " "), lambda t: t != "").alias("toks")
    )
    n = F.size("toks")
    nch = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
        ((n - _CHUNK_W + _CHUNK_S - 1) / _CHUNK_S).cast("long") + 1
    )
    chunks = toked.select(
        "doc_id", "toks", F.posexplode(F.sequence(F.lit(0), nch - 1)).alias("chunk_idx", "_i")
    )
    start = F.col("chunk_idx") * _CHUNK_S + 1
    piece = F.slice("toks", start, _CHUNK_W)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


_NLL_KEEP = 3.404  # nats/token; docs above this are "surprising" → drop


@register(
    "q_lm_perplexity",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
vocab AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
tot AS (SELECT sum(c) AS t FROM vocab),
lp AS (
  SELECT token,
         CAST(floor(ln(CAST(c AS DOUBLE) / t) * 1000000 + 0.5) AS BIGINT) AS lp_micro
  FROM vocab, tot
),
perdoc AS (
  SELECT doc_id, count(*) AS n, sum(lp_micro) AS s
  FROM toks JOIN lp USING (token) GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       floor((-CAST(s AS DOUBLE) / (n * 1000000.0)) * 1000000 + 0.5) / 1000000 AS avg_nll,
       floor((-CAST(s AS DOUBLE) / (n * 1000000.0)) * 1000000 + 0.5) / 1000000
         <= {_NLL_KEEP} AS keep
FROM perdoc
""",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity quality filter (the CCNet / Wenzek et
    al. 2020 gate, with the corpus itself as the LM): train a unigram
    MLE model over the whole corpus, score every document by its
    average negative log-likelihood per token, and keep the
    unsurprising ones (avg_nll <= 3.404 nats).  This is the standard
    third quality axis next to q_quality_score's ratio heuristics and
    q_repetition_filter's duplication fraction: gibberish and
    boilerplate both sit in the NLL tails.

    Spark-first shape: ONE tokenize pass feeds (a) the vocabulary hash
    agg (token -> count, map-side combinable) and (b) the per-doc
    scoring agg; the corpus-total token count is a broadcast scalar
    computed IN-PLAN (one-row agg + crossJoin, the dangling-mass
    pattern from graph.py), and the token->logprob join is an equi-join
    on token with the vocab side PINNED broadcast (bm25's term-dim
    pattern; without the hint Catalyst broadcasts the post-explode
    PROBE side at small SFs — the wrong side at any scale).  At 100 TB
    vocab sizes drop the hint for a shuffle hash join; Heaps' law still
    keeps the vocab side orders of magnitude under the token stream.
    Hot tokens ("the")
    are join KEYS only on the probe side — the vocab side is unique per
    token, so the join skews no worse than the data itself and needs no
    salting.

    Determinism contract (what makes an LM score oracle-checkable):
    each token's log-prob is rounded to integer MICRO-NATS
    (floor(ln(c/t)*1e6+0.5)) so the per-doc reduction is an exact
    BIGINT sum — summation order cannot drift between engines; the
    final avg re-rounds through the same portable floor form.  The
    only float ops are one ln per DISTINCT token and one divide per
    doc, both on identical inputs in both engines.

    Residual oracle risk, stated honestly (r8 ADVICE): the integer
    micro-nat columns are compared EXACTLY, and JVM Math.log vs DuckDB
    ln() may differ by 1 ulp on the same input — if that ulp lands
    within an ulp of a floor(x*1e6+0.5) boundary the micro-nat flips
    and the hash fails.  No deterministic cross-engine quantization of
    a transcendental can eliminate this (any boundary placement has
    the same measure-zero failure set; pre-rounding ln's INPUT doesn't
    help because the divergence is in the two ln implementations, not
    the inputs).  The per-token collision probability is ~2·ulp(1e7)/1
    ≈ 4e-9; over the ~3e4-token fixture vocab that is ~1e-4 per sweep
    — an accepted, documented residual, not a guaranteed contract."""
    return lm_perplexity_frame(load(spark, sf_dir, "documents"))


def lm_perplexity_frame(docs: DataFrame) -> DataFrame:
    """q_lm_perplexity's pipeline over an arbitrary (doc_id, text) frame —
    factored out so tools/lm_scale_probe.py can drive it against a
    blown-up corpus and measure the vocab/stream asymmetry claim."""
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token"),
    )
    # Materialize the vocabulary ONCE (Heaps'-law-sized, orders of
    # magnitude under the token stream): without this the tokenize scan
    # runs three times — once under the total-count scalar, once under
    # the log-prob table, once on the probe side.  localCheckpoint, not
    # .cache() (GC-scoped, and the scalar subtree would otherwise embed
    # a duplicate of the whole agg pipeline).
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = vocab.agg(F.sum("c").alias("t"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        F.floor(F.log(F.col("c").cast("double") / F.col("t")) * 1e6 + F.lit(0.5))
        .cast("long")
        .alias("lp_micro"),
    )
    perdoc = (
        toks.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("lp_micro").alias("s"))
    )
    nll = F.floor(
        (-F.col("s").cast("double") / (F.col("n") * 1e6)) * 1e6 + F.lit(0.5)
    ) / 1e6
    return perdoc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        nll.alias("avg_nll"),
        (nll <= _NLL_KEEP).alias("keep"),
    )


@register(
    "q_quality_classifier",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
lab AS (
  SELECT doc_id, count(*) AS n,
         CASE WHEN 10 * count(*) FILTER (WHERE token IN {_STOPWORDS!r}) >= count(*)
              THEN 1 ELSE 0 END AS y
  FROM toks GROUP BY doc_id
),
tl AS (
  SELECT token, y, count(*) AS c
  FROM toks JOIN lab USING (doc_id) GROUP BY token, y
),
wide AS (
  SELECT token,
         coalesce(sum(c) FILTER (WHERE y = 1), 0) AS c1,
         coalesce(sum(c) FILTER (WHERE y = 0), 0) AS c0
  FROM tl GROUP BY token
),
consts AS (
  SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS v FROM wide
),
lp AS (
  SELECT token,
         CAST(floor(ln((c1 + 1.0) / (n1 + v)) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln((c0 + 1.0) / (n0 + v)) * 1000000 + 0.5) AS BIGINT) AS dlp
  FROM wide, consts
),
prior AS (
  SELECT CAST(floor(ln(sum(y) * 1.0 / count(*)) * 1000000 + 0.5) AS BIGINT)
         - CAST(floor(ln((count(*) - sum(y)) * 1.0 / count(*)) * 1000000 + 0.5) AS BIGINT) AS dprior
  FROM lab
),
score AS (
  SELECT doc_id, sum(dlp) AS s
  FROM toks JOIN lp USING (token) GROUP BY doc_id
)
SELECT lab.doc_id,
       CAST(lab.n AS BIGINT) AS n_tokens,
       lab.y = 1 AS weak_keep,
       CAST(score.s + prior.dprior AS BIGINT) AS log_odds_micro,
       (score.s + prior.dprior) > 0 AS pred_keep
FROM lab JOIN score ON lab.doc_id = score.doc_id, prior
""",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based quality filtering — the third stage of the
    CCNet / LLaMA-style curation stack (heuristics → perplexity →
    classifier): train a multinomial Naive Bayes text classifier with
    Laplace smoothing on WEAK labels (stopword density ≥ 10%, an
    integer-exact portable rule) and score every document's keep/drop
    log-odds.  NB is the closed-form stand-in for the fasttext linear
    classifier used in production pipelines: same bag-of-words decision
    function w·x + b, but with weights derived by counting — which is
    what makes it expressible as a dataflow in BOTH engines and thus
    oracle-checkable end-to-end, training included.

    Spark-first shape (the q_lm_perplexity template, one class wider):
    ONE tokenize pass feeds the label agg, the per-(token, class)
    count agg, and the scoring probe; all corpus constants (class
    token totals, vocab size, priors) are computed IN-PLAN (one-row
    aggs + broadcast cross joins, never a driver collect); the
    token→Δlogprob table is Heaps'-law-sized and PINNED broadcast on
    the probe join.  Every reduction is a BIGINT sum of integer
    MICRO-NATS — floor(ln(·)·1e6 + 0.5) per DISTINCT token, the
    determinism contract that makes a trained model's scores
    hash-comparable across engines (see q_lm_perplexity, including
    its honest statement of the irreducible 1-ulp/floor-boundary
    residual risk, ~1e-4 per sweep — it applies to log_odds_micro
    here identically).

    At 100 TB: training is two map-side-combinable hash aggs over the
    token stream (label + (token, class) counts) — embarrassingly
    partial; scoring is the same broadcast probe as perplexity.  The
    weak-label rule stands in for hand-curated positives (in CCNet,
    Wikipedia); swapping a curated label column in changes nothing
    structural."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token"),
        )
    )
    # one materialization feeds labels, counts, and the scoring probe
    toks = toks.localCheckpoint(eager=True)
    lab = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        (
            10 * F.count(F.when(F.col("token").isin(*_STOPWORDS), 1)) >= F.count(F.lit(1))
        ).cast("int").alias("y"),
    ).localCheckpoint(eager=True)  # read by training AND the final select
    tl = (
        toks.join(lab.select("doc_id", "y"), "doc_id")
        .groupBy("token", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wide = tl.groupBy("token").agg(
        F.coalesce(F.sum(F.when(F.col("y") == 1, F.col("c"))), F.lit(0)).alias("c1"),
        F.coalesce(F.sum(F.when(F.col("y") == 0, F.col("c"))), F.lit(0)).alias("c0"),
    ).localCheckpoint(eager=True)  # Heaps'-law-sized; feeds consts AND lp
    consts = wide.agg(
        F.sum("c1").alias("n1"), F.sum("c0").alias("n0"), F.count(F.lit(1)).alias("v")
    )
    micro = lambda x: F.floor(F.log(x) * 1e6 + F.lit(0.5)).cast("long")
    lp = wide.crossJoin(F.broadcast(consts)).select(
        "token",
        (
            micro((F.col("c1") + 1.0) / (F.col("n1") + F.col("v")))
            - micro((F.col("c0") + 1.0) / (F.col("n0") + F.col("v")))
        ).alias("dlp"),
    )
    prior = lab.agg(
        (
            micro(F.sum("y") * 1.0 / F.count(F.lit(1)))
            - micro((F.count(F.lit(1)) - F.sum("y")) * 1.0 / F.count(F.lit(1)))
        ).alias("dprior")
    )
    score = (
        toks.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(F.sum("dlp").alias("s"))
    )
    odds = (F.col("s") + F.col("dprior")).cast("long")
    return (
        lab.join(score, "doc_id")
        .crossJoin(F.broadcast(prior))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            (F.col("y") == 1).alias("weak_keep"),
            odds.alias("log_odds_micro"),
            (odds > 0).alias("pred_keep"),
        )
    )


# ---------------------------------------------------------------------------
# Curation gates (VERDICT r9 item 4): the two standard CCNet/RefinedWeb
# stages the strict-clean stack was missing — a domain/URL blocklist and
# a lexicon toxicity gate.  Both pure relational, fully oracle-checked.
# The fixtures carry no URLs (synthetic word-soup text), so a
# deterministic URL is seeded per (source, doc_id) first — the q_pii_scrub
# convention: both engines seed identically, the gate logic is real.

#: blocklist stand-in (a real deployment reads ~1M rules from a table):
#: exact rules match the full host; suffix rules match any registrable
#: suffix of it (RFC-style: 'src11.example.com' blocks every subdomain).
_DOMAIN_RULES: tuple[tuple[str, str], ...] = (
    ("www.src3.example.com", "exact"),
    ("www.src7.example.org", "exact"),
    ("src11.example.com", "suffix"),
    ("src15.example.net", "suffix"),
)


def _seeded_host():
    """Deterministic host per document: www.<source>.example.<tld> with
    the tld cycling by doc_id — 60 distinct hosts over the fixtures."""
    tld = (
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net")
    )
    return F.concat(F.lit("www."), F.col("source"), F.lit(".example."), tld)


_SQL_SEEDED_HOST = (
    "'www.' || source || '.example.' || "
    "(CASE WHEN doc_id % 3 = 0 THEN 'com' WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END)"
)


def _host_suffix_chain(host):
    """host → its dot-suffix chain, most-specific first:
    www.a.example.com → [www.a.example.com, a.example.com, example.com,
    com].  The chain is what makes suffix rules an EQUI-join: explode it
    and match rules by equality instead of scanning every rule with
    endswith — at 1M rules × 100 TB of docs that is the difference
    between a broadcast hash join and an all-pairs predicate."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
    )


_SQL_HOST_CHAIN = (
    "list_transform(range(len(string_split({h}, '.'))), "
    "i -> array_to_string(list_slice(string_split({h}, '.'), i + 1, "
    "len(string_split({h}, '.'))), '.'))"
)


def domain_gate(docs: DataFrame, rules: DataFrame) -> DataFrame:
    """Domain/URL-blocklist gate (CCNet/RefinedWeb stage): ``docs`` must
    carry a ``host`` column; ``rules`` is (rule, kind) with kind
    'exact' (full-host match) or 'suffix' (any dot-suffix match).
    Returns docs + a ``blocked`` boolean.

    Scale shape: the host's suffix chain (≤ label-count elements, ~4)
    explodes per doc and equi-joins the BROADCAST rule table; an exact
    rule only matches chain position 0 (the full host).  One narrow
    explode + one broadcast hash join + one doc_id dedup — never an
    endswith scan over the rule list."""
    hits = (
        docs.select("doc_id", F.posexplode(_host_suffix_chain(F.col("host"))).alias("i", "el"))
        .join(F.broadcast(rules), F.col("el") == F.col("rule"))
        .where((F.col("kind") == "suffix") | (F.col("i") == 0))
        .select("doc_id")
        .distinct()
        .withColumn("blocked", F.lit(True))
    )
    return docs.join(hits, "doc_id", "left").withColumn(
        "blocked", F.coalesce("blocked", F.lit(False))
    )


def _sql_domain_rules_values() -> str:
    return ", ".join(f"('{r}', '{k}')" for r, k in _DOMAIN_RULES)


@register(
    "q_domain_filter",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, {_SQL_SEEDED_HOST} AS host FROM documents
),
chain AS (
  SELECT doc_id, unnest(ch) AS el, unnest(range(len(ch))) AS i
  FROM (SELECT doc_id, {_SQL_HOST_CHAIN.format(h="host")} AS ch FROM d)
),
rules(rule, kind) AS (VALUES {_sql_domain_rules_values()}),
hits AS (
  SELECT DISTINCT c.doc_id
  FROM chain c JOIN rules r ON c.el = r.rule
  WHERE r.kind = 'suffix' OR c.i = 0
)
SELECT d.host AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       (count(*) FILTER (WHERE h.doc_id IS NOT NULL) = count(*)) AS blocked
FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
GROUP BY d.host
""",
)
def q_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/URL-blocklist gate as a query: seed the deterministic host
    per document (the fixtures carry no URLs — q_pii_scrub convention),
    run domain_gate against the 4-rule stand-in blocklist (2 exact-host
    rules + 2 registrable-suffix rules), and report per-host doc counts
    with the gate decision.  Every doc of a host shares its fate, so
    ``blocked`` is constant per group — asserted by the all-or-nothing
    aggregate.  ORACLE-CHECKED; the gate itself is one narrow
    suffix-chain explode + one broadcast equi-join (domain_gate
    docstring for the 100 TB posture)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", _seeded_host().alias("host"))
    rules = spark.createDataFrame(list(_DOMAIN_RULES), "rule string, kind string")
    gated = domain_gate(d, rules)
    return gated.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("blocked").cast("int")) == F.count(F.lit(1))).alias("blocked"),
    )


#: lexicon toxicity stand-in (a real deployment reads a weighted term
#: list — e.g. the Jigsaw/badwords lexicons): term → severity weight.
#: Weights are exact binary fractions (multiples of 0.25) so the score
#: sum is EXACT in doubles — no summation-order divergence is possible
#: before the final division (cross-engine fp note).
_TOX_LEXICON: tuple[tuple[str, float], ...] = (
    ("slow", 1.0),
    ("big", 0.5),
    ("filter", 0.75),
)
_TOX_THRESH = 0.09  # score ≥ τ blocks; ~p80 of the fixture distribution


def tox_score_expr(toks):
    """Per-doc lexicon toxicity score: Σ weight(token) / n_tokens — a
    pure higher-order expression (transform + aggregate over the token
    array), JVM-side, fused into the scan.  For a 100k-term real
    lexicon swap the literal CASE for a token-explode + broadcast join
    (the q_lm_perplexity vocab pattern); the per-doc normalization is
    identical."""
    def weight(t):
        expr = F.lit(0.0)
        for term, wt in _TOX_LEXICON:
            expr = F.when(t == term, F.lit(wt)).otherwise(expr)
        return expr

    total = F.aggregate(F.transform(toks, weight), F.lit(0.0), lambda a, x: a + x)
    return total / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


_SQL_TOX_CASE = (
    "CASE t WHEN 'slow' THEN CAST(1.0 AS DOUBLE) WHEN 'big' THEN CAST(0.5 AS DOUBLE) "
    "WHEN 'filter' THEN CAST(0.75 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
)
_SQL_TOX_SCORE = (
    "list_sum(list_transform(list_filter(string_split(text, ' '), x -> x <> ''), "
    f"t -> {_SQL_TOX_CASE})) "
    "/ greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1)"
)


@register(
    "q_toxicity_filter",
    oracle=f"""
SELECT doc_id,
       (CAST(floor(({_SQL_TOX_SCORE}) * 1000000 + 0.5) AS DOUBLE) / 1000000) AS tox_score,
       ({_SQL_TOX_SCORE}) >= {_TOX_THRESH} AS blocked
FROM documents
""",
)
def q_toxicity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon toxicity gate (the Jigsaw-style curation stage): per-doc
    score = Σ lexicon-weight(token) / n_tokens over the 3-term weighted
    stand-in lexicon, gate at τ={t}.  Pure projection — the score fuses
    into the scan (no shuffle, no UDF); exact-binary weights make the
    sum engine-order-proof (see _TOX_LEXICON note).  ORACLE-CHECKED:
    6-dp half-up score + the gate decision per document.""".replace(
        "{t}", str(_TOX_THRESH)
    )
    d = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    score = tox_score_expr(toks)
    six = F.floor(score * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(1000000.0)
    return d.select(
        "doc_id", six.alias("tox_score"), (score >= F.lit(_TOX_THRESH)).alias("blocked")
    )


_PMI_MIN_COUNT = 5  # collocation support floor — keeps the result set
# bounded and the estimator out of the ln(0)-adjacent noise regime

#: shared final expression (identical text in Spark SQL and DuckDB — the
#: repo's shared-SQL-text IEEE-determinism convention): micro-nat PMI =
#: ln( p(a,b) / (p(a)·p(b)) ) with p(a,b)=cab/m, p(x)=c/n, algebraically
#: cab·n/m·n/(ca·cb), evaluated in ONE fixed op order
_PMI_EXPR = (
    "CAST(floor(ln(CAST(cab AS DOUBLE) * n_tok / m_big * n_tok "
    "/ (CAST(ca AS DOUBLE) * cb)) * 1000000 + 0.5) AS BIGINT)"
)


@register(
    "q_word_pmi",
    oracle=f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
big AS MATERIALIZED (
  SELECT toks[i + 1] AS a, toks[i + 2] AS b
  FROM t, (SELECT unnest(range(len(toks) - 1)) AS i)
),
cab AS (SELECT a, b, count(*) AS cab FROM big GROUP BY a, b HAVING count(*) >= {_PMI_MIN_COUNT}),
uni AS MATERIALIZED (
  SELECT tok, count(*) AS c FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
),
j AS (
  SELECT cab.a, cab.b, cab.cab, ua.c AS ca, ub.c AS cb,
         (SELECT sum(c) FROM uni) AS n_tok,
         (SELECT count(*) FROM big) AS m_big
  FROM cab JOIN uni ua ON cab.a = ua.tok JOIN uni ub ON cab.b = ub.tok
)
SELECT a, b, CAST(cab AS BIGINT) AS pair_count, {{expr}} AS pmi_micro
FROM j
""".replace("{expr}", _PMI_EXPR),
)
def q_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocations over adjacent word
    pairs — the phrase-mining / lexicon-induction stage of a text
    pipeline (Mikolov-style phrase detection runs exactly this
    statistic).  Shape at scale: bigrams are PER-DOC ARRAY algebra
    (transform over the token array — no window shuffle, no per-token
    rows until the one combinable pair-count agg); unigram counts are a
    second combinable agg; the vocab-sized count table joins back
    broadcast (the q_tfidf discipline) and the two corpus scalars ride
    a 1-row crossJoin.  Determinism: counts are exact integers and the
    micro-nat PMI is ONE shared expression text, so both engines run
    the identical IEEE op sequence.  Support floor {mc} bounds the
    result.""".replace("{mc}", str(_PMI_MIN_COUNT))
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("toks")
    )
    big = t.select(
        F.expr(
            "explode(transform(slice(toks, 1, size(toks) - 1), (x, i) -> struct(x AS a, toks[i + 1] AS b)))"
        ).alias("p")
    ).select("p.a", "p.b")
    cab = (
        big.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .where(F.col("cab") >= _PMI_MIN_COUNT)
    )
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = t.select(F.explode("toks").alias("tok")).agg(
        F.count(F.lit(1)).alias("n_tok")
    )
    m = big.agg(F.count(F.lit(1)).alias("m_big"))
    j = (
        cab.join(F.broadcast(uni.select(F.col("tok").alias("a"), F.col("c").alias("ca"))), "a")
        .join(F.broadcast(uni.select(F.col("tok").alias("b"), F.col("c").alias("cb"))), "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(m))
    )
    return j.select(
        "a", "b", F.col("cab").cast("long").alias("pair_count"), F.expr(_PMI_EXPR).alias("pmi_micro")
    )


@register(
    "q_lang_entropy",
    oracle="""
WITH tok AS MATERIALIZED (
  SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
  FROM documents
),
c AS (SELECT lang, tok, count(*) AS c FROM tok GROUP BY lang, tok),
g AS (
  SELECT lang, sum(c) AS n_tok, count(*) AS vocab,
         sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)) AS s_clnc
  FROM c GROUP BY lang
)
SELECT lang, CAST(n_tok AS BIGINT) AS n_tok, CAST(vocab AS BIGINT) AS vocab,
       floor((CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
              - CAST(s_clnc AS DOUBLE) / n_tok) + 0.5) / 1000000 AS entropy_nats
FROM g
""",
)
def q_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Shannon entropy of the word distribution — the
    corpus-diversity diagnostic (a collapsing or template-spammed
    source shows up as an entropy drop long before eyeballing does):
    H = ln N − (Σ c·ln c)/N over exact integer counts.  One combinable
    (lang, token) count agg + one per-lang rollup; the per-term ln is
    micro-nat-quantized (the q_lm_perplexity route) so the Σ c·ln c is
    an EXACT integer sum — order-proof — and the closing expression is
    one shared text."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("tok")
    )
    c = tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    g = c.groupBy("lang").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(
            F.col("c")
            * F.expr("CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
        ).alias("s_clnc"),
    )
    return g.selectExpr(
        "lang",
        "CAST(n_tok AS BIGINT) AS n_tok",
        "CAST(vocab AS BIGINT) AS vocab",
        "floor((CAST(floor(ln(CAST(n_tok AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
        " - CAST(s_clnc AS DOUBLE) / n_tok) + 0.5) / 1000000 AS entropy_nats",
    )


_INV_MIN_DF = 5
_INV_HEAD = 8


@register(
    "q_inverted_index",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> ''
),
tf AS (SELECT token, count(*) AS tf_total FROM toks GROUP BY token),
p AS (SELECT DISTINCT token, doc_id FROM toks),
df AS (SELECT token, count(*) AS df FROM p GROUP BY token),
head AS (
  SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_head
  FROM (
    SELECT token, doc_id,
           row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
    FROM p
  ) WHERE rn <= {_INV_HEAD} GROUP BY token
)
SELECT df.token, CAST(df.df AS BIGINT) AS df, CAST(tf.tf_total AS BIGINT) AS tf_total,
       head.postings_head
FROM df JOIN tf USING (token) JOIN head USING (token)
WHERE df.df >= {_INV_MIN_DF}
""",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (the retrieval-infrastructure
    primitive under BM25 serving and the shingle-postings dedup
    family): per term, document frequency, total term frequency, and
    the HEAD of the posting list ({h} lowest doc_ids as a canonical
    comma string) for terms with df >= {m}.  The head is cut BEFORE
    any list materializes (row_number <= {h} per term, then an
    {h}-bounded collect) — a hot term's full posting list (millions of
    docs at 100 TB) never aggregates anywhere; df/tf stay map-side-
    combinable counts.  Everything is integer counts and canonical
    strings — no FP anywhere.""".replace("{h}", str(_INV_HEAD)).replace(
        "{m}", str(_INV_MIN_DF)
    )
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.filter(F.split("text", " "), lambda t: t != "")).alias("token"),
        )
        .localCheckpoint(eager=True)  # feeds tf AND the postings pair
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf_total"))
    p = toks.select("token", "doc_id").distinct()
    df = p.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("token").orderBy("doc_id")
    head = (
        p.select("token", "doc_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _INV_HEAD)
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("postings_head")
        )
    )
    return (
        df.where(F.col("df") >= _INV_MIN_DF)
        .join(tf, "token")
        .join(head, "token")
        .select("token", F.col("df").cast("long").alias("df"),
                F.col("tf_total").cast("long").alias("tf_total"), "postings_head")
    )
