"""Round-4 text-operator tail: RAKE keyword extraction, Zipf
rank-frequency profiling, word-length histograms, and banded
edit-distance fuzzy pairing. Registered last (after the 50-slot window;
queries/registry.py ordering note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.queries.base import QuerySpec, tables


# --- RAKE keyword scores ----------------------------------------------------
def _q_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scores over the documents corpus
    (operators/text.rake_keyword_scores): stopword-delimited phrases, word
    score = phrase-degree / frequency."""
    from lakehouse_architecture_spark.operators.text import rake_keyword_scores

    t = tables(spark, sf_dir)
    return rake_keyword_scores(t["documents"], "text", top_k=30)


_RAKE_SPLIT = r"\s*\b(?:the|a|of|and|to|in|is|for|on)\b\s*"

_Q_RAKE_SQL = f"""
WITH phrases AS (
  SELECT p.phrase
  FROM documents,
       unnest(regexp_split_to_array(lower(trim(text)), '{_RAKE_SPLIT}')) AS p(phrase)
  WHERE p.phrase <> ''
),
words AS (
  SELECT len(regexp_split_to_array(phrase, '\\s+')) AS plen, w.word
  FROM phrases, unnest(regexp_split_to_array(phrase, '\\s+')) AS w(word)
  WHERE w.word <> ''
),
scored AS (
  SELECT word, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS degree
  FROM words GROUP BY word
)
SELECT word, freq, degree,
       ROUND(degree * 1.0 / freq, 6) AS rake_score
FROM scored
ORDER BY rake_score DESC, word LIMIT 30
"""


# --- Zipf rank-frequency profile -------------------------------------------
def _q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf profile of the corpus vocabulary: frequency rank vs observed
    frequency plus the Zipf expectation f(1)/rank — the standard sanity
    check that a corpus has natural long-tail token statistics (synthetic
    or templated text shows up as a flat head). Vocabulary-sized
    aggregate, rank window over the tiny vocab table."""
    t = tables(spark, sf_dir)
    words = t["documents"].select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.col("freq").desc(), F.col("word").asc())
    top = vocab.select(
        "word", "freq", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= 30)
    f1 = top.filter(F.col("rank") == 1).select(F.col("freq").alias("__f1"))
    return (
        top.crossJoin(F.broadcast(f1))
        .select(
            "rank",
            "word",
            "freq",
            F.round(F.col("__f1") / F.col("rank"), 4).alias("zipf_expected"),
            F.round(F.col("freq") * F.col("rank") / F.col("__f1"), 6).alias(
                "zipf_ratio"
            ),
        )
        .orderBy("rank")
    )


_Q_ZIPF_SQL = """
WITH words AS (
  SELECT w.word
  FROM documents,
       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w(word)
  WHERE w.word <> ''
),
vocab AS (SELECT word, COUNT(*) AS freq FROM words GROUP BY word),
ranked AS (
  SELECT word, freq,
         CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS INTEGER) AS rank
  FROM vocab
),
top AS (SELECT * FROM ranked WHERE rank <= 30),
f1 AS (SELECT freq AS f1 FROM top WHERE rank = 1)
SELECT rank, word, freq,
       ROUND(f1 * 1.0 / rank, 4) AS zipf_expected,
       ROUND(freq * rank * 1.0 / f1, 6) AS zipf_ratio
FROM top, f1
ORDER BY rank
"""


# --- word-length histogram --------------------------------------------------
def _q_word_len_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word-length histogram with cumulative share — the cheap
    tokenizer-health profile (a spike at extreme lengths flags
    boilerplate/code contamination). One explode + vocabulary-free hash
    aggregate on the length key (bounded domain)."""
    t = tables(spark, sf_dir)
    words = t["documents"].select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    hist = words.groupBy(F.length("word").alias("word_len")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = hist.agg(F.sum("n").alias("__t"))
    w = Window.orderBy("word_len").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "word_len",
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias("share"),
            F.round(F.sum("n").over(w) / F.col("__t"), 6).alias("cum_share"),
        )
        .orderBy("word_len")
    )


_Q_WORD_LEN_SQL = """
WITH words AS (
  SELECT w.word
  FROM documents,
       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w(word)
  WHERE w.word <> ''
),
hist AS (SELECT len(word) AS word_len, COUNT(*) AS n FROM words GROUP BY 1),
tot AS (SELECT SUM(n) AS t FROM hist)
SELECT word_len, n,
       ROUND(n * 1.0 / t, 6) AS share,
       ROUND(SUM(n) OVER (ORDER BY word_len ROWS UNBOUNDED PRECEDING) * 1.0 / t, 6)
         AS cum_share
FROM hist, tot
ORDER BY word_len
"""


# --- banded edit-distance fuzzy pairs --------------------------------------
def _q_levenshtein_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names by edit distance <= 3: DEDUPLICATE to
    distinct names first (with their multiplicities), block on the name's
    last token (the head noun), compare only within blocks, and report
    name pairs with the implied record-pair count — output and compare
    cost are bounded by NAME DIVERSITY, not row count. (The exploded
    key-pair form is output-quadratic on a low-diversity column: at sf0.1
    the same 200 distinct names cover 20k parts, i.e. ~10M key pairs —
    measured 64 s; this form runs in well under a second at any SF.)"""
    t = tables(spark, sf_dir)
    names = (
        t["part"]
        .groupBy(F.lower(F.col("p_name")).alias("name"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "__blk", F.element_at(F.split(F.col("name"), r"\s+"), -1)
        )
    )
    a = names.select(
        F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"), "__blk"
    )
    b = names.select(
        F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"), "__blk"
    )
    return (
        a.join(b, on="__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 3)
        .select(
            "name_a",
            "name_b",
            "edit_dist",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_record_pairs"),
        )
        .orderBy("name_a", "name_b")
    )


_Q_LEV_SQL = """
WITH names AS (
  SELECT lower(p_name) AS name, COUNT(*) AS cnt,
         list_extract(regexp_split_to_array(lower(p_name), '\\s+'), -1) AS blk
  FROM part GROUP BY 1
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_dist,
       a.cnt * b.cnt AS n_record_pairs
FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
ORDER BY name_a, name_b
"""


TEXTOPS2_QUERIES = [
    QuerySpec("q_rake_keywords", "RAKE degree/freq keyword scores", _q_rake, _Q_RAKE_SQL),
    QuerySpec("q_zipf", "Zipf rank-frequency corpus profile", _q_zipf, _Q_ZIPF_SQL),
    QuerySpec("q_word_len_hist", "word-length histogram with cumulative share", _q_word_len_hist, _Q_WORD_LEN_SQL),
    QuerySpec("q_levenshtein_block", "blocked edit-distance fuzzy pairs", _q_levenshtein_block, _Q_LEV_SQL),
]
