"""Training-data pipeline queries: dedup (exact/fingerprint/MinHash-LSH/
SimHash/n-gram-Jaccard), similarity search (brute-force + LSH buckets),
text analysis (tokens/quality/language-ID), and multimodal plumbing.

The hash-based operators use md5-derived integers (functions/hashing.py), so
every step — including MinHash permutations and SimHash bit math — has an
exact DuckDB oracle. Constants here (num_perm=16, bands=4, planes=8,
shingle n=3) must stay in sync between builder and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_spark.operators import similarity as sim
from lakehouse_architecture_spark.operators.dedup import (
    dedup_keep_first,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from lakehouse_architecture_spark.operators.curation import (
    pack_token_budget,
    quota_cap,
    stratified_hash_sample,
    weighted_priority_sample,
)
from lakehouse_architecture_spark.operators.graph import dedup_clusters
from lakehouse_architecture_spark.operators.pandas_ops import grouped_rank
from lakehouse_architecture_spark.operators.multimodal import (
    decode_binary_meta,
    sample_frames,
)
from lakehouse_architecture_spark.operators.text import (
    LANG_MARKERS,
    bpe_ish_token_count,
    char_stats,
    drop_duplicate_lines,
    fingerprint,
    language_id,
    quality_score,
    redact,
    tf_idf_top_terms,
    vocab_topk,
    winnow_fingerprints,
)
from lakehouse_architecture_spark.queries.base import QuerySpec, tables

# Shared oracle CTEs -------------------------------------------------------

_HASH64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

# word 3-shingles per document, distinct (matches operators.dedup.word_shingles)
_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, i.i + 1, i.i + 3), ' ') AS shingle
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(tk) - 3)) AS i) i
  WHERE length(array_to_string(list_slice(tk, i.i + 1, i.i + 3), ' ')) > 0
)
"""


# --- dedup: keep-first per (user_id, event_type) over events --------------
def _q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    out = dedup_keep_first(t["events"], ["user_id", "event_type"], "ts")
    return out.select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        "value",
        "props",
    )


_Q_DEDUP_KEEP_FIRST_SQL = """
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts, value, props
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# --- dedup: normalization fingerprint groups over documents ---------------
def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    fp = fingerprint(t["documents"])
    return (
        fp.groupBy("fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
        .select("fp", "canonical_id", "group_size")
    )


_NORM_EXPR = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)
_Q_FINGERPRINT_SQL = f"""
SELECT {_HASH64.format(expr=_NORM_EXPR)} AS fp,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS group_size
FROM documents
GROUP BY 1
"""


# --- dedup: n-gram Jaccard pairs ------------------------------------------
_JACCARD_THRESHOLD = 0.2


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return ngram_jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=_JACCARD_THRESHOLD
    ).orderBy("id_a", "id_b")


_Q_NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) >= {_JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""


# --- dedup: MinHash + LSH banding -----------------------------------------
_NUM_PERM, _BANDS = 16, 4


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return minhash_lsh_candidates(
        t["documents"], "doc_id", "text", num_perm=_NUM_PERM, bands=_BANDS, shingle_n=3
    ).orderBy("id_a", "id_b")


_Q_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
hashed AS (
  SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh
),
mh AS (
  SELECT doc_id, p.i AS i,
         MIN((((p.i + 1) * 2654435761 % 1000000007) * (h % 1000000007)
              + ((p.i + 1) * 40503 % 1000000007)) % 1000000007) AS mh
  FROM hashed, (SELECT unnest(generate_series(0, {_NUM_PERM - 1})) AS i) p
  GROUP BY doc_id, p.i
),
bands AS (
  SELECT doc_id, i // {_NUM_PERM // _BANDS} AS band,
         string_agg(CAST(mh AS VARCHAR), '_' ORDER BY i) AS sig
  FROM mh GROUP BY doc_id, band
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_bands
FROM bands a
JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --- dedup: SimHash fingerprints ------------------------------------------
def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return simhash(t["documents"], "doc_id", "text", bits=60).orderBy("id")


_Q_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id, {_HASH64.format(expr='tok')} AS h FROM toks WHERE tok <> ''
),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) b
  GROUP BY doc_id, b.b
)
SELECT doc_id AS id,
       CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
FROM bits
GROUP BY doc_id
ORDER BY id
"""


# --- similarity: brute-force cosine top-k ---------------------------------
_KNN_K = 5
_DIMS_CTE = "dims AS (SELECT unnest(generate_series(1, 64)) AS d)"
_NORMS_CTE = """
norms AS (
  SELECT vec_id,
         sqrt(SUM(CAST(embedding[d.d] AS DOUBLE) * CAST(embedding[d.d] AS DOUBLE))) AS nrm
  FROM embeddings, dims d
  GROUP BY vec_id
)
"""


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    emb = t["embeddings"]
    return sim.brute_force_knn(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=_KNN_K
    ).select("query_id", "neighbor_id", "cos", "rank").orderBy("query_id", "rank")


_Q_KNN_SQL = f"""
WITH {_DIMS_CTE},
{_NORMS_CTE},
q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id % 50 = 0),
dots AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         SUM(CAST(q.embedding[d.d] AS DOUBLE) * CAST(c.embedding[d.d] AS DOUBLE)) AS dp
  FROM q, embeddings c, dims d
  WHERE c.vec_id <> q.query_id
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(dp / (nq.nrm * nc.nrm), 6) AS cos
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cos,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {_KNN_K}
ORDER BY query_id, rank
"""


# --- similarity: random-hyperplane LSH bucket pairs -----------------------
_PLANES = 8


def _q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return sim.lsh_bucket_pairs(
        t["embeddings"], dim=64, planes=_PLANES, min_cos=0.0
    ).orderBy("id_a", "id_b")


_Q_LSH_BUCKETS_SQL = f"""
WITH {_DIMS_CTE},
{_NORMS_CTE},
planes AS (
  SELECT p.p AS p, d.d AS d,
         CAST(({_HASH64.format(expr="CAST(p.p AS VARCHAR) || ':' || CAST(d.d - 1 AS VARCHAR)")} % 2001) - 1000 AS DOUBLE) AS w
  FROM (SELECT unnest(generate_series(0, {_PLANES - 1})) AS p) p, dims d
),
pdots AS (
  SELECT e.vec_id, pl.p, SUM(CAST(e.embedding[pl.d] AS DOUBLE) * pl.w) AS dp
  FROM embeddings e, planes pl
  GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id,
         string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM pdots GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.sig AS sig
  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
),
pairdots AS (
  SELECT pr.id_a, pr.id_b, pr.sig,
         SUM(CAST(ea.embedding[d.d] AS DOUBLE) * CAST(eb.embedding[d.d] AS DOUBLE)) AS dp
  FROM pairs pr
  JOIN embeddings ea ON ea.vec_id = pr.id_a
  JOIN embeddings eb ON eb.vec_id = pr.id_b, dims d
  GROUP BY 1, 2, 3
)
SELECT id_a, id_b, sig,
       ROUND(dp / (na.nrm * nb.nrm), 6) AS cos
FROM pairdots
JOIN norms na ON na.vec_id = id_a
JOIN norms nb ON nb.vec_id = id_b
WHERE ROUND(dp / (na.nrm * nb.nrm), 6) >= 0.0
ORDER BY id_a, id_b
"""


# --- text analysis: char/token stats --------------------------------------
def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        char_stats(t["documents"])
        .withColumn("n_subtokens", bpe_ish_token_count("text"))
        .select(
            "doc_id", "n_chars_m", "n_tokens", "n_punct", "n_digits",
            "n_spaces", "n_subtokens",
        )
        .orderBy("doc_id")
    )


_Q_TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars_m,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) END AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS INT) AS n_punct,
       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits,
       CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS INT) AS n_spaces,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subtokens
FROM documents
ORDER BY doc_id
"""


# --- text analysis: quality scoring ---------------------------------------
def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return quality_score(t["documents"]).select(
        "doc_id", "mean_word_len", "punct_ratio", "stopword_ratio", "quality"
    ).orderBy("doc_id")


_Q_QUALITY_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CASE WHEN trim(text) = '' THEN CAST(0 AS DOUBLE)
              ELSE CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) END AS n_tok,
         CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) AS n_punct,
         CASE WHEN trim(text) = '' THEN CAST(0 AS DOUBLE)
              ELSE CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> x IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE) END AS stop
  FROM documents
), ratios AS (
  SELECT doc_id,
         CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END AS mwl,
         CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS pr,
         CASE WHEN n_tok > 0 THEN stop / n_tok ELSE 0.0 END AS sr
  FROM base
)
SELECT doc_id,
       ROUND(mwl, 4) AS mean_word_len,
       ROUND(pr, 4) AS punct_ratio,
       ROUND(sr, 4) AS stopword_ratio,
       ROUND(100.0 - least(40.0, abs(mwl - 5.0) * 8.0)
                   - least(30.0, pr * 100.0)
                   + least(10.0, sr * 50.0), 2) AS quality
FROM ratios
ORDER BY doc_id
"""


# --- text analysis: language identification -------------------------------
def _q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return language_id(t["documents"]).select(
        "doc_id", "lang", "pred_lang",
        *[f"score_{lang}" for lang in sorted(LANG_MARKERS)],
    ).orderBy("doc_id")


def _langid_sql() -> str:
    score_exprs = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_exprs.append(
            f"CASE WHEN trim(text) = '' THEN 0 ELSE CAST(len(list_filter("
            f"regexp_split_to_array(trim(text), '\\s+'), x -> x IN ({markers}))) AS INT) END"
            f" AS score_{lang}"
        )
    # argmax with tie-break on language code DESC (matches sort_array desc
    # over (score, lang) structs in operators.text.language_id)
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    case = " ".join(
        f"WHEN score_{lang} = g THEN '{lang}'" for lang in langs_desc
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {', '.join(score_exprs)}
  FROM documents
), g AS (
  SELECT *, greatest({', '.join('score_' + lang for lang in sorted(LANG_MARKERS))}) AS g
  FROM scored
)
SELECT doc_id, lang,
       CASE WHEN g = 0 THEN 'und' {case} END AS pred_lang,
       {', '.join('score_' + lang for lang in sorted(LANG_MARKERS))}
FROM g
ORDER BY doc_id
"""


# --- multimodal: binary payload metadata via Arrow-batched mapInPandas ----
def _q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # Documents stand in for opaque media payloads: bytes = utf-8 encoding.
    binary_df = t["documents"].select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_binary_meta(binary_df, "payload").select(
        "doc_id", "n_bytes", "head_byte", "tail_byte", "byte_sum_mod"
    ).orderBy("doc_id")


_Q_MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ord(substr(text, 1, 1)) AS INT) AS head_byte,
       CAST(ord(substr(text, length(text), 1)) AS INT) AS tail_byte,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
            i -> ord(substr(text, i, 1)))) % 256 AS INT) AS byte_sum_mod
FROM documents
ORDER BY doc_id
"""


# --- curation: deterministic stratified sampling --------------------------
def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    # binary-exact fractions so fraction*1e6 is an exact integer in double
    # arithmetic on both engines (truncation == rounding)
    return stratified_hash_sample(
        t["documents"], "lang", "doc_id", {"en": 0.5, "de": 0.25}, default_fraction=0.125
    ).select("doc_id", "lang").orderBy("doc_id")


_Q_STRATIFIED_SQL = """
SELECT doc_id, lang
FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000
      < CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.125 END)
             * 1000000) AS BIGINT)
ORDER BY doc_id
"""


# --- curation: per-group token-budget packing ------------------------------
def _q_pack_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return pack_token_budget(
        t["documents"].select("doc_id", "lang", "n_chars"),
        group_col="lang",
        token_col="n_chars",
        quality_col="n_chars",
        id_col="doc_id",
        budget=20000,
    ).select("doc_id", "lang", "running_tokens").orderBy("lang", "doc_id")


_Q_PACK_BUDGET_SQL = """
SELECT doc_id, lang, CAST(running_tokens AS BIGINT) AS running_tokens
FROM (
  SELECT doc_id, lang,
         SUM(n_chars) OVER (
           PARTITION BY lang
           ORDER BY n_chars DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_tokens
  FROM documents)
WHERE running_tokens <= 20000
ORDER BY lang, doc_id
"""


# --- dedup: SimHash banded hamming near-dup pairs -------------------------
def _q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return simhash_neardup_pairs(
        t["documents"], "doc_id", "text", bits=60, bands=4, max_hamming=3
    ).orderBy("id_a", "id_b")


_Q_SIMHASH_NEARDUP_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id, {_HASH64.format(expr='tok')} AS h FROM toks WHERE tok <> ''
),
bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, (SELECT unnest(generate_series(0, 59)) AS b) b
  GROUP BY doc_id, b.b
),
sig AS (
  SELECT doc_id AS id,
         CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS sh
  FROM bits GROUP BY doc_id
),
band AS (
  SELECT id, sh, b.b AS band, (sh >> CAST(b.b * 15 AS INT)) & 32767 AS key
  FROM sig, (SELECT unnest(range(0, 4)) AS b) b
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS ha, b.sh AS hb
  FROM band a JOIN band b ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
ORDER BY id_a, id_b
"""


# --- fingerprinting: winnowing (rolling k-gram hash + window min) ---------
def _q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    fp = winnow_fingerprints(t["documents"], "doc_id", "text", k=8, w=4)
    return (
        fp.groupBy("id")
        .agg(
            F.countDistinct("fp").alias("n_fps"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .select(F.col("id").alias("doc_id"), "n_fps", "min_fp", "max_fp")
        .orderBy("doc_id")
    )


_Q_WINNOW_SQL = """
WITH g AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - 8 + 2),
           i -> CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT)) AS gh
  FROM documents
  WHERE length(text) >= 11
), f AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(gh) - 4 + 2),
           j -> list_min(gh[j:j + 3]))) AS fp
  FROM g
)
SELECT doc_id,
       COUNT(DISTINCT fp) AS n_fps,
       MIN(fp) AS min_fp,
       MAX(fp) AS max_fp
FROM f
GROUP BY doc_id
ORDER BY doc_id
"""


# --- multimodal: video-style frame sampling (row-expanding mapInPandas) ---
def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    binary_df = t["documents"].select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return (
        sample_frames(binary_df, "payload", frame_bytes=64, every_k=2)
        .orderBy("doc_id", "frame_index")
    )


# Byte-accurate framing: Spark slices the UTF-8 payload by BYTES, so the
# oracle must too — char-based length()/substr()/ord() silently diverge on
# any non-ASCII text (byte length ≠ char count). DuckDB lacks blob slicing,
# but hex(encode(text)) exposes every byte: byte at 0-based offset o is the
# hex pair at 2·o+1.
_Q_FRAME_SAMPLE_SQL = """
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS blen,
         hex(encode(text)) AS hx
  FROM documents
)
SELECT doc_id,
       CAST(fi AS INT) AS frame_index,
       CAST(fi * 64 AS BIGINT) AS frame_offset,
       CAST(LEAST(64, blen - fi * 64) AS INT) AS frame_len,
       CAST(('0x' || substr(hx, fi * 64 * 2 + 1, 2)) AS INT) AS frame_head
FROM b,
     UNNEST(range(0, CAST(ceil(blen / 64.0) AS BIGINT), 2)) AS t(fi)
ORDER BY doc_id, frame_index
"""


# --- dedup: connected components over near-dup pairs ----------------------
def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=_JACCARD_THRESHOLD
    )
    return dedup_clusters(t["documents"], pairs, "doc_id").select(
        "doc_id", "canonical_id"
    ).orderBy("doc_id")


# Transitive closure via recursive CTE; component label = min reachable id.
_Q_DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE ROUND(n_inter / (sa.sz + sb.sz - n_inter), 6) >= {_JACCARD_THRESHOLD}
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)
SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS canonical_id
FROM documents d
LEFT JOIN comp ON comp.node = d.doc_id
ORDER BY d.doc_id
"""


# --- grouped-map pandas: per-group ranking over events --------------------
def _q_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    src = t["events"].select("event_id", "event_type", "value")
    return grouped_rank(src, "event_type", ["value", "event_id"]).orderBy(
        "event_type", "grp_rank"
    )


_Q_GROUPED_PANDAS_SQL = """
SELECT event_id, event_type, value,
       CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY value, event_id) AS INT) AS grp_rank,
       CAST(COUNT(*) OVER (PARTITION BY event_type) AS INT) AS grp_size
FROM events
ORDER BY event_type, grp_rank
"""


# --- similarity: IVF-style ANN (deterministic coarse quantizer) -----------
_IVF_CELLS = 8


def _q_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    emb = t["embeddings"]
    return sim.ivf_knn(
        emb,
        emb.filter(F.col("vec_id") % 50 == 0),
        n_cells=_IVF_CELLS,
        k=3,
        # centroids=None pins the SEEDED (lowest-id) quantizer: the SQL
        # oracle below replicates it exactly, which Lloyd's iterations
        # would not allow; the trained "kmeans" DEFAULT is gated by the
        # recall-floor tests (tests/test_operators.py) instead
        centroids=None,
    ).select("query_id", "neighbor_id", "cell", "cos", "rank").orderBy(
        "query_id", "rank"
    )


# Assignment = argmax cosine against the _IVF_CELLS lowest-id vectors
# (tiebreak: lowest centroid id); search restricted to the query's cell.
_Q_IVF_SQL = f"""
WITH {_DIMS_CTE},
{_NORMS_CTE},
cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM embeddings ORDER BY vec_id ASC LIMIT {_IVF_CELLS}
),
cdots AS (
  SELECT e.vec_id, c.cent_id,
         ROUND(SUM(CAST(e.embedding[d.d] AS DOUBLE) * CAST(c.cvec[d.d] AS DOUBLE))
               / (ne.nrm * nc.nrm), 6) AS ccos
  FROM embeddings e
  JOIN norms ne ON ne.vec_id = e.vec_id
  CROSS JOIN cents c
  JOIN norms nc ON nc.vec_id = c.cent_id, dims d
  GROUP BY e.vec_id, c.cent_id, ne.nrm, nc.nrm
),
assign AS (
  SELECT vec_id, cent_id AS cell
  FROM (SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY ccos DESC, cent_id ASC) AS rn
        FROM cdots)
  WHERE rn = 1
),
q AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 50 = 0),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, ac.cell,
         ROUND(SUM(CAST(eq.embedding[d.d] AS DOUBLE) * CAST(c.embedding[d.d] AS DOUBLE))
               / (nq.nrm * nc2.nrm), 6) AS cos
  FROM q
  JOIN assign aq ON aq.vec_id = q.query_id
  JOIN assign ac ON ac.cell = aq.cell
  JOIN embeddings c ON c.vec_id = ac.vec_id AND c.vec_id <> q.query_id
  JOIN embeddings eq ON eq.vec_id = q.query_id
  JOIN norms nq ON nq.vec_id = q.query_id
  JOIN norms nc2 ON nc2.vec_id = c.vec_id, dims d
  GROUP BY q.query_id, c.vec_id, ac.cell, nq.nrm, nc2.nrm
)
SELECT query_id, neighbor_id, cell, cos,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank
FROM pairs
QUALIFY rank <= 3
ORDER BY query_id, rank
"""


# --- curation: benchmark decontamination ----------------------------------
def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing ≥3 distinct word 3-grams with the 'benchmark' subset
    (doc_id % 50 == 0 stands in for an eval set)."""
    from lakehouse_architecture_spark.operators.curation import decontaminate

    t = tables(spark, sf_dir)
    docs = t["documents"]
    return (
        decontaminate(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            "doc_id",
            "text",
            n=3,
            min_overlap=3,
        )
        .select(F.col("id").alias("doc_id"), "n_overlap")
        .orderBy("doc_id")
    )


_Q_DECONTAMINATE_SQL = f"""
WITH {_SHINGLES_CTE},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0)
SELECT doc_id, COUNT(*) AS n_overlap
FROM sh JOIN bench USING (shingle)
WHERE doc_id % 50 != 0
GROUP BY doc_id
HAVING COUNT(*) >= 3
ORDER BY doc_id
"""


# --- text analysis: intra-document repetition (Gopher rule) ---------------
def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.text import repetition_stats

    t = tables(spark, sf_dir)
    return (
        repetition_stats(t["documents"], "doc_id", "text", n=3)
        .select(F.col("id").alias("doc_id"), "n_ngrams", "n_distinct", "dup_frac")
        .orderBy("doc_id")
    )


# non-distinct shingles (repetition needs duplicates), left join back so
# docs shorter than n tokens report zeros
_Q_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk FROM documents
),
g AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, i.i + 1, i.i + 3), ' ') AS s
  FROM toks,
       LATERAL (SELECT unnest(generate_series(0, len(tk) - 3)) AS i) i
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_ngrams, COUNT(DISTINCT s) AS n_distinct
  FROM g GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_ngrams, 0) AS INT) AS n_ngrams,
       CAST(COALESCE(a.n_distinct, 0) AS INT) AS n_distinct,
       CASE WHEN a.n_ngrams > 0
            THEN ROUND(1.0 - a.n_distinct / a.n_ngrams, 6)
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


# --- curation: deterministic training-shard manifest ----------------------
def _q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.curation import shard_manifest

    t = tables(spark, sf_dir)
    return (
        shard_manifest(t["documents"], "doc_id", n_shards=8)
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


_Q_SHARD_MANIFEST_SQL = f"""
WITH h AS (
  SELECT doc_id,
         {_HASH64.format(expr="CAST(doc_id AS VARCHAR)")} AS hh
  FROM documents
)
SELECT doc_id,
       CAST(hh % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8
                               ORDER BY hh ASC, doc_id ASC) AS INT) AS pos
FROM h
ORDER BY shard, pos
"""


# --- curation: per-source quota cap ----------------------------------------
_CAP = 10


def _q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return quota_cap(t["documents"], "source", "doc_id", _CAP).select(
        "source", "doc_id", "n_chars"
    )


_Q_SOURCE_CAP_SQL = f"""
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {_HASH64.format(expr="CAST(doc_id AS VARCHAR)")} ASC,
                    doc_id ASC) AS rn
  FROM documents
) WHERE rn <= {_CAP}
"""


# --- text: corpus vocabulary top-k ------------------------------------------
_VOCAB_K = 50


def _q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return vocab_topk(t["documents"], "doc_id", "text", k=_VOCAB_K)


_Q_VOCAB_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
)
SELECT tok,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM tok
WHERE tok <> ''
GROUP BY tok
ORDER BY term_freq DESC, tok ASC
LIMIT {_VOCAB_K}
"""


# --- dedup: cross-corpus duplicated-line scrub ------------------------------
# The registry query runs the operator at token granularity (delim=' '):
# the fixture documents are single-line, so '\n' lines would make it a
# no-op; with token "lines" the hot set is the corpus's stopword layer and
# the scrub does real work. Production use is delim='\n' verbatim.
_LINE_MAX_DF = 350


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    out = drop_duplicate_lines(
        t["documents"], "doc_id", "text", max_df=_LINE_MAX_DF, delim=" "
    )
    return out.select(
        "id",
        "text",
        F.col("n_lines_kept").cast("int").alias("n_lines_kept"),
        F.col("n_lines_dropped").cast("int").alias("n_lines_dropped"),
    )


_Q_LINE_DEDUP_SQL = f"""
WITH lines AS (
  SELECT doc_id, i.i AS pos, tk[i.i + 1] AS line
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       LATERAL (SELECT unnest(generate_series(0, len(tk) - 1)) AS i) i
),
hashed AS (
  SELECT doc_id, pos, line, {_HASH64.format(expr="line")} AS h FROM lines
),
hot AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS df FROM hashed GROUP BY h
  ) WHERE df > {_LINE_MAX_DF}
)
SELECT doc_id AS id,
       COALESCE(string_agg(line, ' ' ORDER BY pos)
                  FILTER (WHERE h NOT IN (SELECT h FROM hot)), '') AS text,
       CAST(COUNT(*) FILTER (WHERE h NOT IN (SELECT h FROM hot)) AS INT)
         AS n_lines_kept,
       CAST(COUNT(*) FILTER (WHERE h IN (SELECT h FROM hot)) AS INT)
         AS n_lines_dropped
FROM hashed
GROUP BY doc_id
"""


# --- text: PII/pattern redaction over events.props --------------------------
def _q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    out = redact(t["events"], "props")
    return out.select(
        "event_id",
        F.col("n_email").cast("int").alias("n_email"),
        F.col("n_number").cast("int").alias("n_number"),
        "redacted",
    )


_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_Q_REDACT_SQL = f"""
WITH r1 AS (
  SELECT event_id,
         CAST(len(regexp_extract_all(props, '{_EMAIL_PAT}')) AS INT) AS n_email,
         regexp_replace(props, '{_EMAIL_PAT}', '<EMAIL>', 'g') AS t1
  FROM events
)
SELECT event_id, n_email,
       CAST(len(regexp_extract_all(t1, '[0-9]+')) AS INT) AS n_number,
       regexp_replace(t1, '[0-9]+', '<NUM>', 'g') AS redacted
FROM r1
"""


# --- sketch: Bloom-filter membership screen ---------------------------------
# Build over orders' customer keys, probe every customer: the classic
# "screen a huge probe stream against a set that fits in a sketch" step
# (seen-ID dedup, join pre-filtering). ~1/3 of TPC-H customers place no
# orders, so the probe genuinely separates; false positives are
# deterministic because the hash math is.
_BLOOM_K = 4
_BLOOM_M = 16384


def _q_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.sketch import bloom_build, bloom_probe

    t = tables(spark, sf_dir)
    bloom = bloom_build(
        t["orders"].select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        k=_BLOOM_K,
        m_bits=_BLOOM_M,
    )
    out = bloom_probe(
        bloom,
        t["customer"].select("c_custkey", "c_mktsegment"),
        "c_custkey",
        k=_BLOOM_K,
        m_bits=_BLOOM_M,
    )
    return out.select("c_custkey", "c_mktsegment", "maybe_present")


def _bloom_pos_cte(src: str, key_expr: str) -> str:
    h = _HASH64.format(expr=f"CAST({key_expr} AS VARCHAR)")
    from lakehouse_architecture_spark.functions.hashing import minhash_perm_sql

    h1 = minhash_perm_sql("hh", "0")
    h2 = minhash_perm_sql("hh", "1")
    return f"""
  SELECT key, ((h1 + i.i * h2) % {_BLOOM_M}) AS p
  FROM (SELECT key, {h1} AS h1, {h2} AS h2
        FROM (SELECT {key_expr} AS key, {h} AS hh FROM {src})),
       LATERAL (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i) i
"""


_Q_BLOOM_SQL = f"""
WITH bpos AS ({_bloom_pos_cte("orders", "o_custkey")}),
bloom AS (
  SELECT p // 32 AS word, bit_or(CAST(1 AS BIGINT) << (p % 32)) AS bits
  FROM bpos GROUP BY 1
),
ppos AS ({_bloom_pos_cte("customer", "c_custkey")}),
probes AS (
  SELECT key, p // 32 AS word, CAST(1 AS BIGINT) << (p % 32) AS bit FROM ppos
),
hits AS (
  SELECT probes.key,
         SUM(CASE WHEN bloom.bits IS NOT NULL
                   AND (bloom.bits & probes.bit) = probes.bit
                  THEN 1 ELSE 0 END) = {_BLOOM_K} AS maybe_present
  FROM probes LEFT JOIN bloom USING (word)
  GROUP BY 1
)
SELECT c_custkey, c_mktsegment, maybe_present
FROM customer JOIN hits ON hits.key = customer.c_custkey
"""


# --- curation: deterministic weighted sampling ------------------------------
_WSAMPLE_N = 100


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return weighted_priority_sample(t["documents"], "doc_id", "n_chars", _WSAMPLE_N).select(
        "doc_id", "source", "n_chars", "priority"
    )


_Q_WSAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       {_HASH64.format(expr="CAST(doc_id AS VARCHAR)")}
             / CAST(n_chars AS DOUBLE) AS priority
FROM documents
ORDER BY priority ASC, doc_id ASC
LIMIT {_WSAMPLE_N}
"""


# --- reconciliation: snapshot diff ------------------------------------------
# "after" is a deterministic mutation of documents: doc_id % 10 == 0 rows
# dropped (-> removed), doc_id % 7 == 0 re-sourced (-> changed), and a
# shifted copy of doc_id % 13 == 0 appended (-> added).
def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.upsert import snapshot_diff

    t = tables(spark, sf_dir)
    before = t["documents"]
    kept = before.filter(F.col("doc_id") % 10 != 0).withColumn(
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.lit("resourced")).otherwise(
            F.col("source")
        ),
    )
    added = before.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    after = kept.unionByName(added)
    return snapshot_diff(before, after, ["doc_id"], ["lang", "source", "text"])


# length-prefixed framing in lockstep with operators/upsert.snapshot_diff
# (round 11): '<len>:<value>' per value, bare 'n' for NULL — no value
# content can shift a column boundary
_DIFF_FRAME = (
    "CASE WHEN {c} IS NULL THEN 'n' ELSE CONCAT(CAST(LENGTH(CAST({c} AS"
    " VARCHAR)) AS VARCHAR), ':', CAST({c} AS VARCHAR)) END"
)
_DIFF_ROWHASH = _HASH64.format(
    expr="concat_ws(chr(31), "
    + ", ".join(_DIFF_FRAME.format(c=c) for c in ("lang", "source", "text"))
    + ")"
)
_Q_SNAPSHOT_DIFF_SQL = f"""
WITH after_t AS (
  SELECT doc_id,
         lang,
         CASE WHEN doc_id % 7 = 0 THEN 'resourced' ELSE source END AS source,
         text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang, source, text
  FROM documents WHERE doc_id % 13 = 0
),
b AS (SELECT doc_id, {_DIFF_ROWHASH} AS h_before FROM documents),
a AS (SELECT doc_id, {_DIFF_ROWHASH} AS h_after FROM after_t)
SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
       CASE WHEN b.doc_id IS NULL THEN 'added'
            WHEN a.doc_id IS NULL THEN 'removed'
            WHEN h_before = h_after THEN 'same'
            ELSE 'changed' END AS status
FROM b FULL OUTER JOIN a USING (doc_id)
"""


# --- dedup: embedding-cosine near-dup canonicalization --------------------
# Fewer planes than q_lsh_bucket_pairs (more candidate collisions → higher
# recall) and a threshold tuned to the synthetic corpus's cosine range —
# real near-dup corpora would use ~0.9 with the same plan shape.
_ND_PLANES = 4
_ND_MIN_COS = 0.3


def _q_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        sim.cosine_neardup(
            t["embeddings"], dim=64, planes=_ND_PLANES, min_cos=_ND_MIN_COS
        )
        .select("vec_id", "canonical_id", "is_canonical")
        .orderBy("vec_id")
    )


# LSH candidates → exact-cosine filter → recursive-CTE transitive closure;
# canonical = min reachable id (mirrors operators/graph.py min-label CC).
_Q_COSINE_NEARDUP_SQL = f"""
WITH RECURSIVE {_DIMS_CTE},
{_NORMS_CTE},
planes AS (
  SELECT p.p AS p, d.d AS d,
         CAST(({_HASH64.format(expr="CAST(p.p AS VARCHAR) || ':' || CAST(d.d - 1 AS VARCHAR)")} % 2001) - 1000 AS DOUBLE) AS w
  FROM (SELECT unnest(generate_series(0, {_ND_PLANES - 1})) AS p) p, dims d
),
pdots AS (
  SELECT e.vec_id, pl.p, SUM(CAST(e.embedding[pl.d] AS DOUBLE) * pl.w) AS dp
  FROM embeddings e, planes pl
  GROUP BY 1, 2
),
sigs AS (
  SELECT vec_id,
         string_agg(CASE WHEN dp > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS sig
  FROM pdots GROUP BY vec_id
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
),
pairdots AS (
  SELECT c.id_a, c.id_b,
         SUM(CAST(ea.embedding[d.d] AS DOUBLE) * CAST(eb.embedding[d.d] AS DOUBLE)) AS dp
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b, dims d
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM pairdots
  JOIN norms na ON na.vec_id = id_a
  JOIN norms nb ON nb.vec_id = id_b
  WHERE ROUND(dp / (na.nrm * nb.nrm), 6) >= {_ND_MIN_COS}
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT a, a FROM sym
  UNION
  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a
),
comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)
SELECT e.vec_id,
       COALESCE(comp.component, e.vec_id) AS canonical_id,
       COALESCE(comp.component, e.vec_id) = e.vec_id AS is_canonical
FROM embeddings e
LEFT JOIN comp ON comp.node = e.vec_id
ORDER BY e.vec_id
"""


# --- text analysis: per-document TF-IDF top terms -------------------------
_TFIDF_K = 3


def _q_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        tf_idf_top_terms(t["documents"], "doc_id", "text", k=_TFIDF_K)
        .select(
            F.col("id").alias("doc_id"), "term", "tf", "df_t", "score", "rank"
        )
        .orderBy("doc_id", "rank")
    )


_Q_TFIDF_SQL = f"""
WITH tk AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tk WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df_t,
         ROUND(tf * ln((n_docs + 1) / (df_t + 1)), 6) AS score
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, tf, df_t, score,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {_TFIDF_K}
ORDER BY doc_id, rank
"""


# --- similarity: int8 scalar-quantized cosine top-k ------------------------
_SQ8_K = 5


def _q_int8_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    emb = t["embeddings"]
    return (
        sim.quantized_knn(emb, emb.filter(F.col("vec_id") % 50 == 0), k=_SQ8_K)
        .select("query_id", "neighbor_id", "qcos", "rank")
        .orderBy("query_id", "rank")
    )


_Q_INT8_KNN_SQL = f"""
WITH {_DIMS_CTE},
s AS (SELECT MAX(abs(CAST(embedding[d.d] AS DOUBLE))) AS s FROM embeddings, dims d),
qv AS (
  SELECT vec_id, d.d AS d,
         CAST(ROUND(CAST(embedding[d.d] AS DOUBLE) / s.s * 127) AS BIGINT) AS q
  FROM embeddings, dims d, s
),
qn AS (SELECT vec_id, sqrt(CAST(SUM(q * q) AS DOUBLE)) AS qn FROM qv GROUP BY 1),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.q * b.q) AS dp
  FROM qv a JOIN qv b ON a.d = b.d AND b.vec_id <> a.vec_id
  WHERE a.vec_id % 50 = 0
  GROUP BY 1, 2
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(CAST(dp AS DOUBLE) / (na.qn * nb.qn), 6) AS qcos
  FROM dots
  JOIN qn na ON na.vec_id = query_id
  JOIN qn nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, qcos,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY qcos DESC, neighbor_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= {_SQ8_K}
ORDER BY query_id, rank
"""


# --- corpus report: per-source language mix + Shannon entropy ---------------
def _q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    c = t["documents"].groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("source")
    p = F.col("c") / F.sum("c").over(w)
    # `+ 0.0` normalizes the p=1 term's -0.0 to +0.0 (engines disagree on
    # the sign of a rounded negative zero)
    term = F.round(-p * F.log(p) + F.lit(0.0), 6)
    return (
        c.withColumn("term", term)
        .groupBy("source")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(
                F.sum(F.col("term").cast("decimal(38,6)")).cast("double"), 6
            ).alias("lang_entropy"),
        )
        .orderBy("source")
    )


_Q_LANG_MIX_SQL = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
p AS (
  SELECT source, c,
         ROUND(-(c / CAST(SUM(c) OVER (PARTITION BY source) AS DOUBLE))
               * ln(c / CAST(SUM(c) OVER (PARTITION BY source) AS DOUBLE))
               + 0.0, 6) AS term
  FROM c
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       COUNT(*) AS n_langs,
       ROUND(CAST(SUM(CAST(term AS DECIMAL(38,6))) AS DOUBLE), 6) AS lang_entropy
FROM p
GROUP BY source
ORDER BY source
"""


# --- retrieval: BM25 scoring over the corpus ------------------------------
_BM25_TERMS = ("vector", "hash", "spark")
_BM25_K1, _BM25_B = 1.2, 0.75


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.text import bm25_scores

    t = tables(spark, sf_dir)
    return (
        bm25_scores(t["documents"], "doc_id", "text", _BM25_TERMS, _BM25_K1, _BM25_B)
        .select(F.col("id").alias("doc_id"), "score", "n_hit")
        .orderBy("doc_id")
    )


_Q_BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id AS id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tok2 AS (SELECT id, term FROM tok WHERE term <> ''),
dl AS (SELECT id, COUNT(*) AS dl FROM tok2 GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT id, term, COUNT(*) AS tf FROM tok2
  WHERE term IN {_BM25_TERMS!r}
  GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY 1),
per AS (
  SELECT id,
         ROUND(ln(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
               * tf * {_BM25_K1 + 1.0!r}
               / (tf + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                  + {_BM25_B!r} * dl / avgdl)), 6) AS t_score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (id), stats
)
SELECT id AS doc_id,
       ROUND(CAST(SUM(CAST(t_score AS DECIMAL(38,6))) AS DOUBLE), 6) AS score,
       COUNT(*) AS n_hit
FROM per
GROUP BY id
ORDER BY doc_id
"""


# --- dedup: directional shingle containment --------------------------------
_CONT_THRESHOLD = 0.5


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.dedup import containment_pairs

    t = tables(spark, sf_dir)
    return containment_pairs(
        t["documents"], "doc_id", "text", n=3, threshold=_CONT_THRESHOLD
    ).orderBy("id_a", "id_b")


_Q_CONTAINMENT_SQL = f"""
WITH {_SHINGLES_CTE},
shh AS (SELECT doc_id, {_HASH64.format(expr='shingle')} AS h FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter,
       ROUND(n_inter / sa.sz, 6) AS cont_a,
       ROUND(n_inter / sb.sz, 6) AS cont_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE ROUND(n_inter / sa.sz, 6) >= {_CONT_THRESHOLD}
   OR ROUND(n_inter / sb.sz, 6) >= {_CONT_THRESHOLD}
ORDER BY id_a, id_b
"""


# --- entity resolution: blocked edit-distance candidate pairs ---------------
_FUZZY_MAX_DIST = 3


def _q_fuzzy_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_spark.operators.dedup import blocked_fuzzy_pairs

    t = tables(spark, sf_dir)
    p = t["part"].select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    )
    return blocked_fuzzy_pairs(
        p, "p_partkey", "p_name", ["p_brand", "noun"], _FUZZY_MAX_DIST
    ).orderBy("id_a", "id_b")


_Q_FUZZY_BLOCK_SQL = f"""
WITH p AS (
  SELECT p_partkey, p_name, p_brand, split_part(p_name, ' ', 2) AS noun
  FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
FROM p a
JOIN p b ON a.p_brand = b.p_brand AND a.noun = b.noun
        AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
ORDER BY id_a, id_b
"""


TEXTOPS_QUERIES: list[QuerySpec] = [
    QuerySpec("q_bloom_screen", "Bloom-filter membership screen (build + probe)", _q_bloom_screen, _Q_BLOOM_SQL),
    QuerySpec("q_weighted_sample", "deterministic weighted priority sampling", _q_weighted_sample, _Q_WSAMPLE_SQL),
    QuerySpec("q_snapshot_diff", "per-key snapshot reconciliation diff", _q_snapshot_diff, _Q_SNAPSHOT_DIFF_SQL),
    QuerySpec("q_source_cap", "per-source document quota cap", _q_source_cap, _Q_SOURCE_CAP_SQL),
    QuerySpec("q_vocab_topk", "corpus vocabulary with term/doc frequency", _q_vocab_topk, _Q_VOCAB_SQL),
    QuerySpec("q_line_dedup", "cross-corpus duplicated-line scrub (RefinedWeb-style)", _q_line_dedup, _Q_LINE_DEDUP_SQL),
    QuerySpec("q_redact", "pattern/PII redaction with per-pattern counts", _q_redact, _Q_REDACT_SQL),
    QuerySpec("q_dedup_keep_first", "deterministic keep-first dedup", _q_dedup_keep_first, _Q_DEDUP_KEEP_FIRST_SQL),
    QuerySpec("q_fingerprint_groups", "normalization-fingerprint dedup groups", _q_fingerprint, _Q_FINGERPRINT_SQL),
    QuerySpec("q_ngram_jaccard", "word-3-gram Jaccard near-dup pairs", _q_ngram_jaccard, _Q_NGRAM_JACCARD_SQL),
    QuerySpec("q_dedup_components", "connected-components canonical assignment", _q_dedup_components, _Q_DEDUP_COMPONENTS_SQL),
    QuerySpec("q_grouped_pandas", "applyInPandas per-group ranking", _q_grouped_pandas, _Q_GROUPED_PANDAS_SQL),
    QuerySpec("q_minhash_lsh", "MinHash+LSH band candidate pairs", _q_minhash_lsh, _Q_MINHASH_SQL),
    QuerySpec("q_simhash", "60-bit SimHash fingerprints", _q_simhash, _Q_SIMHASH_SQL),
    QuerySpec("q_embedding_knn", "brute-force cosine top-k neighbors", _q_knn, _Q_KNN_SQL),
    QuerySpec("q_ivf_knn", "IVF-cell-restricted approximate kNN", _q_ivf_knn, _Q_IVF_SQL),
    QuerySpec("q_lsh_bucket_pairs", "random-hyperplane LSH near-neighbor pairs", _q_lsh_buckets, _Q_LSH_BUCKETS_SQL),
    QuerySpec("q_text_stats", "char/token/sub-token statistics", _q_text_stats, _Q_TEXT_STATS_SQL),
    QuerySpec("q_text_quality", "heuristic quality scoring", _q_quality, _Q_QUALITY_SQL),
    QuerySpec("q_language_id", "stopword-marker language ID", _q_langid, _langid_sql()),
    QuerySpec("q_multimodal_meta", "binary payload metadata via mapInPandas", _q_multimodal, _Q_MULTIMODAL_SQL),
    QuerySpec("q_frame_sample", "row-expanding frame sampling over binary payloads", _q_frame_sample, _Q_FRAME_SAMPLE_SQL),
    QuerySpec("q_winnow_fingerprint", "winnowing rolling-hash fingerprints (MOSS)", _q_winnow, _Q_WINNOW_SQL),
    QuerySpec("q_simhash_neardup", "banded SimHash hamming near-dup pairs", _q_simhash_neardup, _Q_SIMHASH_NEARDUP_SQL),
    QuerySpec("q_stratified_sample", "deterministic per-stratum hash sampling", _q_stratified_sample, _Q_STRATIFIED_SQL),
    QuerySpec("q_pack_budget", "per-group greedy token-budget packing", _q_pack_budget, _Q_PACK_BUDGET_SQL),
    QuerySpec("q_decontaminate", "benchmark n-gram decontamination screen", _q_decontaminate, _Q_DECONTAMINATE_SQL),
    QuerySpec("q_repetition", "intra-doc n-gram repetition (Gopher rule)", _q_repetition, _Q_REPETITION_SQL),
    QuerySpec("q_shard_manifest", "deterministic training-shard manifest", _q_shard_manifest, _Q_SHARD_MANIFEST_SQL),
    QuerySpec("q_cosine_neardup", "embedding-cosine near-dup canonicalization", _q_cosine_neardup, _Q_COSINE_NEARDUP_SQL),
    QuerySpec("q_tfidf_terms", "per-document top-k TF-IDF terms", _q_tfidf_terms, _Q_TFIDF_SQL),
    QuerySpec("q_bm25", "BM25 relevance over the corpus", _q_bm25, _Q_BM25_SQL),
    QuerySpec("q_containment", "directional shingle-containment pairs", _q_containment, _Q_CONTAINMENT_SQL),
    QuerySpec("q_fuzzy_block", "blocked edit-distance entity-resolution pairs", _q_fuzzy_block, _Q_FUZZY_BLOCK_SQL),
    QuerySpec("q_int8_knn", "int8 scalar-quantized cosine top-k", _q_int8_knn, _Q_INT8_KNN_SQL),
    QuerySpec("q_lang_mix", "per-source language mix + Shannon entropy", _q_lang_mix, _Q_LANG_MIX_SQL),
]
