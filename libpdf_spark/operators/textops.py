"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
and document fingerprinting — all JVM-side column expressions over
the ``documents`` table (no UDFs in the hot path).
"""

from __future__ import annotations

from libpdf_spark.operators.common import load_parallel

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _F():
    from pyspark.sql import functions as F

    return F


def q_langid(spark, sf_dir):
    """Stopword-ratio language heuristic: ratio of stopword tokens;
    >= 0.02 → 'en', else 'unk'. (On real corpora the stopword lists
    are per-language; the operator shape — tokenize, ratio, argmax —
    is what scales.)"""
    F = _F()
    docs = load_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.round(
        F.size(F.filter("w", lambda t: F.array_contains(stop_arr, t)))
        / F.size("w"),
        6,
    )
    return docs.select(
        "doc_id",
        ratio.alias("stop_ratio"),
        F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("unk")).alias("lang_guess"),
    )


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

SQL_LANGID = rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    )
    SELECT doc_id,
           ROUND(len(list_filter(w, x -> list_contains({_STOP_SQL}, x))) / len(w), 6) AS stop_ratio,
           CASE WHEN ROUND(len(list_filter(w, x -> list_contains({_STOP_SQL}, x))) / len(w), 6) >= 0.02
                THEN 'en' ELSE 'unk' END AS lang_guess
    FROM t
"""


def q_quality_score(spark, sf_dir):
    """Document quality features: char/word counts, mean word length,
    punctuation density — the pre-training filter-feature shape."""
    F = _F()
    docs = load_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id",
        "text",
        F.split(F.trim("text"), r"\s+").alias("w"),
    )
    n_chars = F.length("text")
    n_words = F.size("w")
    mean_wlen = F.round(
        F.aggregate(
            F.transform("w", lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        / n_words,
        6,
    )
    n_punct = F.length(F.regexp_replace("text", r"[^.!?,;]", ""))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars2"),
        n_words.cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        n_punct.cast("long").alias("n_punct"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
    )


SQL_QUALITY = r"""
    WITH t AS (
      SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    )
    SELECT doc_id,
           LENGTH(text) AS n_chars2,
           len(w) AS n_words,
           ROUND(list_sum(list_transform(w, x -> CAST(LENGTH(x) AS DOUBLE))) / len(w), 6) AS mean_word_len,
           LENGTH(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct,
           ROUND(LENGTH(regexp_replace(text, '[^.!?,;]', '', 'g')) / LENGTH(text), 6) AS punct_ratio
    FROM t
"""


def q_token_count(spark, sf_dir):
    """Whitespace token count + a BPE-ish subword estimate
    (ceil(len/4) pieces per word) — the cost-estimation shape for
    training-data budgeting."""
    F = _F()
    docs = load_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    )
    n_tokens = F.size("w")
    n_subwords = F.aggregate(
        F.transform("w", lambda t: F.ceil(F.length(t) / 4.0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_subwords.alias("n_subwords"),
    )


SQL_TOKEN_COUNT = r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
    )
    SELECT doc_id,
           len(w) AS n_tokens,
           CAST(list_sum(list_transform(w, x -> CAST(CEIL(LENGTH(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords
    FROM t
"""


def q_fingerprint(spark, sf_dir):
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    md5 (X6-adjacent identifier sanitation + S7 golden-file shape)."""
    F = _F()
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return load_parallel(spark, sf_dir, "documents", "doc_id").select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


SQL_FINGERPRINT = r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
"""


QUERIES = {
    "langid": q_langid,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "fingerprint": q_fingerprint,
}

ORACLES = {
    "langid": SQL_LANGID,
    "quality_score": SQL_QUALITY,
    "token_count": SQL_TOKEN_COUNT,
    "fingerprint": SQL_FINGERPRINT,
}
