"""Extraction queries over driver testdata (non-SQL-expressible tier).

Wraps the ``documents`` table into document-bearing transcript turns
(deterministic layout via :func:`libpdf_spark.fixtures.doc_from_text`)
and runs the full ``mapInPandas`` extraction pipeline. No DuckDB
oracle exists for these (the kernel itself is the operator under
test) — the driver records a rows-only check; per-turn text equality
is enforced by the pytest suite instead.
"""

from __future__ import annotations

from libpdf_spark.config import ExtractConfig
from libpdf_spark.operators.common import load


def transcripts_from_documents(
    spark,
    sf_dir: str,
    limit: int | None = None,
    replicate: int = 1,
    text_repeat: int = 1,
):
    """documents(doc_id, text, …) → transcripts(conv_id, turn_idx,
    role, text, tool, ts): every document becomes the tool-turn of a
    conversation; conv assignment buckets 16 docs per conversation.

    ``replicate``/``text_repeat`` scale the corpus up for throughput
    benchmarking (more turns / heavier documents) while staying fully
    deterministic. The payload embedding runs inside ``mapInPandas``
    too — expected extraction output is a function of the input text
    alone.
    """
    from pyspark.sql import functions as F

    from libpdf_spark.fixtures import doc_from_text
    from libpdf_spark.payload import embed

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    if limit:
        docs = docs.limit(limit)
    if text_repeat > 1:
        docs = docs.select(
            "doc_id",
            F.concat_ws(" ", F.array_repeat("text", text_repeat)).alias("text"),
        )
    if replicate > 1:
        docs = (
            docs.crossJoin(
                spark.range(replicate).select(F.col("id").alias("replica"))
            )
            .select(
                (F.col("doc_id") * replicate + F.col("replica")).alias("doc_id"),
                "text",
            )
        )
        docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)

    def build(batches):
        import pandas as pd

        for pdf in batches:
            rows = {
                "conv_id": [], "turn_idx": [], "role": [],
                "text": [], "tool": [], "ts": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                builder = doc_from_text(text)
                rows["conv_id"].append(f"doc-conv-{int(doc_id) // 16:06d}")
                rows["turn_idx"].append(int(doc_id) % 16)
                rows["role"].append("tool")
                rows["text"].append(
                    embed(builder.build(), prefix=f"doc {int(doc_id)}: ")
                )
                rows["tool"].append(None)
                rows["ts"].append(pd.Timestamp("2026-01-01"))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        build,
        schema="conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def q_extract_documents(spark, sf_dir):
    """Flagship: full extraction over document-bearing turns.

    Has a FULL DuckDB value oracle: ``doc_from_text`` is a
    deterministic layout (8 words/line, 4 lines/paragraph, 5
    paragraphs/page), so the expected extraction output is
    reconstructible in pure SQL — the oracle re-derives per-turn
    extracted text (and its md5) from ``documents.text`` alone and the
    driver hash-compares it against what the real mapInPandas kernel
    produced. This is the per-turn text-equality gate expressed as a
    relational oracle.
    """
    from pyspark.sql import functions as F

    from libpdf_spark.pipeline import extract_turns

    transcripts = transcripts_from_documents(spark, sf_dir)
    out = extract_turns(transcripts, ExtractConfig())
    return out.select(
        "conv_id",
        "turn_idx",
        "parse_ok",
        "n_elements",
        "n_pages",
        F.length("extracted_text").cast("long").alias("text_len"),
        F.md5("extracted_text").alias("text_md5"),
    )


# SQL model of doc_from_text (fixtures.py): words → 8-word lines →
# 4-line paragraphs (joined "\n") → extracted_text (joined "\n\n"),
# pages of 5 paragraphs.
_SQL_DOC_RECONSTRUCT = r"""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 1
                       AND regexp_split_to_array(trim(text), '\s+')[1] = ''
                  THEN ['empty']
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS words
      FROM documents
    ), lines AS (
      SELECT doc_id,
             [array_to_string(words[i : least(i + 7, len(words))], ' ')
              for i in range(1, len(words) + 1, 8)] AS ls
      FROM w
    ), paras AS (
      SELECT doc_id,
             [array_to_string(ls[j : least(j + 3, len(ls))], chr(10))
              for j in range(1, len(ls) + 1, 4)] AS ps
      FROM lines
    )
"""

SQL_EXTRACT_DOCUMENTS = (
    _SQL_DOC_RECONSTRUCT
    + """
    SELECT printf('doc-conv-%06d', doc_id // 16) AS conv_id,
           CAST(doc_id % 16 AS INT) AS turn_idx,
           TRUE AS parse_ok,
           CAST(len(ps) AS INT) AS n_elements,
           CAST(CAST(ceil(len(ps) / 5.0) AS INT) AS INT) AS n_pages,
           LENGTH(array_to_string(ps, chr(10) || chr(10))) AS text_len,
           md5(array_to_string(ps, chr(10) || chr(10))) AS text_md5
    FROM paras
"""
)


def q_extract_element_stats(spark, sf_dir):
    """Element-kind histogram across the extracted corpus — explode
    the nested element array and hash-aggregate. Oracled against the
    SQL reconstruction of per-paragraph texts."""
    from pyspark.sql import functions as F

    from libpdf_spark.pipeline import extract_turns

    transcripts = transcripts_from_documents(spark, sf_dir)
    out = extract_turns(transcripts, ExtractConfig())
    return (
        out.select(F.explode("elements").alias("e"))
        .groupBy(F.col("e.kind").alias("kind"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.length("e.text")), 4).alias("avg_text_len"),
        )
    )


SQL_EXTRACT_ELEMENT_STATS = (
    _SQL_DOC_RECONSTRUCT
    + """
    , per_para AS (SELECT doc_id, unnest(ps) AS para FROM paras)
    SELECT 'paragraph' AS kind,
           COUNT(*) AS n,
           ROUND(AVG(LENGTH(para)), 4) AS avg_text_len
    FROM per_para
"""
)


def q_extract_words(spark, sf_dir):
    """Word-level surface (keep_words): run the extraction with the
    word/line tree retained, explode ``elements.words`` and rebuild the
    per-turn word stream — the DuckDB oracle re-derives it from
    ``documents.text`` alone, value-hashing word order, count, and the
    uniform-lift result (every fixture char is black, so every word
    must lift ncolor = [0,0,0])."""
    from pyspark.sql import functions as F

    from libpdf_spark.pipeline import extract_turns

    transcripts = transcripts_from_documents(spark, sf_dir)
    out = extract_turns(transcripts, ExtractConfig(keep_words=True))
    exploded = out.select(
        "conv_id", "turn_idx", F.posexplode("elements").alias("epos", "e")
    ).select(
        "conv_id", "turn_idx", "epos",
        F.posexplode("e.words").alias("wpos", "w"),
    )
    black = (
        (F.col("w.ncolor.r") == 0.0)
        & (F.col("w.ncolor.g") == 0.0)
        & (F.col("w.ncolor.b") == 0.0)
    )
    return exploded.groupBy("conv_id", "turn_idx").agg(
        F.count("*").alias("n_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("epos", "wpos", F.col("w.text").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                " ",
            )
        ).alias("words_md5"),
        F.sum(black.cast("long")).alias("n_black"),
    )


SQL_EXTRACT_WORDS = (
    _SQL_DOC_RECONSTRUCT
    + """
    SELECT printf('doc-conv-%06d', doc_id // 16) AS conv_id,
           CAST(doc_id % 16 AS INT) AS turn_idx,
           CAST(len(words) AS BIGINT) AS n_words,
           md5(array_to_string(words, ' ')) AS words_md5,
           CAST(len(words) AS BIGINT) AS n_black
    FROM w
"""
)


QUERIES = {
    "extract_documents": q_extract_documents,
    "extract_element_stats": q_extract_element_stats,
    "extract_words": q_extract_words,
}

ORACLES: dict[str, str] = {
    "extract_documents": SQL_EXTRACT_DOCUMENTS,
    "extract_element_stats": SQL_EXTRACT_ELEMENT_STATS,
    "extract_words": SQL_EXTRACT_WORDS,
}
