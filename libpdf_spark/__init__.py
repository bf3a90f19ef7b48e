"""libpdf_spark — a PySpark-native structured-extraction analytics engine.

A brand-new engine (not a port) with the query/data-processing
capabilities of useblocks/libpdf, re-expressed Spark-first:

* the whole-document extraction DAG (layout grouping, chapter
  detection, ruled-table cell reconstruction, figure/rect/link
  resolution, smart header/footer crop) runs as ONE vectorized
  ``mapInPandas`` stage over an Iceberg/parquet table of multi-turn
  agent transcripts ``(conv_id, turn_idx, role, text, tool, ts)``;
* every cross-row operator (interval joins, order-sensitive
  aggregation, window renumbering, top-1 fuzzy joins, header/footer
  occurrence aggregation) is also exposed as a DataFrame-tier
  operator in :mod:`libpdf_spark.operators` for corpus-scale
  analytics, plus the training-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).

Reference semantics are cited per function as
``/root/reference/libpdf/<file>:<lines>``.
"""

from libpdf_spark.config import ExtractConfig

__all__ = ["ExtractConfig", "load", "load_corpus", "extract_turns", "EXTRACT_SCHEMA"]
__version__ = "0.2.0"


def __getattr__(name):  # lazy: keep the kernel importable without pyspark/JVM
    if name in ("extract_turns", "EXTRACT_SCHEMA"):
        from libpdf_spark import pipeline

        return getattr(pipeline, name)
    if name in ("load", "load_corpus", "ApiObjects"):
        # reference-compatible facade (core.py:171-262, apiobjects.py)
        from libpdf_spark import api

        return getattr(api, name)
    raise AttributeError(name)
