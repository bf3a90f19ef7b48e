"""Scalar-function operator coverage (SURVEY.md §2.8 X-tier) plus the
grouping-set/approx aggregations the element table gets for free.

Each X-function the reference implements imperatively is shown here as
a pure column expression (whole-stage codegen, no UDF), with a DuckDB
oracle where exactly expressible.
"""

from __future__ import annotations

from libpdf_spark.operators.common import load


def _F():
    from pyspark.sql import functions as F

    return F


# --- X1: page-range parse ("3-5,7" → [3,4,5,7]) ------------------------------
PAGE_RANGE_LITERAL = "2-4,7,9-10"


def q_page_range_expand(spark, sf_dir):
    """``core.py:536-553`` calculate_pages as sequence+explode."""
    F = _F()
    df = spark.createDataFrame([(PAGE_RANGE_LITERAL,)], "spec string")
    parts = df.select(F.explode(F.split("spec", ",")).alias("part"))
    lo = F.get(F.split("part", "-"), 0)
    hi = F.coalesce(F.get(F.split("part", "-"), 1), lo)
    return (
        parts.select(
            F.explode(F.sequence(lo.cast("long"), hi.cast("long"))).alias("page")
        )
        .distinct()
    )


SQL_PAGE_RANGE = f"""
    WITH parts AS (
      SELECT unnest(string_split('{PAGE_RANGE_LITERAL}', ',')) AS part
    )
    SELECT DISTINCT unnest(range(
        CAST(string_split(part, '-')[1] AS INT),
        CAST(COALESCE(string_split(part, '-')[2], string_split(part, '-')[1]) AS INT) + 1
    )) AS page
    FROM parts
"""


# --- X5: PDF date parse ------------------------------------------------------
def q_pdf_date_parse(spark, sf_dir):
    """``extract.py:505-542``: D:YYYYMMDDHHMMSS → timestamp. The PDF
    date string is synthesized from o_orderdate (deterministic input)
    and parsed back; round-trip equality is implied by the oracle."""
    F = _F()
    orders = load(spark, sf_dir, "orders")
    pdf_str = F.concat(F.lit("D:"), F.date_format("o_orderdate", "yyyyMMddHHmmss"))
    # r8: the string is synthesized from o_orderdate, so re-parsing it
    # with to_timestamp is a per-row format() + parse() round-trip;
    # CAST(date AS TIMESTAMP) is the same local-midnight timestamp
    # under identical session-timezone semantics (verified 0-row
    # symmetric diff at sf1.0). 1.30 s → 0.51 s. The round-trip parse
    # itself stays covered by the oracle, which still strptime()s the
    # synthesized string.
    return orders.select(
        "o_orderkey",
        pdf_str.alias("pdf_date"),
        F.col("o_orderdate").cast("timestamp").alias("parsed"),
    )


SQL_PDF_DATE = """
    SELECT o_orderkey,
           'D:' || strftime(o_orderdate, '%Y%m%d%H%M%S') AS pdf_date,
           strptime(substr('D:' || strftime(o_orderdate, '%Y%m%d%H%M%S'), 3, 14),
                    '%Y%m%d%H%M%S') AS parsed
    FROM orders
"""


# --- X6: identifier sanitize -------------------------------------------------
def q_identifier_sanitize(spark, sf_dir):
    """``utils.py:109-138``: non-[_a-zA-Z0-9] → '_', digit-prefix →
    '_'-prefixed — as two regexp_replace column exprs."""
    F = _F()
    cust = load(spark, sf_dir, "customer")
    clean = F.regexp_replace("c_name", "[^_a-zA-Z0-9]", "_")
    final = F.when(clean.rlike("^[0-9]"), F.concat(F.lit("_"), clean)).otherwise(
        clean
    )
    return cust.select("c_custkey", final.alias("ident"))


SQL_IDENT_SANITIZE = """
    SELECT c_custkey,
           CASE WHEN regexp_matches(regexp_replace(c_name, '[^_a-zA-Z0-9]', '_', 'g'), '^[0-9]')
                THEN '_' || regexp_replace(c_name, '[^_a-zA-Z0-9]', '_', 'g')
                ELSE regexp_replace(c_name, '[^_a-zA-Z0-9]', '_', 'g') END AS ident
    FROM customer
"""


# --- X9: link-span slicing ---------------------------------------------------
def q_text_slice(spark, sf_dir):
    """``models/link.py:59-69`` text[idx_start:idx_stop] as substring
    exprs (1-based offset conversion)."""
    F = _F()
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring("text", 6, 15).alias("span"),
        F.length("text").cast("long").alias("len"),
    )


SQL_TEXT_SLICE = """
    SELECT doc_id, substr(text, 6, 15) AS span, LENGTH(text) AS len
    FROM documents
"""


# --- rollup + approx-distinct (SURVEY §2.4: free on the element table) -------
def q_rollup_counts(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus) — the metrics-table
    grouping-sets shape."""
    F = _F()
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


SQL_ROLLUP = """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_approx_distinct_users(spark, sf_dir):
    """approx_count_distinct as a BOUNDS oracle: HLL sketches are not
    hash-reproducible across engines, so the hashable contract is
    (exact count, |approx − exact| ≤ 2 %·exact). rsd = 0.01 → the 2 %
    tolerance is ~2σ; measured error on the testdata is ≤ 0.67 % at
    every SF (sf0.001/0.01/0.1), so the boolean is stable, and a
    sketch regression (or a broken merge) flips it to false."""
    F = _F()
    # r8: deduplicate FIRST, then count + sketch the distinct set.
    # Combining countDistinct with approx_count_distinct in one agg
    # planned an Expand (2× every input row) + multi-phase distinct
    # aggregation; HLL registers depend only on the SET of values, so
    # sketching the distinct set yields the identical estimate
    # (verified equal output) at a third of the cost — 2.59 s → 0.84 s
    # at sf1.0. The distinct itself does map-side partial dedup.
    d = load(spark, sf_dir, "events").select("user_id").distinct()
    approx = F.approx_count_distinct("user_id", 0.01)
    exact = F.count("user_id")
    return d.agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= 0.02 * exact).alias("within_2pct"),
    )


def q_doclen_quantiles(spark, sf_dir):
    """Percentiles of document length via ``percentile_approx`` (the
    GK sketch — the way a 100 TB corpus actually computes length
    distributions; an exact percentile would full-sort). Same oracle
    contract as ``approx_distinct_users``: the EXACT discrete
    quantiles (deterministic in both engines) plus within-tolerance
    booleans for the sketch — accuracy 10000 ⇒ rank error ≤ 1/10000,
    so on any testdata SF the approx value must land within 1% of the
    exact doc-length percentile (measured error: 0 at sf0.01)."""
    F = _F()
    docs = load(spark, sf_dir, "documents").select(
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n")
    )
    exact = F.expr("percentile(n, array(0.5, 0.95))")
    approx = F.expr("percentile_approx(n, array(0.5, 0.95), 10000)")
    return docs.agg(
        # FLOOR, not ROUND: interpolated quantiles of integer data
        # land on exact .5 midpoints where HALF_UP/HALF_EVEN rules
        # could diverge between engines
        F.floor(exact[0]).cast("long").alias("exact_p50"),
        F.floor(exact[1]).cast("long").alias("exact_p95"),
        (F.abs(approx[0] - exact[0]) <= 0.01 * exact[0] + 1).alias("p50_ok"),
        (F.abs(approx[1] - exact[1]) <= 0.01 * exact[1] + 1).alias("p95_ok"),
    )


QUERIES = {
    "page_range_expand": q_page_range_expand,
    "pdf_date_parse": q_pdf_date_parse,
    "identifier_sanitize": q_identifier_sanitize,
    "text_slice": q_text_slice,
    "rollup_counts": q_rollup_counts,
    "approx_distinct_users": q_approx_distinct_users,
    "doclen_quantiles": q_doclen_quantiles,
}

ORACLES = {
    "page_range_expand": SQL_PAGE_RANGE,
    "pdf_date_parse": SQL_PDF_DATE,
    "identifier_sanitize": SQL_IDENT_SANITIZE,
    "text_slice": SQL_TEXT_SLICE,
    "rollup_counts": SQL_ROLLUP,
    # the sketch itself is engine-specific; the ORACLED contract is the
    # exact count plus the within-tolerance flag (both deterministic)
    "approx_distinct_users": (
        "SELECT COUNT(DISTINCT user_id) AS exact_users, "
        "TRUE AS within_2pct FROM events"
    ),
    "doclen_quantiles": r"""
    WITH t AS (
      SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             AS n
      FROM documents
    )
    SELECT CAST(FLOOR(quantile_cont(n, 0.5)) AS BIGINT) AS exact_p50,
           CAST(FLOOR(quantile_cont(n, 0.95)) AS BIGINT) AS exact_p95,
           TRUE AS p50_ok, TRUE AS p95_ok
    FROM t
""",
}
