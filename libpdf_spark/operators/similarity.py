"""Similarity search over the embeddings table.

Brute-force cosine top-k as the exact baseline, and an LSH-bucketed
(random-hyperplane sign) variant as the scale path. Dot products run
JVM-side via ``F.zip_with`` + ``F.aggregate`` — no Python UDF.

Scale posture: brute force is O(Q·N) with Q broadcast — correct
verifier, not the production path; the sign-LSH variant buckets by a
deterministic bit signature so the candidate join is an equi-join on
the bucket key (shuffle bounded by bucket sizes).
"""

from __future__ import annotations

from libpdf_spark.operators.common import load, load_parallel

TOP_K = 5
N_QUERIES = 3  # vec_id < 3 are the query vectors


def _F():
    from pyspark.sql import functions as F

    return F


def _dot(a, b):
    F = _F()
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


QUANT = 1_000_000  # 1e-6 embedding quantization grid


def _quantize(col):
    """double[] → int64[] on a 1e-6 grid. Integer dot products are
    EXACT in both engines (no accumulation-order / FMA divergence —
    double-based dot products disagree by 1 ulp between Spark and
    DuckDB, which flips 6-decimal rounding on boundary values)."""
    F = _F()
    return F.transform(col, lambda x: F.round(x * QUANT, 0).cast("long"))


def _idot(a, b):
    F = _F()
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def q_cosine_topk(spark, sf_dir):
    """Exact top-k cosine neighbors for each query vector over
    quantized embeddings (brute force; queries broadcast)."""
    F = _F()
    from pyspark.sql import Window

    emb = load_parallel(spark, sf_dir, "embeddings", "vec_id").select(
        "vec_id", _quantize("embedding").alias("qe")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("qe").alias("q_emb")
    )
    joined = emb.crossJoin(F.broadcast(queries)).withColumn(
        "cosine",
        F.round(
            _idot(F.col("qe"), F.col("q_emb")).cast("double")
            / (
                F.sqrt(_idot(F.col("qe"), F.col("qe")).cast("double"))
                * F.sqrt(_idot(F.col("q_emb"), F.col("q_emb")).cast("double"))
            ),
            6,
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "vec_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


_SQL_QUANT = f"list_transform(embedding, x -> CAST(ROUND(x * {QUANT}, 0) AS BIGINT))"

SQL_COSINE_TOPK = f"""
    WITH qe AS (
      SELECT vec_id, {_SQL_QUANT} AS qe FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, qe AS q_emb FROM qe WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.q_id, e.vec_id,
             ROUND(CAST(list_dot_product(e.qe, q.q_emb) AS DOUBLE)
               / (sqrt(CAST(list_dot_product(e.qe, e.qe) AS DOUBLE))
                  * sqrt(CAST(list_dot_product(q.q_emb, q.q_emb) AS DOUBLE))), 6) AS cosine
      FROM qe e CROSS JOIN q
    )
    SELECT q_id, vec_id, cosine, rank FROM (
      SELECT q_id, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
      FROM scored
    ) t WHERE rank <= {TOP_K}
"""


N_PLANES = 8


def _plane(i: int, dim: int = 64) -> list[float]:
    """Deterministic pseudo-random hyperplane (LCG — same constants in
    both engines would be overkill; the plane values are literals)."""
    vals = []
    state = 1103515245 * (i + 1) % 2147483647
    for _ in range(dim):
        state = (1103515245 * state + 12345) % 2147483647
        vals.append((state / 2147483647.0) * 2.0 - 1.0)
    return vals


def _plane_q(i: int) -> list[int]:
    """Quantized hyperplane — integer dot products keep the sign test
    exact in both engines (no 1-ulp sign flips near zero)."""
    return [round(v * QUANT) for v in _plane(i)]


def q_ann_lsh_buckets(spark, sf_dir):
    """Sign-LSH bucket key per vector: bit i = sign(v · plane_i).
    Vectors sharing the 8-bit key are ANN candidates — the production
    path joins on this key instead of cross-joining the corpus."""
    F = _F()
    emb = load_parallel(spark, sf_dir, "embeddings", "vec_id").withColumn(
        "qe", _quantize("embedding")
    )
    bucket = None
    for i in range(N_PLANES):
        plane = F.array(*[F.lit(v).cast("long") for v in _plane_q(i)])
        bit = (_idot(F.col("qe"), plane) > 0).cast("int")
        term = bit * (1 << i)
        bucket = term if bucket is None else bucket + term
    return emb.select("vec_id", "label", bucket.alias("bucket"))


def _sql_ann_lsh() -> str:
    terms = []
    for i in range(N_PLANES):
        lits = "[" + ", ".join(str(v) for v in _plane_q(i)) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({_SQL_QUANT}, {lits}) > 0 THEN {1 << i} ELSE 0 END)"
        )
    expr = " + ".join(terms)
    return f"SELECT vec_id, label, CAST({expr} AS INT) AS bucket FROM embeddings"


QUERIES = {
    "cosine_topk": q_cosine_topk,
    "ann_lsh_buckets": q_ann_lsh_buckets,
}

ORACLES = {
    "cosine_topk": SQL_COSINE_TOPK,
    "ann_lsh_buckets": _sql_ann_lsh(),
}
