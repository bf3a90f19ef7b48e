"""Every queries() entry vs its DuckDB oracle at sf0.001 — the local
mirror of the driver's correctness gate (row count + sorted-column
value comparison)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness-gate scale
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64")  # unify int32/int64 widths
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, con):
    raw = QUERIES[name](spark, SF_DIR).toPandas()
    got = _normalize(raw)
    if name not in ORACLES:
        # non-SQL-expressible: rows-only sanity (driver's weaker check)
        assert len(got) > 0
        return
    raw_exp = con.sql(ORACLES[name]).df()
    # integer-width parity: int32 vs int64 would fail a strict schema gate
    for c in sorted(set(raw.columns) & set(raw_exp.columns)):
        a, b = raw[c].dtype, raw_exp[c].dtype
        if pd.api.types.is_integer_dtype(a) or pd.api.types.is_integer_dtype(b):
            assert str(a) == str(b), f"{name}.{c}: spark {a} vs duckdb {b}"
    exp = _normalize(raw_exp)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a, b = got[c].to_numpy(), exp[c].to_numpy()
            mask = ~(pd.isna(a) & pd.isna(b))
            assert (abs(a[mask] - b[mask]) < 1e-9).all(), f"{name}.{c}"
        else:
            assert got[c].equals(exp[c]), f"{name}.{c}\n{got[c].head()}\n{exp[c].head()}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert pdf.parse_ok.all()
    assert (pdf.n_elements > 0).all()


def test_ann_ivf_recall_floor(spark):
    """IVF probes NPROBE/K of a near-orthogonal corpus → recall must
    at least track the probed fraction (and self-hit rank 1 always)."""
    from libpdf_spark.operators import similarity as S

    ivf = S.QUERIES["ann_ivf_topk"](spark, SF_DIR).toPandas()
    exact = S.QUERIES["cosine_topk"](spark, SF_DIR).toPandas()
    a = set(map(tuple, ivf[["q_id", "vec_id"]].values))
    b = set(map(tuple, exact[["q_id", "vec_id"]].values))
    assert len(a & b) / len(b) >= S.IVF_NPROBE / S.IVF_K * 0.8
    r1 = ivf[ivf["rank"] == 1]
    assert (r1["q_id"] == r1["vec_id"]).all()  # self is its own NN


def test_dedup_clusters_consistency(spark):
    """Cluster invariants: every pair endpoint is labeled, labels are
    component minima, survivors are exactly the per-cluster minima."""
    from libpdf_spark.operators import dedup as D

    pairs = D.QUERIES["dedup_minhash_lsh"](spark, SF_DIR).toPandas()
    clusters = D.QUERIES["dedup_clusters"](spark, SF_DIR).toPandas()
    labeled = dict(zip(clusters.doc_id, clusters.cluster_id))
    # both endpoints of every pair share a cluster
    for a, b in pairs[["doc_a", "doc_b"]].values:
        assert labeled[a] == labeled[b]
    # cluster_id is the min member; exactly one survivor per cluster
    g = clusters.groupby("cluster_id")
    assert (g.doc_id.min() == g.doc_id.min().index).all()
    assert (clusters.groupby("cluster_id").is_survivor.sum() == 1).all()
    assert (g.doc_id.size() == g.cluster_size.first()).all()


def test_pack_bins_shard_invariance_and_semantics(spark):
    """pack_bins is a two-phase distributed prefix scan: results must
    be IDENTICAL for any shard constant (the parallelism knob cannot
    change the packing), bin_ids must be non-decreasing in doc_id
    order, and every bin's offset stays inside the budget (quantized
    next-fit: a bin may overflow by at most one document)."""
    from libpdf_spark.operators.textops import q_pack_bins

    sf = "/root/testdata/sf0.001"
    a = q_pack_bins(spark, sf, shard=1000).orderBy("doc_id").toPandas()
    b = q_pack_bins(spark, sf, shard=7).orderBy("doc_id").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert (a.bin_id.diff().fillna(0) >= 0).all()
    assert (a.bin_offset < 2048).all() and (a.bin_offset >= 0).all()
    # exclusive prefix: first doc starts at offset 0 of bin 0
    assert a.iloc[0].bin_id == 0 and a.iloc[0].bin_offset == 0
    # prefix identity: bin_id*budget + offset == cumsum of previous docs
    prefix = a.n_tokens.cumsum().shift(1).fillna(0).astype(int)
    assert ((a.bin_id * 2048 + a.bin_offset) == prefix).all()


def test_repetition_score_values(spark):
    from libpdf_spark.operators.textops import q_repetition_score

    r = (
        q_repetition_score(spark, "/root/testdata/sf0.001")
        .orderBy("doc_id").toPandas()
    )
    assert (r.n_distinct <= r.n_words).all()
    assert (r.dup_ppm >= 0).all() and (r.dup_ppm <= 1000000).all()
    # integer ppm identity
    assert (
        r.dup_ppm == (r.n_words - r.n_distinct) * 1000000 // r.n_words
    ).all()
