"""DSIR importance weights: reference-model parity, ranking behavior,
determinism."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from feasibility_etl_spark.operators.corpus import (
    DSIR_BUCKETS,
    _DSIR_SCALE,
    dsir_weights,
)


def _feats(text):
    ws = text.lower().split()
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS
        for g in grams
    ]


def _weights(raw_texts, tgt_texts):
    """Reference implementation in plain Python."""
    c_raw, c_tgt, t_raw, t_tgt = {}, {}, 0, 0
    for t in raw_texts:
        for b in _feats(t):
            c_raw[b] = c_raw.get(b, 0) + 1
            t_raw += 1
    for t in tgt_texts:
        for b in _feats(t):
            c_tgt[b] = c_tgt.get(b, 0) + 1
            t_tgt += 1
    lw = {}
    for b in set(c_raw) | set(c_tgt):
        p_t = (c_tgt.get(b, 0) + 1) / (t_tgt + DSIR_BUCKETS)
        p_r = (c_raw.get(b, 0) + 1) / (t_raw + DSIR_BUCKETS)
        lw[b] = round(math.log10(p_t / p_r) * _DSIR_SCALE)
    return lw


@pytest.fixture()
def corpora(spark):
    raw = spark.createDataFrame(
        [
            (1, "the stock market fell sharply today"),
            (2, "python code review and unit tests"),
            (3, "the cat sat on the mat"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    tgt = spark.createDataFrame(
        [
            (100, "python unit tests for code"),
            (101, "code review in python"),
        ],
        "doc_id long, text string",
    )
    return raw, tgt


def test_matches_reference_model(spark, corpora):
    raw, tgt = corpora
    got = {
        r.doc_id: (r.n_feats, r.logw_e9)
        for r in dsir_weights(raw, tgt).collect()
    }
    raw_rows = {r.doc_id: r.text for r in raw.collect()}
    lw = _weights(raw_rows.values(), [r.text for r in tgt.collect()])
    for doc_id, text in raw_rows.items():
        fs = _feats(text)
        if not fs:
            assert doc_id not in got  # empty doc -> no features -> no row
        else:
            assert got[doc_id] == (len(fs), sum(lw[b] for b in fs))


def test_target_like_docs_rank_higher(spark, corpora):
    raw, tgt = corpora
    scores = {r.doc_id: r.avg_logw for r in dsir_weights(raw, tgt).collect()}
    # doc 2 shares the target's vocabulary; docs 1 and 3 do not
    assert scores[2] > scores[1]
    assert scores[2] > scores[3]


def test_partitioning_invariant(spark):
    raw = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha w"), (F.col("id") % 11).cast("string"),
            F.lit(" beta w"), (F.col("id") % 7).cast("string"),
        ).alias("text"),
    )
    tgt = raw.where("doc_id % 13 = 0")
    a = sorted(
        (r.doc_id, r.n_feats, r.logw_e9)
        for r in dsir_weights(raw, tgt).collect()
    )
    b = sorted(
        (r.doc_id, r.n_feats, r.logw_e9)
        for r in dsir_weights(raw.repartition(32), tgt.repartition(5)).collect()
    )
    assert a == b  # exact BIGINT nano-sums: no float-order drift


def test_avg_derives_from_exact_sum(spark, corpora):
    raw, tgt = corpora
    for r in dsir_weights(raw, tgt).collect():
        assert r.avg_logw == r.logw_e9 / _DSIR_SCALE / r.n_feats


def test_persisted_model_scores_identically(spark, corpora, tmp_path):
    from feasibility_etl_spark.operators.corpus import dsir_model, dsir_score

    raw, tgt = corpora
    inline = sorted(
        (r.doc_id, r.n_feats, r.logw_e9) for r in dsir_weights(raw, tgt).collect()
    )
    path = str(tmp_path / "dsir_model")
    dsir_model(raw, tgt).write.parquet(path)
    served = sorted(
        (r.doc_id, r.n_feats, r.logw_e9)
        for r in dsir_score(raw, spark.read.parquet(path)).collect()
    )
    assert served == inline
    # and new documents score through the frozen model without retraining
    probe = spark.createDataFrame(
        [(500, "python code review")], "doc_id long, text string"
    )
    rows = dsir_score(probe, spark.read.parquet(path)).collect()
    assert len(rows) == 1 and rows[0].n_feats == 5
