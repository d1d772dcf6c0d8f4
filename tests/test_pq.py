"""Product-quantization semantics (operators/similarity.py PQ block)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.similarity import (
    pq_adc_topk,
    pq_codebook,
    pq_encode,
    pq_rerank,
)

NSUB, DSUB, MOD, NCW = 16, 4, 5, 64


def _vectors(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def test_encode_matches_numpy_argmin(spark, sf_dir):
    e = _vectors(spark, sf_dir)
    data = {r["vec_id"]: np.array(r["v"]) for r in e.collect()}
    cb = pq_codebook(e, n_sub=NSUB, d_sub=DSUB, selector_mod=MOD, n_codewords=NCW)
    got = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(e, cb, n_sub=NSUB, d_sub=DSUB).collect()
    }
    donors = sorted(k for k in data if k % MOD == 0)[:NCW]
    for vid in list(data)[:20]:
        for m in range(NSUB):
            sub = data[vid][m * DSUB : (m + 1) * DSUB]
            # argmin on int64 micro-distances, ties to smallest cid —
            # the engine's exact decision function
            best = min(
                (int(np.round(((sub - data[c][m * DSUB : (m + 1) * DSUB]) ** 2).sum() * 1e6)), c)
                for c in donors
            )[1]
            assert got[vid][m] == best


def test_shortlist_plus_rerank_recall(spark, sf_dir):
    e = _vectors(spark, sf_dir)
    data = {r["vec_id"]: np.array(r["v"]) for r in e.collect()}
    cb = pq_codebook(e, n_sub=NSUB, d_sub=DSUB, selector_mod=MOD, n_codewords=NCW)
    enc = pq_encode(e, cb, n_sub=NSUB, d_sub=DSUB)
    short = pq_adc_topk(
        e, cb, enc, F.col("vec_id") < 3, n_sub=NSUB, d_sub=DSUB, k=50
    )
    top = pq_rerank(short, e, F.col("vec_id") < 3, k=10)
    rows = top.collect()
    recalls = []
    for q in range(3):
        exact = [
            vid
            for _, vid in sorted(
                (((data[q] - v) ** 2).sum(), vid) for vid, v in data.items()
            )[:10]
        ]
        approx = [r["vec_id"] for r in rows if r["query_id"] == q]
        recalls.append(len(set(exact) & set(approx)) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_encode_plan_is_shuffle_free(spark, sf_dir):
    e = _vectors(spark, sf_dir)
    cb = pq_codebook(e, n_sub=NSUB, d_sub=DSUB, selector_mod=MOD, n_codewords=NCW)
    plan = (
        pq_encode(e, cb, n_sub=NSUB, d_sub=DSUB)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchange feeds the single-row codebook broadcast; the
    # corpus side must not shuffle
    assert "Exchange hashpartitioning" not in plan
