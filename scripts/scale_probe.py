#!/usr/bin/env python
"""Scale probe: replicate sf0.1 tables ~10x (key-shifted) and re-time
the headline queries.  Evidence that the plans scale linearly rather
than blowing up on data volume; results recorded in SCALE.md.

Writes only inside the repo (.scratch/, gitignored).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import REGISTRY
from childhoodcancerdatainitiative_prefect_pipeline_spark.session import build_session

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SCALE_FACTOR", "10"))
# factor 10 shares bench.py's replica; other factors get their own
# dir so switching scale points never thrashes a rebuild (the
# _REPLICA_FACTOR marker would correctly force one otherwise)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEST = os.path.join(
    _REPO, ".scratch", "sf1" if FACTOR == 10 else f"x{FACTOR}"
)

from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (  # noqa: E402
    KEY_SHIFTS,
    ensure_replica,  # noqa: F401 - KEY_SHIFTS re-exported for callers
)


def main():
    global DEST
    spark = build_session(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DEST, exist_ok=True)
    built = ensure_replica(spark, SRC, DEST, FACTOR)
    print("replica " + ("built" if built else "reused"), file=sys.stderr)

    # SCALE_SALT_DOCS=k → run against the REALISTIC-dup-rate documents
    # arm (VERDICT r8 item 4): replica text word-salted per replica
    # except 1-in-k docs that keep exact dups, so dedup pair outputs
    # stop being fixture-quadratic.  Non-document tables symlink to
    # the plain replica.
    salt = os.environ.get("SCALE_SALT_DOCS")
    if salt:
        from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
            ensure_salted_documents,
        )

        DEST = ensure_salted_documents(
            spark, SRC, DEST + "_salted", factor=FACTOR,
            keep_dup_one_in=int(salt), link_from=DEST,
        )
        print(f"salted docs arm (1-in-{salt} exact dups): {DEST}",
              file=sys.stderr)

    queries = (
        "q1_pricing_summary", "q3_revenue_by_order", "q5_region_revenue",
        "catalog_stats", "j3_multi_path_flatten", "a9_dedup_keep_last",
        "w1_eav_pivot", "events_daily_rollup", "dedup_ngram_jaccard",
        "text_quality", "sim_cosine_topk",
        # round-3 ops
        "text_repetition_stats", "text_tfidf_topk", "inverted_index_build",
        "events_sessionize", "corpus_token_budget_mix",
        # round-3 pack 8/9 (TPC-H shapes + LLM primitives)
        "q2_min_cost_supplier", "q13_order_count_distribution",
        "q18_large_volume_customers", "q21_waiting_suppliers",
        "corpus_chunk_sliding", "corpus_group_sample_k",
        "dedup_cluster_star", "kf_transfer_groups",
        # round-4 ops (semdedup/triangles/kcore excluded: their exact
        # cosine EDGE BUILD is O(n^2) by design at probe scale — the
        # operators themselves are keyed; feed them LSH/IVF edges at
        # 100 TB.  setsim excluded: the synthetic corpus's uniform
        # 30-word vocabulary defeats rarity-based prefix pruning —
        # Zipfian corpora are the operator's habitat)
        "corpus_bloom_decontaminate", "text_quality_classifier",
        "text_bigram_logprob", "corpus_temperature_mix",
        "events_cms_heavy_hitters", "profile_hll_distinct",
        "events_concurrency_peak", "lineitem_weighted_median",
        "orders_cube_stats", "lineitem_median_twopass",
        "corpus_weighted_sample",
        # round-3-session ops
        "ccdi_to_tabbreaker", "indexd_guid_validation",
        "text_bpe_tokens", "text_bpe_tokens_fast", "text_html_strip",
        "privacy_k_anonymity", "linkage_blocked_fuzzy",
        # round-3-session pack 2 (dedup_minhash_eval excluded: its
        # EXACT-truth side is an inverted-index pair join that the
        # synthetic 30-word vocabulary makes near-all-pairs — recall
        # audits run on samples by design)
        "cdc_merge_snapshot", "cdc_incremental_agg",
        "text_trigram_backoff", "corpus_kl_drift",
        "corpus_batch_schedule", "entity_golden_record",
        "events_attribution", "corpus_decontaminate_cut",
        "corpus_split_leakage_safe", "profile_psi_drift",
        "embedding_doc_pool", "sim_hard_negatives", "sim_pq_topk_det",
        "repair_fd_violations", "lineitem_trimmed_mean",
        "features_target_encode_loo", "eval_auc_by_source",
        "text_bpe_fertility",
        # round-4/5 ops: the de-weakened scale fixes (rfm distributed
        # ntile, cds persist, dashboard cache) plus the new kernels
        "customer_rfm_segments", "cds_flatten", "ccdi_release_dashboard",
        "bam_stats_extract", "multimodal_png_decode",
        "multimodal_wav_decode", "multimodal_jpeg_decode",
        "multimodal_mjpeg_video_decode", "multimodal_flac_decode",
        "multimodal_gif_decode", "multimodal_route_decode",
        "dedup_image_ahash_pairs", "dedup_audio_ahash_pairs",
        "dedup_video_clip_pairs", "corpus_warc_extract",
        "corpus_tar_extract",
        "cog_dcc_postprocess_merge",
        "corpus_weighted_sample",
        "dcc_manifest_guid_remap", "corpus_pack_sequences",
        "graph_pagerank_topk", "dedup_minhash_pairs",
        "dedup_simhash_pairs",
        # round-6: the LSH-edge and kNN-graph scale paths for graph
        # construction (their exact all-pairs twins stay excluded by
        # design)
        "graph_triangle_count_lsh", "graph_kcore_membership_lsh",
        "graph_triangle_count_knn", "graph_kcore_membership_knn",
    )
    # SCALE_QUERIES=a,b,c confines the sweep (the 100x decade runs a
    # focused headliner+iterative set; the full standing list at 100x
    # would take hours without adding plan-shape information)
    subset = os.environ.get("SCALE_QUERIES")
    if subset:
        queries = tuple(n for n in subset.split(",") if n)
    runs = int(os.environ.get("SCALE_RUNS", "2"))
    timings = {}
    for name in queries:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, DEST).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)
    print(json.dumps({"metric": "scale_probe", "factor": FACTOR,
                      "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()
    if os.environ.get("KEEP_SCRATCH") != "1":
        shutil.rmtree(os.path.dirname(DEST), ignore_errors=True)


if __name__ == "__main__":
    main()
