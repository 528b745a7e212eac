"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship constraint suite on a spans-shaped table
derived from sf0.001; ``queries()``/``oracle_sql()`` map the operator
inventory from SURVEY.md §2 onto the driver fixture tables with DuckDB
oracle SQL twins (see anomalydetection_spark/plans/driver_queries.py for
the cross-engine determinism rules).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from anomalydetection_spark.plans import (
    driver_queries,
    driver_queries_curation,
    driver_queries_dedup,
    driver_queries_events,
    driver_queries_quality,
    driver_queries_relational,
    driver_queries_training,
)
from anomalydetection_spark.plans.flagship import (
    SUITE_VERDICTS_SQL,
    flagship_suite,
    suite_verdicts,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full validation suite
    (stats, uniqueness, referential, drift, span_order) over the derived
    interleaved documents table → per-partition verdict rows."""
    return flagship_suite(spark, "/root/testdata/sf0.001")


# The driver's per-round correctness gate checks a bounded prefix of this
# registry (50 entries in rounds 2 and 3), so ordering is part of the
# contract. Round-4 rotation policy (verdict r03 ask #4): the flagship
# suite stays first, then every entry that has NEVER had a driver row
# (27 of them after the round-3 retirement of 15 redundant entries into
# plans/retired.py), then every entry whose operator or oracle twin
# CHANGED this round, then the stalest previously-green entries (last
# driver-checked r01, then r02). _TAIL holds only entries that are
# driver-verified hash-green in r03 (or r02) AND untouched since — each
# one's family also keeps an in-window representative (noted inline) —
# so a prefix cut never leaves a family driver-unverified.
_PRIORITY = [
    "suite_verdicts",          # flagship product query (full DuckDB twin); also re-proves the round-4 manifest/uniqueness resume changes feeding the suite
    "moments_n_chars_by_lang", # the ONE r03-red cell: shape columns now exact fixed-point (no double round on the hash boundary) — must re-verify
    "benford_totalprice",      # never driver-checked + round-4 deterministic log10 quantization fix rides the same discipline
    "media_near_dup_pairs",    # r03-green but REWORKED this round: frequency cap now broadcasts the bounded HOT set and anti-joins (was corpus-sized kept-set broadcast)
    "frame_near_dup_docs",     # same hot-set anti-join rework at frame granularity
    "kcenter_diverse_embeddings",  # r03-green but REWORKED: chosen-set anti-join + periodic localCheckpoint (plan depth bounded for real k)
    "drift_ks_js_hellinger_by_source",  # oracle twin CHANGED: grid is now the full bucket union (current-only buckets count)
    "drift_wasserstein_chisq_by_source",  # same oracle-grid change on the W1/chi-square pair
    # ---- never driver-checked (26 more) ----
    "kmv_distinct_orders_by_flag",  # NEW round 4: KMV bottom-k distinct sketch, integer estimator re-derived by the twin
    "kmv_overlap_orders_flags",     # NEW round 4: theta-sketch set intersection (the algebra HLL can't do)
    "join_fanout_orders_lineitem",  # NEW round 4: pre-join explosion audit (exact predicted join size + hot keys)
    "mahalanobis_anomaly_by_label",  # full-covariance Mahalanobis scoring, model-literal oracle
    "corr_matrix_events",      # one-pass all-pairs correlation matrix from exact bigint moment sums
    "bigram_nll_by_source",    # order-2 Stupid-Backoff LM scoring, fixed-point ln
    "ppl_buckets_by_source",   # perplexity bucketing over the unigram NLL core
    "dup_ngram_coverage",      # Lee et al. duplicate-window substring coverage (60-bit window hashes)
    "c4_quality_filter_stats", # C4 line-level filter accounting
    "url_domain_stats_blocked",  # URL domain extraction + broadcast blocklist anti-join
    "retention_cohorts",       # cohort retention matrix (first-seen join-back + conditional aggs)
    "funnel_stages",           # strictly-ordered funnel (chained conditional min-ts)
    "gapfill_daily_activity",  # dense-calendar gap-fill (generated dimension + outer join)
    "set_ops_users",           # INTERSECT/EXCEPT physical set-ops
    "unpivot_user_metrics",    # UNPIVOT/melt (Expand-node stack)
    "q2_cheapest_supplier",    # groupwise-min join-back with ties kept
    "q7_volume_shipping",      # two-nation-path star + symmetric pair disjunction
    "q8_market_share",         # conditional-agg market-share ratio over a 5-way star
    "q9_product_profit",       # name-filter-pruned star profit agg
    "q10_returned_items",      # agg-then-join-back top-k on returned lineitems
    "q11_important_stock",     # group share vs scalar-agg threshold, integer cross-multiplied
    "q12_late_priority_lines", # conditional-count shipmode classification
    "q14_promo_share",         # conditional share over a broadcast join, single-row output
    "q15_top_revenue_supplier",  # scalar-max argmax with ties kept
    "q16_supplier_variety",    # NOT-IN anti-join + grouped distinct-agg
    "q19_branded_revenue",     # post-join disjunctive predicate over a hash equi-join
    "q20_heavy_suppliers",     # nested semi-join + grouped-HAVING half-sum threshold
    "q21_sole_blame_suppliers",  # EXISTS + NOT EXISTS self-join chain
    "q22_idle_rich_customers", # scalar-avg threshold + anti-join composition
    # ---- stalest green: last driver-checked in r01 ----
    "multimodal_decode_stats", # mapInPandas decode-accounting (Arrow batch path)
    "above_brand_avg_lineitems",  # decorrelated per-group scalar-avg predicate
    "pandas_udf_token_stats",  # Arrow scalar-iterator UDF token accounting
    "token_count_bpe",         # BPE-ish subword counting (JVM regex split)
    # ---- stalest green: last driver-checked in r02 ----
    "uniqueness_partkey",      # uniqueness VERDICT core (suite constraint family)
    "threshold_verdict_events",  # exact-percentile threshold → verdict rows
    "drift_kl_psi_by_source",  # KL/PSI drift pair (suite constraint family)
    "roc_auc_embeddings",      # bucketed two-phase Mann-Whitney AUC
    "ann_cosine_topk",         # brute-force exact-cosine top-k baseline
    "dedup_embedding_cosine",  # SRP-banded embedding near-dup
    "confusion_matrix_embeddings",  # 2-D label-agreement counts
    "template_mining_events",  # masked template extraction (Drain-analog batch)
    "asof_last_purchase",      # as-of join via conditional last() carry-forward
]
_TAIL = [
    "curation_pipeline",           # r02 green, untouched; composed plan whose stages (exact dedup, lang id, quality) are each in-window via dedup_embedding_cosine + c4_quality_filter_stats
    "eval_metrics_embeddings",     # r02 green, untouched; P/R/F1 derives from the same confusion counts as in-window confusion_matrix_embeddings
    "fingerprint_docs",            # r02 green, untouched; min-shingle-hash core shared with in-window token_count_bpe + dedup shingle families
    # Every entry below is driver-verified hash-green in CORRECTNESS_r03.json
    # (or r02 where noted) and its operator + oracle twin are UNTOUCHED since
    # that green row; the inline note names the in-window family twin.
    "anomaly_daily_event_counts",  # r03 green; metric-ledger anomaly family also exercised by suite_verdicts' ledger writes
    "profile_suggest_documents",   # r03 green; profiler shares stats_documents' analyzer core (stats family in-window via suite_verdicts)
    "entropy_lang_by_source",      # r03 green; exact-bigint info-theory family in-window via corr_matrix_events
    "mi_lang_source",              # r03 green; same joint-histogram core as entropy_lang_by_source
    "corr_hour_value_by_type",     # r03 green; scalar Pearson is a projection of in-window corr_matrix_events
    "placement_audit_docs",        # r03 green; map-only partition-transform audit, pinned by test_placement
    "pca_anomaly_by_label",        # r03 green (model-literal oracle); anomaly-scoring family in-window via mahalanobis_anomaly_by_label
    "ann_pq_topk",                 # r03 green; ANN family in-window via ann_cosine_topk (exact-cosine rerank shared)
    "hybrid_rrf_topk",             # r03 green; fusion consumes the in-window ann_cosine_topk + r03-green bm25 cores
    "pii_scan_by_source",          # r03 green; regex-scan accounting family in-window via url_domain_stats_blocked
    "pack_chunks_stats",           # r03 green; two-phase prefix-scan packing, pinned by test_training_ops
    "skew_audit_user_events",      # r03 green; hot-key audit family in-window via topk rank cores (roc_auc/threshold)
    "temperature_sample_sources",  # r03 green; deterministic-sampling family in-window via stratified (tail r02) + retired sample parity test
    "decontaminate_docs",          # r03 green; broadcast shingle membership shares url blocklist anti-join shape (in-window)
    "repetition_quality_by_lang",  # r03 green; Gopher rules family in-window via c4_quality_filter_stats
    "domain_mixture_weights",      # r03 green; mixture planning over in-window-checked quality/token stats
    "normalize_text_stats",        # r03 green; Arrow NFC UDF family in-window via pandas_udf_token_stats
    "mad_outlier_hours",           # r03 green; median/MAD family in-window via threshold_verdict_events (percentile crossJoin core)
    "dedup_incremental",           # r03 green; md5-identity + bloom short-circuit, exact-dedup family pinned by retired-parity tests
    "semdedup_clusters",           # r03 green; cluster-blocked cosine dedup family in-window via dedup_embedding_cosine
    "quality_classifier_stats",    # r03 green; hashed linear classifier shares c4/repetition accounting (in-window)
    "q18_large_orders",            # r03 green; group-HAVING join-back family in-window via q10_returned_items
    "bm25_topk_docs",              # r03 green; lexical retrieval, query-vocab-bounded posting core pinned by test_retrieval paths
    "unigram_nll_by_source",       # r03 green; LM family in-window via bigram_nll_by_source + ppl_buckets_by_source
    "q4_priority_late_exists",     # r03 green; EXISTS semi-join family in-window via q21_sole_blame_suppliers
    "q17_small_quantity_share",    # r03 green; correlated scalar-avg family in-window via above_brand_avg_lineitems
    "epoch_order_stats",           # r03 green; shard-rank family, shard column re-derived (retired shard_assignment parity test)
    "dedup_keep_best_quality",     # r03 green; components + argmax canonicalization (retired dedup_components parity test)
    "tdigest_bounds_events",       # r03 green; t-digest UDAF family pinned by test_tdigest + suite sketch blobs
    "stats_documents",             # r03 green; per-column stats analyzer re-proved inside in-window suite_verdicts' twin
    "fd_audit_events",             # r03 green; FD audit generalizes in-window uniqueness_partkey's distinct-per-key core
    "referential_orphans",         # r03 green; anti-join family in-window via q21 (NOT EXISTS) + url blocklist
    "freshness_events_by_type",    # r03 green; recency audit shares threshold_verdict_events' scalar-agg core (in-window)
    "topk_rank_drift_events",      # r03 green; rank-churn drift shares the in-window drift grid + topk cores
    "template_merge_events",       # r03 green; template family in-window via template_mining_events (same parse+mask core)
    "sessionize_events",           # r03 green; session windows share funnel_stages' per-user ordered-agg core (in-window)
    "topk_users_by_type",          # r03 green; rank-window top-k family in-window via q10_returned_items + roc_auc
    "hopping_window_counts",       # r03 green; hopping windows share gapfill_daily_activity's generated-grid join (in-window)
    "expression_rules_documents",  # r03 green; fused row-level rule scan, pinned by test_suite_configs
    "reconcile_orders_copy",       # r03 green; reconciliation diff statuses share set_ops_users' set-op core (in-window)
    "grouping_sets_orders",        # r03 green; cube/grouping-sets family in-window via confusion_matrix_embeddings margins
    "dsir_importance_by_lang",     # r03 green; hashed-feature bag models share quality classifier + token accounting (in-window)
    "class_centroid_stats",        # r03 green; fixed-point centroid norms share ann_cosine_topk's vector reduce core (in-window)
    "q1_pricing_summary",          # r02 green, untouched; single-hash-agg family in-window via suite stats + q14 conditional sums
    "q13_order_count_distribution",  # r02 green, untouched; outer-join null-group family in-window via gapfill_daily_activity
    "dedup_minhash_lsh",           # r02 green, untouched; banded near-dup family in-window via dedup_embedding_cosine (SRP bands)
    "parse_logs",                  # r02 green, untouched; positional parse family also in template_mining_events (in-window)
    "stratified_sample_langs",     # r02 green, untouched; per-stratum deterministic sampling (R2) over the retired-parity-tested R1 core
    "dedup_simhash",               # r02 green, untouched; near-dup family in-window via dedup_embedding_cosine + minhash (tail, r02)
    "lang_id_confusion",           # r02 green, untouched; text-stats family in-window via token_count_bpe + c4 filter
    "range_join_windows",          # r02 green, untouched; bucketed containment rewrite shares hopping's bucket-grid shape
    "zorder_event_buckets",        # r02 green, untouched; layout family also pinned by docstore z-order compaction tests
    "ann_ivf_topk",                # r02 green, untouched; cell-pruned ANN family in-window via ann_cosine_topk (recall floors in pytest)
    "dedup_ngram_jaccard",         # r02 green, untouched; shingle→exact-Jaccard shares minhash's df-capped verify core
    "quality_by_source",           # r02 green, untouched; quality-scoring family in-window via c4_quality_filter_stats
    "q3_shipping_priority",        # r02 green, untouched; join+topk family in-window via q10_returned_items
    "q5_local_supplier_volume",    # r02 green, untouched; multi-way star family in-window via q7/q8/q9
    "pivot_event_counts",          # r02 green, untouched; pivot is the wide complement of in-window unpivot_user_metrics
    "ntile_value_quartiles",       # r02 green, untouched; ordered-window family in-window via roc_auc (rank buckets)
    "q6_revenue_filter",           # r02 green, untouched; scan+filter+agg family in-window via q14_promo_share
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(driver_queries.QUERIES)
    q.update(driver_queries_dedup.QUERIES)
    q.update(driver_queries_events.QUERIES)
    q.update(driver_queries_curation.QUERIES)
    q.update(driver_queries_quality.QUERIES)
    q.update(driver_queries_training.QUERIES)
    q.update(driver_queries_relational.QUERIES)
    # deterministic columns of the flagship suite — full DuckDB oracle twin
    q["suite_verdicts"] = suite_verdicts
    missing = set(q) - set(_PRIORITY) - set(_TAIL)
    assert not missing, f"unordered registry entries: {sorted(missing)}"
    return {name: q[name] for name in _PRIORITY + _TAIL if name in q}


def oracle_sql() -> dict[str, str]:
    sql = dict(driver_queries.ORACLE_SQL)
    sql.update(driver_queries_dedup.ORACLE_SQL)
    sql.update(driver_queries_events.ORACLE_SQL)
    sql.update(driver_queries_curation.ORACLE_SQL)
    sql.update(driver_queries_quality.ORACLE_SQL)
    sql.update(driver_queries_training.ORACLE_SQL)
    sql.update(driver_queries_relational.ORACLE_SQL)
    sql["suite_verdicts"] = SUITE_VERDICTS_SQL
    return {name: sql[name] for name in _PRIORITY + _TAIL if name in sql}
