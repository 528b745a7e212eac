"""Retired driver-registry entries — still implemented, still oracled.

Round-3 verdict ask #9: the driver's per-round correctness gate checks a
bounded window of the registry, so truly-redundant entries (a strict
subset or near-alias of another registered entry's operator core) cost
window slots without adding coverage. The 15 pairs below moved OUT of
``__spark_entry__.queries()`` and INTO the pytest gate: each retired
query still runs against its full DuckDB oracle at sf0.001 on every
``pytest`` pass (tests/test_retired_parity.py) — the family keeps its
oracle, the driver window shrinks to entries that buy real coverage.

Each entry names the registry twin that keeps its operator family
driver-checkable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from anomalydetection_spark.plans.driver_queries import (
    DISTINCT_AGG_SQL,
    GROUP_COUNT_SQL,
    HISTOGRAM_SQL,
    LEFT_JOIN_NULL_SQL,
    RUNNING_TOTAL_SQL,
    SAMPLE_SQL,
    SQL_API_SQL,
    TUMBLING_SQL,
    distinct_agg_customers,
    group_count_having,
    histogram_n_chars,
    left_join_null_handling,
    running_total_user,
    sample_deterministic,
    sql_api_revenue_by_status,
    tumbling_hourly,
)
from anomalydetection_spark.plans.driver_queries_curation import (
    BOILERPLATE_SQL,
    boilerplate_paragraphs,
)
from anomalydetection_spark.plans.driver_queries_dedup import (
    DEDUP_COMPONENTS_SQL,
    DEDUP_EXACT_SQL,
    MULTIMODAL_FRAMES_SQL,
    TOKEN_STATS_SQL,
    dedup_components,
    dedup_exact,
    multimodal_frame_stats,
    token_stats_lang,
)
from anomalydetection_spark.plans.driver_queries_quality import (
    MAD_GROUPED_SQL,
    mad_outlier_hours_by_type,
)
from anomalydetection_spark.plans.driver_queries_training import (
    SHARD_ASSIGNMENT_SQL,
    shard_assignment_stats,
)

# name -> (query fn, oracle SQL, registry twin that keeps the family)
RETIRED: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str, str]] = {
    "shard_assignment_stats": (
        shard_assignment_stats, SHARD_ASSIGNMENT_SQL,
        "epoch_order_stats",  # re-derives the identical md5-mod shard column before ranking
    ),
    "multimodal_frame_stats": (
        multimodal_frame_stats, MULTIMODAL_FRAMES_SQL,
        "frame_near_dup_docs",  # same mapInPandas frame-split core, plus the banding
    ),
    "mad_outlier_hours_by_type": (
        mad_outlier_hours_by_type, MAD_GROUPED_SQL,
        "mad_outlier_hours",  # same median/MAD core, grouped keys instead of scalar crossJoin
    ),
    "token_stats_lang": (
        token_stats_lang, TOKEN_STATS_SQL,
        "token_count_bpe",  # same JVM token accounting; BPE adds the subword split
    ),
    "histogram_n_chars": (
        histogram_n_chars, HISTOGRAM_SQL,
        "drift_kl_psi_by_source",  # builds the identical width-50 capped histogram as its input
    ),
    "sql_api_revenue_by_status": (
        sql_api_revenue_by_status, SQL_API_SQL,
        "q1_pricing_summary",  # same scan-agg plan, spark.sql() surface instead of DataFrame
    ),
    "boilerplate_paragraphs": (
        boilerplate_paragraphs, BOILERPLATE_SQL,
        "dedup_incremental",  # same md5-identity hash-agg core at paragraph granularity
    ),
    "distinct_agg_customers": (
        distinct_agg_customers, DISTINCT_AGG_SQL,
        "stats_documents",  # A12 exact+approx distincts live in the stats analyzer
    ),
    "dedup_exact": (
        dedup_exact, DEDUP_EXACT_SQL,
        "dedup_incremental",  # identical md5-identity groupBy, plus corpus bloom short-circuit
    ),
    "dedup_components": (
        dedup_components, DEDUP_COMPONENTS_SQL,
        "dedup_keep_best_quality",  # runs the same connected_components, plus the quality argmax
    ),
    "tumbling_hourly": (
        tumbling_hourly, TUMBLING_SQL,
        "hopping_window_counts",  # tumbling = hopping with step == size
    ),
    "left_join_null_handling": (
        left_join_null_handling, LEFT_JOIN_NULL_SQL,
        "q13_order_count_distribution",  # same outer-join null-group core
    ),
    "group_count_having": (
        group_count_having, GROUP_COUNT_SQL,
        "q18_large_orders",  # group-count + HAVING, with the join-back on top
    ),
    "sample_deterministic": (
        sample_deterministic, SAMPLE_SQL,
        "temperature_sample_sources",  # same hash-threshold deterministic sampling core
    ),
    "running_total_user": (
        running_total_user, RUNNING_TOTAL_SQL,
        "ntile_value_quartiles",  # ordered-window family; frame spec vs bucket rank
    ),
}
