"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01–Q31 + §2-C extensions x01–x72); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap (50 in
rounds 1–3), so the dict leads with oracle-bearing entries that have NOT yet
been driver-checked (rounds 1–3 all verified the same first 50: Q01–Q31 +
19 x-entries — see CORRECTNESS_r03.json), then x28 (fixed this round), then
the new x66–x72, then the already-verified rest, then rows-only entries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datum_spark import extensions, tierb


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tierb.QUERIES["q10_star_join"][0](spark, "/root/testdata/sf0.001")


# Names hash-verified by the driver in rounds 1–3 (CORRECTNESS_r01–r03):
# every run covered the same 50-entry prefix.  Everything oracle-bearing
# outside this set goes first this round so the driver's cap reaches it.
_DRIVER_CHECKED = {
    "q01_count", "q02_project", "q03_predicates", "q04_inner_join",
    "q05_left_join", "q06_semi_join", "q07_anti_join", "q08_cross_join",
    "q09_theta_join", "q10_star_join", "q11_interval_join",
    "q12_groupby_agg", "q13_count_distinct", "q14_rollup", "q15_having",
    "q16_median", "q17_rank_window", "q18_lag", "q19_running_sum",
    "q20_topk", "q21_intersect", "q22_distinct", "q23_scalar_subquery",
    "q24_cte", "q25_string_fns", "q26_date_fns", "q27_math_fns",
    "q28_case", "q29_casts", "q30_json", "q31_window_agg",
    "x01_dedup_exact", "x02_dup_groups", "x03_ngram_jaccard",
    "x39_pack_documents", "x06_embedding_dups", "x08_cosine_topk",
    "x29_part_revenue", "x30_json_typed", "x31_grouping_sets",
    "x32_stream_stream_join", "x33_string_agg", "x34_topk_per_group",
    "x35_stats_aggs", "x36_word_count", "x10_token_count",
    "x11_language_guess", "x14_asof_join", "x15_sessionize",
    # x28_time_rollup was in the driver set but hash-FAILED through r3;
    # its oracle was fixed this round → re-verify early (priority 1).
}


# Round-5 re-check set — everything whose oracle is NEW or CHANGED this
# round, so it must land inside the driver's 50-entry verification cap:
# x16/x19 oracle fixes (DuckDB TIMESTAMPTZ → CAST AS TIMESTAMP);
# rows-only → oracle promotions x84/x12/x13/x86/x05/x83; the brand-new
# x87–x105 operators.
_RECHECK_R5 = {
    "x16_tumbling_window", "x19_sliding_window",
    "x84_fuzzy_dedup", "x12_fingerprint", "x13_quality_score",
    "x86_expectations", "x05_simhash",
    "x83_pagerank", "x87_doc_chunking", "x88_column_profile",
    "x89_robust_outliers", "x90_event_debounce", "x91_bpe_tokens",
    "x92_substring_dedup", "x85_sketch_rollup", "x93_length_histogram",
    "x94_variant_json", "x95_recursive_calendar", "x96_session_stats",
    "x97_char_entropy", "x98_novelty", "x99_containment",
    "x100_golden_record", "x101_weighted_sample", "x102_source_drift",
    "x103_centroid_outliers", "x104_cms_heavy_hitters",
    "x105_radius_join", "x106_unpivot", "x107_regression_aggs",
    "x18_image_features", "x108_kmeans_verified", "x109_incremental_dedup",
    "x110_rolling_distinct", "x111_decayed_engagement", "x112_cdc_apply",
    "x113_interval_join", "x114_bpe_train",
    "x115_audio_features", "x116_video_frames",
    "x117_copurchase", "x118_impute",
    "x119_bpe_encode", "x120_assoc_rules",
    "x121_decile_lift", "x122_winsorize",
    "x123_scd2", "x124_activity_streaks",
    "x125_snapshot_diff", "x129_communities",
}
# The set fills the driver's 50-entry verification cap exactly.  The
# remaining brand-new entries (x126 ref-integrity, x127 OHLC, x128
# top-k-with-ties, and the x130–x150 analytics family: Markov
# transitions, survival, bigram-LM, quantization, k-anonymity, triangle
# census, BFS reachability, rolling corr, attribution, A/B z-test, Gini,
# Benford, HHI, PMI, readability, seasonality, weighted median, centroid
# similarity, chi-square independence, inter-arrival gaps, cohort LTV)
# are diff_runner-green locally (see COVERAGE.md) and rotate into the r6
# driver check via the not-in-_DRIVER_CHECKED priority tier.


def _priority(name: str, has_oracle: bool) -> int:
    if not has_oracle:
        return 3                      # rows-only: after every oracle entry
    if name in _RECHECK_R5:
        return 0                      # fixed/promoted this round — re-check
    if name not in _DRIVER_CHECKED:
        return 1                      # verified only once (r4 rotation)
    return 2                          # verified green in r1–r3


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(tierb.queries())
    merged.update(extensions.queries())
    oracles = oracle_sql()
    names = sorted(merged, key=lambda n: (_priority(n, n in oracles), n))
    return {n: merged[n] for n in names}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tierb.oracle_sql())
    out.update(extensions.oracle_sql())
    return out
