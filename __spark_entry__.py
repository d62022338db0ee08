"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01–Q31 + §2-C extensions x01–x157); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap (50
in every round so far), so the dict leads with the round-7 recheck set —
the new spatial entries (x158–x160) and everything whose code or oracle
changed this round — then rotates the STALEST green entries (latest
check = r3, then r4) into the remaining slots.  Every oracle-bearing
entry has been driver-verified at least once (r6 closed the set); this
rotation keeps the oldest evidence fresh.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datum_spark import extensions, tierb


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tierb.QUERIES["q10_star_join"][0](spark, "/root/testdata/sf0.001")


# Round-7 re-check set — the brand-new round-7 spatial operators
# (x158–x162) plus every entry whose implementation or oracle CHANGED
# this round (x151's short-doc gram guard landed on both sides; x154's
# dirty-row tolerance touched the partial path; x153 gained flood
# observability around its LSH stage).  10 entries; the remaining ~40
# cap slots fall to priority 1 — the STALEST green entries, i.e. those
# whose latest driver check is CORRECTNESS_r03 (q08–q31 and the
# early-x band) — then the r4 cohort at priority 2.
_RECHECK_R7 = {
    "x158_spatial_predicates", "x159_point_in_polygon_join",
    "x160_polygon_matrix", "x161_geometry_measures",
    "x162_nearest_neighbor",                          # new round-7
    "x151_contamination",                             # gram guard fix
    "x154_embedding_covariance",                      # dirty-row fix
    "x153_near_dup_clusters", "x04_minhash_lsh",      # flood observer
    "x07_embedding_dups_lsh",
}

# Latest driver check = round 3 (stalest greens; r6 re-verified
# q01–q07 and x01–x03 et al., so those fell out of this band).
_STALE_R3 = {
    "q08_cross_join", "q09_theta_join", "q10_star_join",
    "q11_interval_join", "q12_groupby_agg", "q13_count_distinct",
    "q14_rollup", "q15_having", "q16_median", "q17_rank_window",
    "q18_lag", "q19_running_sum", "q20_topk", "q21_intersect",
    "q22_distinct", "q23_scalar_subquery", "q24_cte", "q25_string_fns",
    "q26_date_fns", "q27_math_fns", "q28_case", "q29_casts", "q30_json",
    "q31_window_agg", "x01_dedup_exact", "x02_dup_groups",
    "x03_ngram_jaccard", "x06_embedding_dups", "x08_cosine_topk",
    "x10_token_count", "x11_language_guess", "x14_asof_join",
    "x15_sessionize", "x29_part_revenue", "x30_json_typed",
    "x31_grouping_sets", "x32_stream_stream_join", "x33_string_agg",
    "x34_topk_per_group", "x35_stats_aggs", "x36_word_count",
    "x39_pack_documents",
}

# Latest driver check = round 4 (next-stalest band).
_STALE_R4 = {
    "x17_media_metadata", "x20_running_totals", "x21_quality_pipeline",
    "x22_union_all_agg", "x23_except", "x24_cube", "x25_percentiles",
    "x26_pivot", "x28_time_rollup", "x40_ntile_first_last",
    "x41_range_frame", "x42_percent_rank", "x43_union_distinct",
    "x44_except_all", "x45_date_arith", "x46_string_regex",
    "x47_pii_redact", "x48_repetition", "x49_contamination",
    "x50_corpus_pipeline", "x51_dup_clusters", "x52_tfidf_terms",
    "x53_bm25", "x54_vector_stats", "x59_split_md5", "x60_group_sample",
    "x61_doc_frequency", "x62_minhash_md5", "x63_top_bigrams",
    "x64_mix_md5", "x65_upsample", "x66_epoch_shuffle",
    "x67_interleave_sources", "x68_token_budget",
    "x69_quality_percentile", "x70_user_features", "x71_funnel",
    "x72_retention_cohorts", "x73_exists_subquery", "x74_quantified_all",
    "x75_conditional_agg", "x76_ignore_nulls_window",
    "x77_approx_aggregates", "x78_posexplode", "x79_union_by_name",
    "x80_share_of_total", "x81_resample_ffill", "x82_paragraph_dedup",
}


def _priority(name: str, has_oracle: bool) -> int:
    if name in _RECHECK_R7:
        return 0                      # new / changed this round
    if not has_oracle:
        return 4                      # rows-only outside the recheck set
    if name in _STALE_R3:
        return 1                      # stalest greens (last checked r3)
    if name in _STALE_R4:
        return 2                      # next-stalest (last checked r4)
    return 3                          # verified green in r5–r6


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
