"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01–Q31 + §2-C extensions x01–x157); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap (50
in every round so far), so the dict leads with the round-6 recheck set —
entries never driver-checked (x126–x128, x130–x150), oracles fixed or
promoted this round (x100, x38, x56, x18, x140), and the 8 permanently
rows-only entries — then rotates the oldest-verified (r1–r3) entries into
the remaining slots.  After r6 every oracle-bearing entry has been
driver-verified at least once.
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


# Round-6 re-check set — everything that was never driver-verified
# (the late-r5 additions x126–x128 and x130–x150), everything whose
# oracle is NEW or CHANGED this round (the x100 scalar-provenance fix,
# the x38/x56 md5 promotions, the x18 short-doc rpad fix, the x140
# round-before-rank fix), the four brand-new round-6 operators
# (x151–x157), and the 8 permanently-rows-only entries so the driver at
# least records their row counts.  43 entries; the remaining 7 cap
# slots fall to priority 1 (the r1–r3-verified entries, q01 onward —
# the oldest green checks get re-confirmed).
_RECHECK_R6 = {
    "x100_golden_record",
    "x38_train_test_split", "x56_source_mixing",     # md5 promotions
    "x18_image_features", "x140_gini",               # oracle fixes
    # brand-new round-6 operators:
    "x151_contamination", "x152_bm25_retrieval",
    "x153_near_dup_clusters", "x154_embedding_covariance",
    "x155_source_overlap", "x156_lsh_calibration",
    "x157_dedup_retention",
    # never driver-checked (late round-5 additions):
    "x126_ref_integrity", "x127_ohlc_bars", "x128_topk_ties",
    "x130_transitions", "x131_survival", "x132_bigram_lm",
    "x133_quantization_error", "x134_k_anonymity", "x135_triangle_count",
    "x136_reachability", "x137_rolling_corr", "x138_attribution",
    "x139_ab_test", "x141_benford", "x142_hhi", "x143_pmi_phrases",
    "x144_readability", "x145_seasonality", "x146_weighted_median",
    "x147_centroid_distances", "x148_chi2_independence",
    "x149_interarrival", "x150_cohort_ltv",
    # permanently rows-only (engine-specific hash families / iterative
    # algorithms; each has a portable twin or recall/invariant tests —
    # see COVERAGE.md): the driver records their rows-only status.
    "x04_minhash_lsh", "x07_embedding_dups_lsh", "x09_cosine_topk_lsh",
    "x27_cosine_topk_ivf", "x37_minhash_fast", "x55_kmeans",
    "x57_semantic_dedup", "x58_coreset_sample",
}


def _priority(name: str, has_oracle: bool) -> int:
    if name in _RECHECK_R6:
        return 0                      # new / fixed / never driver-checked
    if not has_oracle:
        return 3                      # rows-only outside the recheck set
    if name in _DRIVER_CHECKED:
        return 1                      # oldest green checks (r1–r3) rotate
    return 2                          # verified green in r4–r5


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
