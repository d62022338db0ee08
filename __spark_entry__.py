"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01-Q31 + §2-C extensions); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap
(50 in every round so far).  The dict leads with the round-14 RECHECK
set: the 20 entries whose code path changed in this optimization
round (vectorized driver ROUND in the k-means/PQ/GD finishes, Arrow
feature collect, lazy-checkpoint pagerank, compute-once caches in the
grading and co-purchase entries) — every one locally diff-run green
at sf0.01 after its change, hashes unchanged by construction.  After
the recheck set, entries order by EVIDENCE STALENESS
computed from the committed CORRECTNESS_r*.json artifacts themselves
(oldest latest-check first), so each round's window automatically
drains the stalest band — after the r13 window the oldest band is the
r8-evidence cohort (geometry/overlay and LSH-family entries).
Rows-only entries outside the recheck set sort last — the hash gate
cannot check them anyway.
Every oracle-bearing entry has been driver-verified at least
once (r6 closed the set); the rotation keeps the oldest evidence
fresh without hand-curated band lists going stale.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datum_spark import extensions, tierb


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tierb.QUERIES["q10_star_join"][0](spark, "/root/testdata/sf0.001")


# Round-14 recheck set: entries whose CODE PATH changed in this
# optimization round (each locally diff-run green at sf0.01 after the
# change) — the vectorized driver ROUND (k-means/PQ/GD finishes), the
# Arrow feature collect, the lazy-checkpoint pagerank, and the
# compute-once caches in the grading / co-purchase entries.
_RECHECK_R14 = {
    "x186_pq_recall",             # r14: fast round + shared base scan
    "x189_ivfpq_recall",          # r14: fast round + shared base scan
    "x190_ivfpq_refine",          # r14: fast round + shared base scan
    "x212_opq_recall",            # r14: fast round + shared base scan
    "x203_ivfpq_occupancy",       # r14: fast round (PQ driver Lloyd)
    "x27_cosine_topk_ivf",        # r14: shared base scan (rows-only)
    "x55_kmeans",                 # r14: fast round (rows-only)
    "x57_semantic_dedup",         # r14: fast round (driver Lloyd)
    "x58_coreset_sample",         # r14: fast round (driver Lloyd)
    "x108_kmeans_verified",       # r14: fast round (driver Lloyd)
    "x217_semdedup",              # r14: fast round (driver Lloyd)
    "x188_quality_classifier",    # r14: GD op order + Arrow collect
    "x207_language_id",           # r14: GD op order + Arrow collect
    "x202_sgd_audit",             # r14: GD op order + Arrow collect
    "x83_pagerank",               # r14: lazy checkpoints, no dangling probe
    "x117_copurchase",            # r14: cached co-purchase distinct
    "x120_assoc_rules",           # r14: cached co-purchase distinct
    "x135_triangle_count",        # r14: cached co-purchase distinct
    "x136_reachability",          # r14: cached edges + seeds reuse
    "x129_communities",           # r14: count-based jaccard substrate
    "x03_ngram_jaccard",          # r14: count-based jaccard join
    "x51_dup_clusters",           # r14: count-based jaccard + CC
    "x84_fuzzy_dedup",            # r14: count-based jaccard candidates
    "x100_golden_record",         # r14: count-based jaccard + CC
    "x153_near_dup_clusters",     # r14: CC distinct removal
    "x157_dedup_retention",       # r14: CC distinct removal
    "x181_dbscan",                # r14: CC distinct removal
    "x209_leakage_safe_split",    # r14: jaccard + CC changes
    "x229_record_linkage",        # r14: CC distinct removal
    "x06_embedding_dups",         # r14: normalize-lambda hoist
    "x08_cosine_topk",            # r14: normalize-lambda hoist
    "x192_hard_negatives",        # r14: normalize-lambda hoist
    "x196_matryoshka_recall",     # r14: normalize-lambda hoist
    "x197_semantic_contamination",  # r14: normalize-lambda hoist
    "x228_hard_negatives",        # r14: normalize-lambda hoist
    "x230_hashed_embedding_knn",  # r14: normalize-lambda hoist
}


def _latest_checked() -> dict[str, int]:
    """Latest driver-check round per entry, read from the committed
    CORRECTNESS_r*.json artifacts — the rotation's source of truth, so
    the staleness ladder never goes stale itself."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    try:
        for f in sorted(glob.glob(os.path.join(here,
                                               "CORRECTNESS_r*.json"))):
            r = int(os.path.basename(f).split("_r")[1].split(".")[0])
            with open(f) as fh:
                for k in json.load(fh):
                    latest[k] = max(latest.get(k, 0), r)
    except (OSError, ValueError):
        return {}
    return latest


_LATEST = _latest_checked()


def _priority(name: str, has_oracle: bool) -> tuple:
    if name in _RECHECK_R14:
        return (0, 0)                 # new / changed this round
    if not has_oracle:
        return (2, 0)                 # rows-only outside the recheck set
    # stalest evidence first (never-checked sorts as round 0)
    return (1, _LATEST.get(name, 0))


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
