"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01-Q31 + §2-C extensions); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap
(50 in every round so far).  The dict leads with the round-11 RECHECK
set (the 5 new entries x206/x207/x208/x209/x210; x205, whose oracle gained the
pruned_tokens column; the 6 entries whose joins were size-gated or
whose grading changed this round: x204/x119/x49/x50/x202/x203 — every
one locally diff-run green this round; the two r5 leftovers x98/x99
the r10 window could not fit; and the 6 entries changed in r10 that
rotated here as announced: x27/x55/x186/x189/x190/x198).  After the
recheck set, entries order by EVIDENCE STALENESS computed from the
committed CORRECTNESS_r*.json artifacts themselves (oldest latest-
check first), so each round's window automatically drains the stalest
band — this round that is 30 of the r6 cohort's 39 oracle-bearing
entries; the 9 alphabetically-last (x149_interarrival,
x150_cohort_ltv, x152_bm25_retrieval, x155_source_overlap,
x156_lsh_calibration, x157_dedup_retention, x18_image_features,
x38_train_test_split, x56_source_mixing) spill to r12, along with
the rows-only cohort (x37_minhash_fast et al., which the hash gate
cannot check anyway).
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


# Round-11 recheck set: new entries, changed oracles, and entries
# whose code changed in r10/r11 (each locally diff-run green).
_RECHECK_R11 = {
    "x206_unigram_pruned",        # new: Kudo §4 EM pruning
    "x207_language_id",           # new: char-trigram multiclass langid
    "x208_ccnet_buckets",         # new: CCNet perplexity terciles
    "x209_leakage_safe_split",    # new: cluster-keyed split, 0 leaks
    "x210_ccnet_by_language",     # new: per-language CCNet buckets
    "x205_tokenizer_fertility",   # oracle extended: pruned_tokens col
    "x204_unigram_perplexity",    # r11: size-gated vocab broadcast
    "x119_bpe_encode",            # r11: size-gated vocab broadcast
    "x49_contamination",          # r11: size-gated benchmark grams
    "x50_corpus_pipeline",        # r11: size-gated benchmark grams
    "x202_sgd_audit",             # r11: tolerance match columns
    "x203_ivfpq_occupancy",       # r11: zero-total guard
    "x98_novelty",                # r5 leftovers from the r10 window
    "x99_containment",
    "x27_cosine_topk_ivf",        # changed in r10 (in-entry grading),
    "x55_kmeans",                 # rotated into this window as
    "x186_pq_recall",             # announced in the r10 entry notes
    "x189_ivfpq_recall",
    "x190_ivfpq_refine",
    "x198_temperature_mix",
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
    if name in _RECHECK_R11:
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
