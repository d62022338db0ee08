"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01-Q31 + §2-C extensions); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.

Ordering: the driver hash-verifies entries in dict order up to a cap
(50 in every round so far).  The dict leads with the round-12 RECHECK
set (the 4 new entries x211 gopher / x212 OPQ / x213 C4 /
x214 repetition; the 4
entries whose code changed this round: x207 — the multiclass fit
vectorized into one gradient job per step, x208/x210 — histogram-
derived tercile cuts + cached score frame, x185 — the power-iteration
helper extraction OPQ shares; every one locally diff-run green this
round).  After the recheck set, entries order by EVIDENCE STALENESS
computed from the committed CORRECTNESS_r*.json artifacts themselves
(oldest latest-check first), so each round's window automatically
drains the stalest band — this round that is the 9 oracle-bearing
r6-cohort leftovers (x149/x150/x152/x155/x156/x157/x18/x38/x56) and
then the r7 band, whose alphabetical order puts the core Tier-B
surface q08..q31 (last driver-checked r7 — the r11 VERDICT's gap #1)
ahead of the r7 x-entries; the 50-slot window covers the recheck set,
the whole r6 cohort, all 24 stale Tier-B queries and ~11 r7
x-entries, with the rest of the r7 band next in line for r13.
Rows-only entries (x37_minhash_fast et al.) sort last — the hash gate
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


# Round-12 recheck set: new entries and entries whose code changed
# this round (each locally diff-run green).
_RECHECK_R12 = {
    "x211_gopher_rules",          # new: Rae 2021 A1.1 audited columns
    "x212_opq_recall",            # new: Householder OPQ vs plain PQ
    "x207_language_id",           # r12: one gradient job per GD step
    "x208_ccnet_buckets",         # r12: histogram tercile cuts
    "x210_ccnet_by_language",     # r12: histogram cuts per group
    "x185_pca_power",             # r12: power-iteration helper split
    "x213_c4_rules",              # new: Raffel 2020 §2.2 audited columns
    "x214_gopher_repetition",     # new: Rae 2021 §A1.2 repetition rules
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
    if name in _RECHECK_R12:
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
