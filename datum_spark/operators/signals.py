"""Quality-signal diagnostics: rank-correlation structure between the
heuristic signals a curation stack thresholds on (length, stopword
share, repetition, entropy, learned scores ...).

Why it exists: filtering pipelines stack many signals; two signals
with Spearman ≈ 1 gate the same documents twice (wasted compute,
double-counted bias), and a signal uncorrelated with every other is
either novel information or noise.  The reference
(CityOfPhiladelphia/datum) has no analytics of its own — north-star
extension beside ``operators/skew.py``'s shuffle diagnostics.

Scale posture: one unpivot pass (corpus × n_signals rows), one ranking
window PER SIGNAL (partitioned by signal — signals spread across the
cluster, never a global sort over one partition), one self-join on the
doc id, one corr aggregate per signal pair (map-combined).  Ranks use
the deterministic dense ordering ``(value, id)`` — ties broken by id,
not averaged, so an external engine replays the exact ranks (x195);
for the near-tie-free continuous signals this matches classical
Spearman to ~1e-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def spearman_matrix(df: DataFrame, id_col: str,
                    cols: list[str], round_to: int = 4) -> DataFrame:
    """Pairwise Spearman rank correlation of ``cols``: one row per
    unordered pair ``(sig_a, sig_b, spearman, n)`` with
    ``sig_a < sig_b`` (names ordered), NULL-valued rows dropped
    per-signal before ranking."""
    stack = ", ".join(f"'{c}', cast({c} as double)" for c in cols)
    long = (df.selectExpr(id_col,
                          f"stack({len(cols)}, {stack}) AS (sig, v)")
              .filter(F.col("v").isNotNull()))
    w = Window.partitionBy("sig").orderBy(F.col("v").asc(),
                                          F.col(id_col).asc())
    ranked = long.select(id_col, "sig",
                         F.row_number().over(w).alias("r"))
    a = ranked.select(F.col(id_col).alias("__id"),
                      F.col("sig").alias("sig_a"),
                      F.col("r").alias("ra"))
    b = ranked.select(F.col(id_col).alias("__id"),
                      F.col("sig").alias("sig_b"),
                      F.col("r").alias("rb"))
    return (a.join(b, "__id")
             .filter(F.col("sig_a") < F.col("sig_b"))
             .groupBy("sig_a", "sig_b")
             .agg(F.round(F.corr("ra", "rb"), round_to)
                   .alias("spearman"),
                  F.count(F.lit(1)).alias("n"))
             .orderBy("sig_a", "sig_b"))
