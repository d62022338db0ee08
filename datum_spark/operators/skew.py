"""Skew-mitigation join: salt-and-replicate for hot keys.

AQE's skew-join splitting (enabled in session defaults) handles most skew at
runtime, but only for sort-merge joins it can observe; explicit salting is
the standing technique when a hot key would otherwise pin one task: the big
(probe) side scatters each row to one of ``salt`` sub-keys, the small
(build) side replicates every row to ALL sub-keys, and the join key becomes
(key, salt) — a hot key's rows now spread over ``salt`` tasks.

Cost model: build side inflates ×salt (choose salt ≈ hottest-key-share ×
shuffle-partitions, not more), probe side is unchanged. Result set is
identical to the unsalted join (verified by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: list[str] | str,
                how: str = "inner", salt: int = 8) -> DataFrame:
    """Equi-join with the build side replicated over ``salt`` sub-keys.

    ``big``'s salt is derived from a hash of its whole row (deterministic,
    partitioning-independent) — any uniform distribution works because the
    salt only spreads rows, it never changes match semantics.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                         F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(small_s, keys + ["__salt"], how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key_cols: list[str] | str,
                top: int = 10) -> DataFrame:
    """Hot-key diagnosis BEFORE a join/groupBy pins one task: per-key
    cardinality summary + the heaviest keys and a suggested salt
    factor for :func:`salted_join`.

    One summary row: ``n_rows``, ``n_keys``, ``max_n`` (heaviest key's
    rows), ``mean_n``, ``p99_n`` (exact), ``skew_ratio`` (max/mean —
    ≫1 means one task's input outweighs its peers), ``salt_factor``
    (ceil(skew_ratio), capped at 64 — replication cost grows with it),
    and ``top_keys`` (the ``top`` heaviest, '=' joined, as one scalar
    string so the row stays hashable).

    Scale shape: one map-combined count shuffle over the key (the same
    exchange the diagnosed join would do, but carrying (key, count)
    rows); the summary is a second tiny aggregation over counts, and
    the top-N is a TakeOrderedAndProject.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = (df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n")))
    tops = (counts.orderBy(F.col("__n").desc(),
                           *[F.col(k).asc() for k in keys])
                  .limit(top)
                  .select(F.concat_ws(
                      "=", *[F.col(k).cast("string") for k in keys],
                      F.col("__n").cast("string")).alias("__t")))
    top_str = (tops.agg(F.concat_ws(
        ",", F.collect_list("__t")).alias("top_keys")))
    summary = counts.agg(
        F.sum("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__n").alias("max_n"),
        F.round(F.avg("__n"), 4).alias("mean_n"),
        F.expr("percentile(__n, 0.99)").alias("__p99"),
        (F.max("__n") / F.avg("__n")).alias("__ratio"))
    return (summary.crossJoin(top_str)
            .select("n_rows", "n_keys", "max_n", "mean_n",
                    F.round("__p99", 4).alias("p99_n"),
                    F.round("__ratio", 4).alias("skew_ratio"),
                    F.least(F.ceil("__ratio"), F.lit(64))
                     .cast("int").alias("salt_factor"),
                    "top_keys"))
