"""Exact two-sample distribution tests — Kolmogorov–Smirnov and
Mann–Whitney U — the drift detectors a corpus/feature monitoring
pipeline runs between two snapshots, sources, or time windows.

Reference parity: the reference engine (CityOfPhiladelphia/datum)
has no statistics surface; this extends the engine in the same
oracle-replayable style as the experimentation family (x139 / x226 /
x239).

Scale shape: both tests reduce the data to a PER-DISTINCT-VALUE
rollup (one hash shuffle; cardinality ≤ distinct metric values, the
natural compression of tied data), then need cumulative counts in
value order.  That prefix sum is computed the curriculum way
(`_global_position`'s discipline): range-partition by value,
per-partition subtotals (one row each — the only driver-side data),
broadcast the offsets back, and finish with a WITHIN-partition
running sum — never a global single-partition window.  Every
statistic is arithmetic over exact integer counts, so the DuckDB
oracles replay bit-for-bit (the one transcendental, KS's exp-bound
p-value, is rounded past any last-ulp libm difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_rollup(df: DataFrame, group_col: str, value_col: str,
                       a, num_partitions: int | None = None
                       ) -> DataFrame:
    """Per-distinct-value rollup with EXCLUSIVE cumulative counts:
    ``(v, ca, cb, cum_a, cum_b)`` where ``cum_*`` counts rows with a
    strictly smaller value.  ``a`` is the group value forming sample
    A; every other non-null group is B.  The cumulative sum is a
    distributed prefix sum (range partition → per-partition subtotals
    → broadcast offsets → within-partition window), so no task ever
    sees the whole value axis."""
    from ..session import default_parallelism
    from ..util import retain_cache

    flag = (F.col(group_col) == F.lit(a)).cast("long")
    roll = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isNotNull())
              .select(F.col(value_col).cast("double").alias("v"),
                      flag.alias("__a"))
              .groupBy("v")
              .agg(F.sum("__a").alias("ca"),
                   F.sum(F.lit(1) - F.col("__a")).alias("cb")))
    n = num_partitions or default_parallelism()
    d = retain_cache(roll.repartitionByRange(n, F.col("v"))
                         .withColumn("__pid", F.spark_partition_id()))
    parts = (d.groupBy("__pid")
              .agg(F.sum("ca").alias("sa"), F.sum("cb").alias("sb"))
              .collect())                     # ≤ num_partitions rows
    rows, oa, ob = [], 0, 0
    for r in sorted(parts, key=lambda r: r["__pid"]):
        rows.append((r["__pid"], oa, ob))
        oa += r["sa"] or 0
        ob += r["sb"] or 0
    off = d.sparkSession.createDataFrame(
        rows, "__pid int, __oa long, __ob long")
    w = (Window.partitionBy("__pid").orderBy("v")
               .rowsBetween(Window.unboundedPreceding, -1))
    return (d.join(F.broadcast(off), "__pid")
             .select("v", "ca", "cb",
                     (F.col("__oa")
                      + F.coalesce(F.sum("ca").over(w), F.lit(0)))
                     .alias("cum_a"),
                     (F.col("__ob")
                      + F.coalesce(F.sum("cb").over(w), F.lit(0)))
                     .alias("cum_b")))


def ks_2sample(df: DataFrame, group_col: str, value_col: str, a,
               round_to: int = 6) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov test: sample A = rows with
    ``group_col == a``, sample B = the rest.  Returns ONE row
    ``(n_a, n_b, d_stat, d_at, p_value)``:

        D    = sup_v |ECDF_A(v) − ECDF_B(v)|   (evaluated AT each
               distinct value, i.e. after consuming its ties),
        d_at = the smallest value attaining D,
        p    = min(1, 2·exp(−2·m·D²)),  m = n_a·n_b/(n_a+n_b)   (the
               standard one-term asymptotic bound).

    Every ECDF step is a ratio of exact integer counts; the argmax is
    a two-pass max-then-filter, not a window over the value axis."""
    c = _cumulative_rollup(df, group_col, value_col, a)
    tot = c.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    j = c.crossJoin(F.broadcast(tot))
    diff = F.abs((F.col("cum_a") + F.col("ca"))
                 / F.nullif(F.col("na").cast("double"), F.lit(0.0))
                 - (F.col("cum_b") + F.col("cb"))
                 / F.nullif(F.col("nb").cast("double"), F.lit(0.0)))
    per_v = j.select("v", "na", "nb", diff.alias("d"))
    mx = per_v.agg(F.max("d").alias("d_raw"))
    arg = (per_v.join(F.broadcast(mx), per_v["d"] == mx["d_raw"])
                .agg(F.min("v").alias("d_at"),
                     F.first("d_raw").alias("d_raw"),
                     F.first("na").alias("n_a"),
                     F.first("nb").alias("n_b")))
    m = (F.col("n_a").cast("double") * F.col("n_b")
         / (F.col("n_a") + F.col("n_b")).cast("double"))
    p = F.least(F.lit(1.0),
                F.lit(2.0) * F.exp(F.lit(-2.0) * m
                                   * F.col("d_raw") * F.col("d_raw")))
    return arg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("d_raw", round_to).alias("d_stat"),
        F.round("d_at", round_to).alias("d_at"),
        F.round(p, round_to).alias("p_value"))


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str, a,
                   round_to: int = 6) -> DataFrame:
    """Exact Mann–Whitney U (Wilcoxon rank-sum) with midrank ties and
    the tie-corrected normal approximation: sample A = rows with
    ``group_col == a``.  Returns ONE row ``(n_a, n_b, u_stat, z_stat,
    significant)``:

        midrank(v) = cum_before(v) + (t_v + 1)/2          (1-based),
        R_A  = Σ_v ca_v · midrank(v),
        U    = R_A − n_a(n_a+1)/2,
        σ²   = n_a·n_b/12 · [(N+1) − Σ(t³−t)/(N(N−1))],
        z    = (U − n_a·n_b/2) / σ,   significant ⇔ |z| > 1.96.

    Rank sums are integers-and-halves over exact counts — no FP-order
    hazard.  The verdict is z-based (neither engine ships erf, so a
    shared p spelling would mean duplicating a polynomial
    approximation for no analytical gain).  NULL z/verdict on a
    degenerate split (empty side or all values tied)."""
    c = _cumulative_rollup(df, group_col, value_col, a)
    t = F.col("ca") + F.col("cb")
    cumn = F.col("cum_a") + F.col("cum_b")
    midrank = cumn.cast("double") + (t.cast("double") + 1.0) / 2.0
    agg = c.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca").cast("double") * midrank).alias("ra"),
        F.sum(t.cast("double") * t * t - t.cast("double"))
         .alias("tie_term"))
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    nn = na + nb
    u = F.col("ra") - na * (na + 1.0) / 2.0
    var = (na * nb / 12.0
           * ((nn + 1.0)
              - F.col("tie_term")
                / F.nullif(nn * (nn - 1.0), F.lit(0.0))))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) & (sd > 0)
    z = F.when(ok, F.round((u - na * nb / 2.0) / F.nullif(sd, F.lit(0.0)),
                           round_to))
    return agg.select(
        "n_a", "n_b",
        F.round(u, round_to).alias("u_stat"),
        z.alias("z_stat"),
        F.when(z.isNotNull(), F.abs(z) > 1.96).alias("significant"))
