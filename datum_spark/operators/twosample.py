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


def _value_prefix(roll: DataFrame, count_cols: list[str],
                  num_partitions: int | None = None) -> DataFrame:
    """EXCLUSIVE cumulative sums of ``count_cols`` over a rollup keyed
    by value column ``v`` — the curriculum-style distributed prefix
    sum: range-partition by v, per-partition subtotals (one row each,
    the only driver-side data), broadcast the offsets back, finish
    with a WITHIN-partition running window.  Adds ``cum_<c>`` (count
    of rows with strictly smaller v) for each input column."""
    from ..session import default_parallelism
    from ..util import retain_cache

    n = num_partitions or default_parallelism()
    d = retain_cache(roll.repartitionByRange(n, F.col("v"))
                         .withColumn("__pid", F.spark_partition_id()))
    parts = (d.groupBy("__pid")
              .agg(*[F.sum(c).alias(c) for c in count_cols])
              .collect())                     # ≤ num_partitions rows
    rows, acc = [], {c: 0 for c in count_cols}
    for r in sorted(parts, key=lambda r: r["__pid"]):
        rows.append((r["__pid"], *[acc[c] for c in count_cols]))
        for c in count_cols:
            acc[c] += r[c] or 0
    off = d.sparkSession.createDataFrame(
        rows, ", ".join(["__pid int"]
                        + [f"__off_{c} long" for c in count_cols]))
    w = (Window.partitionBy("__pid").orderBy("v")
               .rowsBetween(Window.unboundedPreceding, -1))
    out = d.join(F.broadcast(off), "__pid")
    for c in count_cols:
        out = out.withColumn(
            f"cum_{c}",
            F.col(f"__off_{c}")
            + F.coalesce(F.sum(c).over(w), F.lit(0)))
    return out.drop("__pid", *[f"__off_{c}" for c in count_cols])


def _cumulative_rollup(df: DataFrame, group_col: str, value_col: str,
                       a, num_partitions: int | None = None
                       ) -> DataFrame:
    """Per-distinct-value rollup with EXCLUSIVE cumulative counts:
    ``(v, ca, cb, cum_a, cum_b)`` where ``cum_*`` counts rows with a
    strictly smaller value.  ``a`` is the group value forming sample
    A; every other non-null group is B."""
    flag = (F.col(group_col) == F.lit(a)).cast("long")
    roll = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isNotNull())
              .select(F.col(value_col).cast("double").alias("v"),
                      flag.alias("__a"))
              .groupBy("v")
              .agg(F.sum("__a").alias("ca"),
                   F.sum(F.lit(1) - F.col("__a")).alias("cb")))
    return (_value_prefix(roll, ["ca", "cb"], num_partitions)
            .select("v", "ca", "cb",
                    F.col("cum_ca").alias("cum_a"),
                    F.col("cum_cb").alias("cum_b")))


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


def grouped_ks_screen(df: DataFrame, group_col: str, value_col: str,
                      alpha: float = 0.05,
                      round_to: int = 6) -> DataFrame:
    """Multi-group drift screen with FDR control: an exact two-sample
    KS test of EVERY group against the rest of the corpus in ONE
    pass, then Benjamini–Hochberg across the group battery — the
    monitoring sweep ("which source/type drifted?") where per-group
    p-values multiply into false alarms without FDR control.

    Per group g, D_g = sup over the POOLED value axis of
    |ECDF_g − ECDF_rest|.  The group's rollup only has rows at the
    group's OWN values, but its ECDF is flat between them while the
    rest's keeps moving — so each (g, v) row contributes TWO
    candidates: the inclusive diff AT v (right after g's jump) and
    the exclusive pre-jump diff (the rest's high-water point just
    before g jumps).  Together they cover every pooled candidate;
    ``p_g = min(1, 2·exp(−2·m_g·D_g²))``, ``m_g = n_g(N−n_g)/N``,
    then BH step-up: flag every group with rank ≤ max{k : p_(k) ≤
    k·alpha/G}.  Returns one row per group: ``(group, n, d_stat,
    p_value, bh_rank, bh_cutoff, flagged)`` ordered by p then group.

    Scale shape: one hash shuffle to the (group, value) rollup; the
    global cumulative uses the distributed prefix sum
    (:func:`_value_prefix`), the per-group cumulative a window
    partitioned by group over the rollup (bounded by per-group
    distinct values — quantize first for continuous metrics, the
    CCNet histogram discipline); the BH pass runs on G rows (the
    bounded group count).  All counts exact integers; the oracle
    replays everything."""
    roll = (df.filter(F.col(value_col).isNotNull()
                      & F.col(group_col).isNotNull())
              .select(F.col(group_col).alias("g"),
                      F.col(value_col).cast("double").alias("v"))
              .groupBy("g", "v")
              .agg(F.count(F.lit(1)).alias("c")))
    # per-value totals across ALL groups (the complement's numerator),
    # with exclusive global cumulative via the distributed prefix sum
    allv = _value_prefix(
        roll.groupBy("v").agg(F.sum("c").alias("ct")), ["ct"])
    tot = roll.groupBy("g").agg(F.sum("c").alias("n"))
    nn = tot.agg(F.sum("n").alias("__N"))
    wg = (Window.partitionBy("g").orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0))
    per = (roll.withColumn("cum_g", F.sum("c").over(wg))
               .join(allv.select("v", "ct", "cum_ct"), "v")
               .join(F.broadcast(tot), "g")
               .crossJoin(F.broadcast(nn)))
    ng = F.col("n").cast("double")
    nrest = F.nullif((F.col("__N") - F.col("n")).cast("double"),
                     F.lit(0.0))
    inc_all = F.col("cum_ct") + F.col("ct")       # inclusive at v
    d_inc = F.abs(F.col("cum_g") / ng
                  - (inc_all - F.col("cum_g")) / nrest)
    exc_g = F.col("cum_g") - F.col("c")           # before g's jump
    d_exc = F.abs(exc_g / ng
                  - (F.col("cum_ct") - exc_g) / nrest)
    per_g = (per.select("g", "n", "__N",
                        F.greatest(d_inc, d_exc).alias("d"))
                .groupBy("g", "n", "__N")
                .agg(F.max("d").alias("d_raw")))
    m = (F.col("n").cast("double")
         * (F.col("__N") - F.col("n"))
         / F.col("__N").cast("double"))
    p = F.least(F.lit(1.0),
                F.lit(2.0) * F.exp(F.lit(-2.0) * m
                                   * F.col("d_raw") * F.col("d_raw")))
    scored = per_g.select("g", F.col("n").cast("long").alias("n"),
                          F.round("d_raw", round_to).alias("d_stat"),
                          F.round(p, round_to).alias("p_value"))
    # BH step-up over the G-row battery (bounded group count)
    wp = Window.orderBy("p_value", "g")
    gcount = Window.partitionBy()
    ranked = scored.select(
        "*", F.row_number().over(wp).alias("bh_rank"),
        F.count(F.lit(1)).over(gcount).alias("__G"))
    cutoff = (F.col("bh_rank").cast("double") * F.lit(float(alpha))
              / F.col("__G").cast("double"))
    ranked = ranked.withColumn("bh_cutoff", F.round(cutoff, round_to)) \
                   .withColumn("__pass",
                               (F.col("p_value") <= cutoff)
                               .cast("long"))
    kmax = (Window.partitionBy()
                  .rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing))
    ranked = ranked.withColumn(
        "__kmax", F.max(F.when(F.col("__pass") == 1,
                               F.col("bh_rank"))).over(kmax))
    return (ranked.select(
                F.col("g").alias(group_col), "n", "d_stat", "p_value",
                "bh_rank", "bh_cutoff",
                F.coalesce(F.col("bh_rank") <= F.col("__kmax"),
                           F.lit(False)).alias("flagged"))
                  .orderBy("bh_rank"))
