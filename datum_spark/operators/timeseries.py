"""Order-sensitive time-series folds: EWMA smoothing, one-step
forecast error, and CUSUM changepoint screens as exact per-key left
folds.

Reference parity: the reference engine (CityOfPhiladelphia/datum)
exposes no time-series surface; this module extends the engine for
event-stream curation (drift/anomaly screens over the ``events``
table) in the same oracle-replayable style as the rest of the repo.

Shape at 100 TB: ONE hash shuffle on the series key — the same bound
as sessionization.  ``collect_list`` gathers each entity's points into
one task, ``sort_array`` fixes a total order (ts, then a unique
tie-break column), and a single O(n) ``F.aggregate`` left fold runs
the recursion JVM-side: no Python, no O(n²) self-join, no global
window, no per-row UDF.  Per-key series length is the only memory
bound (per-entity event counts — the documented sessionize bound); the
rollup output is one row per key.

Determinism: the folds are plain IEEE-754 double chains evaluated in a
fixed order, so a DuckDB ``list_reduce`` replaying the identical
operation order over the identically-sorted array reproduces them
bit-for-bit.  The x237/x238 oracle entries grade exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sorted_vals(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str, tie_col: str) -> DataFrame:
    """Per-key array of values in (ts, tie) order; null values dropped
    so both engines fold the same sequence."""
    rec = F.struct(F.col(ts_col).alias("t"), F.col(tie_col).alias("e"),
                   F.col(value_col).cast("double").alias("v"))
    return (df.filter(F.col(value_col).isNotNull())
              .groupBy(key_col)
              .agg(F.sort_array(F.collect_list(rec)).alias("recs"))
              .select(key_col,
                      F.transform("recs", lambda r: r["v"]).alias("vals")))


def _ewma_fold(vals: Column, alpha: float,
               seed_s: Column | None = None,
               seed_e: Column | None = None) -> Column:
    """Left fold of s_t = (1-a)*s_{t-1} + a*x_t with s_1 = x_1, carrying
    the absolute one-step forecast error sum.  Null-seeded so the first
    element initialises the state through coalesce — the same trick the
    DuckDB oracle uses with a prepended ``{s: NULL, e: 0.0}`` record.

    ``seed_s``/``seed_e`` (optional Columns) CONTINUE a prior fold
    instead of starting one: with a non-null ``seed_s`` the first
    element is treated as a forecast step from that level — exactly
    the state a batch fold would carry at that point, which is what
    makes the streaming twin (``streaming.stateful.ewma_sink``) equal
    its batch recompute.  A null ``seed_s`` degrades to a fresh fold,
    so one code path serves both."""
    packed = F.transform(
        vals, lambda v: F.struct(v.alias("s"), F.lit(0.0).alias("e")))
    init = F.struct(
        (seed_s if seed_s is not None
         else F.lit(None).cast("double")).cast("double").alias("s"),
        (seed_e if seed_e is not None
         else F.lit(0.0)).cast("double").alias("e"))
    a = float(alpha)
    return F.aggregate(
        packed, init,
        lambda acc, x: F.struct(
            F.coalesce(F.lit(1.0 - a) * acc["s"] + F.lit(a) * x["s"],
                       x["s"]).alias("s"),
            (acc["e"] + F.coalesce(F.abs(x["s"] - acc["s"]),
                                   F.lit(0.0))).alias("e")))


def ewma_summary(df: DataFrame, key_col: str, ts_col: str,
                 value_col: str, alpha: float = 0.3,
                 tie_col: str = "event_id",
                 round_to: int = 6) -> DataFrame:
    """Per-key EWMA rollup: ``(key, n_events, ewma_last, mae_1step)``.

    ``ewma_last`` is the final smoothed level (pandas
    ``ewm(alpha, adjust=False)`` semantics); ``mae_1step`` the mean
    absolute one-step-ahead forecast error |x_t − s_{t−1}| over t ≥ 2
    (NULL for single-point series) — the series' self-predictability,
    the screen behind "did this entity's behaviour drift".
    """
    s = _sorted_vals(df, key_col, ts_col, value_col, tie_col)
    r = _ewma_fold(F.col("vals"), alpha)
    n = F.size("vals")
    return (s.select(key_col, n.cast("long").alias("n_events"),
                     r.alias("_r"))
             .select(key_col, "n_events",
                     F.round(F.col("_r.s"), round_to).alias("ewma_last"),
                     F.when(F.col("n_events") > 1,
                            F.round(F.col("_r.e")
                                    / (F.col("n_events") - F.lit(1.0)),
                                    round_to)).alias("mae_1step"))
             .orderBy(key_col))


def ewma(df: DataFrame, key_col: str, ts_col: str, value_col: str,
         alpha: float = 0.3, tie_col: str = "event_id",
         out_col: str = "ewma") -> DataFrame:
    """Per-ROW running EWMA: returns ``(key, ts, tie, value, out_col)``
    with one row per non-null input point, ``out_col`` the smoothed
    level AT that point.  Same single-shuffle fold as
    :func:`ewma_summary`, carrying the running array in the accumulator
    and exploding it back against the sorted records.
    """
    rec = F.struct(F.col(ts_col).alias("t"), F.col(tie_col).alias("e"),
                   F.col(value_col).cast("double").alias("v"))
    g = (df.filter(F.col(value_col).isNotNull())
           .groupBy(key_col)
           .agg(F.sort_array(F.collect_list(rec)).alias("recs")))
    a = float(alpha)
    init = F.struct(F.lit(None).cast("double").alias("s"),
                    F.array().cast("array<double>").alias("arr"))
    folded = F.aggregate(
        F.transform("recs", lambda r: r["v"]), init,
        lambda acc, v: F.struct(
            F.coalesce(F.lit(1.0 - a) * acc["s"] + F.lit(a) * v,
                       v).alias("s"),
            F.array_append(
                acc["arr"],
                F.coalesce(F.lit(1.0 - a) * acc["s"] + F.lit(a) * v,
                           v)).alias("arr")))
    z = g.select(key_col,
                 F.arrays_zip("recs", folded["arr"].alias("sm"))
                  .alias("zipped"))
    e = z.select(key_col, F.explode("zipped").alias("p"))
    return e.select(key_col,
                    F.col("p.recs.t").alias(ts_col),
                    F.col("p.recs.e").alias(tie_col),
                    F.col("p.recs.v").alias(value_col),
                    F.col("p.sm").alias(out_col))


def _cusum_fold(vals: Column, mu: Column, sd: Column,
                slack: float, threshold: float,
                seed=None, idx_offset: Column | None = None) -> Column:
    """The CUSUM left fold over a sorted value array: state struct
    ``(g, al, fi, gm)`` = (running statistic, alarm count, first-alarm
    1-based position, max statistic).  ``seed`` (optional struct
    Column) CONTINUES a prior fold — the state a batch fold would
    carry at that point, which is what makes the streaming sink
    (``streaming.stateful.cusum_sink``) equal its batch recompute;
    ``idx_offset`` shifts element positions so ``fi`` stays a
    whole-stream index across batches."""
    k, h = float(slack), float(threshold)
    off = idx_offset if idx_offset is not None else F.lit(0)
    elems = F.transform(
        vals,
        lambda x, i: F.struct(
            ((x - mu) / F.nullif(sd, F.lit(0.0))
             - F.lit(k)).alias("g"),
            F.lit(0).cast("long").alias("al"),
            (i + F.lit(1) + off).cast("long").alias("fi"),
            F.lit(0.0).alias("gm")))
    init = seed if seed is not None else F.struct(
        F.lit(0.0).alias("g"),
        F.lit(0).cast("long").alias("al"),
        F.lit(0).cast("long").alias("fi"),
        F.lit(0.0).alias("gm"))

    def merge(acc, e):
        g2 = F.greatest(F.lit(0.0), acc["g"] + e["g"])
        hit = (g2 > F.lit(h))
        return F.struct(
            g2.alias("g"),
            (acc["al"] + hit.cast("long")).alias("al"),
            F.when(acc["fi"] > 0, acc["fi"])
             .when(hit, e["fi"]).otherwise(F.lit(0).cast("long"))
             .alias("fi"),
            F.greatest(acc["gm"], g2).alias("gm"))

    return F.aggregate(elems, init, merge)


def cusum_reference(df: DataFrame, key_col: str, ts_col: str,
                    value_col: str,
                    tie_col: str = "event_id") -> DataFrame:
    """Per-key reference moments ``(key, mu, sd)`` from a calibration
    window — the deployment mode of Page's CUSUM: freeze μ/σ on an
    in-control period, then monitor new data against them (the
    self-calibrating :func:`cusum_summary` is the retrospective
    audit).  Computed by the same sorted-array fold, so they are
    engine-reproducible; σ=0 / n<2 keys carry sd NULL (consumers skip
    them)."""
    s = _sorted_vals(df, key_col, ts_col, value_col, tie_col)
    vals = F.col("vals")
    nd = F.size(vals).cast("double")
    s1 = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(F.transform(vals, lambda x: x * x), F.lit(0.0),
                     lambda a, x: a + x)
    m = s.select(key_col, nd.alias("nd"), s1.alias("s1"),
                 s2.alias("s2"))
    mu = F.col("s1") / F.col("nd")
    var = F.try_divide(F.col("s2") - F.col("s1") * F.col("s1")
                       / F.col("nd"),
                       F.col("nd") - F.lit(1.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return m.select(key_col, mu.alias("mu"),
                    F.nullif(sd, F.lit(0.0)).alias("sd"))


def cusum_monitor(df: DataFrame, ref: DataFrame, key_col: str,
                  ts_col: str, value_col: str, slack: float = 0.5,
                  threshold: float = 4.0, tie_col: str = "event_id",
                  round_to: int = 6) -> DataFrame:
    """Batch CUSUM against FIXED reference moments (the
    :func:`cusum_reference` contract): per key, fold the
    (ts, tie)-sorted values with the reference μ/σ.  Returns
    ``(key, n_events, n_alarms, first_alarm, g_max)``; keys missing
    from ``ref`` (or with NULL sd) report zero alarms and NULL stats.
    This is the batch twin the streaming ``cusum_sink`` is
    parity-tested against."""
    s = _sorted_vals(df, key_col, ts_col, value_col, tie_col)
    m = s.join(ref.select(key_col, "mu", "sd"), key_col, "left")
    folded = _cusum_fold(F.col("vals"), F.col("mu"), F.col("sd"),
                         slack, threshold)
    ok = F.col("sd").isNotNull()
    return (m.select(key_col,
                     F.size("vals").cast("long").alias("n_events"),
                     ok.alias("_ok"), folded.alias("_f"))
             .select(key_col, "n_events",
                     F.when(F.col("_ok"), F.col("_f.al"))
                      .otherwise(F.lit(0).cast("long"))
                      .alias("n_alarms"),
                     F.when(F.col("_ok") & (F.col("_f.fi") > 0),
                            F.col("_f.fi")).alias("first_alarm"),
                     F.when(F.col("_ok"),
                            F.round(F.col("_f.gm"), round_to))
                      .alias("g_max"))
             .orderBy(key_col))


def cusum_summary(df: DataFrame, key_col: str, ts_col: str,
                  value_col: str, slack: float = 0.5,
                  threshold: float = 4.0, tie_col: str = "event_id",
                  round_to: int = 6) -> DataFrame:
    """Per-key one-sided (upward) standardized CUSUM changepoint screen:
    ``(key, n_events, n_alarms, first_alarm, g_max)``.

    g_0 = 0;  g_t = max(0, g_{t−1} + (x_t − μ)/σ − slack);  an alarm is
    any t with g_t > threshold (Page 1954 in its standardized textbook
    form).  μ/σ are the key's own sample moments, computed by the SAME
    sorted-array fold on both engines so the standardization — and
    therefore every threshold comparison — is bit-identical; keys with
    n < 2 or σ = 0 report zero alarms and NULL statistics.
    ``first_alarm`` is the 1-based position of the first alarm in
    (ts, tie) order, NULL if none.
    """
    s = _sorted_vals(df, key_col, ts_col, value_col, tie_col)
    vals = F.col("vals")
    nd = F.size(vals).cast("double")
    s1 = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(F.transform(vals, lambda x: x * x), F.lit(0.0),
                     lambda a, x: a + x)
    m = s.select(key_col, vals.alias("vals"), nd.alias("nd"),
                 s1.alias("s1"), s2.alias("s2"))
    mu = F.col("s1") / F.col("nd")
    # try_divide: NULL (not an ANSI error) for single-point series; the
    # σ=0 keys then null their standardized deltas through nullif —
    # both gated out of the output by the _ok flag below.
    var = F.try_divide(F.col("s2") - F.col("s1") * F.col("s1")
                       / F.col("nd"),
                       F.col("nd") - F.lit(1.0))
    m = m.select(key_col, "vals", "nd", mu.alias("mu"),
                 F.sqrt(F.greatest(var, F.lit(0.0))).alias("sd"))
    k, h = float(slack), float(threshold)
    folded = _cusum_fold(F.col("vals"), F.col("mu"), F.col("sd"),
                         k, h)
    ok = (F.col("nd") >= 2) & (F.col("sd") > 0)
    return (m.select(key_col, F.col("nd").cast("long").alias("n_events"),
                     ok.alias("_ok"), folded.alias("_f"))
             .select(key_col, "n_events",
                     F.when(F.col("_ok"), F.col("_f.al"))
                      .otherwise(F.lit(0).cast("long")).alias("n_alarms"),
                     F.when(F.col("_ok") & (F.col("_f.fi") > 0),
                            F.col("_f.fi")).alias("first_alarm"),
                     F.when(F.col("_ok"),
                            F.round(F.col("_f.gm"), round_to))
                      .alias("g_max"))
             .orderBy(key_col))
