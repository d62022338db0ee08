"""Event-stream analytics operators: per-user feature extraction, funnel
conversion, and cohort retention — the batch feature-engineering ops a
training pipeline runs over interaction logs (the streaming twins live in
``datum_spark.streaming``).

All three are plain groupBy/join/window compositions: one hash exchange on
``user_id`` each (the funnel joins two *pre-aggregated* per-user tables, so
nothing pairwise ever explodes), which is as shuffle-light as these
semantics get at 100 TB.  Skewed power users are handled by AQE skew-join
splitting; no driver-side state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_features(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """One feature row per user: activity volume, breadth, value moments,
    and lifetime span — a single partial-aggregating hash exchange."""
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct(type_col).alias("n_types"),
        F.sum(value_col).alias("sum_value"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (F.unix_timestamp(F.max(ts_col))
         - F.unix_timestamp(F.min(ts_col))).alias("span_s"),
    )


def funnel(events: DataFrame, step_a: str, step_b: str,
           within_s: int = 3600, user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Two-step funnel: per user, the FIRST ``step_a`` event and whether a
    ``step_b`` event follows it within ``within_s`` seconds.

    Both sides reduce to one row per user BEFORE the join (min-ts
    aggregates), so the join is 1:1 on ``user_id`` — never event×event.
    Returns one row per user who reached step A, with ``converted`` 0/1
    and the conversion delay in seconds (null if not converted).
    """
    a = (events.filter(F.col(type_col) == step_a)
               .groupBy(user_col).agg(F.min(ts_col).alias("ts_a")))
    b = events.filter(F.col(type_col) == step_b).select(
        user_col, F.col(ts_col).alias("ts_b"))
    # earliest qualifying B per user: join the per-user A row to B events,
    # keep B in (A, A+within], then min — the B side is filtered by type
    # first, so the join input is a small slice of the log
    joined = (a.join(b, user_col, "left")
               .withColumn("ok",
                           (F.col("ts_b") > F.col("ts_a"))
                           & (F.unix_timestamp("ts_b")
                              - F.unix_timestamp("ts_a") <= within_s))
               .withColumn("ts_b_ok",
                           F.when(F.col("ok"), F.col("ts_b"))))
    return (joined.groupBy(user_col, "ts_a")
            .agg(F.min("ts_b_ok").alias("ts_b"))
            .withColumn("converted",
                        F.when(F.col("ts_b").isNotNull(), 1).otherwise(0))
            .withColumn("delay_s",
                        F.unix_timestamp("ts_b")
                        - F.unix_timestamp("ts_a")))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      max_offset_days: int = 14) -> DataFrame:
    """Classic cohort retention: users grouped by their first active day,
    counted on each later day they return.

    Two aggregations: (user → cohort day) then
    ((cohort, offset) → distinct users).  Returns
    ``cohort_day, day_offset, n_users`` for offsets 0..max_offset_days.
    """
    days = events.select(user_col, F.to_date(ts_col).alias("day")).distinct()
    first = days.groupBy(user_col).agg(F.min("day").alias("cohort_day"))
    return (days.join(first, user_col)
            .withColumn("day_offset", F.datediff("day", "cohort_day"))
            .filter(F.col("day_offset") <= max_offset_days)
            .groupBy("cohort_day", "day_offset")
            .agg(F.countDistinct(user_col).alias("n_users")))


def debounce(events: DataFrame, key_cols: list[str] | None = None,
             ts_col: str = "ts", within_s: int = 300) -> DataFrame:
    """Collapse bursts: keep only the FIRST event of each gap-delimited
    burst per key — two events of the same key belong to one burst when
    they are within ``within_s`` seconds of the previous event (chained,
    i.e. the x15 sessionization grouping with a short gap), and only the
    burst opener survives.  The instrumentation-dedup step for click /
    retry / sensor logs where repeats within seconds are noise.

    One window shuffle on the key columns; the lag frame streams within
    sorted partitions — no self-join, no state beyond one previous row.  Ties on ``ts_col`` within a key are broken arbitrarily but
    deterministically only if the input has no exact-duplicate
    timestamps per key; pass a finer key when they exist.
    """
    from pyspark.sql import Window

    key_cols = key_cols if key_cols is not None else ["user_id", "event_type"]
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    # cast-to-double keeps the microsecond fraction (exact in a double up
    # to 2^53 µs); unix_timestamp would TRUNCATE to whole seconds and
    # mis-classify gaps within 1 s of the boundary
    gap = (F.col(ts_col).cast("double")
           - F.lag(F.col(ts_col).cast("double")).over(w))
    new_burst = F.when(gap.isNull() | (gap > within_s), 1).otherwise(0)
    return (events.withColumn("__nb", new_burst)
                  .filter(F.col("__nb") == 1)
                  .drop("__nb"))


def hourly_anomalies(events: DataFrame, type_col: str = "event_type",
                     ts_col: str = "ts",
                     z_thresh: float = 3.0) -> DataFrame:
    """Seasonal-baseline anomaly screen over an event stream: count
    events per (type, hour), build each type's HOUR-OF-DAY baseline
    (population mean/std of the observed hourly counts at that wall
    hour — the daily-seasonality profile), and z-score every hour
    against its own baseline.  ``is_anomaly`` flags |z| > ``z_thresh``
    (NULL z when the baseline is degenerate: one observation or zero
    variance).

    Returns ``(type_col, h, n, mu, sigma, z, is_anomaly)`` — ``mu``/
    ``sigma`` rounded 6 dp, ``z`` 4 dp.  Every statistic derives from
    exact INTEGER count sums (Σn, Σn² per baseline cell), so the
    result replays bit-for-bit in any engine — no float-order noise,
    no sampling.

    Baseline note: hours with ZERO events contribute no baseline row
    (the screen models observed-activity hours; a silent-hour detector
    needs the q32-style spine join first).

    Scale shape: one (type, hour) count aggregation (map-side
    combined, corpus-sized input → hours-sized output), one (type,
    hour-of-day) 24-row-per-type baseline aggregation, one
    hours-sized join back.  Nothing corpus-sized past the first
    exchange."""
    h = F.date_trunc("hour", F.col(ts_col))
    hourly = (events.groupBy(F.col(type_col).alias("__t"),
                             h.alias("h"))
                    .agg(F.count(F.lit(1)).alias("n")))
    hod = F.hour("h")
    base = (hourly.groupBy(F.col("__t").alias("__bt"),
                           hod.alias("__hod"))
                  .agg(F.count(F.lit(1)).alias("__m"),
                       F.sum("n").alias("__s1"),
                       F.sum(F.col("n") * F.col("n")).alias("__s2")))
    j = (hourly.join(base, (F.col("__t") == F.col("__bt"))
                     & (F.hour(F.col("h")) == F.col("__hod")))
               .select("__t", "h", "n", "__m", "__s1", "__s2"))
    m = F.col("__m").cast("double")
    mu = F.col("__s1") / m
    var = F.greatest(F.col("__s2") / m - mu * mu, F.lit(0.0))
    sigma = F.sqrt(var)
    z = F.when((F.col("__m") > 1) & (sigma > 0),
               F.round((F.col("n") - mu) / sigma, 4))
    return (j.select(F.col("__t").alias(type_col), "h", "n",
                     F.round(mu, 6).alias("mu"),
                     F.round(sigma, 6).alias("sigma"),
                     z.alias("z"))
             .withColumn("is_anomaly",
                         F.when(F.col("z").isNotNull(),
                                F.abs("z") > float(z_thresh))))


def ab_test_summary(events: DataFrame, user_col: str = "user_id",
                    type_col: str = "event_type",
                    exposure: str = "view",
                    conversion: str = "purchase",
                    salt: str = "ab") -> DataFrame:
    """Deterministic A/B experiment readout: split EXPOSED users into
    two variants by md5 bucket (``md5(salt-user) % 2`` — the repo's
    portable split discipline, reproducible from the data alone),
    measure each variant's conversion rate (exposed users with ≥ 1
    ``conversion`` event), and test the difference with the pooled
    two-proportion z statistic:

        z = (p_a − p_b) / sqrt(p(1−p)(1/n_a + 1/n_b)),  p pooled.

    Returns ONE row ``(n_a, conv_a, rate_a, n_b, conv_b, rate_b,
    z_stat, significant)`` — rates 6 dp, z 4 dp, ``significant`` =
    |z| > 1.96 (two-sided 5%); NULL z on a degenerate split (an empty
    variant or pooled rate 0/1).  Every input to the formula is an
    exact integer count, so the whole readout replays bit-for-bit.

    Scale shape: one distinct-user aggregation per role (exposure /
    conversion flags fold map-side), then a 2-row variant aggregate —
    nothing user-cardinality-sized leaves the first exchange."""
    from .sampling import md5_bucket

    bucket = md5_bucket(F.col(user_col), salt) % 2
    per_user = (events.filter(F.col(type_col).isin(exposure, conversion))
                .groupBy(user_col)
                .agg(F.max(F.when(F.col(type_col) == exposure, 1)
                           .otherwise(0)).alias("__e"),
                     F.max(F.when(F.col(type_col) == conversion, 1)
                           .otherwise(0)).alias("__c"))
                .filter(F.col("__e") == 1)
                .select(bucket.alias("__v"), "__c"))
    var = (per_user.groupBy("__v")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("__c").alias("conv")))
    row = var.agg(
        F.sum(F.when(F.col("__v") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("__v") == 0, F.col("conv"))).alias("conv_a"),
        F.sum(F.when(F.col("__v") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("__v") == 1, F.col("conv"))).alias("conv_b"))
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    se = F.sqrt(pool * (F.lit(1.0) - pool)
                * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0),
               F.round((pa - pb) / se, 4))
    return (row.withColumn("rate_a", F.round(pa, 6))
               .withColumn("rate_b", F.round(pb, 6))
               .withColumn("z_stat", z)
               .withColumn("significant",
                           F.when(F.col("z_stat").isNotNull(),
                                  F.abs("z_stat") > 1.96))
               .select("n_a", "conv_a", "rate_a", "n_b", "conv_b",
                       "rate_b", "z_stat", "significant"))


def cuped_summary(events: DataFrame, cut_ts: str,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  salt: str = "cuped") -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM 2013 —
    the industry-standard experiment sensitivity boost): each user's
    PRE-period metric X (activity before ``cut_ts``) de-noises their
    EXPERIMENT-period metric Y via

        Y_adj = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X),

    with θ pooled over ALL users (X predates assignment, so pooling
    is unbiased).  Arms come from the repo's portable md5 bucket
    (``md5(salt-user) % 2``).  Returns ONE row: ``(n_users, n_treat,
    n_ctrl, theta, diff_raw, diff_cuped, var_reduction_pct)`` —
    ``diff_cuped = diff_raw − θ·(mean_x_treat − mean_x_ctrl)`` and
    ``var_reduction_pct = 100·ρ²(X,Y)``, the theoretical variance cut.
    NULL θ/diff_cuped/reduction when var(X) or var(Y) is 0 or a split
    side is empty.

    Numeric discipline: per-user X/Y are 4-dp-rounded (collapsing
    cross-engine partial-sum noise at the user grain), the global
    moments are plain SUM aggregates over those rounded values, and
    outputs round at 6/4 dp — the same convention as the repo's other
    moment-based oracles.  Scale shape: one user-grain aggregation
    (map-side partial), then a single 1-row moment aggregate; nothing
    user-cardinality-sized crosses the second exchange."""
    from .sampling import md5_bucket

    cut = F.lit(cut_ts).cast("timestamp")
    bucket = md5_bucket(F.col(user_col), salt) % 2
    per_user = (events.filter(F.col(value_col).isNotNull())
                .groupBy(user_col)
                .agg(F.round(F.coalesce(F.sum(
                        F.when(F.col(ts_col) < cut,
                               F.col(value_col))), F.lit(0.0)), 4)
                      .alias("__x"),
                     F.round(F.coalesce(F.sum(
                        F.when(F.col(ts_col) >= cut,
                               F.col(value_col))), F.lit(0.0)), 4)
                      .alias("__y"))
                .select(bucket.alias("__t"), "__x", "__y"))
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__t")).alias("n_t"),
        F.sum("__x").alias("sx"), F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.when(F.col("__t") == 1, F.col("__x"))).alias("stx"),
        F.sum(F.when(F.col("__t") == 1, F.col("__y"))).alias("sty"),
        F.sum(F.when(F.col("__t") == 0, F.col("__x"))).alias("scx"),
        F.sum(F.when(F.col("__t") == 0, F.col("__y"))).alias("scy"))
    nd = F.col("n").cast("double")
    nt = F.col("n_t").cast("double")
    nc = nd - nt
    var_x = F.try_divide(F.col("sxx") - F.col("sx") * F.col("sx") / nd,
                         nd - F.lit(1.0))
    var_y = F.try_divide(F.col("syy") - F.col("sy") * F.col("sy") / nd,
                         nd - F.lit(1.0))
    cov = F.try_divide(F.col("sxy") - F.col("sx") * F.col("sy") / nd,
                       nd - F.lit(1.0))
    theta = F.try_divide(cov, F.nullif(var_x, F.lit(0.0)))
    ok_split = (nt > 0) & (nc > 0)
    diff_raw = F.when(ok_split,
                      F.col("sty") / nt - F.col("scy") / nc)
    diff_x = F.col("stx") / nt - F.col("scx") / nc
    diff_cuped = F.when(ok_split, diff_raw - theta * diff_x)
    rho2 = F.try_divide(cov * cov,
                        F.nullif(var_x * var_y, F.lit(0.0)))
    return m.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n_t").cast("long").alias("n_treat"),
        (F.col("n") - F.col("n_t")).cast("long").alias("n_ctrl"),
        F.round(theta, 6).alias("theta"),
        F.round(diff_raw, 6).alias("diff_raw"),
        F.round(diff_cuped, 6).alias("diff_cuped"),
        F.round(F.lit(100.0) * rho2, 4).alias("var_reduction_pct"))
