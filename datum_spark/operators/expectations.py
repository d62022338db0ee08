"""Data-quality expectations: declarative row-level rules validated in ONE
aggregation pass — the ingest gate a training pipeline runs before letting
a batch into the corpus.

Not in the reference (its only validation was column-name checks on write,
``datum/postgis/table.py:216-222``); north-star extension.  Scale shape:
every rule compiles to a ``SUM(CASE WHEN NOT cond THEN 1 END)`` inside a
single partial+final aggregate over one scan — N rules cost one pass, not
N passes; nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Evaluate ``{rule_name: sql_condition}`` over ``df`` in one pass.

    Returns one row per rule: ``(rule, n_violations, violation_rate)``.
    A NULL condition result counts as a violation (SQL three-valued logic
    would otherwise let NULLs slip through every check).
    """
    if not rules:
        raise ValueError("no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name in rules:
        cond = F.expr(rules[name])
        aggs.append(F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1)
                          .otherwise(0)).alias(name))
    row = df.agg(*aggs)
    spark = df.sparkSession
    total = F.col("__n")
    stacked = row.select(F.stack(
        F.lit(len(rules)),
        *[x for name in rules
          for x in (F.lit(name), F.col(name).cast("long"))]
    ).alias("rule", "n_violations"), total.alias("__n"))
    return (stacked.select(
                "rule", "n_violations",
                F.when(F.col("__n") > 0,
                       F.round(F.col("n_violations") / F.col("__n"), 6))
                 .otherwise(F.lit(0.0)).alias("violation_rate"))
            .orderBy("rule"))


def enforce_expectations(df: DataFrame, rules: dict[str, str],
                         quarantine: bool = False):
    """Filter to rows passing EVERY rule.

    ``quarantine=True`` returns ``(good, bad)`` where ``bad`` carries a
    ``failed_rules`` array naming each violated rule — the reviewable
    reject-file pattern.  Map-only (one scan, no shuffle).
    """
    if not rules:
        raise ValueError("no rules given")
    conds = {name: F.coalesce(F.expr(cond), F.lit(False))
             for name, cond in rules.items()}
    all_ok = None
    for c in conds.values():
        all_ok = c if all_ok is None else (all_ok & c)
    good = df.filter(all_ok)
    if not quarantine:
        return good
    failed = F.filter(
        F.array(*[F.when(~c, F.lit(name)) for name, c in conds.items()]),
        lambda v: v.isNotNull())
    bad = (df.withColumn("failed_rules", failed)
             .filter(F.size("failed_rules") > 0))
    return good, bad
