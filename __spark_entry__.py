"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join (t2 Q10, TPC-H Q5 skeleton) at
sf0.001.  ``queries()`` exposes every implemented operator from SURVEY.md §2
(Tier-B Q01–Q31 + §2-C extensions x01–x58); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for each hash-checkable entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datum_spark import extensions, tierb


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tierb.QUERIES["q10_star_join"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tierb.queries())
    out.update(extensions.queries())
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tierb.oracle_sql())
    out.update(extensions.oracle_sql())
    return out
