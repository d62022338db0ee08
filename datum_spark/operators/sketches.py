"""Count-min sketch — a fixed-size, re-aggregable frequency summary.

At 100 TB you cannot keep exact counts for an unbounded term universe,
but a CMS counter table is ``depth × width`` cells REGARDLESS of corpus
size, merges by cell-wise addition (shards/days/sources sum into one
sketch — the same re-aggregability contract as the HLL rollup in
extensions.py), and answers point frequency queries with a one-sided
error: estimates never undercount, and overshoot by at most
``e·N/width`` with probability ``1 − e^−depth``.

Hashing is the portable md5 bucket (``int(md5(salt-j-term)[:8],16)``)
rather than xxhash64 so the ENTIRE sketch — counters and estimates — is
a pure function of the data, reproducible bit-for-bit in any engine
with ``md5`` (the x59/x62 auditable-membership discipline applied to a
sketch; DuckDB re-derives it in the x104 oracle).

Plan shape: building is one partial-aggregated ``groupBy`` whose keys
are at most ``depth × width`` values — each task emits a bounded
combiner table, nothing data-proportional shuffles.  Estimation
broadcast-joins the tiny counter table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_bucket(term, j: int, width: int, salt: str):
    s = F.concat_ws("-", F.lit(salt), F.lit(str(j)), term)
    return (F.conv(F.substring(F.md5(s), 1, 8), 16, 10)
             .cast("long") % width)


def cms_build(df: DataFrame, term_col: str,
              depth: int = 4, width: int = 1024,
              salt: str = "cms", weight_col: str | None = None) -> DataFrame:
    """Counter table ``(row, bucket, n)`` from one occurrence per input
    row (or ``weight_col`` occurrences).  Merge sketches by unioning
    counter tables and re-grouping (cell-wise sum)."""
    t = F.col(term_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    cells = F.array(*[
        F.struct(F.lit(j).alias("row"),
                 _cms_bucket(t, j, width, salt).alias("bucket"))
        for j in range(depth)])
    return (df.select(F.explode(cells).alias("c"), w.alias("__w"))
              .groupBy(F.col("c.row").alias("row"),
                       F.col("c.bucket").alias("bucket"))
              .agg(F.sum("__w").cast("long").alias("n")))


def cms_estimate(counters: DataFrame, terms: DataFrame, term_col: str,
                 depth: int = 4, width: int = 1024,
                 salt: str = "cms", out_col: str = "est_n") -> DataFrame:
    """Point estimates for each term in ``terms``: min over the sketch
    rows of the counter at that term's bucket (absent cell = 0).  The
    counter table is broadcast — estimation is map-side on the term
    set."""
    t = F.col(term_col)
    probes = terms.select(
        "*", F.explode(F.array(*[
            F.struct(F.lit(j).alias("row"),
                     _cms_bucket(t, j, width, salt).alias("bucket"))
            for j in range(depth)])).alias("p"))
    joined = (probes.join(F.broadcast(counters),
                          (F.col("p.row") == F.col("row"))
                          & (F.col("p.bucket") == F.col("bucket")),
                          "left")
                    .withColumn("__n", F.coalesce(F.col("n"), F.lit(0))))
    keys = [c for c in terms.columns]
    return (joined.groupBy(*keys)
                  .agg(F.min("__n").alias(out_col)))
