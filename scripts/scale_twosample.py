"""Scale probe for the two-sample drift tests (SCALE.md §33 evidence).

The claim under test: `ks_2sample` / `mann_whitney_u` /
`grouped_ks_screen` cost one hash shuffle to the per-distinct-value
rollup plus the distributed prefix sum — wall should grow ~linearly in
rows whether values are heavily tied (rollup ≪ rows: the compressed
axis does the work) or nearly continuous (rollup ≈ rows: the prefix
sum still never funnels the axis through one task).

Fixture: md5-deterministic uniforms, group 'b' carries a +0.1 shift;
`ties` quantizes to 2 decimals (≈100 distinct values per unit).

Run: python scripts/scale_twosample.py [rows_csv]  (default
100000,400000,1600000).  Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.twosample import (  # noqa: E402
    grouped_ks_screen,
    ks_2sample,
    mann_whitney_u,
)
from datum_spark.session import get_session  # noqa: E402


def data(spark, n: int, tied: bool):
    base = spark.range(n)
    u = (F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.lit("ts2"), F.col("id"))), 1, 8), 16, 10)
          .cast("double") / F.lit(4294967296.0))
    g = F.when(F.col("id") % 2 == 0, "a").otherwise("b")
    v = u + F.when(g == "b", F.lit(0.1)).otherwise(F.lit(0.0))
    if tied:
        v = F.round(v, 2)
    return base.select(g.alias("g"), v.alias("v"))


def run(spark, n: int, tied: bool):
    df = data(spark, n, tied).persist()
    df.count()
    t0 = time.time()
    ks = ks_2sample(df, "g", "v", "a").collect()[0]
    t1 = time.time()
    mann_whitney_u(df, "g", "v", "a").collect()
    t2 = time.time()
    grouped_ks_screen(df, "g", "v").collect()
    t3 = time.time()
    df.unpersist()
    return {"rows": n, "tied": tied,
            "ks_sec": round(t1 - t0, 2),
            "mw_sec": round(t2 - t1, 2),
            "screen_sec": round(t3 - t2, 2),
            "d_stat": ks["d_stat"]}


def main():
    sizes = [int(x) for x in
             (sys.argv[1] if len(sys.argv) > 1
              else "100000,400000,1600000").split(",")]
    spark = get_session(app_name="scale_twosample")
    out = {"tied_2dp": [run(spark, n, True) for n in sizes],
           "continuous": [run(spark, n, False) for n in sizes]}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
