"""Quiet-box isolation probe for q18_lag (VERDICT r9 item 7).

q18's plan did not change in r9 yet its quiet-bench read moved
0.24 s (r8) → 0.55 s (r9), the suite's worst baseline ratio (1.74×).
This probe answers "did q18 actually regress?" with a median-of-5
after a warm-up, run on an otherwise idle box, plus the same
measurement for two neighbors (q17/q19 — same window-function family)
as controls.

Run: python scripts/probe_q18.py   (prints one JSON doc)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from datum_spark import tierb
    from datum_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="probe_q18")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        load_pre = round(os.getloadavg()[0], 2)
    except OSError:
        load_pre = -1.0
    out = {"metric": "q18_isolation", "unit": "sec",
           "load_pre": load_pre, "queries": {}}
    for name in ("q17_rank_window", "q18_lag", "q19_running_sum"):
        fn = tierb.QUERIES[name][0]
        fn(spark, sf_dir).collect()           # warm-up
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        out["queries"][name] = {
            "median5": round(statistics.median(samples), 4),
            "min": min(samples), "max": max(samples),
            "samples": samples}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
