"""Profile named ``queries()`` entries: capture ``explain("formatted")``
to ``plans/r14/<name>_<tag>.txt`` and time reps with the bench's own
methodology (``.collect()``, median of reps after one warm-up, operator
caches cleared between entries).

Usage: ``python scripts/profile_entries.py <tag> <name> [name ...]``
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     SPARK_GRAFT_PROFILE_REPS (default 3).
Writes one JSON line per entry to stdout and a summary to
``/tmp/profile_<tag>.json``.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))

    import __spark_entry__ as entry_mod
    from datum_spark.session import get_session
    from datum_spark.util import clear_operator_caches

    spark = get_session(app_name=f"profile_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        clear_operator_caches()
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        spark.sparkContext.setJobDescription(f"{name} [{tag}] warmup")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        df.collect()
        samples = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] rep{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        med = round(statistics.median(samples), 4)
        out[name] = med
        print(json.dumps({"name": name, "median": med,
                          "samples": [round(s, 3) for s in samples]}),
              flush=True)
    with open(f"/tmp/profile_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
