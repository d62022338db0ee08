"""In-process interleaved A/B: one shared JVM, two datum_spark package
roots, alternating variant per rep so JIT state, page cache and box
drift hit both variants equally.

Variant roots: "wt" = this repo's working tree, "head" = a detached
`git worktree` of HEAD (pass its path).  Between runs every
datum_spark*/ __spark_entry__ module is purged from sys.modules and
re-imported from the variant root, so each variant builds its own
plans; the SparkSession (JIT-warm JVM) is shared.

Usage: python scripts/ab_inproc.py <head_root> <reps_per_variant> \
           <name> [name ...]
Writes /tmp/ab_inproc.json.
"""
from __future__ import annotations

import importlib
import json
import os
import statistics
import sys
import time

WT_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def purge_modules() -> None:
    for m in list(sys.modules):
        if m == "__spark_entry__" or m == "datum_spark" \
                or m.startswith("datum_spark."):
            del sys.modules[m]


def load_variant(root: str):
    purge_modules()
    sys.path = [p for p in sys.path if p not in (WT_ROOT,)
                and not p.startswith("/tmp/abhead")]
    sys.path.insert(0, root)
    entry = importlib.import_module("__spark_entry__")
    return entry.queries()


def main() -> int:
    head_root = sys.argv[1]
    reps = int(sys.argv[2])
    names = sys.argv[3:]
    roots = {"wt": WT_ROOT, "head": head_root}

    sys.path.insert(0, WT_ROOT)
    from datum_spark.session import get_session
    spark = get_session(app_name="ab_inproc")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    res: dict[str, dict[str, list[float]]] = {}
    for name in names:
        res[name] = {"wt": [], "head": []}
        # warm-up: one run per variant (plans, load memo, JIT)
        for v in ("head", "wt"):
            q = load_variant(roots[v])
            spark.sparkContext.setJobDescription(f"{name} [{v}] warmup")
            q[name](spark, sf_dir).collect()
        for i in range(reps):
            order = ("wt", "head") if i % 2 == 0 else ("head", "wt")
            for v in order:
                q = load_variant(roots[v])
                spark.sparkContext.setJobDescription(f"{name} [{v}] r{i}")
                t0 = time.perf_counter()
                q[name](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                res[name][v].append(dt)
        h = statistics.median(res[name]["head"])
        w = statistics.median(res[name]["wt"])
        print(json.dumps({
            "name": name, "head": round(h, 3), "wt": round(w, 3),
            "ratio": round(w / h, 3),
            "head_samples": [round(x, 2) for x in res[name]["head"]],
            "wt_samples": [round(x, 2) for x in res[name]["wt"]]}),
            flush=True)
    with open("/tmp/ab_inproc.json", "w") as fh:
        json.dump({n: {"head": statistics.median(v["head"]),
                       "wt": statistics.median(v["wt"])}
                   for n, v in res.items()}, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
