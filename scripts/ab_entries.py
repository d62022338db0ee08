"""Interleaved quiet-box A/B of two working-tree states over named
``queries()`` entries.

Each variant × entry runs in a FRESH JVM (subprocess) so JIT/cache
state cannot leak between variants; rounds alternate variant order to
cancel slow drift.  The tree is swapped between variants with ``git
stash`` (variant "head") / ``git stash pop`` (variant "wt"), so run it
from a tree whose candidate diff is unstaged.

Usage: python scripts/ab_entries.py <rounds> <name> [name ...]
Writes per-run JSON lines to stdout and a summary table to
/tmp/ab_summary.json.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ONE_ENTRY = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import __spark_entry__ as entry_mod
from datum_spark.session import get_session
name = %(name)r
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="ab_" + name)
spark.sparkContext.setLogLevel("ERROR")
fn = entry_mod.queries()[name]
fn(spark, sf_dir).collect()          # warm-up (JIT, codegen, broadcast)
samples = []
for i in range(3):
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    samples.append(time.perf_counter() - t0)
print("ABRESULT " + json.dumps({"name": name,
                                "median": sorted(samples)[1],
                                "samples": samples}))
"""


def run_one(name: str) -> float:
    code = ONE_ENTRY % {"repo": REPO, "name": name}
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])["median"]
    sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
    raise RuntimeError(f"no result for {name}")


def git(*args: str) -> None:
    subprocess.run(["git", *args], cwd=REPO, check=True,
                   capture_output=True)


def main() -> int:
    rounds = int(sys.argv[1])
    names = sys.argv[2:]
    res: dict[str, dict[str, list[float]]] = {
        n: {"head": [], "wt": []} for n in names}
    for r in range(rounds):
        order = ["wt", "head"] if r % 2 == 0 else ["head", "wt"]
        for variant in order:
            if variant == "head":
                git("stash", "push", "-m", "ab-swap", "--",
                    "datum_spark")
            try:
                for n in names:
                    med = run_one(n)
                    res[n][variant].append(med)
                    print(json.dumps({"round": r, "variant": variant,
                                      "name": n,
                                      "median": round(med, 3)}),
                          flush=True)
            finally:
                if variant == "head":
                    git("stash", "pop")
    summary = {}
    for n in names:
        h = statistics.median(res[n]["head"])
        w = statistics.median(res[n]["wt"])
        summary[n] = {"head": round(h, 3), "wt": round(w, 3),
                      "ratio_wt_over_head": round(w / h, 3),
                      "head_samples": [round(x, 3) for x in res[n]["head"]],
                      "wt_samples": [round(x, 3) for x in res[n]["wt"]]}
        print(f"{n}: head={h:.2f}s wt={w:.2f}s ratio={w/h:.3f}")
    with open("/tmp/ab_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
