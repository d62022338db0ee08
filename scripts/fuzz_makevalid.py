"""Repeatable ST_MakeValid fuzz: random star rings (integer and float
coords) must repair to valid, idempotent, area-bounded output.

Run: python scripts/fuzz_makevalid.py [n_trials] [seed]
The committed unit test (tests/test_clipping.py) runs a 150-trial
subset; this script is the full sweep recorded in SCALE.md §14.
"""

import random
import sys

sys.path.insert(0, ".")

from datum_spark.functions.clipping import (  # noqa: E402
    is_valid_wkt, make_valid_wkt, multipoly_area, parse_wkt)


def main() -> int:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260815
    rng = random.Random(seed)
    bad = ran = 0
    for trial in range(n_trials):
        n = rng.randint(4, 12)
        if trial % 3 == 0:
            pts = [(round(rng.uniform(0, 20), 2),
                    round(rng.uniform(0, 20), 2)) for _ in range(n)]
        else:
            pts = [(rng.randint(0, 20), rng.randint(0, 20))
                   for _ in range(n)]
        if len(set(pts)) < 3:
            continue
        ran += 1
        ring = ", ".join(f"{x} {y}" for x, y in pts + [pts[0]])
        wkt = f"POLYGON (({ring}))"
        try:
            mv = make_valid_wkt(wkt)
            ok, reason = is_valid_wkt(mv)
            if not ok:
                bad += 1
                print(f"INVALID OUT {trial}: {wkt} -> {reason}")
                continue
            if "EMPTY" not in mv:
                area = multipoly_area(parse_wkt(mv)[1])
                if not 0 <= area <= 400.0001:
                    bad += 1
                    print(f"AREA {trial}: {area} {wkt}")
                if make_valid_wkt(mv) != mv:
                    bad += 1
                    print(f"NOT IDEMPOTENT {trial}: {wkt}")
        except Exception as exc:          # noqa: BLE001
            bad += 1
            print(f"RAISE {trial}: {wkt} {exc!r}")
    print(f"makevalid: {ran - bad}/{ran} clean (seed {seed})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
