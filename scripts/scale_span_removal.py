"""Scale probe for span-removal dedup (SCALE.md §31 evidence).

The claim under test: `remove_duplicated_spans` keeps the ExactSubstr
ACTION linear in corpus size — the span-hash aggregation is
partial-combined (spans travel as md5 prefixes), the join-back
materializes only REMOVED occurrences (bounded by actual duplication,
not corpus size), and the per-doc rewrite is a map-side array
expression.  Wall should grow ~linearly over a 16x corpus sweep at a
FIXED duplication rate, and the removed-word fraction should stay
constant (the operator's work tracks duplication, never pair volume).

Fixture: N docs of 60 md5-deterministic words; every third doc carries
a shared 12-word boilerplate footer (the cross-doc duplicated span);
every tenth doc is an exact replica of doc (id-9) — reruns are
bit-identical.

Run: python scripts/scale_span_removal.py [sizes_csv]  (default
2000,8000,32000).  Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datum_spark.operators.dedup import remove_duplicated_spans  # noqa: E402
from datum_spark.session import get_session  # noqa: E402

FOOTER = ("subscribe to our newsletter for updates terms privacy "
          "cookies contact")


def corpus(spark, n: int):
    """N synthetic docs: 60 md5-derived words each, shared footer on
    every third doc, exact replica of doc (id-9) on every tenth."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    src = F.when(F.col("doc_id") % 10 == 9,
                 F.col("doc_id") - 9).otherwise(F.col("doc_id"))
    base = base.select("doc_id", src.alias("__src"))

    def word(j: int):
        return F.substring(F.md5(F.concat_ws(
            "-", F.lit("spanscale"), F.col("__src"), F.lit(j))), 1, 6)

    body = F.concat_ws(" ", *[word(j) for j in range(60)])
    text = F.when(F.col("__src") % 3 == 0,
                  F.concat(body, F.lit(" " + FOOTER))).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    spark = get_session()
    sizes = [int(x) for x in
             (sys.argv[1] if len(sys.argv) > 1
              else "2000,8000,32000").split(",")]
    out = {"sizes": []}
    for n in sizes:
        df = corpus(spark, n).cache()
        df.count()
        t0 = time.time()
        rw = remove_duplicated_spans(df, "doc_id", "text", n=8)
        agg = rw.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_words_removed").alias("w_rm"),
            F.sum("n_words").alias("w_all"),
            F.sum("n_spans_removed").alias("spans_rm")).first()
        wall = round(time.time() - t0, 2)
        df.unpersist()
        out["sizes"].append({
            "n_docs": n, "wall_sec": wall,
            "removed_word_frac": round(agg["w_rm"] / agg["w_all"], 4),
            "spans_removed": int(agg["spans_rm"]),
        })
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
