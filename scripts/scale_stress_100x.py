"""100× corpus stress for the three ingest-critical dedup paths
(SCALE.md §8 evidence — the round-6 escalation of the 10× run in §7).

Drives `documents` (sf0.1: 5,000 rows) to 500,000 via deterministic
`upsample_sources` replication (copy_idx re-keyed into doc_id), then
times, end-to-end on local[32]:

  1. minhash_near_dups_md5 — the portable banded-LSH near-dup pass.
     100 exact replicas per doc is the degenerate-bucket worst case:
     every band bucket of an original holds all 100 copies, so this is
     exactly the regime `max_bucket_size` exists for.
  2. incremental_near_dups_md5 — the daily-ingest shape: the ORIGINAL
     5,000-doc fixture as the delta against the 500,000-doc corpus
     (delta×corpus candidates only; the corpus is never self-joined).
  3. dup_clusters → golden_records — survivorship over the pass-1
     pairs: log-round connected components, then ONE partial-aggregated
     groupBy collapsing each ~100-member clique to its golden row.

Recorded per path: wall seconds, output rows, shuffle read/write MB
(Spark UI REST deltas), and the PEAK PARTITION of the output (max rows
in any single partition, via spark_partition_id — the skew indicator a
hot LSH bucket or mega-cluster key would spike).

Run: python scripts/scale_stress_100x.py [sf_dir] [upsample]
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_totals() -> dict:
    """Cumulative shuffle bytes over all completed stages (UI REST)."""
    try:
        apps = json.load(urllib.request.urlopen(
            "http://localhost:4040/api/v1/applications", timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app_id}/stages"
            "?status=complete", timeout=5))
    except Exception:  # noqa: BLE001 — UI off / port shifted
        return {"shuffle_write": -1, "shuffle_read": -1}
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def peak_partition_rows(df) -> int:
    """Max rows held by any single partition of ``df`` — the skew probe.
    One extra pass over the (already computed) frame; partition-count
    bounded aggregation, no data movement."""
    from pyspark.sql import functions as F

    row = (df.groupBy(F.spark_partition_id().alias("p"))
             .agg(F.count(F.lit(1)).alias("n"))
             .agg(F.max("n").alias("mx")).collect()[0])
    return int(row["mx"] or 0)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from datum_spark.operators.components import dup_clusters
    from datum_spark.operators.dedup import (
        golden_records,
        incremental_near_dups_md5,
        minhash_near_dups_md5,
    )
    from datum_spark.operators.sampling import upsample_sources
    from datum_spark.session import get_session
    from datum_spark.sources.registry import read_parquet_normalized

    spark = get_session(app_name="scale_stress_100x",
                        extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = read_parquet_normalized(spark, f"{sf_dir}/documents.parquet")
    # rekey multiplier: next power of two above the factor keeps ids unique
    mult = 1 << (factor - 1).bit_length()
    docs = (upsample_sources(docs0, {}, default_weight=float(factor))
            .withColumn("doc_id",
                        F.col("doc_id") * mult + F.col("copy_idx"))
            .drop("copy_idx")
            .repartition(128).persist())
    n_docs = docs.count()
    results: dict[str, dict] = {}

    def run(name, thunk):
        before = stage_totals()
        t0 = time.perf_counter()
        out_df = thunk()
        out_df = out_df.persist()
        n = out_df.count()
        wall = round(time.perf_counter() - t0, 2)
        after = stage_totals()          # before the peak probe's own pass
        peak = peak_partition_rows(out_df)
        results[name] = {
            "wall_s": wall,
            "rows_out": n,
            "peak_partition_rows": peak,
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 2**20, 1)
            if before["shuffle_write"] >= 0 else -1,
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 2**20, 1)
            if before["shuffle_read"] >= 0 else -1,
        }
        print(f"# {name}: {wall}s, {n} rows, peak part {peak}",
              file=sys.stderr)
        return out_df

    # 1. banded MinHash over the flooded corpus (default bucket cap 1000:
    #    each replica clique of `factor` members fits — the cap is a
    #    guard for boilerplate mega-buckets, not honest cliques)
    pairs = run("minhash_md5_neardups",
                lambda: minhash_near_dups_md5(docs, "doc_id", "text",
                                              num_hashes=16, bands=4,
                                              threshold=0.5))

    # 2. daily-ingest: original fixture (re-keyed clear of the corpus ids)
    #    as the delta against the 100× corpus
    delta = docs0.withColumn("doc_id", -F.col("doc_id") - 1)
    run("incremental_delta_vs_corpus",
        lambda: incremental_near_dups_md5(delta, docs, "doc_id", "text",
                                          num_hashes=16, bands=4,
                                          threshold=0.5))

    # 3. survivorship: clusters from the pass-1 pairs, one golden row per
    #    ~factor-member clique
    def _golden():
        comp = dup_clusters(pairs.select("id_a", "id_b"))
        members = (comp.select(F.col("node").alias("doc_id"),
                               F.col("component").alias("__cluster"))
                       .join(docs.select("doc_id", "source", "n_chars"),
                             "doc_id"))
        return (golden_records(members, "doc_id", "__cluster", "n_chars",
                               collect_cols=("source",),
                               sum_cols=("n_chars",))
                .filter(F.col("n_members") >= 2))

    run("dup_clusters_golden_records", _golden)

    # 4. the production composition the raw-LSH rows motivate: collapse
    #    exact duplicates BEFORE LSH (500k rows → ~5k distinct texts),
    #    cluster representatives, map members back — replica floods never
    #    reach the band buckets and intra-clique pairs are never
    #    materialized
    from datum_spark.operators.dedup import near_dup_clusters
    run("near_dup_clusters_collapsed",
        lambda: near_dup_clusters(docs, "doc_id", "text", num_hashes=16,
                                  bands=4, threshold=0.5))

    print(json.dumps({
        "corpus": {"documents": n_docs, "upsample": factor},
        "sf_dir": sf_dir,
        "operators": results,
        "load_pre": round(os.getloadavg()[0], 1),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
