"""10× corpus stress run for the dedup/ANN family (SCALE.md evidence).

Drives `documents` (sf0.1: 5,000 rows) to 50,000 via the deterministic
`upsample_sources` replication (copy_idx re-keyed into doc_id) and
`embeddings` (2,000) to 20,000, then times the headline dedup operators
and records per-operator wall time + shuffle bytes (from the Spark UI
REST API).  Exact replicas are the WORST case for near-dup operators:
every original becomes a 10-member duplicate clique, so pair volume per
group is maximal (45 pairs/clique).

Run: python scripts/scale_stress.py [sf_dir] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_totals() -> dict:
    """Cumulative shuffle/IO bytes over all completed stages (UI REST)."""
    try:
        apps = json.load(urllib.request.urlopen(
            "http://localhost:4040/api/v1/applications", timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:4040/api/v1/applications/{app_id}/stages"
            "?status=complete", timeout=5))
    except Exception:  # noqa: BLE001 — UI off / port shifted
        return {"shuffle_write": -1, "shuffle_read": -1, "input": -1}
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input": sum(s.get("inputBytes", 0) for s in stages),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from datum_spark.operators.clustering import semantic_dedup_pairs
    from datum_spark.operators.components import connected_components
    from datum_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dups,
        ngram_jaccard_pairs,
    )
    from datum_spark.operators.sampling import upsample_sources
    from datum_spark.session import get_session
    from datum_spark.sources.registry import read_parquet_normalized

    spark = get_session(app_name="scale_stress",
                        extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    docs0 = read_parquet_normalized(spark, f"{sf_dir}/documents.parquet")
    # 10× corpus: every source weighted 10.0 → exactly 10 deterministic
    # copies per doc; copy_idx re-keys doc_id so ids stay unique.
    # repartition: the fixture is ONE small parquet file → one scan split,
    # so without an explicit fan-out every downstream map stage (shingles,
    # signatures, gram explode) runs in a single task — the first stress
    # attempt spent minutes single-threaded on a 32-core box.  On a real
    # cluster the corpus arrives as many splits and this is a no-op
    # concern; persist so the 10× explode isn't re-run per operator.
    docs = (upsample_sources(docs0, {}, default_weight=10.0)
            .withColumn("doc_id",
                        F.col("doc_id") * 16 + F.col("copy_idx"))
            .drop("copy_idx")
            .repartition(64).persist())
    emb0 = read_parquet_normalized(spark, f"{sf_dir}/embeddings.parquet")
    emb = (emb0.select("vec_id", "embedding",
                       F.explode(F.sequence(F.lit(0), F.lit(9)))
                        .alias("copy_idx"))
               .withColumn("vec_id",
                           F.col("vec_id") * 16 + F.col("copy_idx"))
               .drop("copy_idx")
               .repartition(64).persist())

    n_docs, n_vecs = docs.count(), emb.count()
    results: dict[str, dict] = {}

    def run(name, thunk):
        before = stage_totals()
        t0 = time.perf_counter()
        out = thunk()
        wall = round(time.perf_counter() - t0, 2)
        after = stage_totals()
        results[name] = {
            "wall_s": wall,
            "rows_out": out,
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 2**20, 1)
            if before["shuffle_write"] >= 0 else -1,
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 2**20, 1)
            if before["shuffle_read"] >= 0 else -1,
        }
        print(f"# {name}: {wall}s, {out} rows", file=sys.stderr)

    run("exact_dedup_text",
        lambda: exact_dedup(docs, ["text"], keep_by="doc_id").count())

    # the x03→x51 chain: candidate pairs then duplicate clusters
    pairs_holder = {}

    def _pairs():
        # word TRIgrams: the synthetic vocabulary is ~30 words, so at 50k
        # docs every unigram exceeds any sane hot-gram cap and the pair
        # stage is vacuous (first stress run returned 0 rows); trigram
        # doc-frequency stays near the replica count, so the cap guards
        # skew without erasing the signal
        p = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                threshold=0.8, max_ngram_freq=1000)
        p = p.persist()
        n = p.count()
        pairs_holder["p"] = p
        return n

    run("ngram_jaccard_pairs", _pairs)
    run("connected_components",
        lambda: connected_components(
            pairs_holder["p"].select("id_a", "id_b")).count())

    run("minhash_lsh",
        lambda: minhash_near_dups(docs, "doc_id", "text", num_hashes=32,
                                  bands=8, threshold=0.5).count())

    run("semantic_dedup_pairs",
        lambda: semantic_dedup_pairs(emb, "vec_id", "embedding", k=16,
                                     iters=2, threshold=0.95).count())

    from datum_spark.operators.dedup import duplicated_span_stats
    run("substring_span_stats",
        lambda: duplicated_span_stats(docs, "doc_id", "text", n=8)
        .filter("dup_ratio > 0.5").count())

    # round-5 additions: containment (asymmetric prefix probe), centroid
    # coherence (no pair generation), CMS build (bounded combiner table),
    # stratified weighted draw (pruned per-group top-k)
    from datum_spark.operators.dedup import ngram_containment_pairs
    run("ngram_containment_pairs",
        lambda: ngram_containment_pairs(docs, "doc_id", "text", n=3,
                                        threshold=0.8,
                                        max_ngram_freq=1000).count())

    from datum_spark.operators.similarity import centroid_cosines
    emb_lbl = (emb.join(emb0.select("vec_id", "label")
                            .withColumnRenamed("vec_id", "__orig"),
                        (F.col("vec_id") / 16).cast("long")
                        == F.col("__orig")).drop("__orig"))
    run("centroid_cosines",
        lambda: centroid_cosines(emb_lbl, "vec_id", "embedding",
                                 "label").count())

    from datum_spark.operators.sketches import cms_build
    run("cms_build_words",
        lambda: cms_build(
            docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                         .alias("word")),
            "word", depth=4, width=1024).count())

    from datum_spark.operators.sampling import weighted_sample
    run("weighted_sample_per_source",
        lambda: weighted_sample(docs, 100, "n_chars", "doc_id",
                                group_col="source").count())

    # round-5 late additions: interval join / CDC apply on 10× events,
    # BPE training on the 10× corpus, basket mining on 10× lineitem
    ev0 = read_parquet_normalized(spark, f"{sf_dir}/events.parquet")
    ev = (ev0.select("*", F.explode(F.sequence(F.lit(0), F.lit(9)))
                     .alias("copy_idx"))
          .withColumn("event_id", F.col("event_id") * 16 + F.col("copy_idx"))
          .drop("copy_idx").repartition(64).persist())
    ev.count()

    from datum_spark.operators.intervals import interval_overlap_join

    def _ivl():
        us = ev.withColumn("__us", F.unix_micros("ts"))
        a = (us.groupBy("user_id", F.to_date("ts").alias("d"))
               .agg(F.min("__us").alias("a_s"), F.max("__us").alias("a_e")))
        b = (us.filter(F.col("event_type") == "error")
               .select("event_id", (F.col("__us") - 1_800_000_000)
                       .alias("b_s"),
                       (F.col("__us") + 1_800_000_000).alias("b_e")))
        return interval_overlap_join(a, b, "a_s", "a_e", "b_s",
                                     "b_e").count()

    run("interval_overlap_join", _ivl)

    from datum_spark.operators.cdc import apply_changes

    def _cdc():
        snap = (read_parquet_normalized(spark, f"{sf_dir}/customer.parquet")
                .select("c_custkey", "c_acctbal"))
        ch = ev.select(F.col("user_id").alias("c_custkey"), "ts", "event_id",
                       F.when(F.col("event_type") == "error", F.lit("D"))
                        .otherwise(F.lit("U")).alias("op"),
                       F.col("value").alias("c_acctbal"))
        return apply_changes(snap, ch, keys=["c_custkey"],
                             seq_cols=["ts", "event_id"],
                             op_col="op").count()

    run("cdc_apply", _cdc)

    from datum_spark.operators.bpe import learn_bpe_merges, word_frequencies
    run("bpe_train_5_iters",
        lambda: len(learn_bpe_merges(word_frequencies(docs), iters=5)))

    li0 = read_parquet_normalized(spark, f"{sf_dir}/lineitem.parquet")
    li = (li0.select("l_orderkey", "l_partkey",
                     F.explode(F.sequence(F.lit(0), F.lit(9)))
                      .alias("copy_idx"))
          .withColumn("l_orderkey",
                      F.col("l_orderkey") * 16 + F.col("copy_idx"))
          .drop("copy_idx").repartition(64).persist())

    def _basket():
        it = li.distinct()
        a, b = it.alias("a"), it.alias("b")
        return (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                       & (F.col("a.l_partkey") < F.col("b.l_partkey")))
                .groupBy(F.col("a.l_partkey"), F.col("b.l_partkey"))
                .agg(F.count(F.lit(1)).alias("n")).count())

    run("copurchase_pairs", _basket)

    print(json.dumps({
        "corpus": {"documents": n_docs, "embeddings": n_vecs,
                   "upsample": 10},
        "sf_dir": sf_dir,
        "operators": results,
        "load_pre": round(os.getloadavg()[0], 1),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
