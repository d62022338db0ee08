"""End-to-end training-corpus pipeline: the canonical composition of the
engine's operators into the shape a 100 TB pre-training ingest actually
runs, as ONE function with a self-reporting metrics trail.

Stage order (each stage is the scale-safe variant measured in SCALE.md):

1. **Quality filter** — heuristic `quality_score` threshold (map-only
   JVM expressions, no UDF).
2. **Dedup** — `near_dup_clusters` (exact-collapse → MinHash over
   distinct texts → components → map-back; SCALE.md §10), keep the
   minimum-id representative of every cluster.
3. **Decontamination** — drop docs sharing word n-grams with the
   held-out eval set (`benchmark_contamination`, broadcast eval side).
4. **Source mixing** — deterministic md5 keep/drop re-weighting
   (`mix_sources_md5`; reproducible from the data alone).
5. **Tokenize + pack + shard** — whitespace token counts, then
   `write_training_shards` (token-balanced contiguous hive shards via
   the distributed prefix sum), metrics observed on the write job.

Every stage is a pure DataFrame transformation until the final write;
counts come from ONE `Observation`-instrumented pass per boundary (no
extra count jobs beyond the per-stage audits the report asks for).

The pipeline is deliberately parameter-light — it is the *composition*
that is the product; each stage's full surface stays available on the
underlying operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_training_corpus(docs: DataFrame, eval_df: DataFrame | None,
                          out_path: str, n_shards: int = 8,
                          id_col: str = "doc_id", text_col: str = "text",
                          source_col: str = "source",
                          min_quality: float = 0.3,
                          dedup_threshold: float = 0.5,
                          contamination_ngram: int = 13,
                          source_weights: dict | None = None,
                          default_weight: float = 1.0) -> tuple[DataFrame, dict]:
    """Run the full corpus pipeline and write token-balanced shards.

    Returns ``(sharded_df, report)`` where ``report`` carries per-stage
    row counts (``rows_in``, ``rows_quality``, ``rows_deduped``,
    ``rows_decontaminated``, ``rows_mixed``) plus the shard write's
    observed ``rows``/``tokens``/``token_budget``.  Counts are taken on
    the cached stage boundaries the dedup pass needs anyway, so the
    audit costs no extra corpus scans beyond one count per stage.
    """
    from .operators.dedup import benchmark_contamination, near_dup_clusters
    from .operators.packing import write_training_shards
    from .operators.sampling import mix_sources_md5
    from .operators.text import quality_score, token_count

    report: dict = {"rows_in": docs.count()}

    # 1. quality gate (map-only)
    q = docs.filter(quality_score(F.col(text_col)) >= min_quality)
    q = q.persist()
    report["rows_quality"] = q.count()

    # 2. dedup: keep each cluster's minimum-id member (the cluster id)
    clusters, flood = near_dup_clusters(q, id_col, text_col,
                                        threshold=dedup_threshold,
                                        with_stats=True)
    deduped = (q.join(clusters.filter(F.col(id_col) == F.col("cluster_id"))
                              .select(id_col),
                      id_col, "semi"))
    deduped = deduped.persist()
    report["rows_deduped"] = deduped.count()
    if flood is not None:
        # bucket-cap loss is observable, not silent: nonzero
        # lsh_buckets_skipped means the dedup recall was truncated by
        # flooded band buckets (metrics fold into the count above)
        report.update({f"lsh_{k}": int(v) for k, v in flood.get.items()})
    q.unpersist()

    # 3. decontamination: anti-join on the contaminated id set
    if eval_df is not None:
        contaminated = benchmark_contamination(
            deduped, eval_df, id_col, text_col,
            n=contamination_ngram).select(id_col)
        clean = deduped.join(contaminated, id_col, "anti")
    else:
        clean = deduped
    clean = clean.persist()
    report["rows_decontaminated"] = clean.count()
    deduped.unpersist()

    # 4. deterministic source mixing (md5 keep sets — reproducible)
    mixed = mix_sources_md5(clean, source_weights or {},
                            source_col=source_col, id_col=id_col,
                            default_weight=default_weight)
    report["rows_mixed"] = mixed.count()

    # 5. tokenize, pack, shard — the write job observes its own metrics
    with_tokens = mixed.withColumn(
        "__n_tokens", token_count(F.col(text_col)).cast("long"))
    sharded, write_metrics = write_training_shards(
        with_tokens, out_path, order_col=id_col, token_col="__n_tokens",
        n_shards=n_shards)
    report.update(write_metrics)
    clean.unpersist()
    return sharded, report
