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

import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _StageStore:
    """Snapshot-backed stage checkpoints for a resumable pipeline run.

    Each completed stage's output is committed to a ``SnapshotTable`` at
    ``{workdir}/{run_id}/{stage}`` through ``append_once(txn_id=run_id,
    txn_version=1)`` — the exactly-once primitive the streaming sinks
    already use.  A re-run with the same ``workdir``/``run_id`` finds
    the txn recorded and READS THE STAGE BACK instead of recomputing it
    (and everything upstream of it): a multi-day 100 TB corpus build
    that dies in decontamination resumes after dedup, not from zero.

    The read-back also truncates lineage — downstream stages scan a
    clean parquet snapshot instead of dragging the dedup DAG — and the
    commit is crash-safe (atomic manifest publish): a run killed
    MID-stage leaves no txn record, so the retry recomputes exactly the
    unfinished stage.

    ``run_id`` must identify (inputs, parameters): reusing it after
    changing either resumes from stale outputs by design — pick a new
    run_id (or workdir) per configuration, like any warehouse job id.
    """

    def __init__(self, spark, workdir: str, run_id: str) -> None:
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id

    def run(self, name: str,
            compute: Callable[[], DataFrame]) -> tuple[DataFrame, bool]:
        """Return ``(stage_df, resumed)`` — read back if committed,
        else compute + commit + read back."""
        from .sources.snapshots import SnapshotTable

        # one table tree per run_id: different configurations never
        # share (or append into) each other's stage tables
        t = SnapshotTable.create(self.spark,
                                 os.path.join(self.workdir,
                                              self.run_id, name))
        if t._last_txn_version(self.run_id) < 1:
            t.append_once(compute(), self.run_id, 1)
            return t.read(), False
        return t.read(), True


def build_training_corpus(docs: DataFrame, eval_df: DataFrame | None,
                          out_path: str, n_shards: int = 8,
                          id_col: str = "doc_id", text_col: str = "text",
                          source_col: str = "source",
                          min_quality: float = 0.3,
                          dedup_threshold: float = 0.5,
                          contamination_ngram: int = 13,
                          source_weights: dict | None = None,
                          default_weight: float = 1.0,
                          workdir: str | None = None,
                          run_id: str = "run",
                          quality_model: tuple | None = None,
                          lang_models: dict | None = None,
                          allowed_langs=None,
                          unigram_vocab: list | None = None,
                          max_nats_per_token: float | None = None
                          ) -> tuple[DataFrame, dict]:
    """Run the full corpus pipeline and write token-balanced shards.

    Returns ``(sharded_df, report)`` where ``report`` carries per-stage
    row counts (``rows_in``, ``rows_quality``, ``rows_deduped``,
    ``rows_decontaminated``, ``rows_mixed``, plus ``rows_langid`` /
    ``rows_perplexity`` when those gates are enabled) plus the shard
    write's observed ``rows``/``tokens``/``token_budget``.  Counts are
    taken on the cached stage boundaries the dedup pass needs anyway,
    so the audit costs no extra corpus scans beyond one count per
    stage.

    ``workdir`` (optional) makes the run RESUMABLE: the quality, dedup
    and decontamination boundaries are committed as snapshot-table
    checkpoints keyed by ``run_id`` (see :class:`_StageStore`), and a
    re-run skips every stage already committed — ``report`` then
    carries ``resumed_<stage>`` flags.  Without it the pipeline is the
    original single-pass composition (persist/unpersist boundaries).

    ``quality_model`` (optional ``(weights, bias)`` from
    :func:`operators.classifier.quality_classifier_fit`) replaces the
    heuristic gate with the LEARNED filter: keep docs whose calibrated
    score ≥ ``min_quality`` (reinterpreted as the probability
    threshold) — the CCNet-style curation posture, still one map-only
    stage.  Docs with zero tokens are dropped (nothing to score on),
    matching the heuristic's behavior on empty text.  Passing the
    literal string ``"gopher"`` instead gates on the published Gopher
    rule conjunction (``operators.text.gopher_rules``, r12).

    ``lang_models`` + ``allowed_langs`` (optional) enable the
    LANGUAGE-ID gate as stage 0 — the first pass of a multilingual
    build: score every doc with the trained multiclass models
    (:func:`operators.langid.language_classifier_score`) and keep only
    the allowed predicted languages (``rows_langid`` in the funnel).

    ``unigram_vocab`` + ``max_nats_per_token`` (optional) enable the
    CCNet-style PERPLEXITY gate after the quality stage: keep docs the
    unigram LM finds cheap (``nats_per_token ≤`` threshold via
    :func:`operators.unigram.unigram_doc_scores`; ``rows_perplexity``
    in the funnel).  Both gates are semi joins on a scored id set —
    the corpus text rides through untouched.
    """
    if workdir is not None:
        return _build_training_corpus_resumable(
            docs, eval_df, out_path, n_shards, id_col, text_col,
            source_col, min_quality, dedup_threshold, contamination_ngram,
            source_weights, default_weight, workdir, run_id,
            quality_model, lang_models, allowed_langs,
            unigram_vocab, max_nats_per_token)
    from .operators.dedup import benchmark_contamination, near_dup_clusters
    from .operators.packing import write_training_shards
    from .operators.sampling import mix_sources_md5
    from .operators.text import token_count

    report: dict = {"rows_in": docs.count()}

    # 0. language gate (optional) — the multilingual first pass
    gated = None
    if lang_models is not None and allowed_langs:
        docs = gated = _langid_gate(docs, id_col, text_col, lang_models,
                                    allowed_langs).persist()
        report["rows_langid"] = docs.count()

    # 1. quality gate (map-only; learned when a model is supplied)
    q = _quality_gate(docs, id_col, text_col, min_quality, quality_model)
    q = q.persist()
    report["rows_quality"] = q.count()
    if gated is not None:
        # release the langid boundary once the quality count has
        # consumed it — every other stage unpersists its predecessor;
        # without this the corpus-sized gated frame is held for the
        # rest of the session (ADVICE r12)
        gated.unpersist()

    # 1b. perplexity gate (optional) — the learned LM quality signal,
    # its own funnel row so the report shows what EACH gate dropped
    if unigram_vocab is not None and max_nats_per_token is not None:
        prev = q
        q = _perplexity_gate(q, id_col, text_col, unigram_vocab,
                             max_nats_per_token).persist()
        report["rows_perplexity"] = q.count()
        prev.unpersist()

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


def _quality_gate(docs: DataFrame, id_col: str, text_col: str,
                  min_quality: float, quality_model) -> DataFrame:
    """Heuristic filter by default; with ``quality_model=(w, b)`` the
    learned classifier's calibrated score gates instead (semi join on
    the scored ids — scoring reads only (id, text)); with
    ``quality_model="gopher"`` the published Gopher rule conjunction
    gates (r12: ``operators.text.gopher_rules`` — every rule an
    audited column, still map-only; ``min_quality`` is ignored, the
    thresholds are the published ones)."""
    from .operators.text import quality_score

    if quality_model == "gopher":
        from .operators.text import gopher_rules

        return (gopher_rules(docs, text_col)
                .filter(F.col("gopher_pass"))
                .select(*docs.columns))
    if quality_model is None:
        return docs.filter(quality_score(F.col(text_col)) >= min_quality)
    from .operators.classifier import quality_classifier_score

    w, b = quality_model
    keep = (quality_classifier_score(docs, list(w), float(b),
                                     id_col, text_col)
            .filter(F.col("score") >= float(min_quality))
            .select(id_col))
    return docs.join(keep, id_col, "semi")


def _langid_gate(docs: DataFrame, id_col: str, text_col: str,
                 lang_models: dict, allowed_langs) -> DataFrame:
    """Keep docs whose predicted language is allowed — a semi join on
    the argmax-scored id set (one shared feature pass, map-only
    scoring; operators/langid.py)."""
    from .operators.langid import language_classifier_score

    keep = (language_classifier_score(docs, lang_models, id_col,
                                      text_col)
            .filter(F.col("pred_lang").isin(
                [str(lg) for lg in sorted(allowed_langs)]))
            .select(id_col))
    return docs.join(keep, id_col, "semi")


def _perplexity_gate(docs: DataFrame, id_col: str, text_col: str,
                     unigram_vocab: list,
                     max_nats_per_token: float) -> DataFrame:
    """Keep docs the unigram LM scores at ``nats_per_token`` ≤ the
    threshold (CCNet's filter direction: cheap = looks like the
    training distribution).  The Viterbi DP runs once per distinct
    word; the only corpus-sized exchange is the per-doc sum
    (operators/unigram.py::unigram_doc_scores)."""
    from .operators.unigram import unigram_doc_scores

    keep = (unigram_doc_scores(docs, unigram_vocab, id_col, text_col)
            .filter(F.col("nats_per_token")
                    <= float(max_nats_per_token))
            .select(id_col))
    return docs.join(keep, id_col, "semi")


def _build_training_corpus_resumable(docs, eval_df, out_path, n_shards,
                                     id_col, text_col, source_col,
                                     min_quality, dedup_threshold,
                                     contamination_ngram, source_weights,
                                     default_weight, workdir,
                                     run_id,
                                     quality_model=None,
                                     lang_models=None,
                                     allowed_langs=None,
                                     unigram_vocab=None,
                                     max_nats_per_token=None
                                     ) -> tuple[DataFrame, dict]:
    """Checkpointed variant of :func:`build_training_corpus` — same
    stages and report keys, but the quality/dedup/decontamination
    boundaries commit to snapshot tables and resume across runs (see
    :class:`_StageStore`).  Flood stats appear only when the dedup
    stage actually computed this run (a resumed stage's stats live in
    the run that produced it)."""
    from .operators.dedup import benchmark_contamination, near_dup_clusters
    from .operators.packing import write_training_shards
    from .operators.sampling import mix_sources_md5
    from .operators.text import token_count

    store = _StageStore(docs.sparkSession, workdir, run_id)
    report: dict = {}
    flood_box: list = []
    orig_docs = docs

    first_resumed = None
    if lang_models is not None and allowed_langs:
        docs_in = docs
        docs, resumed = store.run(
            "langid",
            lambda: _langid_gate(docs_in, id_col, text_col,
                                 lang_models, allowed_langs))
        first_resumed = resumed
        report["resumed_langid"] = resumed
        report["rows_langid"] = docs.count()

    src = docs
    q, resumed = store.run(
        "quality",
        lambda: _quality_gate(src, id_col, text_col, min_quality,
                              quality_model))
    if first_resumed is None:
        first_resumed = resumed
    report["rows_in"] = orig_docs.count() if not first_resumed else None
    report["resumed_quality"] = resumed
    report["rows_quality"] = q.count()

    if unigram_vocab is not None and max_nats_per_token is not None:
        q_in = q
        q, resumed = store.run(
            "perplexity",
            lambda: _perplexity_gate(q_in, id_col, text_col,
                                     unigram_vocab,
                                     max_nats_per_token))
        report["resumed_perplexity"] = resumed
        report["rows_perplexity"] = q.count()

    def _dedup():
        clusters, flood = near_dup_clusters(q, id_col, text_col,
                                            threshold=dedup_threshold,
                                            with_stats=True)
        if flood is not None:
            flood_box.append(flood)
        return q.join(clusters.filter(F.col(id_col) == F.col("cluster_id"))
                              .select(id_col), id_col, "semi")

    deduped, resumed = store.run("deduped", _dedup)
    report["resumed_deduped"] = resumed
    report["rows_deduped"] = deduped.count()
    if flood_box:
        # the checkpoint commit was the action, so .get is safe here
        report.update({f"lsh_{k}": int(v) for k, v in flood_box[0].get.items()})

    def _decontaminate():
        if eval_df is None:
            return deduped
        contaminated = benchmark_contamination(
            deduped, eval_df, id_col, text_col,
            n=contamination_ngram).select(id_col)
        return deduped.join(contaminated, id_col, "anti")

    clean, resumed = store.run("decontaminated", _decontaminate)
    report["resumed_decontaminated"] = resumed
    report["rows_decontaminated"] = clean.count()

    # mixing + sharding are cheap map-side tails of the last checkpoint;
    # the shard WRITE is the run's deliverable, always re-executed (it
    # is itself a full-overwrite of out_path, so retries are idempotent)
    mixed = mix_sources_md5(clean, source_weights or {},
                            source_col=source_col, id_col=id_col,
                            default_weight=default_weight)
    report["rows_mixed"] = mixed.count()
    with_tokens = mixed.withColumn(
        "__n_tokens", token_count(F.col(text_col)).cast("long"))
    sharded, write_metrics = write_training_shards(
        with_tokens, out_path, order_col=id_col, token_col="__n_tokens",
        n_shards=n_shards)
    report.update(write_metrics)
    return sharded, report
