"""End-to-end training-corpus pipeline: the canonical composition of the
engine's operators into the shape a 100 TB pre-training ingest actually
runs, as ONE function with a self-reporting metrics trail.

Stage order (each stage is the scale-safe variant measured in SCALE.md):

0a. **C4 line filter** (optional, r13) — line-retention rewrite BEFORE
    every gate (`text.c4_clean_lines`; the paper's order).
0.  **Language gate** (optional) — multiclass langid semi join.
1.  **Quality filter** — heuristic `quality_score` threshold, a learned
    classifier, or a published rule-set conjunction (gopher / c4 /
    gopher_rep / gopher+rep), all map-only scoring; plus the optional
    CCNet perplexity gate (1b).
2.  **Dedup** — `near_dup_clusters` (exact-collapse → MinHash over
    distinct texts → components → map-back; SCALE.md §10), keep the
    minimum-id representative of every cluster; optionally followed by
    SPAN-level dedup (2b, r13 — the Lee 2022 ExactSubstr action,
    `dedup.remove_duplicated_spans`).
3.  **Decontamination** — drop docs sharing word n-grams with the
    held-out eval set (`benchmark_contamination`, broadcast eval side).
4.  **Source mixing** — deterministic md5 keep/drop re-weighting
    (`mix_sources_md5`; reproducible from the data alone).
5.  **Tokenize + pack + shard** — whitespace token counts, then
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
                          max_nats_per_token: float | None = None,
                          lang_col: str | None = None,
                          span_dedup_n: int | None = None,
                          c4_line_filter: bool = False
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
    matching the heuristic's behavior on empty text.  Passing a
    rule-set sentinel instead gates on a published rule conjunction
    (see :func:`_quality_gate`): ``"gopher"`` (Rae 2021 §A1.1, r12),
    ``"c4"`` (Raffel 2020 §2.2, r13), ``"gopher_rep"`` (Rae 2021
    §A1.2, r13), or ``"gopher+rep"`` (both Gopher tables, r13 — runs
    as two funnel stages so the report shows ``rows_quality`` for the
    page-shape family and ``rows_repetition`` for the repetition
    family).  ``lang_col`` (optional) names an existing language
    column that keys Gopher's stop-word rule; when absent and the
    langid gate is enabled, the stage-0 prediction is reused
    automatically (never the silent English default).

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

    ``span_dedup_n`` (optional, r13) enables SPAN-level dedup after
    the doc-level dedup stage — the ExactSubstr action of Lee et al.
    2022 (:func:`operators.dedup.remove_duplicated_spans`, word
    ``n``-gram spans): surviving docs are REWRITTEN dropping
    cross-document duplicated spans (keep-first deterministic) and
    docs left empty are dropped.  Funnel rows: ``rows_span_dedup``
    (docs with any words left) and ``span_words_removed`` (total
    words cut).
    """
    if workdir is not None:
        return _build_training_corpus_resumable(
            docs, eval_df, out_path, n_shards, id_col, text_col,
            source_col, min_quality, dedup_threshold, contamination_ngram,
            source_weights, default_weight, workdir, run_id,
            quality_model, lang_models, allowed_langs,
            unigram_vocab, max_nats_per_token, lang_col, span_dedup_n,
            c4_line_filter)
    from .operators.dedup import benchmark_contamination, near_dup_clusters
    from .operators.packing import write_training_shards
    from .operators.sampling import mix_sources_md5
    from .operators.text import token_count

    report: dict = {"rows_in": docs.count()}

    # Gopher's stop-word rule is language-keyed: use the caller's
    # lang_col if given, else attach the langid stage's own prediction
    # when both gates run (ADVICE r12 — never silently apply the
    # English stop list to a multilingual corpus)
    wants_lang = quality_model in ("gopher", "gopher+rep")
    attach = ("__langid_pred" if wants_lang and lang_col is None
              and lang_models is not None and allowed_langs else None)
    eff_lang = lang_col if lang_col is not None else attach

    # 0a. C4 line filter (optional, r13) — C4 §2.2 applies its LINE
    # rules BEFORE any page-level judgement, so the rewrite runs ahead
    # of every gate; docs left with no lines drop here (map-only; the
    # count is the stage's funnel row)
    if c4_line_filter:
        docs = _c4_line_stage(docs, text_col)
        report["rows_line_filtered"] = docs.count()

    # 0. language gate (optional) — the multilingual first pass
    gated = None
    if lang_models is not None and allowed_langs:
        docs = gated = _langid_gate(docs, id_col, text_col, lang_models,
                                    allowed_langs,
                                    attach=attach).persist()
        report["rows_langid"] = docs.count()

    # 1. quality gate (map-only; learned when a model is supplied).
    # "gopher+rep" runs as TWO gates so the funnel reports what each
    # rule family dropped (rows_quality = page-shape, rows_repetition
    # = within-document repetition)
    if quality_model == "gopher+rep":
        q1 = _quality_gate(docs, id_col, text_col, min_quality,
                           "gopher", lang_col=eff_lang).persist()
        report["rows_quality"] = q1.count()
        if gated is not None:
            gated.unpersist()
        q = _quality_gate(q1, id_col, text_col, min_quality,
                          "gopher_rep")
        if attach is not None:
            q = q.drop(attach)
        q = q.persist()
        report["rows_repetition"] = q.count()
        q1.unpersist()
    else:
        q = _quality_gate(docs, id_col, text_col, min_quality,
                          quality_model, lang_col=eff_lang)
        if attach is not None:
            q = q.drop(attach)
        q = q.persist()
        report["rows_quality"] = q.count()
        if gated is not None:
            # release the langid boundary once the quality count has
            # consumed it — every other stage unpersists its
            # predecessor; without this the corpus-sized gated frame
            # is held for the rest of the session (ADVICE r12)
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

    # 2b. span-level dedup (optional, r13) — the ExactSubstr ACTION of
    # Lee et al. 2022: rewrite surviving docs dropping cross-document
    # duplicated spans (keep-first), then drop docs left empty.  Doc-
    # level dedup runs FIRST so whole-page duplicates never reach the
    # span pass (the paper composes them the same way).
    dedup_cache = deduped            # the persisted frame to release
    if span_dedup_n is not None:
        from .operators.dedup import remove_duplicated_spans

        prev = deduped
        rw = remove_duplicated_spans(deduped, id_col, text_col,
                                     n=span_dedup_n).persist()
        sums = rw.agg(
            F.sum("n_words_removed").alias("w"),
            F.sum(F.when(F.col("n_words") > F.col("n_words_removed"),
                         1).otherwise(0)).alias("k")).first()
        report["span_words_removed"] = int(sums["w"] or 0)
        report["rows_span_dedup"] = int(sums["k"] or 0)
        deduped = (rw.filter(F.col("n_words") > F.col("n_words_removed"))
                     .select(*prev.columns))
        prev.unpersist()
        dedup_cache = rw

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
    dedup_cache.unpersist()

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


def _c4_line_stage(docs: DataFrame, text_col: str) -> DataFrame:
    """C4 line-retention rewrite + empty-doc drop — stage 0a of the
    pipeline and the streaming sink (same function, no drift): the
    text column is REWRITTEN in place (audit columns dropped after the
    emptiness filter so downstream schemas are unchanged)."""
    from .operators.text import c4_clean_lines

    return (c4_clean_lines(docs, text_col)
            .filter(F.col("n_lines_kept") > 0)
            .drop("n_lines", "n_lines_kept", "removed_line_frac"))


# published-rule-set sentinels _quality_gate accepts (r13 completes
# the family: r12 shipped "gopher" only, leaving x213/x214 audit-only)
_RULE_SET_MODELS = ("gopher", "c4", "gopher_rep", "gopher+rep")


def _quality_gate(docs: DataFrame, id_col: str, text_col: str,
                  min_quality: float, quality_model,
                  lang_col: str | None = None) -> DataFrame:
    """Heuristic filter by default; with ``quality_model=(w, b)`` the
    learned classifier's calibrated score gates instead (semi join on
    the scored ids — scoring reads only (id, text)); with a
    published-rule-set sentinel the corresponding conjunction from
    ``operators.text`` gates (``min_quality`` is ignored, the
    thresholds are the published ones):

    - ``"gopher"`` — Rae 2021 §A1.1 page-shape rules
      (:func:`~datum_spark.operators.text.gopher_rules`);
    - ``"c4"`` — Raffel 2020 §2.2 cleaning rules
      (:func:`~datum_spark.operators.text.c4_rules`);
    - ``"gopher_rep"`` — Rae 2021 §A1.2 repetition rules
      (:func:`~datum_spark.operators.text.gopher_repetition`);
    - ``"gopher+rep"`` — the §A1.1 AND §A1.2 conjunction (the paper
      applies both).

    ``lang_col`` (rule sets only) keys Gopher's stop-word rule per
    language instead of silently applying the English list to every
    document.

    Rule-set gating is a SEMI JOIN on the ids of passing rows, with
    the rule columns computed on a ``(id, text[, lang])`` projection —
    a ``docs`` frame that already carries a column named like a rule
    output (``n_words``, ``c4_pass``, ...) passes through untouched
    (ADVICE r12: the previous ``select(*docs.columns)`` spelling
    returned the computed value instead of the user's data)."""
    from .operators.text import quality_score

    if quality_model in _RULE_SET_MODELS:
        from .operators.text import (c4_rules, gopher_repetition,
                                     gopher_rules)

        cols = [id_col, text_col] + ([lang_col] if lang_col else [])
        scored = docs.select(*cols)
        keep = None
        if quality_model in ("gopher", "gopher+rep"):
            keep = (gopher_rules(scored, text_col, lang_col=lang_col)
                    .filter(F.col("gopher_pass")).select(id_col))
        if quality_model == "c4":
            keep = (c4_rules(scored, text_col)
                    .filter(F.col("c4_pass")).select(id_col))
        if quality_model in ("gopher_rep", "gopher+rep"):
            rep = (gopher_repetition(scored, id_col, text_col)
                   .filter(F.col("repetition_pass")).select(id_col))
            keep = rep if keep is None else keep.join(rep, id_col,
                                                      "semi")
        return docs.join(keep, id_col, "semi")
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
                 lang_models: dict, allowed_langs,
                 attach: str | None = None) -> DataFrame:
    """Keep docs whose predicted language is allowed — a semi join on
    the argmax-scored id set (one shared feature pass, map-only
    scoring; operators/langid.py).  ``attach`` (optional) carries the
    predicted language back as a column of that name (the semi join
    becomes an inner join on the same keep set — identical rows), so
    a downstream language-keyed gate (Gopher stop words) can reuse
    the stage-0 prediction instead of rescoring or defaulting every
    document to English (ADVICE r12)."""
    from .operators.langid import language_classifier_score

    keep = (language_classifier_score(docs, lang_models, id_col,
                                      text_col)
            .filter(F.col("pred_lang").isin(
                [str(lg) for lg in sorted(allowed_langs)]))
            .select(id_col, "pred_lang"))
    if attach is None:
        return docs.join(keep.select(id_col), id_col, "semi")
    return docs.join(keep.withColumnRenamed("pred_lang", attach),
                     id_col, "inner")


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
                                     max_nats_per_token=None,
                                     lang_col=None,
                                     span_dedup_n=None,
                                     c4_line_filter=False
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

    # same language-column resolution as the single-pass path: the
    # caller's lang_col, else the langid stage's attached prediction
    wants_lang = quality_model in ("gopher", "gopher+rep")
    attach = ("__langid_pred" if wants_lang and lang_col is None
              and lang_models is not None and allowed_langs else None)
    eff_lang = lang_col if lang_col is not None else attach

    first_resumed = None
    if c4_line_filter:
        docs_lf = docs
        docs, resumed = store.run(
            "line_filter",
            lambda: _c4_line_stage(docs_lf, text_col))
        first_resumed = resumed
        report["resumed_line_filter"] = resumed
        report["rows_line_filtered"] = docs.count()

    if lang_models is not None and allowed_langs:
        docs_in = docs
        docs, resumed = store.run(
            "langid",
            lambda: _langid_gate(docs_in, id_col, text_col,
                                 lang_models, allowed_langs,
                                 attach=attach))
        if first_resumed is None:
            first_resumed = resumed
        report["resumed_langid"] = resumed
        report["rows_langid"] = docs.count()

    src = docs
    q, resumed = store.run(
        "quality",
        lambda: _quality_gate(
            src, id_col, text_col, min_quality,
            "gopher" if quality_model == "gopher+rep" else quality_model,
            lang_col=eff_lang))
    if first_resumed is None:
        first_resumed = resumed
    report["rows_in"] = orig_docs.count() if not first_resumed else None
    report["resumed_quality"] = resumed
    report["rows_quality"] = q.count()

    if quality_model == "gopher+rep":
        # the repetition family is its own checkpointed stage and its
        # own funnel row, mirroring the single-pass decomposition
        q_in = q
        q, resumed = store.run(
            "repetition",
            lambda: _quality_gate(q_in, id_col, text_col, min_quality,
                                  "gopher_rep"))
        report["resumed_repetition"] = resumed
        report["rows_repetition"] = q.count()
    if attach is not None:
        q = q.drop(attach)

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

    if span_dedup_n is not None:
        from .operators.dedup import remove_duplicated_spans

        d_in = deduped
        # the checkpoint commits the REWRITE with its audit columns,
        # so a resumed run recovers both funnel metrics from the table
        rw, resumed = store.run(
            "span_dedup",
            lambda: remove_duplicated_spans(d_in, id_col, text_col,
                                            n=span_dedup_n))
        report["resumed_span_dedup"] = resumed
        sums = rw.agg(
            F.sum("n_words_removed").alias("w"),
            F.sum(F.when(F.col("n_words") > F.col("n_words_removed"),
                         1).otherwise(0)).alias("k")).first()
        report["span_words_removed"] = int(sums["w"] or 0)
        report["rows_span_dedup"] = int(sums["k"] or 0)
        deduped = (rw.filter(F.col("n_words") > F.col("n_words_removed"))
                     .select(*d_in.columns))

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


def corpus_drift_report(old_docs: DataFrame, new_docs: DataFrame,
                        text_col: str = "text",
                        length_hi: float = 5000.0) -> dict:
    """Snapshot-over-snapshot drift readout — the monitoring sweep run
    before a new corpus crawl replaces the previous one, composing the
    engine's drift detectors over ONE tagged union:

    - ``length_ks_d`` / ``length_ks_p``: exact two-sample KS on the
      character-length distribution (:func:`operators.twosample.ks_2sample`),
    - ``length_psi``: Population Stability Index over fixed-width
      length buckets ``[0, length_hi)``
      (:func:`operators.profile.distribution_psi`; < 0.1 stable,
      > 0.25 shifted),
    - ``word_jsd`` / ``n_shared_words``: Jensen–Shannon divergence
      between the two word distributions
      (:func:`operators.text.source_divergence`; 0 ≤ jsd ≤ ln 2),
    - ``n_old`` / ``n_new``: row counts.

    Every component is an already-oracle-checked operator
    (x241 / x90-family PSI / x222), so the report inherits their
    correctness evidence; all outputs are bounded scalars — safe to
    collect at any corpus size."""
    from .operators.profile import distribution_psi
    from .operators.text import source_divergence
    from .operators.twosample import ks_2sample

    from .util import retain_cache

    u = retain_cache(
        old_docs.select(F.lit("old").alias("__snap"),
                        F.col(text_col).alias("__text"),
                        F.length(text_col).cast("double")
                         .alias("__len"))
        .unionByName(
            new_docs.select(F.lit("new").alias("__snap"),
                            F.col(text_col).alias("__text"),
                            F.length(text_col).cast("double")
                             .alias("__len"))))
    ks_rows = ks_2sample(u, "__snap", "__len", "old").collect()
    ks = ks_rows[0] if ks_rows else None
    if ks is None or ks["n_a"] is None or ks["n_b"] is None:
        # degenerate snapshot (either side empty / all-NULL text):
        # report the counts and no statistics instead of crashing the
        # monitoring sweep
        n_old = old_docs.filter(F.col(text_col).isNotNull()).count()
        n_new = new_docs.filter(F.col(text_col).isNotNull()).count()
        return {"n_old": n_old, "n_new": n_new,
                "length_ks_d": None, "length_ks_p": None,
                "length_psi": None, "word_jsd": None,
                "n_shared_words": 0, "degenerate": True}
    psi = (distribution_psi(u, "__len", "__snap", "old", "new",
                            lo=0.0, hi=float(length_hi))
           .agg(F.round(F.sum("psi"), 6).alias("p")).first()["p"])
    jsd_rows = source_divergence(u, "__snap", "__text").collect()
    jsd = jsd_rows[0] if jsd_rows else None
    return {
        "n_old": int(ks["n_a"]), "n_new": int(ks["n_b"]),
        "length_ks_d": float(ks["d_stat"]),
        "length_ks_p": float(ks["p_value"]),
        "length_psi": float(psi) if psi is not None else None,
        "word_jsd": (float(jsd["jsd"]) if jsd is not None else None),
        "n_shared_words": (int(jsd["n_shared_words"])
                           if jsd is not None else 0),
    }
