"""End-to-end training-corpus pipeline: the canonical operator
composition must run on the fixture corpus, write balanced shards, and
self-report a coherent per-stage audit trail."""

import os

import pytest
from pyspark.sql import functions as F

from datum_spark.pipelines import build_training_corpus
from datum_spark.sources.registry import read_parquet_normalized

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return read_parquet_normalized(spark, f"{SF}/documents.parquet")


def test_pipeline_end_to_end(spark, corpus, tmp_path):
    eval_df = corpus.filter(F.col("doc_id") < 20)
    docs = corpus.filter(F.col("doc_id") >= 20)
    out = str(tmp_path / "shards")
    sharded, report = build_training_corpus(
        docs, eval_df, out, n_shards=4, min_quality=0.2,
        contamination_ngram=5,
        source_weights={"src0": 1.0}, default_weight=0.8)

    # monotone per-stage funnel, every stage did something sane
    assert (report["rows_in"] >= report["rows_quality"]
            >= report["rows_deduped"] >= report["rows_decontaminated"]
            >= report["rows_mixed"] > 0)
    # dedup actually collapsed something on this near-dup-seeded fixture
    assert report["rows_deduped"] < report["rows_quality"]
    # the write job observed exactly what landed on disk
    back = spark.read.parquet(out)
    assert back.count() == report["rows"] == report["rows_mixed"]
    assert report["tokens"] > 0 and report["token_budget"] > 0
    # round-7: the dedup stage's LSH bucket-cap loss is reported, never
    # silent — this clean fixture must show zero skipped buckets
    assert report["lsh_buckets"] > 0 and report["lsh_buckets_skipped"] == 0
    # hive shard layout, all shards present
    shards = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(shards) >= 2
    # no contaminated doc survived: re-screen the output -> empty
    from datum_spark.operators.dedup import benchmark_contamination
    assert benchmark_contamination(back, eval_df, "doc_id", "text",
                                   n=5).count() == 0


def test_pipeline_without_eval_set(spark, corpus, tmp_path):
    sharded, report = build_training_corpus(
        corpus.filter(F.col("doc_id") < 100), None,
        str(tmp_path / "s2"), n_shards=2, min_quality=0.0)
    assert report["rows_decontaminated"] == report["rows_deduped"]
    assert report["rows"] == report["rows_mixed"]


def test_pipeline_deterministic(spark, corpus, tmp_path):
    """Same input -> identical shard assignment and identical report
    (every stage is a pure function of the data)."""
    docs = corpus.filter(F.col("doc_id") >= 20)
    eval_df = corpus.filter(F.col("doc_id") < 20)
    s1, r1 = build_training_corpus(docs, eval_df, str(tmp_path / "a"),
                                   n_shards=4, contamination_ngram=5)
    s2, r2 = build_training_corpus(docs, eval_df, str(tmp_path / "b"),
                                   n_shards=4, contamination_ngram=5)
    assert r1 == r2
    a = {r["doc_id"]: r["shard"] for r in s1.select("doc_id", "shard").collect()}
    b = {r["doc_id"]: r["shard"] for r in s2.select("doc_id", "shard").collect()}
    assert a == b


def test_pipeline_resumable_matches_plain(spark, corpus, tmp_path):
    """workdir mode must produce the same corpus as the single-pass
    composition, and a second run must RESUME (no stage recompute) and
    still rewrite identical shards."""
    eval_df = corpus.filter(F.col("doc_id") < 20)
    docs = corpus.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 400))
    kw = dict(n_shards=2, min_quality=0.2, contamination_ngram=5,
              source_weights={"src0": 1.0}, default_weight=0.8)

    _, plain = build_training_corpus(docs, eval_df,
                                     str(tmp_path / "plain"), **kw)
    wd = str(tmp_path / "wd")
    _, r1 = build_training_corpus(docs, eval_df, str(tmp_path / "c1"),
                                  workdir=wd, run_id="cfg1", **kw)
    # same funnel as the plain composition
    for k in ("rows_quality", "rows_deduped", "rows_decontaminated",
              "rows_mixed", "rows", "tokens"):
        assert r1[k] == plain[k], k
    assert r1["resumed_quality"] is False and r1["resumed_deduped"] is False
    assert r1["lsh_buckets"] > 0          # flood stats present on compute
    # identical rows on disk
    a = {tuple(r) for r in spark.read.parquet(str(tmp_path / "plain"))
         .select("doc_id").collect()}
    b = {tuple(r) for r in spark.read.parquet(str(tmp_path / "c1"))
         .select("doc_id").collect()}
    assert a == b

    # second run: every checkpoint resumes; dedup must NOT be recomputed
    # — poison the operator to prove the stage never runs

    def _boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("dedup recomputed on resume")

    from datum_spark.operators import dedup as dedup_mod
    real = dedup_mod.near_dup_clusters
    dedup_mod.near_dup_clusters = _boom
    try:
        _, r2 = build_training_corpus(docs, eval_df, str(tmp_path / "c2"),
                                      workdir=wd, run_id="cfg1", **kw)
    finally:
        dedup_mod.near_dup_clusters = real
    assert r2["resumed_quality"] and r2["resumed_deduped"]
    assert r2["resumed_decontaminated"]
    assert r2["rows_deduped"] == r1["rows_deduped"]
    assert r2["rows"] == r1["rows"]
    c = {tuple(r) for r in spark.read.parquet(str(tmp_path / "c2"))
         .select("doc_id").collect()}
    assert c == a
    # a different run_id does not reuse cfg1's checkpoints
    _, r3 = build_training_corpus(docs, eval_df, str(tmp_path / "c3"),
                                  workdir=wd, run_id="cfg2", **kw)
    assert r3["resumed_deduped"] is False


def test_pipeline_learned_quality_gate(spark, corpus, tmp_path):
    """quality_model=(w, b) swaps the heuristic gate for the learned
    classifier: the funnel's quality stage keeps exactly the docs whose
    calibrated score clears the threshold."""
    from datum_spark.operators.classifier import (quality_classifier_fit,
                                                  quality_classifier_score)

    docs = corpus.filter(F.col("doc_id") >= 20)
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                     lambda t: t != "")
    share = (F.size(F.filter(words, lambda w: w.isin("the", "a")))
             / F.size(words))
    seed = (docs.withColumn("sh", share)
                .filter((F.col("sh") >= 0.09) | (F.col("sh") <= 0.03))
                .withColumn("y", (F.col("sh") >= 0.09).cast("int")))
    model = quality_classifier_fit(seed, "doc_id", "text", "y",
                                   n_buckets=256, steps=12, lr=4.0)
    _, report = build_training_corpus(
        docs, None, str(tmp_path / "lq"), n_shards=2,
        min_quality=0.5, quality_model=model)
    expect = (quality_classifier_score(docs, model[0], model[1],
                                       "doc_id", "text")
              .filter(F.col("score") >= 0.5).count())
    assert report["rows_quality"] == expect
    assert 0 < expect < docs.count()
    assert report["rows"] > 0


def test_pipeline_gopher_quality_gate(spark, corpus, tmp_path):
    """quality_model="gopher" gates on the published rule
    conjunction: the funnel's quality stage keeps exactly the
    gopher_pass docs (r12)."""
    from datum_spark.operators.text import gopher_rules

    docs = corpus.filter(F.col("doc_id") >= 20)
    _, report = build_training_corpus(
        docs, None, str(tmp_path / "gq"), n_shards=2,
        quality_model="gopher")
    expect = (gopher_rules(docs, "text")
              .filter(F.col("gopher_pass")).count())
    assert report["rows_quality"] == expect
    assert report["rows_quality"] <= report["rows_in"]


def test_pipeline_langid_and_perplexity_gates(spark, corpus, tmp_path):
    """Both r11 optional gates on: the language-ID first pass and the
    CCNet-style perplexity filter join the funnel with their own audit
    rows (monotone), and the resumable run resumes THROUGH the new
    stage checkpoints with identical results."""
    from datum_spark.operators.langid import language_classifier_fit
    from datum_spark.operators.unigram import unigram_trained_vocab

    # the fixture's lang labels are random w.r.t. the text, so make
    # them LEARNABLE by appending a per-language script marker — the
    # pipeline then demonstrates the gate actually separating
    docs = (corpus.filter(F.col("doc_id") >= 20)
            .withColumn("text", F.concat_ws(
                " ", F.col("text"), F.expr("repeat(lang, 10)"))))
    models = language_classifier_fit(docs, "doc_id", "text", "lang",
                                     n_buckets=32, steps=4, lr=2.0)
    _w, vocab = unigram_trained_vocab(docs, iters=1)
    # median nats/token threshold: keeps some, drops some
    from datum_spark.operators.unigram import unigram_doc_scores
    thr = (unigram_doc_scores(docs, vocab)
           .approxQuantile("nats_per_token", [0.5], 0.0)[0])
    kw = dict(n_shards=2, min_quality=0.0, lang_models=models,
              allowed_langs={"en", "fr", "de"}, unigram_vocab=vocab,
              max_nats_per_token=thr)
    _s, report = build_training_corpus(
        docs, None, str(tmp_path / "g1"), **kw)
    assert (report["rows_in"] >= report["rows_langid"]
            >= report["rows_quality"] >= report["rows_perplexity"]
            >= report["rows_deduped"] >= report["rows_mixed"] > 0)
    assert report["rows_langid"] < report["rows_in"]     # gate bit
    assert report["rows_perplexity"] < report["rows_quality"]

    # resumable: first run computes, second resumes every stage and
    # reproduces the same funnel counts
    wd = str(tmp_path / "wd")
    _s1, r1 = build_training_corpus(docs, None, str(tmp_path / "g2"),
                                    workdir=wd, run_id="gates", **kw)
    assert r1["resumed_langid"] is False
    assert r1["resumed_perplexity"] is False
    _s2, r2 = build_training_corpus(docs, None, str(tmp_path / "g3"),
                                    workdir=wd, run_id="gates", **kw)
    assert r2["resumed_langid"] and r2["resumed_quality"]
    assert r2["resumed_perplexity"] and r2["resumed_deduped"]
    for k in ("rows_langid", "rows_quality", "rows_perplexity",
              "rows_deduped", "rows_decontaminated", "rows_mixed"):
        assert r1[k] == r2[k] == report[k]
