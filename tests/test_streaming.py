"""Structured Streaming parity tests: every streaming operator's final
output must equal its batch twin over the same (finite) input — the
batch/stream unification that is Structured Streaming's core contract."""

import pytest
from pyspark.sql import functions as F

from datum_spark.sources.registry import read_parquet_normalized
from datum_spark.streaming import (
    clicks_purchases_join,
    read_events_stream,
    run_stream_to_memory,
    running_totals,
    running_totals_batch,
    session_agg,
    sliding_agg,
    stream_dedup,
    tumbling_agg,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_parquet_normalized(spark, f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def events_stream(spark):
    return read_events_stream(spark, SF)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


def test_stream_is_streaming(events_stream):
    assert events_stream.isStreaming
    # nanos ts must arrive as a real timestamp on the stream too
    assert dict(events_stream.dtypes)["ts"] == "timestamp"


def test_tumbling_parity(spark, events_batch, events_stream):
    run_stream_to_memory(tumbling_agg(events_stream), "t_tumble",
                         output_mode="complete")
    got = _rows(spark.table("t_tumble"), "w_start", "event_type")
    want = _rows(tumbling_agg(events_batch), "w_start", "event_type")
    assert got == want and len(want) > 0


def test_sliding_parity(spark, events_batch, events_stream):
    run_stream_to_memory(sliding_agg(events_stream), "t_slide",
                         output_mode="complete")
    got = _rows(spark.table("t_slide"), "w_start", "event_type")
    want = _rows(sliding_agg(events_batch), "w_start", "event_type")
    assert got == want and len(want) > 0


def test_session_parity(spark, events_batch, events_stream):
    # session windows require watermark + append/update in streaming
    run_stream_to_memory(session_agg(events_stream), "t_sess",
                         output_mode="complete")
    got = _rows(spark.table("t_sess"), "user_id", "session_start")
    want = _rows(session_agg(events_batch), "user_id", "session_start")
    assert got == want and len(want) > 0


def test_stream_dedup(spark, events_batch, events_stream):
    run_stream_to_memory(
        stream_dedup(events_stream, ["user_id", "event_type"]),
        "t_dedup", output_mode="append")
    # watermark-bounded dedup can keep more rows than a global batch dedup
    # (keys recur beyond the watermark horizon), never fewer; and it must
    # actually drop within-watermark duplicates.
    n_stream = spark.table("t_dedup").count()
    n_batch = events_batch.dropDuplicates(["user_id", "event_type"]).count()
    n_all = events_batch.count()
    assert n_batch <= n_stream < n_all


def test_stream_to_parquet_sink(tmp_path, spark, events_batch, events_stream):
    """Checkpointed file sink: append-mode windowed agg lands in Parquet.
    Append emits only watermark-finalized windows, so the sink holds a
    subset of the batch result (and the tail windows stay open)."""
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (tumbling_agg(events_stream).writeStream
         .outputMode("append").format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .start())
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    want = {tuple(r) for r in tumbling_agg(events_batch).collect()}
    assert got and got.issubset(want)


def test_stream_stream_join_parity(spark, events_batch):
    """Stream-stream time-interval join (two watermarked readStream inputs)
    must produce exactly the batch join's rows once input is exhausted."""
    s1 = read_events_stream(spark, SF)
    s2 = read_events_stream(spark, SF)
    run_stream_to_memory(clicks_purchases_join(s1, s2), "t_ssj",
                         output_mode="append")
    got = _rows(spark.table("t_ssj"), "click_id", "p_ts")
    want = _rows(clicks_purchases_join(events_batch, events_batch),
                 "click_id", "p_ts")
    assert got == want and len(want) > 0


def test_timer_sessionizer_matches_session_window(spark, events_batch):
    """transformWithStateInPandas sessionizer: every eagerly-emitted
    session must exactly match a session_window session from the batch
    twin (same user, start, end, count). Tail sessions that the final
    watermark never closed may be absent — that's the eager-emission
    contract, so emitted ⊆ batch and emitted is non-trivial."""
    from datum_spark.streaming.sessionizer import (
        sessionize_with_timers,
        tws_available,
    )

    if not tws_available():
        with pytest.raises(NotImplementedError):
            sessionize_with_timers(read_events_stream(spark, SF))
        pytest.skip("google.protobuf absent: transformWithState worker "
                    "protocol unavailable in this runtime")
    stream = read_events_stream(spark, SF)
    run_stream_to_memory(sessionize_with_timers(stream, gap="30 minutes"),
                         "t_timer_sess", output_mode="append")
    got = {tuple(r) for r in spark.table("t_timer_sess")
           .select("user_id", "session_start", "session_end", "n_events")
           .collect()}
    want = {tuple(r) for r in session_agg(events_batch, gap="30 minutes")
            .select("user_id", "session_start", "session_end",
                    F.col("n_events").cast("long")).collect()}
    assert got, "no sessions emitted"
    assert got.issubset(want), sorted(got - want)[:3]
    assert len(got) > len(want) * 0.5, (len(got), len(want))


def test_running_totals_stateful_parity(spark, events_batch, events_stream):
    """applyInPandasWithState running totals: the LAST update emitted per key
    must equal the batch groupBy aggregate over the full input."""
    run_stream_to_memory(running_totals(events_stream), "t_state",
                         output_mode="update")
    # in update mode each micro-batch appends a row per touched key; the
    # final state per key is the row with the max n_events
    latest = (spark.table("t_state")
              .groupBy("user_id")
              .agg(F.max(F.struct("n_events", "total_value", "last_ts"))
                   .alias("s"))
              .select("user_id", "s.n_events", "s.total_value", "s.last_ts"))
    got = _rows(latest, "user_id")
    want = _rows(running_totals_batch(events_batch), "user_id")
    assert got == want and len(want) > 0


def test_streaming_funnel_parity(spark, events_batch, events_stream):
    """applyInPandasWithState funnel: the final update per user must equal
    the batch funnel (operators.events.funnel, query x71) over the same
    finite input."""
    from datum_spark.operators.events import funnel
    from datum_spark.streaming import streaming_funnel

    run_stream_to_memory(
        streaming_funnel(events_stream, "signup", "purchase",
                         within_s=86400),
        "t_funnel", output_mode="update")
    # update mode: keep the latest state per user = min ts_a, then best
    # (converted, earliest qualifying ts_b) — later updates only improve
    latest = (spark.table("t_funnel")
              .groupBy("user_id")
              .agg(F.min("ts_a").alias("ts_a"),
                   F.min("ts_b").alias("ts_b"),
                   F.max("converted").alias("converted"))
              .withColumn(
                  "delay_s",
                  (F.unix_timestamp("ts_b")
                   - F.unix_timestamp("ts_a")).cast("long")))
    want_df = funnel(events_batch, "signup", "purchase", within_s=86400)
    got = _rows(latest.select("user_id", "ts_a", "ts_b", "converted",
                              "delay_s"), "user_id")
    want = _rows(want_df.select(
        "user_id", "ts_a", "ts_b",
        F.col("converted").cast("int").alias("converted"),
        F.col("delay_s").cast("long").alias("delay_s")), "user_id")
    assert got == want and len(want) > 0


class _FakeState:
    """Minimal GroupState stub for driving the funnel state fn directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True

    def remove(self):
        self._v, self.exists = None, False

    def getCurrentWatermarkMs(self):
        return 0

    def setTimeoutTimestamp(self, ms):
        pass


def test_funnel_late_earlier_step_a_invalidates_stale_b():
    """A later micro-batch delivering an EARLIER step_a moves the window
    start; a B that qualified under the old ts_a but is outside within_s
    of the new one must stop counting as converted (ADVICE r4)."""
    import pandas as pd

    from datum_spark.streaming.stateful import _funnel_fn_factory

    fn = _funnel_fn_factory("signup", "purchase", within_s=100)
    st = _FakeState()

    def batch(rows):
        return list(fn((7,), iter([pd.DataFrame(
            {"user_id": [7] * len(rows),
             "event_type": [r[0] for r in rows],
             "ts": [pd.Timestamp(r[1], unit="s") for r in rows]})]), st))

    # batch 1: A @1000, B @1050 → qualifies (within 100s), converted
    out = batch([("signup", 1000), ("purchase", 1050)])
    assert out[0]["converted"].iloc[0] == 1

    # batch 2: late EARLIER A @100 → window is now [100, 200]; the stored
    # B @1050 no longer qualifies and min-B re-derive can't save it
    out = batch([("signup", 100)])
    assert out[0]["converted"].iloc[0] == 0
    assert out[0]["ts_b"].isna().iloc[0]

    # batch 3: B @150 arrives → converts under the new window
    out = batch([("purchase", 150)])
    assert out[0]["converted"].iloc[0] == 1
    assert out[0]["delay_s"].iloc[0] == 50


def test_streaming_debounce_parity(spark, events_batch, events_stream):
    from datum_spark.operators.events import debounce
    from datum_spark.streaming.stateful import streaming_debounce

    run_stream_to_memory(streaming_debounce(events_stream, within_s=600),
                         "t_debounce", output_mode="append")
    got = _rows(spark.table("t_debounce"), "user_id", "event_type", "ts")
    want = _rows(debounce(events_batch, ["user_id", "event_type"], "ts",
                          within_s=600)
                 .select("user_id", "event_type", "ts"),
                 "user_id", "event_type", "ts")
    assert got == want


def test_streaming_cms_parity(spark, events_batch, events_stream):
    """Stream==batch: the streaming CMS counter table over event_type
    equals cms_build on the same finite input — and its state is the
    fixed cell space, not the key universe."""
    from datum_spark.operators.sketches import cms_build
    from datum_spark.streaming.windows import streaming_cms

    run_stream_to_memory(
        streaming_cms(events_stream, "event_type", depth=4, width=64),
        "cms_stream", output_mode="complete")
    got = {(r["row"], r["bucket"]): r["n"]
           for r in spark.table("cms_stream").collect()}
    want = {(r["row"], r["bucket"]): r["n"]
            for r in cms_build(events_batch, "event_type",
                               depth=4, width=64).collect()}
    assert got == want and len(want) <= 4 * 64


def test_streaming_last_wins_cdc_parity(spark, events_batch, events_stream):
    """Streaming CDC materialization: the final update per key must equal
    the batch last_wins reduction with seq = (ts, event_id)."""
    from datum_spark.operators.cdc import last_wins
    from datum_spark.streaming.stateful import streaming_last_wins

    def to_changelog(df):
        return df.select(
            "user_id", "ts", "event_id",
            F.when(F.col("event_type") == "error", F.lit("D"))
             .otherwise(F.lit("U")).alias("op"),
            "value")

    run_stream_to_memory(streaming_last_wins(to_changelog(events_stream)),
                         "t_cdc", output_mode="update")
    # final state per key = emission with the greatest ts (state is
    # monotone in (ts, event_id), and ts alone is unique per key here)
    latest = (spark.table("t_cdc")
              .groupBy("user_id")
              .agg(F.max(F.struct("ts", "op", "value")).alias("s"))
              .select("user_id", "s.ts", "s.op", "s.value"))
    got = _rows(latest, "user_id")
    want = _rows(last_wins(to_changelog(events_batch),
                           ["user_id"], ["ts", "event_id"])
                 .select("user_id", "ts", "op", "value"), "user_id")
    assert got == want and len(want) > 0


def test_streaming_ohlc_parity(spark, events_batch, events_stream):
    """OHLC bars: streaming result over the finite input equals the batch
    run of the same aggregation (stream==batch unification)."""
    from datum_spark.streaming.windows import ohlc_agg

    run_stream_to_memory(ohlc_agg(events_stream), "t_ohlc",
                         output_mode="complete")
    got = _rows(spark.table("t_ohlc"), "w_start", "event_type")
    want = _rows(ohlc_agg(events_batch), "w_start", "event_type")
    assert got == want and len(want) > 0


def test_upsert_sink_exactly_once(spark, events_stream, events_batch,
                                  tmp_path):
    """foreachBatch + Table.upsert: replaying the whole input against a
    FRESH checkpoint (at-least-once delivery, worst case) leaves the
    table identical — the idempotent-sink half of exactly-once."""
    import datum_spark
    from datum_spark.streaming.stateful import upsert_sink

    db = datum_spark.connect(str(tmp_path / "wh"), spark=spark)
    db.create_table("totals", [{"name": "user_id", "type": "num"},
                               {"name": "n", "type": "num"}])
    agg = (events_stream.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("double").alias("n"))
           .select(F.col("user_id").cast("double"), "n"))

    def run(ckpt):
        q = upsert_sink(agg, db["totals"], ["user_id"],
                        str(tmp_path / ckpt))
        q.processAllAvailable()
        q.stop()

    run("ck1")
    first = sorted((r["user_id"], r["n"]) for r in db["totals"].read())
    run("ck2")     # full replay from scratch: must change nothing
    second = sorted((r["user_id"], r["n"]) for r in db["totals"].read())
    want = sorted((float(r.user_id), float(r.n)) for r in
                  events_batch.groupBy("user_id")
                  .agg(F.count(F.lit(1)).alias("n")).collect())
    assert first == second == want and len(want) > 0


def test_contamination_sink_stream_equals_batch(spark, tmp_path):
    """Streaming ingest decontamination (foreachBatch over a docs stream)
    must flag exactly the rows the batch operator flags on the union —
    per-doc hits depend only on the static eval set, so batching is
    invisible (the structural parity the sink docstring claims)."""
    from datum_spark.operators.dedup import benchmark_contamination
    from datum_spark.streaming.stateful import contamination_sink

    import shutil

    # the streaming file source needs a DIRECTORY; stage a copy
    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    shutil.copy(f"{SF}/documents.parquet", src_dir / "part-0.parquet")
    batch_docs = spark.read.parquet(str(src_dir))
    eval_df = batch_docs.filter(F.col("doc_id") < 20)
    corpus_b = batch_docs.filter(F.col("doc_id") >= 20)

    stream = (spark.readStream.schema(batch_docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src_dir))
              .filter(F.col("doc_id") >= 20))
    out = str(tmp_path / "contam")
    q = contamination_sink(stream, eval_df, out,
                           str(tmp_path / "ckpt"), n=5)
    q.processAllAvailable()
    q.stop()

    got = {tuple(r) for r in
           spark.read.parquet(out).drop("batch").collect()}
    want = {tuple(r) for r in benchmark_contamination(
        corpus_b, eval_df, "doc_id", "text", n=5).collect()}
    assert got == want and len(want) > 0


def test_ingest_sink_stream_equals_batch(spark, tmp_path):
    """Daily-ingest gate: survivors of the streamed multi-batch run must
    equal the batch composition (near-dup screen vs static corpus, then
    decontamination) over the whole delta — both screens are per-doc
    decisions against static side inputs, so batching is invisible."""
    from datum_spark.operators.dedup import (
        benchmark_contamination,
        incremental_near_dups_md5,
    )
    from datum_spark.streaming.stateful import ingest_sink

    all_docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = all_docs.filter(F.col("doc_id") < 200)
    eval_df = all_docs.filter((F.col("doc_id") >= 200)
                              & (F.col("doc_id") < 220))
    delta = all_docs.filter(F.col("doc_id") >= 220)

    # stage the delta as 4 files -> 4 micro-batches
    src_dir = str(tmp_path / "delta_in")
    delta.repartition(4).write.parquet(src_dir)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = str(tmp_path / "accepted")
    q = ingest_sink(stream, corpus, eval_df, out,
                    str(tmp_path / "ckpt"), contamination_ngram=5)
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # at-least-once replay: re-running a micro-batch with its original
    # batch_id overwrites its own batch=<id> dir — output unchanged
    from datum_spark.streaming.stateful import _idempotent_batch_write
    b0 = spark.read.parquet(out).filter(F.col("batch") == 0).drop("batch")
    replay = spark.createDataFrame(b0.collect(), b0.schema)  # materialize
    _idempotent_batch_write(replay, 0, out)
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == got

    # batch twin over the whole delta
    dup_ids = (incremental_near_dups_md5(delta, corpus, "doc_id", "text")
               .select(F.col("delta_id").alias("doc_id")).distinct())
    keep = delta.join(dup_ids, "doc_id", "anti")
    cont = benchmark_contamination(keep, eval_df, "doc_id", "text",
                                   n=5).select("doc_id")
    want = {r["doc_id"] for r in
            keep.join(cont, "doc_id", "anti").collect()}
    assert got == want
    # the gate actually gates on this near-dup-seeded fixture
    assert 0 < len(got) < delta.count()


def test_ingest_sink_gopher_quality_gate_parity(spark, tmp_path):
    """r12: the streaming ingest gate's optional quality screen
    (quality_model="gopher") equals the batch composition of the SAME
    gate function, with its own funnel row; disabled gates stay
    NULL."""
    from datum_spark.operators.dedup import (
        benchmark_contamination,
        incremental_near_dups_md5,
    )
    from datum_spark.pipelines import _quality_gate
    from datum_spark.streaming.stateful import ingest_sink

    all_docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = all_docs.filter(F.col("doc_id") < 200)
    eval_df = all_docs.filter((F.col("doc_id") >= 200)
                              & (F.col("doc_id") < 220))
    delta = all_docs.filter(F.col("doc_id") >= 220)
    src_dir = str(tmp_path / "delta_in")
    delta.repartition(3).write.parquet(src_dir)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = str(tmp_path / "accepted")
    q = ingest_sink(stream, corpus, eval_df, out,
                    str(tmp_path / "ckpt"), contamination_ngram=5,
                    quality_model="gopher", with_funnel=True)
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    g = _quality_gate(delta, "doc_id", "text", 0.3, "gopher")
    dup_ids = (incremental_near_dups_md5(g, corpus, "doc_id", "text")
               .select(F.col("delta_id").alias("doc_id")).distinct())
    keep = g.join(dup_ids, "doc_id", "anti")
    cont = benchmark_contamination(keep, eval_df, "doc_id", "text",
                                   n=5).select("doc_id")
    want = {r["doc_id"] for r in
            keep.join(cont, "doc_id", "anti").collect()}
    assert got == want
    n_delta, n_q = delta.count(), g.count()
    assert 0 < n_q < n_delta            # the gate actually gates
    funnel = spark.read.parquet(out + "/_funnel")
    sums = funnel.agg(F.sum("rows_in").alias("i"),
                      F.sum("rows_quality").alias("q"),
                      F.sum("rows_langid").alias("l"),
                      F.sum("rows_perplexity").alias("p")).first()
    assert (sums["i"], sums["q"]) == (n_delta, n_q)
    assert sums["l"] is None and sums["p"] is None   # gates off


def test_ingest_sink_langid_perplexity_funnel_parity(spark, tmp_path):
    """r12 streaming parity for the batch pipeline's optional gates:
    with language + perplexity screens on, the streamed multi-batch
    survivors equal the batch composition of the SAME gate functions,
    and the per-batch funnel rows sum to the batch funnel."""
    from datum_spark.operators.dedup import (
        benchmark_contamination,
        incremental_near_dups_md5,
    )
    from datum_spark.operators.langid import language_classifier_fit
    from datum_spark.operators.unigram import (unigram_doc_scores,
                                               unigram_trained_vocab)
    from datum_spark.pipelines import _langid_gate, _perplexity_gate
    from datum_spark.streaming.stateful import ingest_sink

    import random as _random

    # three fake 'languages' with disjoint alphabets (the langid test
    # fixture) so every screen genuinely bites: cc is disallowed,
    # near-copies trip the dedup screen, shared texts trip the
    # contamination screen, and a median threshold splits perplexity
    _random.seed(11)
    alph = {"aa": "abcdefg", "bb": "hijklmn", "cc": "opqrstu"}

    def _doc(lg):
        return " ".join("".join(_random.choice(alph[lg])
                                for _ in range(5)) for _ in range(12))

    rows, i = [], 0
    for lg in ("aa", "bb", "cc"):
        for _ in range(30):
            rows.append((i, _doc(lg), lg))
            i += 1
    corpus = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    drows, j = [], 100
    for lg in ("aa", "bb", "cc"):
        for k in range(20):
            drows.append((j, _doc(lg), lg))
            j += 1
    # 5 near-copies of corpus aa docs -> the near-dup screen bites
    for k in range(5):
        drows.append((j + k, rows[k][1] + " x", "aa"))
    delta = spark.createDataFrame(
        drows, "doc_id long, text string, lang string")
    # 3 delta texts appear verbatim in the eval set -> contamination
    eval_df = spark.createDataFrame(
        [(900 + k, drows[k][1]) for k in range(3)],
        "doc_id long, text string")
    models = language_classifier_fit(corpus, "doc_id", "text", "lang",
                                     n_buckets=64, steps=4, lr=2.0)
    allowed = ["aa", "bb"]
    _w, vocab = unigram_trained_vocab(corpus)
    # threshold at the delta median so the perplexity gate bites
    med = (unigram_doc_scores(delta, vocab)
           .agg(F.expr("percentile(nats_per_token, 0.5D)")).first()[0])

    src_dir = str(tmp_path / "delta_in")
    delta.repartition(3).write.parquet(src_dir)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = str(tmp_path / "accepted")
    q = ingest_sink(stream, corpus, eval_df, out,
                    str(tmp_path / "ckpt"), contamination_ngram=5,
                    lang_models=models, allowed_langs=allowed,
                    unigram_vocab=vocab, max_nats_per_token=med,
                    with_funnel=True)
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # batch twin through the SAME gate functions, in the same order
    g1 = _langid_gate(delta, "doc_id", "text", models, allowed)
    g2 = _perplexity_gate(g1, "doc_id", "text", vocab, med)
    dup_ids = (incremental_near_dups_md5(g2, corpus, "doc_id", "text")
               .select(F.col("delta_id").alias("doc_id")).distinct())
    keep = g2.join(dup_ids, "doc_id", "anti")
    cont = benchmark_contamination(keep, eval_df, "doc_id", "text",
                                   n=5).select("doc_id")
    final = keep.join(cont, "doc_id", "anti")
    want = {r["doc_id"] for r in final.collect()}
    assert got == want
    # both gates actually gated
    n_delta, n_g1, n_g2 = delta.count(), g1.count(), g2.count()
    assert n_g1 < n_delta and n_g2 < n_g1

    # funnel rows: hidden from out_path readers, sums match the batch
    funnel = spark.read.parquet(out + "/_funnel")
    sums = funnel.agg(
        F.sum("rows_in").alias("i"), F.sum("rows_langid").alias("l"),
        F.sum("rows_perplexity").alias("p"),
        F.sum("rows_deduped").alias("d"),
        F.sum("rows_decontaminated").alias("c")).first()
    assert (sums["i"], sums["l"], sums["p"]) == (n_delta, n_g1, n_g2)
    assert sums["d"] == keep.count() and sums["c"] == len(want)
    assert "rows_in" not in spark.read.parquet(out).columns


def test_kmv_sink_stream_equals_batch_and_replay_safe(spark, tmp_path):
    """Streaming KMV fold: after consuming the stream in multiple
    micro-batches, the persisted per-group sketches must EQUAL the
    batch sketch of the whole input (bottom-k of a set union is
    batching-invariant), and re-folding a batch (at-least-once replay)
    must leave the state unchanged (semilattice idempotence)."""
    import shutil

    from datum_spark.operators.sketches import kmv_build
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import kmv_sink

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    # several input files -> several micro-batches (maxFilesPerTrigger=1)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(str(src_dir))
    batch_docs = spark.read.parquet(str(src_dir))

    words = F.explode(F.filter(F.split(F.lower("text"), r"\s+"),
                               lambda t: t != "")).alias("w")
    batch_terms = batch_docs.select("source", words)

    state = SnapshotTable.create(spark, str(tmp_path / "kmv_state"))
    stream = (spark.readStream.schema(batch_docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src_dir))
              .select("source", words))
    q = kmv_sink(stream, "w", ["source"], state,
                 str(tmp_path / "ckpt"), k=32)
    q.processAllAvailable()
    q.stop()
    assert state.current_version() >= 3     # one fold per micro-batch

    got = {r["source"]: list(r["kmv"])
           for r in state.read().collect()}
    want = {r["source"]: list(r["kmv"])
            for r in kmv_build(batch_terms, "w", ["source"],
                               k=32).collect()}
    assert got == want and len(want) > 0

    # replay: fold the ENTIRE input once more into the existing state —
    # the semilattice absorbs it (state unchanged)
    q2 = kmv_sink(
        (spark.readStream.schema(batch_docs.schema)
         .option("maxFilesPerTrigger", 3).parquet(str(src_dir))
         .select("source", words)),
        "w", ["source"], state, str(tmp_path / "ckpt2"), k=32)
    q2.processAllAvailable()
    q2.stop()
    after = {r["source"]: list(r["kmv"])
             for r in state.read().collect()}
    assert after == want


def test_ingest_sink_composed_quality_gate_parity(spark, tmp_path):
    """r13: the streaming quality screen accepts the full rule-set
    sentinel family; "gopher+rep" runs as two screens whose
    rows_quality / rows_repetition funnel rows sum to the batch
    decomposition, and the survivors equal the batch composition of
    the SAME gate functions."""
    from datum_spark.operators.dedup import incremental_near_dups_md5
    from datum_spark.pipelines import _quality_gate
    from datum_spark.streaming.stateful import ingest_sink

    all_docs = spark.read.parquet(f"{SF}/documents.parquet")
    # a small corpus slice so some quality survivors are NOT near-dups
    corpus = all_docs.filter(F.col("doc_id") < 50)
    delta = all_docs.filter(F.col("doc_id") >= 220)
    src_dir = str(tmp_path / "delta_in")
    delta.repartition(3).write.parquet(src_dir)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = str(tmp_path / "accepted")
    q = ingest_sink(stream, corpus, None, out,
                    str(tmp_path / "ckpt"),
                    quality_model="gopher+rep", with_funnel=True)
    q.processAllAvailable()
    q.stop()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}

    g1 = _quality_gate(delta, "doc_id", "text", 0.3, "gopher")
    g2 = _quality_gate(g1, "doc_id", "text", 0.3, "gopher_rep")
    dup_ids = (incremental_near_dups_md5(g2, corpus, "doc_id", "text")
               .select(F.col("delta_id").alias("doc_id")).distinct())
    want = {r["doc_id"] for r in
            g2.join(dup_ids, "doc_id", "anti").collect()}
    assert got == want and len(got) > 0
    funnel = spark.read.parquet(out + "/_funnel")
    sums = funnel.agg(F.sum("rows_in").alias("i"),
                      F.sum("rows_quality").alias("q"),
                      F.sum("rows_repetition").alias("r")).first()
    assert sums["i"] == delta.count()
    assert sums["q"] == g1.count()
    assert sums["r"] == g2.count() <= sums["q"]


def test_ingest_sink_c4_line_filter_parity(spark, tmp_path):
    """r13: the streaming pre-stage line filter equals the batch
    composition of the SAME _c4_line_stage (per-doc rewrite — parity
    is structural), with its own funnel row."""
    from datum_spark.operators.dedup import incremental_near_dups_md5
    from datum_spark.pipelines import _c4_line_stage
    from datum_spark.streaming.stateful import ingest_sink

    all_docs = (spark.read.parquet(f"{SF}/documents.parquet")
                .withColumn("text", F.regexp_replace(
                    F.col("text"), " data ", ".\n")))
    corpus = all_docs.filter(F.col("doc_id") < 50)
    delta = all_docs.filter(F.col("doc_id") >= 220)
    src_dir = str(tmp_path / "delta_in")
    delta.repartition(2).write.parquet(src_dir)
    stream = (spark.readStream.schema(delta.schema)
              .option("maxFilesPerTrigger", 1).parquet(src_dir))
    out = str(tmp_path / "accepted")
    q = ingest_sink(stream, corpus, None, out, str(tmp_path / "ckpt"),
                    c4_line_filter=True, with_funnel=True)
    q.processAllAvailable()
    q.stop()
    got = {(r["doc_id"], r["text"]) for r in
           spark.read.parquet(out).collect()}

    lf = _c4_line_stage(delta, "text")
    dup_ids = (incremental_near_dups_md5(lf, corpus, "doc_id", "text")
               .select(F.col("delta_id").alias("doc_id")).distinct())
    keep = lf.join(dup_ids, "doc_id", "anti")
    want = {(r["doc_id"], r["text"]) for r in keep.collect()}
    assert got == want and len(got) > 0
    funnel = spark.read.parquet(out + "/_funnel")
    sums = funnel.agg(F.sum("rows_in").alias("i"),
                      F.sum("rows_line_filtered").alias("lf"),
                      F.sum("rows_quality").alias("q")).first()
    assert sums["i"] == delta.count()
    assert sums["lf"] == lf.count() < sums["i"]
    assert sums["q"] is None             # quality gate off


def test_mg_sink_guarantees_and_replay_guard(spark, tmp_path):
    """r13 streaming heavy hitters: after consuming the stream in
    micro-batches, the persisted MG state keeps the merged-summary
    guarantee against EXACT whole-stream counts (est <= true,
    true - est <= N/(k+1), every above-bound term present), and a
    replayed batch id is a no-op (the last_batch watermark)."""
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import mg_sink

    src_dir = tmp_path / "ev_in"
    src_dir.mkdir()
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_type")
    ev.repartition(3).write.mode("overwrite").parquet(str(src_dir))
    whole = spark.read.parquet(str(src_dir))

    state = SnapshotTable.create(spark, str(tmp_path / "mg_state"))
    stream = (spark.readStream.schema(whole.schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src_dir)))
    q = mg_sink(stream, "event_type", state,
                str(tmp_path / "ckpt"), k=4)
    q.processAllAvailable()
    q.stop()

    rows = state.read().collect()
    n_total = rows[0]["n_total"]
    assert n_total == whole.count()
    est = {r["term"]: r["est"] for r in rows}
    exact = {r["event_type"]: r["c"] for r in
             whole.groupBy("event_type")
                  .agg(F.count(F.lit(1)).alias("c")).collect()}
    bound = n_total / 5.0
    for t, e in est.items():
        assert 0 <= exact[t] - e <= bound, (t, e)
    for t, c in exact.items():
        if c > bound:
            assert t in est, t                  # heavy must appear

    # replay guard: re-running the SAME checkpoint re-delivers nothing,
    # and manually folding an already-seen batch id is a no-op
    before = sorted((r["term"], r["est"]) for r in rows)
    q2 = mg_sink((spark.readStream.schema(whole.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(src_dir))),
                 "event_type", state, str(tmp_path / "ckpt"), k=4)
    q2.processAllAvailable()
    q2.stop()
    after = sorted((r["term"], r["est"])
                   for r in state.read().collect())
    assert after == before


def test_rollup_sink_stream_equals_recompute(spark, tmp_path):
    """r13 streaming rollup maintenance: after consuming an I/D change
    stream in micro-batches, the persisted rollup equals the GROUP BY
    recompute over the net rows (abelian fold), and a replayed batch
    id is a no-op."""
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import rollup_sink

    o = (spark.read.parquet(f"{SF}/orders.parquet")
         .select("o_orderkey", "o_orderpriority", "o_totalprice"))
    b1 = (o.filter(F.col("o_orderkey") % 3 == 0)
           .withColumn("op", F.lit("I")))
    b2 = (o.filter(F.col("o_orderkey") % 6 == 0)
           .withColumn("op", F.lit("D")))
    src = tmp_path / "chg"
    src.mkdir()
    b1.coalesce(1).write.parquet(str(src / "f1"))
    b2.coalesce(1).write.parquet(str(src / "f2"))
    whole = spark.read.option("recursiveFileLookup", "true") \
                 .parquet(str(src))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = rollup_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt"), ["o_orderpriority"],
        ["o_totalprice"])
    q.processAllAvailable()
    q.stop()
    got = {r["o_orderpriority"]: (r["n"], round(r["sum_o_totalprice"],
                                                2))
           for r in state.read().collect()}
    net = (o.filter((F.col("o_orderkey") % 3 == 0)
                    & (F.col("o_orderkey") % 6 != 0))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("s")))
    want = {r["o_orderpriority"]: (r["n"], r["s"])
            for r in net.collect()}
    assert got == want and len(want) > 0

    # replay of the whole stream under a fresh checkpoint: batch ids
    # restart at 0 <= last watermark -> every fold is a no-op
    before = got
    q2 = rollup_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 2)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt2"), ["o_orderpriority"],
        ["o_totalprice"])
    q2.processAllAvailable()
    q2.stop()
    after = {r["o_orderpriority"]: (r["n"],
                                    round(r["sum_o_totalprice"], 2))
             for r in state.read().collect()}
    assert after == before


def test_ewma_sink_stream_equals_batch(spark, tmp_path):
    """r13 streaming EWMA maintenance: after consuming a time-ordered
    event stream in micro-batches, the persisted per-key state equals
    the batch ewma_summary fold over the whole input (same fold code,
    seeded continuation), a replayed batch id is a no-op, and a late
    point is dropped-and-counted, never silently folded."""
    from datum_spark.operators.timeseries import ewma_summary
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import ewma_sink

    ev = (read_parquet_normalized(spark, f"{SF}/events.parquet")
          .select("user_id", "ts", "event_id", "value"))
    src = tmp_path / "ev"
    src.mkdir()
    # cut by ts so the three files are time-ordered across the stream
    # (the sink's documented ingest contract)
    all_ts = [r[0] for r in ev.orderBy("ts").select("ts").collect()]
    t1, t2 = all_ts[len(all_ts) // 3], all_ts[2 * len(all_ts) // 3]
    (ev.filter(F.col("ts") < t1).coalesce(1)
       .write.parquet(str(src / "f1")))
    (ev.filter((F.col("ts") >= t1) & (F.col("ts") < t2)).coalesce(1)
       .write.parquet(str(src / "f2")))
    (ev.filter(F.col("ts") >= t2).coalesce(1)
       .write.parquet(str(src / "f3")))
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(src)))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = ewma_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt"),
        "user_id", "ts", "value", alpha=0.3)
    q.processAllAvailable()
    q.stop()
    got = {r["user_id"]: (r["n_events"], round(r["s"], 6),
                          round(r["err_sum"], 6), r["n_late"])
           for r in state.read().collect()}
    want = {}
    for r in ewma_summary(ev, "user_id", "ts", "value",
                          alpha=0.3).collect():
        err = (0.0 if r["mae_1step"] is None
               else r["mae_1step"] * (r["n_events"] - 1))
        want[r["user_id"]] = (r["n_events"], r["ewma_last"],
                              round(err, 4), 0)
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert got[k][0] == want[k][0], k          # n_events
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-5), k
        assert got[k][2] == pytest.approx(want[k][2], abs=1e-4), k
        assert got[k][3] == 0, k                   # no late drops

    # replay with a fresh checkpoint: batch ids restart at 0, every
    # fold is a no-op
    before = {r["user_id"]: (r["n_events"], r["s"])
              for r in state.read().collect()}
    q2 = ewma_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 2)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt2"),
        "user_id", "ts", "value", alpha=0.3)
    q2.processAllAvailable()
    q2.stop()
    after = {r["user_id"]: (r["n_events"], r["s"])
             for r in state.read().collect()}
    assert after == before


def test_ewma_sink_drops_and_counts_late_points(spark, tmp_path):
    """A point at or before a key's (ts, tie) high-water mark violates
    the ordered-ingest contract: it must be dropped from the fold and
    surfaced in n_late."""
    import pandas as pd

    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import ewma_sink

    t0 = pd.Timestamp("2024-01-01")
    b1 = pd.DataFrame({
        "user_id": [1, 1], "ts": [t0, t0 + pd.Timedelta(minutes=1)],
        "event_id": [0, 1], "value": [10.0, 20.0]})
    b2 = pd.DataFrame({
        "user_id": [1, 1],
        "ts": [t0 + pd.Timedelta(seconds=30),      # LATE: before hwm
               t0 + pd.Timedelta(minutes=2)],
        "event_id": [2, 3], "value": [99.0, 40.0]})
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(src)))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = ewma_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt"),
        "user_id", "ts", "value", alpha=0.3)
    q.processAllAvailable()
    q.stop()
    r = state.read().collect()[0]
    # fold over 10, 20, 40 only: s = .7*(.7*10+.3*20)+.3*40 = 21.4
    assert r["n_events"] == 3 and r["n_late"] == 1
    assert r["s"] == pytest.approx(0.7 * (0.7 * 10 + 0.3 * 20)
                                   + 0.3 * 40, abs=1e-9)
    assert r["err_sum"] == pytest.approx(abs(20 - 10)
                                         + abs(40 - 13.0), abs=1e-9)


def test_cusum_sink_stream_equals_batch_monitor(spark, tmp_path):
    """r13 streaming CUSUM monitoring: calibrate reference moments on
    a pre-period, stream the monitored period in time-ordered
    micro-batches — the persisted per-key state must equal the batch
    cusum_monitor fold over the whole monitored window (same fold
    code, seeded continuation, whole-stream first_alarm index), and a
    replay is a no-op."""
    from datum_spark.operators.timeseries import (cusum_monitor,
                                                  cusum_reference)
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import cusum_sink

    ev = (read_parquet_normalized(spark, f"{SF}/events.parquet")
          .select("user_id", "ts", "event_id", "value"))
    all_ts = [r[0] for r in ev.orderBy("ts").select("ts").collect()]
    t_cal = all_ts[len(all_ts) // 3]          # first third calibrates
    t_mid = all_ts[2 * len(all_ts) // 3]
    cal = ev.filter(F.col("ts") < t_cal)
    mon = ev.filter(F.col("ts") >= t_cal)
    ref = cusum_reference(cal, "user_id", "ts", "value")

    src = tmp_path / "mon"
    src.mkdir()
    (mon.filter(F.col("ts") < t_mid).coalesce(1)
        .write.parquet(str(src / "f1")))
    (mon.filter(F.col("ts") >= t_mid).coalesce(1)
        .write.parquet(str(src / "f2")))
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(src)))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = cusum_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        ref, state, str(tmp_path / "ckpt"),
        "user_id", "ts", "value")
    q.processAllAvailable()
    q.stop()
    got = {r["user_id"]: (r["n_events"], r["n_alarms"],
                          r["first_alarm"], round(r["g_max"], 6),
                          r["n_late"])
           for r in state.read().collect()}
    want = {r["user_id"]: (r["n_events"], r["n_alarms"],
                           r["first_alarm"], r["g_max"])
            for r in cusum_monitor(mon, ref, "user_id", "ts",
                                   "value").collect()}
    assert set(got) == set(want) and len(want) > 0
    alarms_total = 0
    for k in want:
        assert got[k][0] == want[k][0], k            # n_events
        assert got[k][1] == want[k][1], k            # n_alarms
        assert got[k][2] == want[k][2], k            # first_alarm
        if want[k][3] is not None:
            assert got[k][3] == pytest.approx(want[k][3],
                                              abs=1e-6), k
        assert got[k][4] == 0, k                     # no late drops
        alarms_total += want[k][1]
    assert alarms_total > 0      # the monitored period actually fires

    before = got
    q2 = cusum_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 2)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        ref, state, str(tmp_path / "ckpt2"),
        "user_id", "ts", "value")
    q2.processAllAvailable()
    q2.stop()
    after = {r["user_id"]: (r["n_events"], r["n_alarms"],
                            r["first_alarm"], round(r["g_max"], 6),
                            r["n_late"])
             for r in state.read().collect()}
    assert after == before


def test_psi_sink_stream_equals_batch_psi(spark, tmp_path):
    """r13 streaming PSI drift monitor: after consuming the stream in
    micro-batches, the persisted per-bucket PSI table equals
    distribution_psi over (reference rows + all streamed rows) — the
    abelian count fold plus the SHARED formula function; replay is a
    no-op and a planted shift pushes psi_total past 0.25."""
    from datum_spark.operators.profile import (distribution_psi,
                                               psi_bucket)
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import psi_sink

    ev = (read_parquet_normalized(spark, f"{SF}/events.parquet")
          .select("event_id", "ts", "value"))
    all_ts = [r[0] for r in ev.orderBy("ts").select("ts").collect()]
    t_cal, t_mid = (all_ts[len(all_ts) // 3],
                    all_ts[2 * len(all_ts) // 3])
    lo, hi, bk = 0.0, 200.0, 10
    refd = ev.filter(F.col("ts") < t_cal)
    mon = ev.filter(F.col("ts") >= t_cal).withColumn(
        "value", F.col("value") * 2.0)          # planted scale shift
    ref_counts = (refd.filter(F.col("value").isNotNull())
                  .select(psi_bucket("value", lo, hi, bk)
                           .alias("bucket"))
                  .groupBy("bucket")
                  .agg(F.count(F.lit(1)).alias("__ca")))
    src = tmp_path / "mon"
    src.mkdir()
    (mon.filter(F.col("ts") < t_mid).coalesce(1)
        .write.parquet(str(src / "f1")))
    (mon.filter(F.col("ts") >= t_mid).coalesce(1)
        .write.parquet(str(src / "f2")))
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(src)))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = psi_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        ref_counts, state, str(tmp_path / "ckpt"),
        "value", lo=lo, hi=hi, buckets=bk)
    q.processAllAvailable()
    q.stop()
    got = {r["bucket"]: (r["__ca"], r["__cb"], round(r["psi"], 9))
           for r in state.read().collect()}
    batch_union = (refd.select(F.lit("ref").alias("__g"), "value")
                   .unionByName(mon.select(F.lit("live").alias("__g"),
                                           "value")))
    want = {r["bucket"]: (r["__ca"], r["__cb"], round(r["psi"], 9))
            for r in distribution_psi(batch_union, "value", "__g",
                                      "ref", "live",
                                      lo=lo, hi=hi, buckets=bk)
            .collect()}
    assert got == want and len(want) > 0
    psi_total = state.read().select("psi_total").first()[0]
    assert psi_total > 0.25      # the x2 shift reads as "shifted"

    before = got
    q2 = psi_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 2)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        ref_counts, state, str(tmp_path / "ckpt2"),
        "value", lo=lo, hi=hi, buckets=bk)
    q2.processAllAvailable()
    q2.stop()
    after = {r["bucket"]: (r["__ca"], r["__cb"], round(r["psi"], 9))
             for r in state.read().collect()}
    assert after == before


def test_ewma_sink_all_late_batch_survives(spark, tmp_path):
    """A micro-batch consisting ONLY of late points for an existing
    key must not crash the query (ANSI element_at hazard): the points
    are dropped-and-counted and the fold state is untouched."""
    import pandas as pd

    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import ewma_sink

    t0 = pd.Timestamp("2024-01-01")
    b1 = pd.DataFrame({
        "user_id": [1, 1], "ts": [t0, t0 + pd.Timedelta(minutes=2)],
        "event_id": [0, 1], "value": [10.0, 20.0]})
    b2 = pd.DataFrame({                       # ENTIRELY late
        "user_id": [1, 1],
        "ts": [t0 + pd.Timedelta(seconds=10),
               t0 + pd.Timedelta(minutes=1)],
        "event_id": [2, 3], "value": [99.0, 98.0]})
    src = tmp_path / "ev"
    src.mkdir()
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(str(src)))
    state = SnapshotTable.create(spark, str(tmp_path / "state"))
    q = ewma_sink(
        (spark.readStream.schema(whole.schema)
         .option("maxFilesPerTrigger", 1)
         .option("recursiveFileLookup", "true").parquet(str(src))),
        state, str(tmp_path / "ckpt"),
        "user_id", "ts", "value", alpha=0.3)
    q.processAllAvailable()
    q.stop()
    r = state.read().collect()[0]
    assert r["n_events"] == 2 and r["n_late"] == 2
    assert r["s"] == pytest.approx(0.7 * 10 + 0.3 * 20, abs=1e-9)
    assert r["last_e"] == 1          # high-water mark unmoved


class _CaptureStream:
    """Minimal writeStream stand-in: hands the sink's foreachBatch
    closure back to the test so per-batch folds can be driven directly
    (fast, no streaming machinery — the contract under test is the
    fold continuation, which lives entirely in _apply)."""

    def __init__(self):
        self.writeStream = self
        self.fn = None

    def foreachBatch(self, fn):
        self.fn = fn
        return self

    def option(self, *a):
        return self

    def outputMode(self, *a):
        return self

    def start(self):
        return None


def test_ewma_sink_invariant_under_any_time_batching(spark, tmp_path):
    """Batching invariance: for SEVERAL random time-ordered batchings
    of the same multi-key series, the sink's final state equals the
    batch ewma_summary fold — the 'state equals the concatenation'
    contract for cuts the parity test's fixed 3-way split never
    exercises (singleton batches, lopsided cuts, per-batch key
    absence)."""
    import random

    import pandas as pd

    from datum_spark.operators.timeseries import ewma_summary
    from datum_spark.sources.snapshots import SnapshotTable
    from datum_spark.streaming.stateful import ewma_sink

    rng = random.Random(17)
    rows = []
    t0 = pd.Timestamp("2024-01-01")
    for uid in range(4):
        for i in range(rng.randrange(3, 12)):
            rows.append((uid, t0 + pd.Timedelta(minutes=i), i,
                         round(rng.uniform(-50, 50), 3)))
    pdf = (pd.DataFrame(rows,
                        columns=["user_id", "ts", "event_id", "value"])
           .sort_values(["ts", "event_id"]).reset_index(drop=True))
    df = spark.createDataFrame(pdf)
    want = {r["user_id"]: (r["n_events"], round(r["ewma_last"], 6))
            for r in ewma_summary(df, "user_id", "ts",
                                  "value").collect()}

    for trial in range(3):
        cuts = sorted(rng.sample(range(1, len(pdf)), rng.randrange(1, 4)))
        parts = []
        prev = 0
        for c in cuts + [len(pdf)]:
            parts.append(pdf.iloc[prev:c])
            prev = c
        state = SnapshotTable.create(
            spark, str(tmp_path / f"state{trial}"))
        cap = _CaptureStream()
        ewma_sink(cap, state, "", "user_id", "ts", "value", alpha=0.3)
        for i, part in enumerate(p for p in parts if len(p)):
            cap.fn(spark.createDataFrame(part), i)
        got = {r["user_id"]: (r["n_events"], round(r["s"], 6))
               for r in state.read().collect()}
        assert got == want, (trial, cuts)
