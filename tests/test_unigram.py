"""Unigram-LM tokenizer (operators/unigram.py): driver/Catalyst DP
parity, training invariants, segmentation correctness."""

import math
import random

import pytest
from pyspark.sql import functions as F

from datum_spark.operators.unigram import (D, _mstep, _parse,
                                           unigram_encode,
                                           unigram_train_local,
                                           unigram_vocab_table,
                                           viterbi_state)


def _random_words(seed, n=40, alpha="abcd", maxlen=12):
    rng = random.Random(seed)
    return [("".join(rng.choice(alpha)
                     for _ in range(rng.randint(1, maxlen))),
             rng.randint(1, 9)) for _ in range(n)]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_catalyst_dp_bit_equal_to_driver_dp(spark, seed):
    """The packed DP state string from the Catalyst aggregate
    expression must equal the Python reference byte-for-byte —
    score formatting, rounding, tie-breaks and all."""
    words = _random_words(seed)
    vocab = unigram_train_local(words, iters=1)
    cost = {p: c for p, _n, c in vocab}
    enc = unigram_encode(
        spark.createDataFrame(words, "word string, cnt long"), vocab)
    got = {r["word"]: (r["score"], r["n_tokens"], r["seg"])
           for r in enc.collect()}
    for w, _ in words:
        s, n, seg = _parse(viterbi_state(w, cost))
        assert got[w] == (s, n, seg.replace(D, "|").lstrip("|")), w


def test_segmentation_reassembles_word(spark):
    words = _random_words(7, n=60, alpha="abcdef")
    vocab = unigram_train_local(words, iters=2)
    enc = unigram_encode(
        spark.createDataFrame(words, "word string, cnt long"), vocab)
    for r in enc.collect():
        assert r["seg"].replace("|", "") == r["word"]
        assert r["n_tokens"] == len(r["seg"].split("|"))


def test_training_covers_every_character():
    words = [("zebra", 3), ("quartz", 1), ("jazz", 5)]
    vocab = unigram_train_local(words, iters=2)
    pieces = {p for p, _, _ in vocab}
    assert set("zebraqutj") <= pieces      # chars never dropped
    for _p, cnt, cost in vocab:
        assert cnt >= 1 and cost > 0


def test_costs_are_normalized_negative_logs():
    words = _random_words(11)
    vocab = unigram_train_local(words, iters=2)
    total = sum(c for _, c, _ in vocab)
    for p, c, cost in vocab:
        assert cost == pytest.approx(-math.log(c / total), abs=1e-6)


def test_hard_em_never_increases_corpus_cost():
    """Each EM iteration re-fits costs to the segmentation it chose —
    the corpus-weighted Viterbi cost must be non-increasing (the
    monotonicity hard-EM inherits from EM)."""
    words = _random_words(13, n=80)

    def corpus_cost(vocab):
        cost = {p: c for p, _n, c in vocab}
        return sum(cnt * _parse(viterbi_state(w, cost))[0]
                   for w, cnt in words)

    c1 = corpus_cost(unigram_train_local(words, iters=1))
    c2 = corpus_cost(unigram_train_local(words, iters=2))
    c3 = corpus_cost(unigram_train_local(words, iters=3))
    assert c2 <= c1 + 1e-6 and c3 <= c2 + 1e-6


def test_multi_char_pieces_win_frequent_substrings():
    """A substring frequent enough to earn a low cost should be chosen
    over its characters."""
    words = [("banana", 50), ("bandana", 30), ("cabana", 20)]
    vocab = unigram_train_local(words, iters=2)
    cost = {p: c for p, _n, c in vocab}
    seg = _parse(viterbi_state("banana", cost))[2]
    toks = [t for t in seg.split(D) if t]
    assert any(len(t) > 1 for t in toks)


def test_oov_character_yields_null_state(spark):
    words = [("abc", 1)]
    vocab = unigram_train_local(words, iters=1)
    enc = unigram_encode(
        spark.createDataFrame([("axz",)], "word string"), vocab)
    r = enc.collect()[0]
    assert r["score"] is None and r["n_tokens"] is None


def test_vocab_table_schema_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "a cat sat")],
        "doc_id long, text string")
    a = unigram_vocab_table(spark, docs).collect()
    b = unigram_vocab_table(spark, docs).collect()
    assert a == b
    assert [f.name for f in unigram_vocab_table(spark, docs).schema] \
        == ["piece", "cnt", "cost"]


def test_mstep_floor_keeps_unused_chars():
    cost = _mstep({"a": 3, "b": 1})
    assert cost["a"] < cost["b"]
    # floor applied by the trainer, not _mstep: train a corpus where a
    # char is always absorbed into a multi piece
    words = [("aaaa", 100)]
    vocab = unigram_train_local(words, iters=2)
    assert any(p == "a" for p, _, _ in vocab)


def test_long_word_guard(spark):
    words = [("abc", 2)]
    vocab = unigram_train_local(words, iters=1)
    with pytest.raises(ValueError):
        viterbi_state("a" * 1000, {p: c for p, _n, c in vocab})
    enc = unigram_encode(
        spark.createDataFrame([("a" * 1000,), ("abc",)], "word string"),
        vocab)
    got = {r["word"][:5]: r["n_tokens"] for r in enc.collect()}
    assert got["aaaaa"] is None          # overlong → NULL, not garbage
    assert got["abc"] is not None


def test_oversized_cost_rejected(spark):
    with pytest.raises(ValueError):
        unigram_encode(spark.createDataFrame([("a",)], "word string"),
                       [("a", 1, 1000.0)])


def test_doc_scores_orders_quality(spark):
    """A document of common (LM-cheap) words must score fewer nats per
    token than one of rare character salad; sums must reassemble."""
    from datum_spark.operators.unigram import unigram_doc_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat the cat sat on the mat"),
         (2, "the cat sat on the mat"),
         (3, "zqxj vwkp qjzx wvpk zzqq")],
        "doc_id long, text string")
    words = [("the", 30), ("cat", 20), ("sat", 20), ("on", 10),
             ("mat", 10), ("zqxj", 1), ("vwkp", 1), ("qjzx", 1),
             ("wvpk", 1), ("zzqq", 1)]
    vocab = unigram_train_local(words, iters=2)
    out = {r["doc_id"]: r for r in
           unigram_doc_scores(docs, vocab).collect()}
    assert out[1]["n_words"] == 12 and out[3]["n_words"] == 5
    assert out[1]["nats_per_token"] < out[3]["nats_per_token"]
    # same word mix → same per-token cost regardless of doc length
    assert out[1]["nats_per_token"] == pytest.approx(
        out[2]["nats_per_token"], abs=1e-5)
    for r in out.values():
        assert r["total_cost"] == pytest.approx(
            r["nats_per_token"] * r["n_tokens"], abs=1e-4)


def test_doc_scores_excludes_overlong_and_oov(spark):
    from datum_spark.operators.unigram import unigram_doc_scores

    vocab = unigram_train_local([("abc", 5)], iters=1)
    docs = spark.createDataFrame(
        [(1, "abc " + "a" * 20 + " xyz abc")],
        "doc_id long, text string")
    r = unigram_doc_scores(docs, vocab, max_word_len=16).collect()[0]
    # the 20-char word (over max_word_len) and 'xyz' (out-of-vocabulary
    # characters) are both excluded; the two 'abc' occurrences remain
    assert r["n_words"] == 2
    assert r["total_cost"] > 0


def test_doc_scores_broadcast_gate_paths_equal(spark, monkeypatch):
    """The size-gated join (VERDICT r10 #1): the broadcast-hinted path
    (default, vocab provably small) and the forced shuffle-join path
    (gate monkeypatched to 0 — the web-corpus posture where the
    distinct-word table is 10⁷–10⁸ rows) must be value-identical."""
    from datum_spark import util
    from datum_spark.operators.unigram import unigram_doc_scores

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the the the cat"),
         (3, "zqxj vwkp mat on")],
        "doc_id long, text string")
    words = [("the", 30), ("cat", 20), ("sat", 20), ("on", 10),
             ("mat", 10), ("zqxj", 1), ("vwkp", 1)]
    vocab = unigram_train_local(words, iters=2)
    small = sorted(map(tuple, unigram_doc_scores(docs, vocab).collect()))
    monkeypatch.setattr(util, "_GATED_BROADCAST_BYTES", 0)
    large = sorted(map(tuple, unigram_doc_scores(docs, vocab).collect()))
    assert small == large


def test_gated_broadcast_hint_present_only_below_gate(spark, monkeypatch):
    """Below the gate the optimized plan carries the broadcast hint
    (ResolvedHint/broadcast in the plan); at gate 0 it must not."""
    from datum_spark import util

    d = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k")
    j = big.join(util.gated_broadcast(d), "k")
    assert "broadcast" in j._jdf.queryExecution().optimizedPlan() \
        .toString().lower()
    monkeypatch.setattr(util, "_GATED_BROADCAST_BYTES", 0)
    j2 = big.join(util.gated_broadcast(d), "k")
    assert "broadcast" not in j2._jdf.queryExecution().optimizedPlan() \
        .toString().lower()


def test_prune_schedule_deterministic_param_only():
    from datum_spark.operators.unigram import prune_schedule

    assert prune_schedule(96, 24, 0.75) == [72, 54, 41, 31, 24]
    assert prune_schedule(24, 24, 0.75) == []
    assert prune_schedule(25, 24, 0.75) == [24]
    with pytest.raises(ValueError):
        prune_schedule(96, 24, 1.0)


def test_pruned_training_targets_vocab_size():
    """Kudo §4 pruning: the final vocabulary is all chars + exactly
    target_multi multis (enough candidates survive here); chars are
    never pruned; costs re-normalize to a proper distribution."""
    from datum_spark.operators.unigram import unigram_train_pruned

    words = [(w, c) for c, w in enumerate(
        ["interest", "interests", "interesting", "rest", "ingest",
         "testing", "resting", "nest", "nesting", "singe", "tints"],
        start=3)]
    vocab = unigram_train_pruned(words, target_multi=6, seed_multi=40,
                                 shrink=0.75, final_iters=1)
    chars = {p for p, _c, _k in vocab if len(p) == 1}
    multis = [p for p, _c, _k in vocab if len(p) > 1]
    assert len(multis) == 6
    assert chars == set("intersg")            # every corpus character
    total = sum(c for _p, c, _k in vocab)
    for _p, c, k in vocab:
        assert k == pytest.approx(-math.log(c / total), abs=5e-7)


def test_pruned_vocab_still_covers_every_word():
    """Pruning never removes single chars, so Viterbi under the pruned
    vocabulary segments every training word."""
    from datum_spark.operators.unigram import (unigram_train_pruned,
                                               viterbi_state)

    words = [("abcabc", 9), ("bca", 5), ("cab", 4), ("aaa", 2)]
    vocab = unigram_train_pruned(words, target_multi=2, seed_multi=30)
    cost = {p: k for p, _c, k in vocab}
    for w, _ in words:
        seg = _parse(viterbi_state(w, cost))[2]
        assert "".join(seg.split(D)) == w


def test_pruned_keeps_high_contribution_pieces():
    """The contribution proxy (cnt × cost) must keep the workhorse
    multi-piece of a skewed corpus through every prune round."""
    from datum_spark.operators.unigram import unigram_train_pruned

    words = [("zzzz", 100)] + [(w, 1) for w in
                               ["abcd", "bcde", "cdef", "defa", "efab",
                                "fabc", "acbd", "bdce", "cedf"]]
    vocab = unigram_train_pruned(words, target_multi=1, seed_multi=30)
    multis = [p for p, _c, _k in vocab if len(p) > 1]
    assert multis == ["zzzz"]


def test_ccnet_buckets_terciles_and_no_global_sort(spark):
    """head/middle/tail terciles: every doc lands in exactly one
    bucket, heads score below tails, and the plan carries no global
    sort (the cuts are one percentile aggregation)."""
    from datum_spark.operators.unigram import ccnet_buckets

    docs = spark.createDataFrame(
        [(i, ("the cat sat " * (1 + i % 3)) +
          ("zqxj vwkp " * (i % 4)), f"s{i % 2}")
         for i in range(24)],
        "doc_id long, text string, source string")
    words = [("the", 30), ("cat", 20), ("sat", 20),
             ("zqxj", 1), ("vwkp", 1)]
    vocab = unigram_train_local(words, iters=2)
    out = ccnet_buckets(docs, vocab).collect()
    assert sum(r["n_docs"] for r in out) == 24
    by_bucket: dict = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["mean_nats"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) < min(by_bucket["tail"])


def test_ccnet_by_group_cuts_are_per_group(spark):
    """Per-language bucketing (the published CCNet design): each group
    gets its OWN tercile cuts, so a group whose scores are uniformly
    high still splits head/middle/tail instead of landing whole in the
    global tail."""
    from datum_spark.operators.unigram import ccnet_buckets_by_group

    rows = []
    for i in range(12):   # 'aa': cheap words, varying mildly
        rows.append((i, "the cat " + "sat " * (i % 3 + 1), "aa"))
    for i in range(12, 24):   # 'bb': expensive words throughout
        rows.append((i, "zqxj vwkp " * (i % 3 + 1) + "qjzx", "bb"))
    docs = spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")
    words = [("the", 30), ("cat", 20), ("sat", 20),
             ("zqxj", 1), ("vwkp", 1), ("qjzx", 1)]
    vocab = unigram_train_local(words, iters=2)
    out = ccnet_buckets_by_group(docs, vocab).collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    # BOTH groups have a head bucket despite disjoint score ranges
    assert "head" in by_lang["aa"] and "head" in by_lang["bb"]
    # and the cuts differ per group (bb's head cut above aa's tail)
    assert by_lang["bb"]["head"]["c1"] > by_lang["aa"]["head"]["c2"]
    assert sum(r["n_docs"] for r in out) == 24


def test_tercile_cuts_both_paths_match_exact_percentile(spark,
                                                        monkeypatch):
    """r12 histogram cuts: the size-gated driver walk AND the
    distributed boundary-join path both reproduce Spark's exact
    ``percentile`` bit-for-bit (grouped + global, ties, NULL scores,
    singleton and all-NULL groups), and zero scored rows yield an
    empty map instead of a NULL-cut TypeError (ADVICE r12)."""
    import random

    from datum_spark.operators import unigram as U

    rng = random.Random(7)
    rows = []
    for i in range(3000):
        g = rng.choice(["en", "fr", "de", None])
        v = (round(rng.uniform(0, 45), 6)
             if rng.random() > 0.02 else None)
        rows.append((i, g, v))
    rows.append((9001, "solo", 3.141593))
    rows.append((9002, "allnull", None))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, nats_per_token double")
    exact = {r["lang"]: (r["c1"], r["c2"])
             for r in df.groupBy("lang").agg(
                 F.round(F.expr(
                     "percentile(nats_per_token, 1.0D/3)"), 6)
                 .alias("c1"),
                 F.round(F.expr(
                     "percentile(nats_per_token, 2.0D/3)"), 6)
                 .alias("c2")).collect()}
    fast = U._tercile_cuts(df, ["lang"])
    monkeypatch.setattr(U, "_HIST_FAST_PATH_ROWS", 0)
    dist = U._tercile_cuts(df, ["lang"])
    monkeypatch.undo()
    assert fast == dist
    for key, cc in fast.items():
        assert exact[key[0]] == (cc[0], cc[1])
    for lang, e in exact.items():
        if e[0] is None:
            assert (lang,) not in fast      # all-NULL group absent
        else:
            assert (lang,) in fast
    # global (ungrouped) case
    eg = df.agg(
        F.round(F.expr("percentile(nats_per_token, 1.0D/3)"), 6)
        .alias("c1"),
        F.round(F.expr("percentile(nats_per_token, 2.0D/3)"), 6)
        .alias("c2")).first()
    assert tuple(U._tercile_cuts(df, [])[()]) == (eg["c1"], eg["c2"])
    # empty / all-NULL inputs return {} (callers emit empty frames)
    assert U._tercile_cuts(df.filter(F.lit(False)), ["lang"]) == {}
    assert U._tercile_cuts(df.filter("lang = 'allnull'"), []) == {}


def test_ccnet_buckets_empty_corpus_returns_empty_frame(spark):
    """ADVICE r12: zero scored docs (all texts empty/OOV/over-long)
    must yield an empty frame with the output schema, not a
    float(None) TypeError."""
    from datum_spark.operators.unigram import (ccnet_buckets,
                                               ccnet_buckets_by_group)

    docs = spark.createDataFrame(
        [(1, "", "s0"), (2, "zzzz 9999", "s1")],
        "doc_id long, text string, source string")
    words = [("the", 30), ("cat", 20)]
    vocab = unigram_train_local(words, iters=1)
    out = ccnet_buckets(docs, vocab)
    assert out.count() == 0
    assert out.columns == ["source", "bucket", "n_docs", "mean_nats"]
    out2 = ccnet_buckets_by_group(docs, vocab, group_col="source")
    assert out2.count() == 0
    assert out2.columns == ["source", "bucket", "n_docs", "mean_nats",
                            "c1", "c2"]
