"""Language-ID operator: char-n-gram features, multiclass one-vs-rest
deterministic GD, argmax scoring, confusion matrix."""

import random

import pytest
from pyspark.sql import functions as F

from datum_spark.operators.langid import (char_ngram_tokens,
                                          language_classifier_fit,
                                          language_classifier_score,
                                          language_confusion)


def _script_corpus(spark, n_per=40, seed=7):
    """Three fake 'languages' with disjoint alphabets — fully
    separable by character n-grams."""
    random.seed(seed)
    alph = {"aa": "abcdefg", "bb": "hijklmn", "cc": "opqrstu"}
    rows, i = [], 0
    for lg, a in alph.items():
        for _ in range(n_per):
            rows.append((i, " ".join(
                "".join(random.choice(a) for _ in range(5))
                for _ in range(12)), lg))
            i += 1
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")


def test_char_ngram_tokens_positions_and_short_guard(spark):
    df = spark.createDataFrame([("AbCdef",), ("ab",), ("",)],
                               "text string")
    out = [r[0] for r in
           df.select(char_ngram_tokens("text", 3)).collect()]
    assert out[0] == ["abc", "bcd", "cde", "def"]   # lowercased, len-2
    assert out[1] == [] and out[2] == []            # no descending trap


def test_separable_scripts_classify_correctly(spark):
    docs = _script_corpus(spark)
    models = language_classifier_fit(docs, "doc_id", "text", "lang",
                                     n_buckets=64, steps=4, lr=2.0)
    assert sorted(models) == ["aa", "bb", "cc"]
    scored = language_classifier_score(docs, models, "doc_id", "text")
    acc = (docs.join(scored, "doc_id")
               .agg(F.avg((F.col("lang") == F.col("pred_lang"))
                          .cast("double"))).first()[0])
    assert acc > 0.9
    conf = language_confusion(docs, scored, "doc_id", "lang").collect()
    assert sum(r["n_docs"] for r in conf) == 120
    diag = {r["lang"]: r["n_docs"] for r in conf
            if r["lang"] == r["pred_lang"]}
    assert all(diag.get(lg, 0) >= 36 for lg in ("aa", "bb", "cc"))


def test_argmax_tiebreak_is_last_lang(spark):
    """Two classes with IDENTICAL weights produce an exact score tie;
    the struct max must pick the lexicographically LAST language (the
    oracle's ORDER BY p DESC, lang DESC)."""
    docs = spark.createDataFrame([(1, "abcabcabc")],
                                 "doc_id long, text string")
    w = [0.1] * 16
    models = {"aa": (w, 0.0), "bb": (list(w), 0.0)}
    out = language_classifier_score(docs, models, "doc_id", "text",
                                    n_buckets=16).collect()[0]
    assert out["pred_lang"] == "bb"


def test_fit_requires_labels(spark):
    docs = spark.createDataFrame([(1, "abc", None)],
                                 "doc_id long, text string, lang string")
    with pytest.raises(ValueError, match="no labels"):
        language_classifier_fit(docs, "doc_id", "text", "lang")


def test_docs_without_grams_are_excluded(spark):
    """A document shorter than the gram size has no features: it gets
    no score row (nothing to score it on) — same rule both engines."""
    docs = spark.createDataFrame(
        [(1, "abcdefabcdef", "aa"), (2, "hijklmhijklm", "bb"),
         (3, "xy", "aa")],
        "doc_id long, text string, lang string")
    models = language_classifier_fit(docs, "doc_id", "text", "lang",
                                     n_buckets=16, steps=2, lr=2.0)
    scored = language_classifier_score(docs, models, "doc_id", "text",
                                       n_buckets=16)
    assert {r["doc_id"] for r in scored.collect()} == {1, 2}
