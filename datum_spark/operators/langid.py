"""Language identification: multiclass (one-vs-rest) logistic
regression on hashed character n-grams — the first pass of every
multilingual corpus build.

The reference has no text analytics at all (its surface is SQL
assembly over a backend RDBMS — `/root/reference/datum/table.py`);
this is the §2-C text-analysis extension the r10 VERDICT ranked #3
missing.  The approach is the published standard (Cavnar & Trenkle
1994 character n-grams; langid.py / fastText both classify over char
n-gram features), expressed on the x188 classifier substrate:
deterministic full-batch GD with every reduction quantized, so the
ENTIRE multiclass training trajectory — all K one-vs-rest weight
chains — replays value-for-value in DuckDB (the x207 oracle).

Scale shape (the classifier.py posture, multiplied by K):

- the char-n-gram FEATURE PASS runs ONCE and is cached (bounded
  operator ring); all K class fits and the final scoring reuse it —
  tokenize cost does not scale with the number of languages;
- each GD step fits ALL K classes in ONE job (r12,
  ``classifier._fit_features_multi``): the K per-class residuals are
  K map-only expressions over the shared frame (each class's weights
  ride the plan as an array literal), the features explode once per
  doc, and one map-side-combined shuffle of ``n_buckets + 1`` rows ×
  K gradient columns carries every class's gradient — per-step
  traffic is O(K × n_buckets), never O(corpus), and language count
  adds columns, not corpus passes;
- scoring all K classes is a SINGLE map-only projection (K score
  expressions over the shared feature frame), and the argmax is an
  ``array_max`` over (score, lang) structs — no shuffle, no UDF.

At 100 TB: ``steps`` passes over the CACHED feature frame no matter
how many languages (the honest full-batch determinism cost — the SGD
throughput twin in classifier.py applies unchanged if the trajectory
need not be auditable), then one scoring pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .classifier import _features, _fit_features_multi, _score_expr


def char_ngram_tokens(text_col: str, n: int = 3) -> Column:
    """Array of character ``n``-grams of the lowercased text —
    Catalyst-only, guarded against ``sequence``'s descending-range
    trap on short texts (the contamination-operator lesson).  Unicode
    characters count as single positions in both Spark and DuckDB, so
    the grams (and their md5 buckets) agree across engines."""
    t = F.lower(F.col(text_col))
    idx = F.when(F.length(t) >= n,
                 F.sequence(F.lit(1), F.length(t) - (n - 1))
                 ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: t.substr(i, F.lit(n)))


def language_classifier_fit(df: DataFrame, id_col: str, text_col: str,
                            lang_col: str, n_buckets: int = 64,
                            steps: int = 4, lr: float = 2.0,
                            gram_n: int = 3, salt: str = "langid",
                            quantize: int = 9
                            ) -> dict[str, tuple[list[float], float]]:
    """One-vs-rest fit over every distinct label in ``lang_col``
    (sorted — the class order is part of the deterministic recipe).
    Returns ``{lang: (weights, bias)}``.  The char-n-gram feature pass
    runs once, and the K one-vs-rest fits run TOGETHER — one gradient
    job per step carrying all K classes as aggregate columns
    (:func:`~datum_spark.operators.classifier._fit_features_multi`,
    r12): ``steps`` corpus passes total, not ``steps × K``, so
    language count is free at 100 TB.  Per-class arithmetic is the
    x188 GD loop with ``__y = (lang == c)``, unchanged."""
    langs = sorted(r[0] for r in df.select(lang_col).distinct()
                   .collect() if r[0] is not None)
    if not langs:
        raise ValueError("no labels in lang_col")
    feat = (_features(df, id_col, text_col, n_buckets, salt,
                      tokens=char_ngram_tokens(text_col, gram_n))
            .join(df.select(F.col(id_col).alias("__id"),
                            F.col(lang_col).alias("__lang")), "__id"))
    return _fit_features_multi(feat, langs, n_buckets, steps, lr,
                               quantize)


def language_classifier_score(df: DataFrame,
                              models: dict[str, tuple[list[float],
                                                      float]],
                              id_col: str, text_col: str,
                              n_buckets: int | None = None,
                              gram_n: int = 3, salt: str = "langid",
                              quantize: int = 9) -> DataFrame:
    """``(id_col, pred_lang, pred_score)`` for every document with ≥1
    char n-gram: all K calibrated one-vs-rest scores in ONE map-only
    projection over the shared feature pass, argmax by
    ``(score, lang)`` struct max (deterministic tie-break: the
    lexicographically LAST language wins an exact score tie — mirrored
    in the oracle's ``ORDER BY p DESC, lang DESC``)."""
    langs = sorted(models)
    nb = n_buckets or len(models[langs[0]][0])
    feat = _features(df, id_col, text_col, nb, salt,
                     tokens=char_ngram_tokens(text_col, gram_n))
    best = F.array_max(F.array(*[
        F.struct(_score_expr(models[lg][0], models[lg][1],
                             quantize).alias("s"),
                 F.lit(lg).alias("lang")) for lg in langs]))
    return feat.select(F.col("__id").alias(id_col),
                       best["lang"].alias("pred_lang"),
                       best["s"].alias("pred_score"))


def language_confusion(df: DataFrame, scored: DataFrame, id_col: str,
                       lang_col: str) -> DataFrame:
    """Confusion-matrix rows ``(lang, pred_lang, n_docs)`` — the
    evaluation every langid gate ships with.  One map-combined count
    shuffle of ≤ K² rows."""
    return (df.select(id_col, lang_col)
              .join(scored.select(id_col, "pred_lang"), id_col)
              .groupBy(F.col(lang_col).alias("lang"), "pred_lang")
              .agg(F.count(F.lit(1)).alias("n_docs"))
              .orderBy("lang", "pred_lang"))
