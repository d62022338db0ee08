"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_top_k` — exact brute force: broadcast the (small) query set
  against the corpus, cosine via JVM-side array expressions
  (``zip_with`` + ``aggregate``), per-query top-k via a ranking window.
  At 100 TB corpus / small query set this is a single broadcast-nested-loop
  map stage + one shuffle on query_id for the top-k — the right baseline.
- :func:`lsh_cosine_top_k` — sign-LSH (random hyperplane) bucketing: corpus
  and queries hash to buckets map-side; the join happens per (bucket) with
  multi-probe on query side; approximate recall, sub-linear scanned volume.

Hyperplanes are deterministic (seeded) driver-side constants embedded as
array literals — tiny (planes × dim doubles) and broadcast with the plan.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot_expr(a, b):
    """Dot product of two array<double> columns, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _cosine_expr(a, b):
    """Cosine similarity between two array<double> columns, JVM-side.

    NOTE: 3 higher-order aggregates per pair — fine for scoring joined
    candidates, but for all-pairs/top-k loops prefer :func:`_normalize_col`
    once per vector + a single `_dot_expr` per pair (3× less work in the
    quadratic stage).
    """
    return _dot_expr(a, b) / (F.sqrt(_dot_expr(a, a)) * F.sqrt(_dot_expr(b, b)))


def _normalize_col(v):
    """Unit-normalize an array<double> column (map-side, once per vector)."""
    norm = F.sqrt(_dot_expr(v, v))
    return F.transform(v, lambda x: x / norm)


def _planes(dim: int, planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def _signature_col(vec_col: str, dim: int, planes: int, seed: int):
    """Sign-LSH bucket id (bigint) for a vector column: bit i = sign of the
    dot product with deterministic random hyperplane i."""
    plane_lits = [F.array(*[F.lit(w) for w in p])
                  for p in _planes(dim, planes, seed)]
    bits = [
        F.when(
            F.aggregate(F.zip_with(F.col(vec_col), p, lambda x, y: x * y),
                        F.lit(0.0), lambda acc, v: acc + v) >= 0,
            F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(plane_lits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def cosine_top_k(queries: DataFrame, corpus: DataFrame, k: int,
                 query_id: str = "vec_id", query_vec: str = "embedding",
                 corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                 round_to: int | None = None) -> DataFrame:
    """Exact top-k corpus neighbors per query by cosine similarity.

    Returns ``(query_id, neighbor_id, cosine, rnk)``.  ``round_to`` rounds
    the similarity BEFORE ranking (cross-engine determinism: float sums in
    different orders differ at ~1e-16, so rank on the rounded value with the
    neighbor id as tiebreak).
    """
    # unit-normalize ONCE per vector map-side; the quadratic stage is then a
    # single dot product per pair instead of three aggregates
    q = queries.select(F.col(query_id).alias("query_id"),
                       _normalize_col(F.col(query_vec).cast("array<double>"))
                       .alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      _normalize_col(F.col(corpus_vec).cast("array<double>"))
                      .alias("__cv"))
    cos = _dot_expr(F.col("__qv"), F.col("__cv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (F.broadcast(q).crossJoin(c)
              .select("query_id", "neighbor_id", cos.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k))


def lsh_cosine_top_k(queries: DataFrame, corpus: DataFrame, k: int,
                     query_id: str = "vec_id", query_vec: str = "embedding",
                     corpus_id: str = "vec_id", corpus_vec: str = "embedding",
                     planes: int = 12, seed: int = 42,
                     multiprobe: int = 1) -> DataFrame:
    """Approximate top-k: compare only within sign-LSH buckets.

    ``multiprobe`` > 0 additionally probes the buckets at hamming distance 1
    from the query's bucket (flip each of the first ``multiprobe`` bits),
    trading compute for recall.  Scale posture: the corpus is scanned once to
    bucket it; each query touches ~(1+multiprobe)/2^planes of the corpus.
    """
    from pyspark.sql.types import LongType

    dim_row = corpus.select(F.size(F.col(corpus_vec)).alias("d")).first()
    dim = int(dim_row["d"])

    c = (corpus.select(F.col(corpus_id).alias("neighbor_id"),
                       _normalize_col(F.col(corpus_vec).cast("array<double>"))
                       .alias("__cv"))
               .withColumn("__bucket", _signature_col("__cv", dim, planes, seed)))
    q = (queries.select(F.col(query_id).alias("query_id"),
                        _normalize_col(F.col(query_vec).cast("array<double>"))
                        .alias("__qv"))
                .withColumn("__b0", _signature_col("__qv", dim, planes, seed)))
    probes = [F.col("__b0")] + [
        F.col("__b0").bitwiseXOR(F.shiftleft(F.lit(1).cast(LongType()), i))
        for i in range(max(0, multiprobe))
    ]
    q = q.withColumn("__bucket", F.explode(F.array(*probes)))

    cos = _dot_expr(F.col("__qv"), F.col("__cv"))
    scored = (F.broadcast(q).join(c, "__bucket")
              .select("query_id", "neighbor_id",
                      F.round(cos, 6).alias("cosine"))
              .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k))
