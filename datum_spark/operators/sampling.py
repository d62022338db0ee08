"""Sampling operators for training-data pipelines.

- :func:`hash_split` — deterministic train/test membership from a key
  hash.  Unlike ``randomSplit`` (which depends on partitioning and row
  order), membership is a pure function of the key: stable across runs,
  cluster sizes, and re-partitioning — the property a 100 TB pipeline
  needs so that a document never migrates between train and eval.
- :func:`stratified_sample` — per-stratum fractions via ``sampleBy``
  (seeded Bernoulli per row).

Both are map-side only (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def hash_split(df: DataFrame, key_col: str, test_fraction: float = 0.1,
               seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """Split into (train, test): a row is in test iff
    ``pmod(xxhash64(key, seed), 1e6) < test_fraction * 1e6``.

    All rows sharing a key land on the same side (leak-proof for grouped
    data like documents of one source); the split is reproducible from the
    data alone.
    """
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError("test_fraction must be in [0, 1]")
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                    F.lit(_BUCKETS))
    cut = int(test_fraction * _BUCKETS)
    return (df.filter(bucket >= cut), df.filter(bucket < cut))


def with_split_label(df: DataFrame, key_col: str,
                     test_fraction: float = 0.1, seed: int = 42,
                     out_col: str = "split") -> DataFrame:
    """Single-pass variant: adds 'train'/'test' as a column."""
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)),
                    F.lit(_BUCKETS))
    cut = int(test_fraction * _BUCKETS)
    return df.withColumn(out_col, F.when(bucket < cut, F.lit("test"))
                                   .otherwise(F.lit("train")))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``): e.g. downsample an
    over-represented language while keeping rare ones whole."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def mix_sources(df: DataFrame, weights: dict, source_col: str = "source",
                id_col: str = "doc_id", seed: int = 42,
                default_weight: float = 1.0) -> DataFrame:
    """Deterministic corpus re-weighting ("data mixing"): keep each row of
    source ``s`` with probability ``weights.get(s, default_weight)``,
    decided by the row's id hash — not by ``rand()``.

    Properties a 100 TB mixing job needs (all unit-tested):

    - map-only, no shuffle; the weight table compiles into the plan as a
      CASE expression (no join, even for thousands of sources);
    - reproducible from the data alone: stable across runs, partitioning,
      and cluster size (same reason :func:`hash_split` avoids
      ``randomSplit``);
    - monotone in the weight: the keep-set at weight 0.2 is a subset of
      the keep-set at 0.5, so mixture ratios can be re-tuned without
      resampling churn (epoch-over-epoch cache reuse);
    - weights > 1 are capped at 1 (upsampling needs row replication —
      ``F.explode(F.array_repeat(...))`` — deliberately out of scope for
      a keep/drop filter).
    """
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_BUCKETS))
    expr = F.lit(float(default_weight))
    for src, w in sorted(weights.items()):
        expr = F.when(F.col(source_col) == src, F.lit(float(w))
                      ).otherwise(expr)
    return df.filter(bucket < expr * _BUCKETS)
