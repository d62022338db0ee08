"""Shared registry + fixture loaders for the extension-query package.

Every domain module registers its entries into ``EXTENSIONS`` through
the ``x`` decorator at import time; the package ``__init__`` imports
the modules in the historical declaration order so dict order (and
therefore driver-cap ordering semantics) is unchanged from the
single-file era.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..tierb import load
from ..util import ensure_parallelism


def load_emb(spark: SparkSession, sf: str) -> DataFrame:
    """The embeddings fixture fanned out to all cores (signature /
    block-GEMM pandas UDFs are compute-bound; no-op on multi-split
    inputs)."""
    return ensure_parallelism(load(spark, sf, "embeddings"))


def load_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The documents fixture, fanned out to all cores: its text-heavy
    consumers (shingling, n-grams, quality UDFs) are compute-bound, and the
    small fixture file arrives as a single split (util.ensure_parallelism
    is a no-op on real multi-split inputs)."""
    return ensure_parallelism(load(spark, sf, "documents"))


EXTENSIONS: dict[str, tuple[Callable[[SparkSession, str], DataFrame],
                            str | None]] = {}

# Size gate for the rank queries' physical choice (x40/x42): inputs whose
# Catalyst size estimate is below this take the plain window (one job);
# above it, the distributed prefix sum (no task ever sees a whole window
# partition).  512 MB ≈ one comfortably-in-memory task; tests force the
# distributed path by monkeypatching the PACKAGE attribute
# ``extensions._RANK_SMALL_BYTES`` to 0 (read at call time via
# ``rank_sampling._rank_small_bytes``).
_RANK_SMALL_BYTES = 512 << 20


def x(name: str, oracle: str | None):
    def deco(fn):
        EXTENSIONS[name] = (fn, oracle)
        return fn
    return deco
